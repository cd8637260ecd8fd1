package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 148 (C996–C1003): statistical process control (X̄-S chart,
  * Nelson rules), geometry/alignment (closed-form 2-D orthogonal
  * Procrustes), business decomposition (DuPont), frequent-itemset
  * mining (A-priori triples with confidence/lift), density-based
  * clustering (grid-bucketed DBSCAN core/border/noise), nonparametric
  * density (Silverman-bandwidth KDE on a fixed grid), and the energy
  * distance two-sample statistic via exact prefix-sum integer algebra.
  *
  * Shared discipline: every corpus-wide sum is an exact BIGINT/DECIMAL
  * sum of once-quantized values (cents from exact 2-decimal sources,
  * embedding coordinates on the 1e9/1e6 grids, kernel terms on 1e12);
  * doubles appear only in final O(1) arithmetic computed from identical
  * integers in both engines, written in identical left-assoc order.
  * Global windows sit on calendar days or literally-clamped cent grids
  * (the hardened plan-gate's provably-bounded shapes).
  */
object Extras248 {

  // ---------------------------------------------------------------- C996
  /** stat_xbar_s_chart — the X̄-S control chart over daily order-value
    * subgroups: each qualifying day contributes its first five orders
    * (by order key) as a rational subgroup of fixed n = 5, so the
    * textbook constants A3(5) = 1.427, B3(5) = 0, B4(5) = 2.089 apply
    * as literals. Per-subgroup mean and sample s come from exact
    * integer cent moments ((5·Σc² − (Σc)²)/20 ≥ 0 by construction);
    * S̄ is the mean of the 1e6-quantized s values (order-free exact
    * sum). Scale: one hash aggregate per day (calendar-bounded subgroup
    * frame, ≤ a few thousand rows at ANY sf) after a per-day top-5
    * window on the day-partitioned orders — fully distributed.
    */
  def statXbarSChart(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("day")).orderBy(col("o_orderkey"))
    val sub = orders(s, d)
      .select(to_date(col("o_orderdate")).as("day"), col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy("day")
      .agg(count(lit(1)).as("n5"), sum(col("c")).as("s5"),
        sum(col("c") * col("c")).as("q5"))
      .filter(col("n5") === 5)
      // sample s in cents: sqrt((5q5 - s5^2)/20); quantized 1e6 for the
      // order-free mean
      .withColumn("sq", expr(
        "CAST(floor(sqrt((5 * q5 - s5 * s5) / CAST(20 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"))
    val tot = sub.agg(count(lit(1)).as("m"), sum(col("s5")).as("ts"),
      sum(col("sq")).as("tsq"))
    sub.select(col("s5"), col("sq"))
      .crossJoin(broadcast(tot)) // scalar broadcast side: one totals row
      .withColumn("cl", expr("CAST(ts AS DOUBLE) / 5 / m"))
      .withColumn("sbar", expr("CAST(tsq AS DOUBLE) / 1e6 / m"))
      .withColumn("ooc_x", expr(
        "CASE WHEN abs(CAST(s5 AS DOUBLE) / 5 - cl) > 1.427 * sbar THEN 1L ELSE 0L END"))
      .withColumn("ooc_s", expr(
        "CASE WHEN CAST(sq AS DOUBLE) / 1e6 > 2.089 * sbar THEN 1L ELSE 0L END"))
      .groupBy("m")
      .agg(round(min(col("cl")) / 100, 2).as("cl_dollars"),
        round(min(col("sbar")) / 100, 4).as("sbar_dollars"),
        round((min(col("cl")) + lit(1.427d) * min(col("sbar"))) / 100, 2)
          .as("ucl_dollars"),
        round((min(col("cl")) - lit(1.427d) * min(col("sbar"))) / 100, 2)
          .as("lcl_dollars"),
        sum(col("ooc_x")).as("n_ooc_xbar"), sum(col("ooc_s")).as("n_ooc_s"))
      .withColumnRenamed("m", "n_subgroups")
      .orderBy("n_subgroups")
  }
  val statXbarSChartSql: String =
    """WITH sub AS (
      |  SELECT day, count(*) AS n5, sum(c) AS s5, sum(c * c) AS q5
      |  FROM (
      |    SELECT CAST(o_orderdate AS DATE) AS day,
      |      CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c,
      |      row_number() OVER (PARTITION BY CAST(o_orderdate AS DATE)
      |        ORDER BY o_orderkey) AS rn
      |    FROM orders) z
      |  WHERE rn <= 5 GROUP BY 1 HAVING count(*) = 5),
      |q AS (
      |  SELECT day, s5,
      |    CAST(floor(sqrt((5 * q5 - s5 * s5) / CAST(20 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS sq
      |  FROM sub),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m, sum(s5) AS ts, sum(sq) AS tsq
      |  FROM q),
      |lim AS (
      |  SELECT m, CAST(ts AS DOUBLE) / 5 / m AS cl,
      |    CAST(tsq AS DOUBLE) / 1e6 / m AS sbar FROM tot)
      |SELECT m AS n_subgroups, round(cl / 100, 2) AS cl_dollars,
      |  round(sbar / 100, 4) AS sbar_dollars,
      |  round((cl + 1.427 * sbar) / 100, 2) AS ucl_dollars,
      |  round((cl - 1.427 * sbar) / 100, 2) AS lcl_dollars,
      |  CAST(sum(CASE WHEN abs(CAST(s5 AS DOUBLE) / 5 - cl) > 1.427 * sbar
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_ooc_xbar,
      |  CAST(sum(CASE WHEN CAST(sq AS DOUBLE) / 1e6 > 2.089 * sbar
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_ooc_s
      |FROM q, lim GROUP BY 1, 2, 3, 4, 5 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- C997
  /** stat_nelson_rules — Nelson signal rules 1–4 on the individuals
    * chart of daily revenue: R1 a point beyond 3σ̂ (σ̂ = MR̄/1.128,
    * the moving-range estimate), R2 nine consecutive points one side
    * of the center line, R3 six consecutive strictly monotone points,
    * R4 fourteen consecutive alternating points. Side/trend/alternation
    * logic is EXACT integer arithmetic on cent sums (side compares
    * r_d·m vs the total, trends compare lagged cents); only the R1
    * 3σ̂ band is IEEE, computed from identical integer sums. Scale:
    * the frame is the per-day aggregate — calendar-bounded, windows
    * ordered by day over ≤ a few thousand rows at ANY sf.
    */
  def statNelsonRules(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")).as("r"))
    val tot = daily.agg(count(lit(1)).as("m"), sum(col("r")).as("t"),
      sum(expr("r * r")).as("q"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    val marked = daily.crossJoin(broadcast(tot))
      .withColumn("side", expr(
        "CASE WHEN r * m > t THEN 1L WHEN r * m < t THEN -1L ELSE 0L END"))
      .withColumn("diff", col("r") - lag(col("r"), 1).over(w))
      .withColumn("mr", abs(col("diff")))
      .withColumn("up", expr(
        "CASE WHEN diff > 0 THEN 1L WHEN diff < 0 THEN -1L ELSE 0L END"))
      .withColumn("alt", expr(
        "CASE WHEN up * lag(up, 1) OVER (ORDER BY day) = -1 THEN 1L ELSE 0L END"))
    val sig = marked
      .withColumn("mrbar", expr(
        "sum(mr) OVER () / CAST(1.128 AS DOUBLE) / (m - 1)"))
      .withColumn("r1", expr(
        "CASE WHEN abs(CAST(r AS DOUBLE) - CAST(t AS DOUBLE) / m) > 3 * mrbar THEN 1L ELSE 0L END"))
      .withColumn("s9", sum(col("side")).over(w.rowsBetween(-8, 0)))
      .withColumn("c9", count(lit(1)).over(w.rowsBetween(-8, 0)))
      .withColumn("r2", expr(
        "CASE WHEN c9 = 9 AND abs(s9) = 9 THEN 1L ELSE 0L END"))
      .withColumn("u5", sum(when(col("up") === 1L, 1L).otherwise(0L))
        .over(w.rowsBetween(-4, 0)))
      .withColumn("d5", sum(when(col("up") === -1L, 1L).otherwise(0L))
        .over(w.rowsBetween(-4, 0)))
      .withColumn("c5", count(lit(1)).over(w.rowsBetween(-4, 0)))
      .withColumn("r3", expr(
        "CASE WHEN c5 = 5 AND (u5 = 5 OR d5 = 5) THEN 1L ELSE 0L END"))
      .withColumn("a12", sum(col("alt")).over(w.rowsBetween(-11, 0)))
      .withColumn("c12", count(lit(1)).over(w.rowsBetween(-11, 0)))
      .withColumn("r4", expr(
        "CASE WHEN c12 = 12 AND a12 = 12 THEN 1L ELSE 0L END"))
    sig.agg(min(col("m")).as("n_days"),
        round(min(expr("CAST(t AS DOUBLE) / m / 100")), 2).as("cl_dollars"),
        round(min(expr("mrbar / 100")), 4).as("sigma_hat_dollars"),
        sum(col("r1")).as("n_rule1"), sum(col("r2")).as("n_rule2"),
        sum(col("r3")).as("n_rule3"), sum(col("r4")).as("n_rule4"))
  }
  val statNelsonRulesSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS r
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS m, sum(r) AS t FROM daily),
      |mk AS (
      |  SELECT day, r, m, t,
      |    CASE WHEN r * m > t THEN 1 WHEN r * m < t THEN -1 ELSE 0 END AS side,
      |    r - lag(r, 1) OVER (ORDER BY day) AS diff
      |  FROM daily, tot),
      |mk2 AS (
      |  SELECT *, abs(diff) AS mr,
      |    CASE WHEN diff > 0 THEN 1 WHEN diff < 0 THEN -1 ELSE 0 END AS up
      |  FROM mk),
      |mk3 AS (
      |  SELECT *,
      |    CASE WHEN up * lag(up, 1) OVER (ORDER BY day) = -1 THEN 1 ELSE 0 END AS alt,
      |    sum(mr) OVER () / CAST(1.128 AS DOUBLE) / (m - 1) AS mrbar
      |  FROM mk2),
      |sig AS (
      |  SELECT m, t, mrbar,
      |    CASE WHEN abs(CAST(r AS DOUBLE) - CAST(t AS DOUBLE) / m) > 3 * mrbar THEN 1 ELSE 0 END AS r1,
      |    CASE WHEN count(*) OVER w9 = 9
      |      AND abs(sum(side) OVER w9) = 9 THEN 1 ELSE 0 END AS r2,
      |    CASE WHEN count(*) OVER w5 = 5
      |      AND (sum(CASE WHEN up = 1 THEN 1 ELSE 0 END) OVER w5 = 5
      |        OR sum(CASE WHEN up = -1 THEN 1 ELSE 0 END) OVER w5 = 5)
      |      THEN 1 ELSE 0 END AS r3,
      |    CASE WHEN count(*) OVER w12 = 12
      |      AND sum(alt) OVER w12 = 12 THEN 1 ELSE 0 END AS r4
      |  FROM mk3
      |  WINDOW w9 AS (ORDER BY day ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
      |    w5 AS (ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
      |    w12 AS (ORDER BY day ROWS BETWEEN 11 PRECEDING AND CURRENT ROW))
      |SELECT min(m) AS n_days,
      |  round(min(CAST(t AS DOUBLE) / m / 100), 2) AS cl_dollars,
      |  round(min(mrbar / 100), 4) AS sigma_hat_dollars,
      |  CAST(sum(r1) AS BIGINT) AS n_rule1, CAST(sum(r2) AS BIGINT) AS n_rule2,
      |  CAST(sum(r3) AS BIGINT) AS n_rule3, CAST(sum(r4) AS BIGINT) AS n_rule4
      |FROM sig""".stripMargin

  // ---------------------------------------------------------------- C998
  /** embed_procrustes_2d — closed-form 2-D orthogonal Procrustes: align
    * the (dim2, dim3) configuration of every embedding onto its
    * (dim0, dim1) configuration. In 2-D the optimal rotation has the
    * closed form θ = atan2(Σ(x·y′ − y·x′), Σ(x·x′ + y·y′)) over the
    * CENTERED configurations — no SVD needed, so the statistic is
    * exactly oracle-able. Coordinates are quantized once on the 1e9
    * grid; all centered cross-moments are n-scaled exact DECIMAL(38,0)
    * integers (n·Σqq′ − Σq·Σq′); θ, the least-squares scale, and the
    * congruence coefficient are O(1) doubles from those integers.
    * Scale: one aggregation pass over the corpus — no joins, no
    * windows; 100 TB is one tree-reduce.
    */
  def embedProcrustes2d(s: SparkSession, d: String): DataFrame = {
    val q = embeddings(s, d).select(
      expr("CAST(floor(embedding[0] * 1e9 + 0.5) AS BIGINT)").as("x"),
      expr("CAST(floor(embedding[1] * 1e9 + 0.5) AS BIGINT)").as("y"),
      expr("CAST(floor(embedding[2] * 1e9 + 0.5) AS BIGINT)").as("xp"),
      expr("CAST(floor(embedding[3] * 1e9 + 0.5) AS BIGINT)").as("yp"))
    q.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("xp")).as("sxp"), sum(col("yp")).as("syp"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * xp")).as("sxxp"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * yp")).as("syyp"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * yp")).as("sxyp"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * xp")).as("syxp"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("CAST(xp AS DECIMAL(38,0)) * xp")).as("sxpxp"),
        sum(expr("CAST(yp AS DECIMAL(38,0)) * yp")).as("sypyp"))
      .withColumn("rnum", expr(
        "CAST(n * sxyp - CAST(sx AS DECIMAL(38,0)) * syp AS DOUBLE) - CAST(n * syxp - CAST(sy AS DECIMAL(38,0)) * sxp AS DOUBLE)"))
      .withColumn("rden", expr(
        "CAST(n * sxxp - CAST(sx AS DECIMAL(38,0)) * sxp AS DOUBLE) + CAST(n * syyp - CAST(sy AS DECIMAL(38,0)) * syp AS DOUBLE)"))
      .withColumn("na", expr(
        "CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) + CAST(n * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)"))
      .withColumn("nb", expr(
        "CAST(n * sxpxp - CAST(sxp AS DECIMAL(38,0)) * sxp AS DOUBLE) + CAST(n * sypyp - CAST(syp AS DECIMAL(38,0)) * syp AS DOUBLE)"))
      .selectExpr("n",
        "round(atan2(rnum, rden), 6) AS theta_rad",
        "round(sqrt(rnum * rnum + rden * rden) / nb, 6) AS scale",
        "round(sqrt(rnum * rnum + rden * rden) / sqrt(na * nb), 6) AS congruence")
  }
  val embedProcrustes2dSql: String =
    """WITH q AS (
      |  SELECT CAST(floor(embedding[1] * 1e9 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(embedding[2] * 1e9 + 0.5) AS BIGINT) AS y,
      |    CAST(floor(embedding[3] * 1e9 + 0.5) AS BIGINT) AS xp,
      |    CAST(floor(embedding[4] * 1e9 + 0.5) AS BIGINT) AS yp
      |  FROM embeddings),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    sum(x) AS sx, sum(y) AS sy, sum(xp) AS sxp, sum(yp) AS syp,
      |    sum(CAST(x AS HUGEINT) * xp) AS sxxp,
      |    sum(CAST(y AS HUGEINT) * yp) AS syyp,
      |    sum(CAST(x AS HUGEINT) * yp) AS sxyp,
      |    sum(CAST(y AS HUGEINT) * xp) AS syxp,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy,
      |    sum(CAST(xp AS HUGEINT) * xp) AS sxpxp,
      |    sum(CAST(yp AS HUGEINT) * yp) AS sypyp
      |  FROM q),
      |t AS (
      |  SELECT n,
      |    CAST(n * sxyp - CAST(sx AS HUGEINT) * syp AS DOUBLE) - CAST(n * syxp - CAST(sy AS HUGEINT) * sxp AS DOUBLE) AS rnum,
      |    CAST(n * sxxp - CAST(sx AS HUGEINT) * sxp AS DOUBLE) + CAST(n * syyp - CAST(sy AS HUGEINT) * syp AS DOUBLE) AS rden,
      |    CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) + CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS na,
      |    CAST(n * sxpxp - CAST(sxp AS HUGEINT) * sxp AS DOUBLE) + CAST(n * sypyp - CAST(syp AS HUGEINT) * syp AS DOUBLE) AS nb
      |  FROM m)
      |SELECT n, round(atan2(rnum, rden), 6) AS theta_rad,
      |  round(sqrt(rnum * rnum + rden * rden) / nb, 6) AS scale,
      |  round(sqrt(rnum * rnum + rden * rden) / sqrt(na * nb), 6) AS congruence
      |FROM t""".stripMargin

  // ---------------------------------------------------------------- C999
  /** analytics_dupont_decomposition — the DuPont-style multiplicative
    * decomposition of per-nation revenue into average order value ×
    * orders per active customer × active customer base, each factor an
    * exact rational of integer cent/count sums (their product
    * reconstructs revenue identically — that is the point of the
    * identity). Scale: orders⋈customer is a broadcast of the dim-side
    * key map at any sf where customer ≪ orders; one aggregation per
    * nation.
    */
  def analyticsDupontDecomposition(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val nat = nation(s, d).select(col("n_nationkey"), col("n_name"))
    orders(s, d)
      .select(col("o_custkey"), expr(
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(col("c")).as("rev_cents"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_active"))
      .selectExpr("nation",
        "round(CAST(rev_cents AS DOUBLE) / 100, 2) AS revenue_dollars",
        "round(CAST(rev_cents AS DOUBLE) / n_orders / 100, 4) AS avg_order_value",
        "round(CAST(n_orders AS DOUBLE) / n_active, 6) AS orders_per_customer",
        "n_active AS active_customers")
      .orderBy("nation")
  }
  val analyticsDupontDecompositionSql: String =
    """SELECT n_name AS nation,
      |  round(CAST(sum(c) AS DOUBLE) / 100, 2) AS revenue_dollars,
      |  round(CAST(sum(c) AS DOUBLE) / count(*) / 100, 4) AS avg_order_value,
      |  round(CAST(count(*) AS DOUBLE) / count(DISTINCT o_custkey), 6)
      |    AS orders_per_customer,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers
      |FROM (SELECT o_custkey,
      |        CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c
      |      FROM orders) o
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- C1000
  /** analytics_apriori_triples — frequent 3-itemset mining with
    * confidence and lift over order BRAND baskets: the distinct part
    * brands per order form the basket (item dictionary = the 25-value
    * brand enum, baskets ≤ 13 items, so the per-basket C(k,3) HOF
    * explode is a bounded ≤ 286-row fanout and the candidate space is
    * ≤ C(25,3) = 2300 triples at ANY sf — raw part keys singletonize as
    * the key space grows, brands stay dense). Triples with support ≥ 2
    * are scored as the rule (a,b) → c with confidence supp(abc)/
    * supp(ab) and lift conf·N/supp(c). Top 10 by (support, items).
    * Scale: one equi-join to the 2-column part dim, one hash aggregate
    * per order plus codegen explode, then hash joins on the ≤ 2300-row
    * support frames — the A-priori candidate space never touches
    * corpus².
    */
  def analyticsAprioriTriples(s: SparkSession, d: String): DataFrame = {
    val baskets = lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
      .join(part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("ok"), col("p_brand").as("pk"))
      .distinct()
      .groupBy("ok")
      .agg(sort_array(collect_list(col("pk"))).as("ks"))
    // the basket frame feeds four branches (n/items/pairs/triples);
    // persisted so the corpus scan + part join + collect_list run ONCE
    // per execution instead of once per branch (a 4x recompute at sf1
    // before this — same persist-for-multi-consumer pattern as
    // CoPurchaseStage's edge frame)
    val ksCached = baskets
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nOrders = ksCached.agg(count(lit(1)).as("n_orders"))
    val items = ksCached.select(explode(col("ks")).as("c"))
      .groupBy("c").agg(count(lit(1)).as("supp_c"))
    val pairs = ksCached
      .filter(size(col("ks")) >= 2)
      .select(explode(expr(
        """flatten(transform(ks, (a, i) ->
          |  transform(slice(ks, i + 2, size(ks)),
          |    b -> named_struct('a', a, 'b', b))))""".stripMargin)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("supp_ab"))
    val triples = ksCached
      .filter(size(col("ks")) >= 3)
      .select(explode(expr(
        """flatten(flatten(transform(ks, (a, i) ->
          |  transform(slice(ks, i + 2, size(ks)), (b, j) ->
          |    transform(slice(ks, i + j + 3, size(ks)),
          |      c -> named_struct('a', a, 'b', b, 'c', c))))))""".stripMargin))
        .as("t"))
      .groupBy(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"))
      .agg(count(lit(1)).as("supp_abc"))
      .filter(col("supp_abc") >= 2)
    triples
      .join(pairs, Seq("a", "b"))
      .join(items, Seq("c"))
      .crossJoin(broadcast(nOrders))
      .selectExpr("a", "b", "c", "supp_abc", "supp_ab", "supp_c",
        "round(CAST(supp_abc AS DOUBLE) / supp_ab, 6) AS conf_ab_c",
        "round(CAST(supp_abc AS DOUBLE) / supp_ab * n_orders / supp_c, 6) AS lift_ab_c")
      .orderBy(desc("supp_abc"), col("a"), col("b"), col("c"))
      .limit(10)
  }
  val analyticsAprioriTriplesSql: String =
    """WITH it AS (
      |  SELECT DISTINCT l_orderkey AS ok, p_brand AS pk
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM it),
      |items AS (SELECT pk AS c, CAST(count(*) AS BIGINT) AS supp_c FROM it GROUP BY 1),
      |pairs AS (
      |  SELECT x.pk AS a, y.pk AS b, CAST(count(*) AS BIGINT) AS supp_ab
      |  FROM it x JOIN it y ON x.ok = y.ok AND x.pk < y.pk
      |  GROUP BY 1, 2),
      |tri AS (
      |  SELECT x.pk AS a, y.pk AS b, z.pk AS c, CAST(count(*) AS BIGINT) AS supp_abc
      |  FROM it x JOIN it y ON x.ok = y.ok AND x.pk < y.pk
      |            JOIN it z ON y.ok = z.ok AND y.pk < z.pk
      |  GROUP BY 1, 2, 3 HAVING count(*) >= 2)
      |SELECT a, b, c, supp_abc, supp_ab, supp_c,
      |  round(CAST(supp_abc AS DOUBLE) / supp_ab, 6) AS conf_ab_c,
      |  round(CAST(supp_abc AS DOUBLE) / supp_ab * n_orders / supp_c, 6) AS lift_ab_c
      |FROM tri JOIN pairs USING (a, b) JOIN items USING (c), n
      |ORDER BY supp_abc DESC, a, b, c LIMIT 10""".stripMargin

  // --------------------------------------------------------------- C1001
  /** embed_dbscan_cores — DBSCAN core/border/noise census of the
    * FIXED 500-vector probe panel (vec_id < 500, a literal bound)
    * against the FULL corpus, on the (dim0, dim1, dim2) projection,
    * ε = 0.1, minPts = 4 (ε-ball counts include the point itself).
    * Core-ness of a panel point is its exact full-corpus ε-ball count;
    * border = non-core panel point within ε of a core panel point
    * (the panel-relative border contract, documented); noise = rest.
    * Neighbor counting is GRID-BUCKETED: coordinates quantize once to
    * the 1e6 grid, each panel point hashes to its ⌊q/ε⌋ cell and
    * probes only the 27 adjacent cells, so the candidate join is an
    * equi-join on cell ids — never all-pairs. Distances compare exact
    * integer squared sums against the exact ε²·1e12 literal. Scale:
    * the panel is a literal constant, so the candidate frame is
    * panel × local-density — LINEAR in the corpus (the CSLS/LOF
    * probe-bounded pattern); an unbounded exact census is
    * quadratic-in-density by definition and is exactly what a fixed
    * panel avoids at 100 TB.
    */
  def embedDbscanCores(s: SparkSession, d: String): DataFrame = {
    val eps2 = 10000000000L // (0.1 * 1e6)^2 * ... = (1e5)^2 = 1e10
    val pts = embeddings(s, d).select(col("vec_id").as("id"),
      expr("CAST(floor(embedding[0] * 1e6 + 0.5) AS BIGINT)").as("qx"),
      expr("CAST(floor(embedding[1] * 1e6 + 0.5) AS BIGINT)").as("qy"),
      expr("CAST(floor(embedding[2] * 1e6 + 0.5) AS BIGINT)").as("qz"))
      .withColumn("cx", expr("CAST(floor(qx / 1e5) AS BIGINT)"))
      .withColumn("cy", expr("CAST(floor(qy / 1e5) AS BIGINT)"))
      .withColumn("cz", expr("CAST(floor(qz / 1e5) AS BIGINT)"))
    val panel = pts.filter(col("id") < 500L)
    val probes = panel.select(col("id").as("pid"), col("qx").as("px"),
        col("qy").as("py"), col("qz").as("pz"),
        explode(expr("array(-1L, 0L, 1L)")).as("dx"),
        col("cx"), col("cy"), col("cz"))
      .select(col("pid"), col("px"), col("py"), col("pz"),
        (col("cx") + col("dx")).as("jx"),
        explode(expr("array(-1L, 0L, 1L)")).as("dy"), col("cy"), col("cz"))
      .select(col("pid"), col("px"), col("py"), col("pz"), col("jx"),
        (col("cy") + col("dy")).as("jy"),
        explode(expr("array(-1L, 0L, 1L)")).as("dz"), col("cz"))
      .select(col("pid"), col("px"), col("py"), col("pz"), col("jx"),
        col("jy"), (col("cz") + col("dz")).as("jz"))
    val nbr = probes.join(pts,
        col("jx") === col("cx") && col("jy") === col("cy") &&
          col("jz") === col("cz"))
      .filter(expr(
        "(px - qx) * (px - qx) + (py - qy) * (py - qy) + (pz - qz) * (pz - qz)") <= eps2)
      .select(col("pid"), col("id").as("nid"))
    val counts = nbr.groupBy("pid").agg(count(lit(1)).as("k"))
      .withColumn("is_core", col("k") >= 4L)
    val borders = nbr
      .join(counts.filter(col("is_core")).select(col("pid").as("nid_core")),
        col("nid") === col("nid_core"), "left_semi")
      .select(col("pid")).distinct()
      .withColumn("near_core", lit(true))
    counts.join(borders, Seq("pid"), "left")
      .withColumn("class", expr(
        "CASE WHEN is_core THEN 'core' WHEN near_core THEN 'border' ELSE 'noise' END"))
      .groupBy("class").agg(count(lit(1)).as("n_points"))
      .orderBy("class")
  }
  val embedDbscanCoresSql: String =
    """WITH q AS (
      |  SELECT vec_id AS id,
      |    CAST(floor(embedding[1] * 1e6 + 0.5) AS BIGINT) AS qx,
      |    CAST(floor(embedding[2] * 1e6 + 0.5) AS BIGINT) AS qy,
      |    CAST(floor(embedding[3] * 1e6 + 0.5) AS BIGINT) AS qz
      |  FROM embeddings),
      |nbr AS (
      |  SELECT a.id AS pid, b.id AS nid
      |  FROM q a JOIN q b
      |    ON (a.qx - b.qx) * (a.qx - b.qx) + (a.qy - b.qy) * (a.qy - b.qy)
      |       + (a.qz - b.qz) * (a.qz - b.qz) <= 10000000000
      |  WHERE a.id < 500),
      |cnt AS (
      |  SELECT pid, count(*) AS k, count(*) >= 4 AS is_core
      |  FROM nbr GROUP BY 1),
      |bord AS (
      |  SELECT DISTINCT n.pid
      |  FROM nbr n JOIN cnt c ON n.nid = c.pid AND c.is_core)
      |SELECT CASE WHEN c.is_core THEN 'core'
      |            WHEN b.pid IS NOT NULL THEN 'border'
      |            ELSE 'noise' END AS class,
      |  CAST(count(*) AS BIGINT) AS n_points
      |FROM cnt c LEFT JOIN bord b ON c.pid = b.pid
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- C1002
  /** stat_kde_silverman — Gaussian kernel density of per-customer total
    * spend on a fixed 41-point grid with Silverman's rule-of-thumb
    * bandwidth h = 0.9·min(σ̂, IQR/1.34)·n^(−1/5). σ̂ comes from exact
    * integer moments; the quartiles are interpolated percentiles of
    * integer cents (the C23 quantile_cont contract). Every kernel term
    * exp(−u²/2) is quantized once on the 1e12 grid and summed as exact
    * BIGINT weighted by the value's count — the corpus-size double sum
    * that would otherwise be order-dependent never happens. Scale: the
    * value histogram (distinct cent totals) × the 41-point literal grid
    * is a broadcast join; one aggregation per grid point.
    */
  def statKdeSilverman(s: SparkSession, d: String): DataFrame = {
    val spend = orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")).as("v"))
    val hist = spend.groupBy("v").agg(count(lit(1)).as("cnt"))
    val mom = spend.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("qv"),
      min(col("v")).as("vmin"), max(col("v")).as("vmax"),
      expr("percentile(v, 0.25)").as("q1"),
      expr("percentile(v, 0.75)").as("q3"))
    val withH = mom.withColumn("sigma", expr(
        "sqrt((CAST(n * qv - CAST(sv AS DECIMAL(38,0)) * sv AS DOUBLE)) / n / (n - 1))"))
      .withColumn("h", expr(
        "0.9 * least(sigma, (q3 - q1) / CAST(1.34 AS DOUBLE)) * power(n, -0.2)"))
    // scalar broadcast of the 1-row moment frame onto the histogram,
    // then a per-row 41-way Generate for the literal grid — no
    // non-scalar nested-loop join anywhere
    hist.crossJoin(broadcast(withH))
      .withColumn("k", explode(expr("sequence(0, 40)")))
      .withColumn("g", expr(
        "CAST(vmin AS DOUBLE) + k * (CAST(vmax AS DOUBLE) - vmin) / 40"))
      .withColumn("tq", expr(
        "CAST(floor(exp(-((g - v) / h) * ((g - v) / h) / 2) * 1e12 + 0.5) AS BIGINT) * cnt"))
      .groupBy("k", "g", "n", "h")
      .agg(sum(col("tq")).as("sq"))
      .selectExpr("CAST(k AS BIGINT) AS k", "round(g / 100, 2) AS grid_dollars",
        "round(CAST(sq AS DOUBLE) / 1e12 / n / h * 100, 8) AS density_per_dollar")
      .orderBy("k")
  }
  val statKdeSilvermanSql: String =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS v
      |  FROM orders GROUP BY 1),
      |hist AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM spend GROUP BY 1),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, sum(v) AS sv,
      |    sum(CAST(v AS HUGEINT) * v) AS qv,
      |    min(v) AS vmin, max(v) AS vmax,
      |    quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
      |  FROM spend),
      |wh AS (
      |  SELECT *,
      |    sqrt(CAST(n * qv - CAST(sv AS HUGEINT) * sv AS DOUBLE) / n / (n - 1)) AS sigma
      |  FROM mom),
      |wh2 AS (
      |  SELECT *,
      |    0.9 * least(sigma, (q3 - q1) / CAST(1.34 AS DOUBLE)) * power(n, -0.2) AS h
      |  FROM wh),
      |grid AS (
      |  SELECT n, h, CAST(vmin AS DOUBLE) + k * (CAST(vmax AS DOUBLE) - vmin) / 40 AS g, k
      |  FROM wh2, (SELECT unnest(generate_series(0, 40)) AS k) ks)
      |SELECT k, round(g / 100, 2) AS grid_dollars,
      |  round(CAST(sum(CAST(floor(exp(-((g - v) / h) * ((g - v) / h) / 2) * 1e12 + 0.5) AS BIGINT) * cnt) AS DOUBLE)
      |    / 1e12 / min(n) / min(h) * 100, 8) AS density_per_dollar
      |FROM grid, hist GROUP BY k, g ORDER BY k""".stripMargin

  // --------------------------------------------------------------- C1003
  /** stat_energy_distance — the (Székely) energy distance between the
    * purchase and view event-value distributions:
    * E = 2·E|X−Y| − E|X−X′| − E|Y−Y′|, with every pairwise-absolute
    * sum computed EXACTLY in integer cents via prefix sums over the
    * literally-clamped cent grid (Σ_{a,b}|a−b| = Σ_v [c_v·(v·C_<v −
    * S_<v)]-style cumulative identities) — no quadratic pair frame
    * exists anywhere, and the corpus-size sums are BIGINT-exact.
    * Scale: the value histogram is bounded by the literal 1e5-cent
    * clamp, the windows run on that bounded grid, and everything
    * upstream is one hash aggregation of the events scan.
    */
  def statEnergyDistance(s: SparkSession, d: String): DataFrame = {
    val h = events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type").as("g"),
        expr("least(greatest(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT), 0L), 100000L)").as("v"))
      .groupBy("v")
      .agg(sum(when(col("g") === "purchase", 1L).otherwise(0L)).as("cx"),
        sum(when(col("g") === "view", 1L).otherwise(0L)).as("cy"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("v")
      .rowsBetween(Long.MinValue, -1)
    val pre = h
      .withColumn("pcx", coalesce(sum(col("cx")).over(w), lit(0L)))
      .withColumn("pcy", coalesce(sum(col("cy")).over(w), lit(0L)))
      .withColumn("psx", coalesce(sum(col("cx") * col("v")).over(w), lit(0L)))
      .withColumn("psy", coalesce(sum(col("cy") * col("v")).over(w), lit(0L)))
    pre.agg(
        sum(col("cx")).as("n"), sum(col("cy")).as("m"),
        // DECIMAL(38,0) accumulators: the per-term products are BIGINT-
        // safe but the corpus sum is O(n²·maxv) and would cross 9.2e18
        // past sf1 — decimal keeps the identity exact at any sf
        sum(expr(
          "CAST(cy AS DECIMAL(38,0)) * (v * pcx - psx) + CAST(cx AS DECIMAL(38,0)) * (v * pcy - psy)")).as("sxy"),
        sum(expr("CAST(cx AS DECIMAL(38,0)) * (v * pcx - psx)")).as("sxx"),
        sum(expr("CAST(cy AS DECIMAL(38,0)) * (v * pcy - psy)")).as("syy"))
      .selectExpr("n", "m",
        "round((CAST(2 AS DOUBLE) * sxy / n / m - CAST(sxx AS DOUBLE) * 2 / n / n - CAST(syy AS DOUBLE) * 2 / m / m) / 100, 6) AS energy_dist_dollars")
  }
  val statEnergyDistanceSql: String =
    """WITH h AS (
      |  SELECT least(greatest(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT), 0), 100000) AS v,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cy
      |  FROM events WHERE event_type IN ('purchase', 'view')
      |  GROUP BY 1),
      |pre AS (
      |  SELECT *,
      |    coalesce(sum(cx) OVER wp, 0) AS pcx,
      |    coalesce(sum(cy) OVER wp, 0) AS pcy,
      |    coalesce(sum(cx * v) OVER wp, 0) AS psx,
      |    coalesce(sum(cy * v) OVER wp, 0) AS psy
      |  FROM h
      |  WINDOW wp AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT CAST(sum(cx) AS BIGINT) AS n, CAST(sum(cy) AS BIGINT) AS m,
      |  round((CAST(2 AS DOUBLE) * sum(cy * (v * pcx - psx) + cx * (v * pcy - psy)) / sum(cx) / sum(cy)
      |    - CAST(sum(cx * (v * pcx - psx)) AS DOUBLE) * 2 / sum(cx) / sum(cx)
      |    - CAST(sum(cy * (v * pcy - psy)) AS DOUBLE) * 2 / sum(cy) / sum(cy)) / 100, 6) AS energy_dist_dollars
      |FROM pre""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_xbar_s_chart" -> (statXbarSChart _),
    "stat_nelson_rules" -> (statNelsonRules _),
    "embed_procrustes_2d" -> (embedProcrustes2d _),
    "analytics_dupont_decomposition" -> (analyticsDupontDecomposition _),
    "analytics_apriori_triples" -> (analyticsAprioriTriples _),
    "embed_dbscan_cores" -> (embedDbscanCores _),
    "stat_kde_silverman" -> (statKdeSilverman _),
    "stat_energy_distance" -> (statEnergyDistance _))

  val oracle: Map[String, String] = Map(
    "stat_xbar_s_chart" -> statXbarSChartSql,
    "stat_nelson_rules" -> statNelsonRulesSql,
    "embed_procrustes_2d" -> embedProcrustes2dSql,
    "analytics_dupont_decomposition" -> analyticsDupontDecompositionSql,
    "analytics_apriori_triples" -> analyticsAprioriTriplesSql,
    "embed_dbscan_cores" -> embedDbscanCoresSql,
    "stat_kde_silverman" -> statKdeSilvermanSql,
    "stat_energy_distance" -> statEnergyDistanceSql)
}
