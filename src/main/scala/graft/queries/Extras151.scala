package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 51 (C608–C611): Gini best-split stump, Cochran–Armitage trend
  * test, Fleiss' kappa, Deming regression.
  */
object Extras151 {

  /** C608 analytics_best_split_gini — the distributed decision-stump
    * split finder (the inner loop of tree training): candidate
    * thresholds are ALL distinct feature values; left-side class
    * counts for every candidate come from ONE GlobalRank two-pass
    * range-partitioned prefix sum with (count, positives) PACKED into
    * a single long (cnt·2³² + pos — both components < 2³² to 4e9 rows,
    * no carry, so one pass carries both) — never a single-task window,
    * never a per-candidate scan. Weighted Gini per candidate as a
    * deterministic double from the exact prefix integers; argmin via
    * struct ordering with threshold tie-break (lowest wins).
    */
  def analyticsBestSplitGini(s: SparkSession, d: String): DataFrame = {
    val rows = lineitem(s, d).select(
      expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("v"),
      expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END").as("y"))
    val byV = rows.groupBy("v")
      .agg(count(lit(1)).cast("long").as("cnt"), sum(col("y")).cast("long").as("pos"))
      .withColumn("packed", expr("cnt * 4294967296L + pos"))
    val pre = graft.plans.GlobalRank.withExclusivePrefixSum(
      byV, "pfx", col("packed"), Seq(col("v").asc))
      .selectExpr("v", "cnt", "pos",
        "CAST((pfx + packed) div 4294967296L AS BIGINT) AS cl",
        "CAST((pfx + packed) % 4294967296L AS BIGINT) AS pl")
    val tot = rows.agg(count(lit(1)).cast("long").as("n"),
      sum(col("y")).cast("long").as("p"))
    val cand = pre.crossJoin(broadcast(tot))
      .filter(col("cl") < col("n"))
      .withColumn("f", expr(
        """(CAST(pl AS DOUBLE) * pl + CAST(cl - pl AS DOUBLE) * (cl - pl)) / cl
          |+ (CAST(p - pl AS DOUBLE) * (p - pl)
          |   + CAST(n - cl - p + pl AS DOUBLE) * (n - cl - p + pl)) / (n - cl)
          |""".stripMargin))
    cand
      .agg(max(col("n")).as("n"), max(col("p")).as("p"),
        max(struct(col("f"), (col("v") * -1).as("nv"))).as("best"))
      .selectExpr("n",
        "round(CAST(best.nv * -1 AS DOUBLE) / 100, 2) AS best_threshold",
        "round(1 - (CAST(p AS DOUBLE)/n)*(CAST(p AS DOUBLE)/n) - (CAST(n-p AS DOUBLE)/n)*(CAST(n-p AS DOUBLE)/n), 6) AS gini_base",
        "round((n - best.f) / n, 6) AS gini_split")
  }
  val analyticsBestSplitGiniSql: String =
    """WITH rows_ AS (
      |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem),
      |byv AS (
      |  SELECT v, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(y) AS BIGINT) AS pos
      |  FROM rows_ GROUP BY 1),
      |pre AS (
      |  SELECT v, cnt, pos,
      |    CAST(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cl,
      |    CAST(sum(pos) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pl
      |  FROM byv),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS p
      |  FROM rows_),
      |cand AS (
      |  SELECT v, n, p,
      |    (CAST(pl AS DOUBLE) * pl + CAST(cl - pl AS DOUBLE) * (cl - pl)) / cl
      |    + (CAST(p - pl AS DOUBLE) * (p - pl)
      |       + CAST(n - cl - p + pl AS DOUBLE) * (n - cl - p + pl)) / (n - cl) AS f
      |  FROM pre, tot WHERE cl < n)
      |SELECT max(n) AS n,
      |  round(CAST((max(struct_pack(f := f, nv := -v))).nv * -1 AS DOUBLE) / 100, 2)
      |    AS best_threshold,
      |  round(1 - (CAST(max(p) AS DOUBLE)/max(n))*(CAST(max(p) AS DOUBLE)/max(n))
      |    - (CAST(max(n)-max(p) AS DOUBLE)/max(n))*(CAST(max(n)-max(p) AS DOUBLE)/max(n)), 6)
      |    AS gini_base,
      |  round((max(n) - (max(struct_pack(f := f, nv := -v))).f) / max(n), 6)
      |    AS gini_split
      |FROM cand""".stripMargin

  /** C609 stat_cochran_armitage — the trend-in-proportions test across
    * the FIVE ordered priority groups (is P(status='F') monotone in
    * urgency?): scores s_k = leading digit of o_orderpriority, all
    * five moments (N, R, A=Σs·r, B=Σs·n, C=Σs²·n) exact integer sums
    * in one pass over the bounded group frame, z = (NA−RB)/
    * √(R(N−R)(NC−B²)/N) in deterministic doubles. The denominator is
    * cleared — no per-group float proportions anywhere.
    */
  def statCochranArmitage(s: SparkSession, d: String): DataFrame = {
    val g = orders(s, d).select(
      expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("sk"),
      expr("CASE WHEN o_orderstatus = 'F' THEN 1L ELSE 0L END").as("y"))
      .groupBy("sk")
      .agg(count(lit(1)).cast("long").as("nk"), sum(col("y")).cast("long").as("rk"))
    g.agg(sum(col("nk")).cast("long").as("n"),
        sum(col("rk")).cast("long").as("r"),
        sum(expr("sk * rk")).cast("long").as("a"),
        sum(expr("sk * nk")).cast("long").as("b"),
        sum(expr("sk * sk * nk")).cast("long").as("c"))
      .selectExpr("n", "r",
        """round((CAST(n AS DOUBLE) * a - CAST(r AS DOUBLE) * b)
          |  / sqrt(CAST(r AS DOUBLE) * (n - r)
          |    * (CAST(n AS DOUBLE) * c - CAST(b AS DOUBLE) * b) / n), 4)
          |  AS z_trend""".stripMargin,
        """abs((CAST(n AS DOUBLE) * a - CAST(r AS DOUBLE) * b)
          |  / sqrt(CAST(r AS DOUBLE) * (n - r)
          |    * (CAST(n AS DOUBLE) * c - CAST(b AS DOUBLE) * b) / n)) > 1.96
          |  AS reject_no_trend""".stripMargin)
  }
  val statCochranArmitageSql: String =
    """WITH g AS (
      |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS sk,
      |    CAST(count(*) AS BIGINT) AS nk,
      |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS rk
      |  FROM orders GROUP BY 1),
      |m AS (
      |  SELECT CAST(sum(nk) AS BIGINT) AS n, CAST(sum(rk) AS BIGINT) AS r,
      |    CAST(sum(sk * rk) AS BIGINT) AS a, CAST(sum(sk * nk) AS BIGINT) AS b,
      |    CAST(sum(sk * sk * nk) AS BIGINT) AS c
      |  FROM g)
      |SELECT n, r,
      |  round((CAST(n AS DOUBLE) * a - CAST(r AS DOUBLE) * b)
      |    / sqrt(CAST(r AS DOUBLE) * (n - r)
      |      * (CAST(n AS DOUBLE) * c - CAST(b AS DOUBLE) * b) / n), 4) AS z_trend,
      |  abs((CAST(n AS DOUBLE) * a - CAST(r AS DOUBLE) * b)
      |    / sqrt(CAST(r AS DOUBLE) * (n - r)
      |      * (CAST(n AS DOUBLE) * c - CAST(b AS DOUBLE) * b) / n)) > 1.96
      |    AS reject_no_trend
      |FROM m""".stripMargin

  /** C610 stat_fleiss_kappa — multi-rater agreement (the annotator-
    * consistency gate of labeling pipelines): subjects = orders with
    * EXACTLY 4 lineitems (fixed rating count m, Fleiss' requirement),
    * raters' votes = the four l_returnflag labels. P̄ from the exact
    * integer sum ΣᵢΣ_c n_ic² (one pass), P̄e from the exact per-
    * category totals over the BOUNDED category frame, κ = (P̄−P̄e)/
    * (1−P̄e) in deterministic doubles — the only floats are the three
    * final reported expressions.
    */
  def statFleissKappa(s: SparkSession, d: String): DataFrame = {
    val m = 4
    val eligible = lineitem(s, d).groupBy("l_orderkey")
      .agg(count(lit(1)).cast("long").as("cnt"))
      .filter(col("cnt") === m)
      .select("l_orderkey")
    val votes = lineitem(s, d).join(eligible, "l_orderkey")
      .groupBy("l_orderkey", "l_returnflag")
      .agg(count(lit(1)).cast("long").as("nic"))
    val s2 = votes.agg(
      countDistinct(col("l_orderkey")).cast("long").as("n_subjects"),
      sum(expr("nic * nic")).cast("long").as("s2"))
    val pc = votes.groupBy("l_returnflag")
      .agg(sum(col("nic")).cast("long").as("tc"))
      .agg(sum(expr("tc * tc")).cast("long").as("tc2"),
        sum(col("tc")).cast("long").as("t"))
    s2.crossJoin(broadcast(pc))
      .selectExpr("n_subjects",
        s"round((CAST(s2 AS DOUBLE) - n_subjects * $m) / (CAST(n_subjects AS DOUBLE) * $m * ${m - 1}), 6) AS p_bar",
        "round(CAST(tc2 AS DOUBLE) / (CAST(t AS DOUBLE) * t), 6) AS p_e",
        s"""round(((CAST(s2 AS DOUBLE) - n_subjects * $m) / (CAST(n_subjects AS DOUBLE) * $m * ${m - 1})
           |  - CAST(tc2 AS DOUBLE) / (CAST(t AS DOUBLE) * t))
           |  / (1 - CAST(tc2 AS DOUBLE) / (CAST(t AS DOUBLE) * t)), 6) AS kappa""".stripMargin)
  }
  val statFleissKappaSql: String =
    """WITH eligible AS (
      |  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING count(*) = 4),
      |votes AS (
      |  SELECT l.l_orderkey, l.l_returnflag, CAST(count(*) AS BIGINT) AS nic
      |  FROM lineitem l JOIN eligible e USING (l_orderkey)
      |  GROUP BY 1, 2),
      |s2 AS (
      |  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_subjects,
      |    CAST(sum(nic * nic) AS BIGINT) AS s2
      |  FROM votes),
      |pc AS (
      |  SELECT CAST(sum(tc * tc) AS BIGINT) AS tc2, CAST(sum(tc) AS BIGINT) AS t
      |  FROM (SELECT CAST(sum(nic) AS BIGINT) AS tc FROM votes GROUP BY l_returnflag))
      |SELECT n_subjects,
      |  round((CAST(s2 AS DOUBLE) - n_subjects * 4) / (CAST(n_subjects AS DOUBLE) * 4 * 3), 6) AS p_bar,
      |  round(CAST(tc2 AS DOUBLE) / (CAST(t AS DOUBLE) * t), 6) AS p_e,
      |  round(((CAST(s2 AS DOUBLE) - n_subjects * 4) / (CAST(n_subjects AS DOUBLE) * 4 * 3)
      |    - CAST(tc2 AS DOUBLE) / (CAST(t AS DOUBLE) * t))
      |    / (1 - CAST(tc2 AS DOUBLE) / (CAST(t AS DOUBLE) * t)), 6) AS kappa
      |FROM s2, pc""".stripMargin

  /** C611 stat_deming_regression — errors-in-variables regression
    * (δ=1) of price-cents on quantity: the three scatter moments are
    * denominator-cleared exact DECIMAL sums (Sxx = nΣx²−(Σx)² etc. —
    * one corpus pass, no float touches a row), the slope's quadratic
    * β = (Syy−Sxx+√((Syy−Sxx)²+4Sxy²))/(2Sxy) runs in doubles AFTER
    * the exact sums (the cleared n² factor cancels in β, so casting
    * is safe), intercept = (Σy−βΣx)/n, r = Sxy/√(Sxx·Syy).
    */
  def statDemingRegression(s: SparkSession, d: String): DataFrame = {
    val v = lineitem(s, d).select(
      expr("CAST(l_quantity AS BIGINT)").as("x"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("y"))
    v.agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(expr("x * x")).cast("decimal(38,0)").as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"),
        sum(expr("x * y")).cast("decimal(38,0)").as("sxy"))
      .selectExpr("n",
        "CAST(n * sxx - sx * sx AS DOUBLE) AS cxx",
        "CAST(n * syy - sy * sy AS DOUBLE) AS cyy",
        "CAST(n * sxy - sx * sy AS DOUBLE) AS cxy",
        "CAST(sx AS DOUBLE) AS sxd", "CAST(sy AS DOUBLE) AS syd")
      .selectExpr("n", "cxx", "cyy", "cxy", "sxd", "syd",
        "(cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx) + 4 * cxy * cxy)) / (2 * cxy) AS beta")
      .selectExpr("n", "round(beta, 6) AS slope_cents",
        "round((syd - beta * sxd) / n, 4) AS intercept_cents",
        "round(cxy / sqrt(cxx * cyy), 6) AS pearson_r")
  }
  val statDemingRegressionSql: String =
    """WITH v AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy,
      |    CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy
      |  FROM v),
      |c AS (
      |  SELECT n,
      |    CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
      |    CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
      |    CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
      |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      |  FROM m),
      |b AS (
      |  SELECT n, cxx, cyy, cxy, sxd, syd,
      |    (cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx) + 4 * cxy * cxy)) / (2 * cxy) AS beta
      |  FROM c)
      |SELECT n, round(beta, 6) AS slope_cents,
      |  round((syd - beta * sxd) / n, 4) AS intercept_cents,
      |  round(cxy / sqrt(cxx * cyy), 6) AS pearson_r
      |FROM b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_best_split_gini" -> (analyticsBestSplitGini _),
    "stat_cochran_armitage" -> (statCochranArmitage _),
    "stat_fleiss_kappa" -> (statFleissKappa _),
    "stat_deming_regression" -> (statDemingRegression _),
  )

  val oracle: Map[String, String] = Map(
    "analytics_best_split_gini" -> analyticsBestSplitGiniSql,
    "stat_cochran_armitage" -> statCochranArmitageSql,
    "stat_fleiss_kappa" -> statFleissKappaSql,
    "stat_deming_regression" -> statDemingRegressionSql,
  )
}
