package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 87 (C752–C755): distribution-comparison + multiplicity +
  * inequality — the stochastic-dominance census, quantile treatment
  * effects, Benjamini–Yekutieli, and the Hoover index.
  *
  * Shared discipline: CDFs and quantiles come from value histograms
  * with exact cumulative counts (cross-multiplied comparisons, no
  * divisions until the final row); the multiplicity row reuses the
  * suite's Mann–Kendall + A&S 26.2.17 p-value machinery over the
  * bounded 5-row family frame; the inequality numerator Σ|cᵢ·n − S|
  * stays exact in DECIMAL.
  */
object Extras187 {

  /** C752 stat_stochastic_dominance — first-order dominance census
    * between click and view values: at every pooled distinct value,
    * compare F_click and F_view by EXACT cross-multiplication
    * (cum1·n2 vs cum2·n1); report the share of value blocks where
    * click strictly dominates (F_click < F_view), both one-sided KS
    * gaps, and the FSD verdicts. The "is A just bigger everywhere"
    * question a mean test cannot answer.
    */
  def statStochasticDominance(s: SparkSession, d: String): DataFrame = {
    val pv = events(s, d).filter(col("event_type").isin("click", "view"))
      .groupBy("value")
      .agg(sum(expr("CASE WHEN event_type = 'click' THEN 1L ELSE 0L END")).cast("long").as("m1"),
        sum(expr("CASE WHEN event_type = 'view' THEN 1L ELSE 0L END")).cast("long").as("m2"))
    // two prefix sums over the SAME value-order: one combined two-pass
    // machinery instead of two (r14, GlobalRank.withRankAndPrefixSums)
    val withC2 = graft.plans.GlobalRank.withRankAndPrefixSums(pv, None,
      Seq((col("m1"), "c1"), (col("m2"), "c2")), Seq(col("value").asc))
    // r14: totals off the pinned spine (exact longs), not a second
    // events scan + aggregation
    val tot = withC2.agg(sum(col("m1")).cast("long").as("n1"), sum(col("m2")).cast("long").as("n2"))
    withC2.crossJoin(broadcast(tot))
      .selectExpr("(c1 + m1) * n2 AS f1x", "(c2 + m2) * n1 AS f2x", "n1", "n2",
        "CAST((c1 + m1) AS DOUBLE) / n1 - CAST((c2 + m2) AS DOUBLE) / n2 AS gap")
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        count(lit(1)).cast("long").as("n_blocks"),
        sum(expr("CASE WHEN f1x < f2x THEN 1L ELSE 0L END")).cast("long").as("n_click_dom"),
        sum(expr("CASE WHEN f1x > f2x THEN 1L ELSE 0L END")).cast("long").as("n_view_dom"),
        max(expr("CAST(floor(gap * 1e9 + 0.5) AS BIGINT)")).as("gmaxq"),
        min(expr("CAST(floor(gap * 1e9 + 0.5) AS BIGINT)")).as("gminq"))
      .selectExpr("n1", "n2", "n_blocks",
        "round(CAST(n_click_dom AS DOUBLE) / n_blocks, 6) AS click_dom_share",
        "round(CAST(gmaxq AS DOUBLE) / 1e9, 6) AS max_gap_view_dom",
        "round(CAST(-gminq AS DOUBLE) / 1e9, 6) AS max_gap_click_dom",
        "n_view_dom = 0L AS click_fsd", "n_click_dom = 0L AS view_fsd")
  }
  val statStochasticDominanceSql: String =
    """WITH pv AS (
      |  SELECT value,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS m1,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS m2
      |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
      |blocks AS (
      |  SELECT value, m1, m2,
      |    COALESCE(sum(m1) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c1,
      |    COALESCE(sum(m2) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c2
      |  FROM pv),
      |tot AS (SELECT CAST(sum(m1) AS BIGINT) AS n1, CAST(sum(m2) AS BIGINT) AS n2 FROM pv),
      |g AS (
      |  SELECT (c1 + m1) * n2 AS f1x, (c2 + m2) * n1 AS f2x, n1, n2,
      |    CAST((c1 + m1) AS DOUBLE) / n1 - CAST((c2 + m2) AS DOUBLE) / n2 AS gap
      |  FROM blocks, tot)
      |SELECT max(n1) AS n1, max(n2) AS n2, CAST(count(*) AS BIGINT) AS n_blocks,
      |  round(CAST(sum(CASE WHEN f1x < f2x THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS click_dom_share,
      |  round(CAST(max(CAST(floor(gap * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / 1e9, 6) AS max_gap_view_dom,
      |  round(CAST(-min(CAST(floor(gap * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / 1e9, 6) AS max_gap_click_dom,
      |  CAST(sum(CASE WHEN f1x > f2x THEN 1 ELSE 0 END) AS BIGINT) = 0 AS click_fsd,
      |  CAST(sum(CASE WHEN f1x < f2x THEN 1 ELSE 0 END) AS BIGINT) = 0 AS view_fsd
      |FROM g""".stripMargin

  /** C753 stat_qte_deciles — quantile treatment effects: the exact
    * d/10 order statistics (d = 1..9) of click vs purchase values
    * from per-group histogram prefixes, and their differences. The
    * distributional "where does the effect live" view a single mean
    * difference hides; 9 rows, one per decile.
    */
  def statQteDeciles(s: SparkSession, d: String): DataFrame = {
    val pv = events(s, d).filter(col("event_type").isin("click", "purchase"))
      .groupBy("value")
      .agg(sum(expr("CASE WHEN event_type = 'click' THEN 1L ELSE 0L END")).cast("long").as("m1"),
        sum(expr("CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END")).cast("long").as("m2"))
    // same combined-machinery rewrite as statStochasticDominance (r14)
    val withC2 = graft.plans.GlobalRank.withRankAndPrefixSums(pv, None,
      Seq((col("m1"), "c1"), (col("m2"), "c2")), Seq(col("value").asc))
    // r14: totals off the pinned spine (exact longs), not a second
    // events scan + aggregation
    val tot = withC2.agg(sum(col("m1")).cast("long").as("n1"), sum(col("m2")).cast("long").as("n2"))
    val base = withC2.crossJoin(broadcast(tot))
      .select(col("value"), col("m1"), col("m2"), col("c1"), col("c2"), col("n1"), col("n2"),
        explode(expr("array(1, 2, 3, 4, 5, 6, 7, 8, 9)")).as("dec"))
    base.groupBy("dec")
      .agg(min(expr("CASE WHEN 10 * (c1 + m1) >= dec * n1 AND m1 > 0 THEN value END")).as("q_click"),
        min(expr("CASE WHEN 10 * (c2 + m2) >= dec * n2 AND m2 > 0 THEN value END")).as("q_purchase"))
      .selectExpr("CAST(dec AS BIGINT) AS decile",
        "round(q_click, 6) AS q_click", "round(q_purchase, 6) AS q_purchase",
        "round(q_purchase - q_click, 6) AS qte")
      .orderBy("decile")
  }
  val statQteDecilesSql: String =
    """WITH pv AS (
      |  SELECT value,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS m1,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS m2
      |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
      |blocks AS (
      |  SELECT value, m1, m2,
      |    COALESCE(sum(m1) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c1,
      |    COALESCE(sum(m2) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c2
      |  FROM pv),
      |tot AS (SELECT CAST(sum(m1) AS BIGINT) AS n1, CAST(sum(m2) AS BIGINT) AS n2 FROM pv),
      |base AS (
      |  SELECT b.*, t.n1, t.n2, d.dec
      |  FROM blocks b, tot t, (SELECT unnest(generate_series(1, 9)) AS dec) d),
      |g AS (
      |  SELECT dec,
      |    min(CASE WHEN 10 * (c1 + m1) >= dec * n1 AND m1 > 0 THEN value END) AS q_click,
      |    min(CASE WHEN 10 * (c2 + m2) >= dec * n2 AND m2 > 0 THEN value END) AS q_purchase
      |  FROM base GROUP BY 1)
      |SELECT dec AS decile,
      |  round(q_click, 6) AS q_click, round(q_purchase, 6) AS q_purchase,
      |  round(q_purchase - q_click, 6) AS qte
      |FROM g ORDER BY decile""".stripMargin

  /** C754 stat_benjamini_yekutieli — the dependence-robust FDR
    * control beside the suite's BH row: the same 5 per-event-type
    * Mann–Kendall trend p-values (exact S from the bounded day-pair
    * frame, A&S 26.2.17 normal tail), but the BY threshold
    * rank·α/(m·H_m) with H₅ = 137/60. Emits per family member the
    * p-value and BOTH verdicts — BY rejecting strictly less often is
    * the visible price of arbitrary dependence.
    */
  def statBenjaminiYekutieli(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(dec(col("value"))).as("v"))
    val l = daily.select(col("event_type"), col("day").as("d1"), col("v").as("v1"))
    val r = daily.select(col("event_type"), col("day").as("d2"), col("v").as("v2"))
    val sCount = l.join(r, Seq("event_type")).filter(col("d1") < col("d2"))
      .groupBy("event_type")
      .agg(sum(when(col("v2") > col("v1"), 1L)
        .when(col("v2") < col("v1"), -1L).otherwise(0L)).as("s"))
    val nDays = daily.groupBy("event_type").agg(count(lit(1)).as("n"))
    val zp = sCount.join(broadcast(nDays), "event_type")
      .withColumn("var_s",
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5)).cast("double") / 18.0d)
      .withColumn("z",
        when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(col("var_s")))
          .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(col("var_s")))
          .otherwise(0.0d))
      .selectExpr("event_type", "z",
        """2 * (exp(-abs(z) * abs(z) / 2) / 2.5066282746310002
          |  * (0.319381530 * (1 / (1 + 0.2316419 * abs(z)))
          |    - 0.356563782 * pow(1 / (1 + 0.2316419 * abs(z)), 2)
          |    + 1.781477937 * pow(1 / (1 + 0.2316419 * abs(z)), 3)
          |    - 1.821255978 * pow(1 / (1 + 0.2316419 * abs(z)), 4)
          |    + 1.330274429 * pow(1 / (1 + 0.2316419 * abs(z)), 5))) AS p""".stripMargin)
    val m = 5.0; val h5 = 137.0 / 60
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("p").asc, col("event_type").asc)
    val ranked = zp.withColumn("rk", row_number().over(w))
      .withColumn("bh_thr", expr(s"rk * 0.05 / $m"))
      .withColumn("by_thr", expr(s"rk * 0.05 / ($m * $h5)"))
    val kStarBh = ranked.agg(max(expr("CASE WHEN p <= bh_thr THEN rk ELSE 0 END")).as("k_bh"),
      max(expr("CASE WHEN p <= by_thr THEN rk ELSE 0 END")).as("k_by"))
    ranked.crossJoin(broadcast(kStarBh))
      .selectExpr("event_type", "round(p, 8) AS p", "CAST(rk AS BIGINT) AS rk",
        "rk <= k_bh AS bh_reject", "rk <= k_by AS by_reject")
      .orderBy("rk")
  }
  val statBenjaminiYekutieliSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    sum(CAST(value AS DECIMAL(14,2))) AS v
      |  FROM events GROUP BY 1, 2),
      |sc AS (
      |  SELECT l.event_type,
      |    CAST(sum(CASE WHEN r.v2 > l.v1 THEN 1 WHEN r.v2 < l.v1 THEN -1 ELSE 0 END) AS BIGINT) AS s
      |  FROM (SELECT event_type, day AS d1, v AS v1 FROM daily) l
      |  JOIN (SELECT event_type, day AS d2, v AS v2 FROM daily) r
      |    ON l.event_type = r.event_type AND l.d1 < r.d2
      |  GROUP BY 1),
      |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1),
      |zp AS (
      |  SELECT s.event_type,
      |    CASE WHEN s.s > 0 THEN (s.s - 1) / sqrt((n.n * (n.n - 1) * (2 * n.n + 5)) / 18.0)
      |      WHEN s.s < 0 THEN (s.s + 1) / sqrt((n.n * (n.n - 1) * (2 * n.n + 5)) / 18.0)
      |      ELSE 0.0 END AS z
      |  FROM sc s JOIN nd n ON n.event_type = s.event_type),
      |pv AS (
      |  SELECT event_type,
      |    2 * (exp(-abs(z) * abs(z) / 2) / 2.5066282746310002
      |      * (0.319381530 * (1 / (1 + 0.2316419 * abs(z)))
      |        - 0.356563782 * pow(1 / (1 + 0.2316419 * abs(z)), 2)
      |        + 1.781477937 * pow(1 / (1 + 0.2316419 * abs(z)), 3)
      |        - 1.821255978 * pow(1 / (1 + 0.2316419 * abs(z)), 4)
      |        + 1.330274429 * pow(1 / (1 + 0.2316419 * abs(z)), 5))) AS p
      |  FROM zp),
      |ranked AS (
      |  SELECT event_type, p, row_number() OVER (ORDER BY p, event_type) AS rk
      |  FROM pv),
      |thr AS (
      |  SELECT *, rk * 0.05 / 5 AS bh_thr, rk * 0.05 / (5 * (137.0 / 60)) AS by_thr
      |  FROM ranked),
      |ks AS (
      |  SELECT max(CASE WHEN p <= bh_thr THEN rk ELSE 0 END) AS k_bh,
      |    max(CASE WHEN p <= by_thr THEN rk ELSE 0 END) AS k_by
      |  FROM thr)
      |SELECT t.event_type, round(t.p, 8) AS p, t.rk,
      |  t.rk <= k.k_bh AS bh_reject, t.rk <= k.k_by AS by_reject
      |FROM thr t, ks k ORDER BY t.rk""".stripMargin

  /** C755 stat_hoover_index — the Hoover (Robin Hood) index of
    * supplier revenue concentration: H = ½Σ|sᵢ − 1/n| — the share of
    * total revenue that would have to move to equalize suppliers —
    * with an EXACT numerator Σ|cᵢ·n − S| in DECIMAL and one final
    * division by 2nS. The third leg beside the Gini/Atkinson/Theil
    * rows: H is also the maximum Lorenz-to-diagonal gap.
    */
  def statHooverIndex(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .groupBy("l_suppkey")
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("c"))
    val tot = g.agg(count(lit(1)).cast("long").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("sc"))
    g.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"), max(col("sc")).as("sc"),
        sum(expr("abs(c * n - sc)")).cast("decimal(38,0)").as("num"))
      .selectExpr("n",
        """round(CAST(num AS DOUBLE)
          |/ (2.0 * CAST(n AS DOUBLE) * CAST(sc AS DOUBLE)), 6) AS hoover""".stripMargin)
  }
  val statHooverIndexSql: String =
    """WITH g AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS c
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS DECIMAL(38,0)) AS sc FROM g)
      |SELECT max(n) AS n,
      |  round(CAST(CAST(sum(abs(c * n - sc)) AS DECIMAL(38,0)) AS DOUBLE)
      |  / (2.0 * CAST(max(n) AS DOUBLE) * CAST(max(sc) AS DOUBLE)), 6) AS hoover
      |FROM g, tot""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_stochastic_dominance" -> (statStochasticDominance _),
    "stat_qte_deciles" -> (statQteDeciles _),
    "stat_benjamini_yekutieli" -> (statBenjaminiYekutieli _),
    "stat_hoover_index" -> (statHooverIndex _),
  )

  val oracle: Map[String, String] = Map(
    "stat_stochastic_dominance" -> statStochasticDominanceSql,
    "stat_qte_deciles" -> statQteDecilesSql,
    "stat_benjamini_yekutieli" -> statBenjaminiYekutieliSql,
    "stat_hoover_index" -> statHooverIndexSql,
  )
}
