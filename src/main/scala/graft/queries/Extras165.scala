package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 65 (C664–C667): Quade test, Huber M-estimator, XmR chart,
  * embedding centering effect.
  */
object Extras165 {

  /** C664 stat_quade_test — Quade's weighted rank test (the Friedman
    * upgrade that weights blocks by their range): within-year quarter
    * ranks and across-year range ranks both over the BOUNDED 28-cell
    * frame, doubled scores 2S = Q(2r−(k+1)) keep everything exact
    * integers, F = (b−1)B/(A−B) with A/B from exact sums (the ×4
    * scale cancels in the ratio).
    */
  def statQuadeTest(s: SparkSession, d: String): DataFrame = {
    val cells = lineitem(s, d)
      .groupBy(year(col("l_shipdate")).as("y"), quarter(col("l_shipdate")).as("q"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val wr = Window.partitionBy("y").orderBy(col("c").asc, col("q").asc)
    val wy = Window.partitionBy("y")
    val ranked = cells
      .withColumn("r", rank().over(wr).cast("long"))
      .withColumn("rng", max(col("c")).over(wy) - min(col("c")).over(wy))
    val blockW = ranked.select("y", "rng").distinct()
    val wq = Window.orderBy(col("rng").asc, col("y").asc)
    val qd = blockW.withColumn("qw", rank().over(wq).cast("long"))
    val scored = ranked.join(broadcast(qd.select("y", "qw")), Seq("y"))
      .withColumn("s2", expr("qw * (2 * r - 5)")) // k=4: 2r-(k+1)
    val a = scored.agg(sum(expr("s2 * s2")).cast("long").as("a2"),
      countDistinct(col("y")).cast("long").as("b"),
      countDistinct(col("q")).cast("long").as("k"))
    val sj = scored.groupBy("q")
      .agg(sum(col("s2")).cast("long").as("sj2"))
      .agg(sum(expr("sj2 * sj2")).cast("long").as("bsum"))
    a.crossJoin(broadcast(sj))
      .selectExpr("b", "k",
        "CAST(bsum AS DOUBLE) / b AS bb", "CAST(a2 AS DOUBLE) AS aa")
      .selectExpr("b", "k",
        "round((b - 1) * bb / (aa - bb), 4) AS quade_f",
        "(b - 1) * bb / (aa - bb) > 3.16 AS reject_equal_treatments")
  }
  val statQuadeTestSql: String =
    """WITH cells AS (
      |  SELECT EXTRACT(year FROM l_shipdate) AS y,
      |    EXTRACT(quarter FROM l_shipdate) AS q,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |ranked AS (
      |  SELECT y, q,
      |    CAST(rank() OVER (PARTITION BY y ORDER BY c, q) AS BIGINT) AS r,
      |    max(c) OVER (PARTITION BY y) - min(c) OVER (PARTITION BY y) AS rng
      |  FROM cells),
      |qd AS (
      |  SELECT y, CAST(rank() OVER (ORDER BY rng, y) AS BIGINT) AS qw
      |  FROM (SELECT DISTINCT y, rng FROM ranked)),
      |scored AS (
      |  SELECT ranked.y, ranked.q, qd.qw * (2 * ranked.r - 5) AS s2
      |  FROM ranked JOIN qd USING (y)),
      |a AS (
      |  SELECT CAST(sum(s2 * s2) AS BIGINT) AS a2,
      |    CAST(count(DISTINCT y) AS BIGINT) AS b,
      |    CAST(count(DISTINCT q) AS BIGINT) AS k
      |  FROM scored),
      |sj AS (
      |  SELECT CAST(sum(sj2 * sj2) AS BIGINT) AS bsum
      |  FROM (SELECT CAST(sum(s2) AS BIGINT) AS sj2 FROM scored GROUP BY q)),
      |m AS (
      |  SELECT b, k, CAST(bsum AS DOUBLE) / b AS bb, CAST(a2 AS DOUBLE) AS aa
      |  FROM a, sj)
      |SELECT b, k,
      |  round((b - 1) * bb / (aa - bb), 4) AS quade_f,
      |  (b - 1) * bb / (aa - bb) > 3.16 AS reject_equal_treatments
      |FROM m""".stripMargin

  /** C665 stat_huber_m_estimator — the Huber robust mean of daily
    * revenue by 3 fixed IRLS supersteps: weights w = min(1, k/|x−μ|)
    * PPM-QUANTIZED per row so Σwx and Σw are exact integer sums (no
    * float-ordered accumulation), μ collected once per round (the
    * BFS driver-loop discipline), k = 1.345σ from the cleared exact
    * initial moments. Reports the robust-vs-plain gap.
    */
  def statHuberMEstimator(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .localCheckpoint(true)
    val m0 = bars.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("c")).cast("decimal(38,0)").as("sc"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("qc"))
      .selectExpr("CAST(n AS BIGINT) AS n",
        "CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mu",
        "sqrt(CAST(n * qc - sc * sc AS DOUBLE) / CAST(n * n AS DOUBLE)) AS sigma")
      .collect().head
    val (n, mean0, sigma) = (m0.getLong(0), m0.getDouble(1), m0.getDouble(2))
    val k = 1.345 * sigma
    var mu = mean0
    for (_ <- 1 to 3) {
      val it = bars
        .withColumn("wq", expr(
          s"CAST(floor(least(1.0D, $k / abs(c - $mu)) * 1e6 + 0.5) AS BIGINT)"))
        .agg(sum(expr("CAST(wq AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("swx"),
          sum(col("wq")).cast("decimal(38,0)").as("sw"))
        .selectExpr("CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) AS mu")
        .collect().head
      mu = it.getDouble(0)
    }
    val ss = bars.sparkSession
    ss.range(1).selectExpr(s"CAST($n AS BIGINT) AS n_days",
      s"round(CAST($mean0 AS DOUBLE) / 100, 2) AS plain_mean",
      s"round(CAST($mu AS DOUBLE) / 100, 2) AS huber_mean",
      s"round((CAST($mean0 AS DOUBLE) - $mu) / $sigma, 6) AS shift_sigmas")
  }
  val statHuberMEstimatorSql: String = {
    def iter(k: Int): String = {
      val prev = if (k == 1) "i0" else s"i${k - 1}"
      s"""i$k AS (
         |  SELECT CAST(CAST(sum(CAST(CAST(floor(least(1.0, kk.k / abs(b.c - p.mu)) * 1e6 + 0.5) AS BIGINT) AS HUGEINT) * b.c) AS DECIMAL(38,0)) AS DOUBLE)
         |    / CAST(CAST(sum(CAST(floor(least(1.0, kk.k / abs(b.c - p.mu)) * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS DOUBLE) AS mu
         |  FROM base b, $prev p, kk)""".stripMargin
    }
    """WITH base AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |m0 AS (
      |  SELECT CAST(n AS BIGINT) AS n,
      |    CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
      |    sqrt(CAST(n * qc - sc * sc AS DOUBLE) / CAST(n * n AS DOUBLE)) AS sigma
      |  FROM (SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
      |    CAST(sum(c) AS DECIMAL(38,0)) AS sc,
      |    CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS qc
      |  FROM base)),
      |kk AS (SELECT 1.345 * sigma AS k FROM m0),
      |i0 AS (SELECT mu FROM m0),
      |""".stripMargin +
      (1 to 3).map(iter).mkString(",\n") +
      """
        |SELECT m0.n AS n_days,
        |  round(m0.mu / 100, 2) AS plain_mean,
        |  round(i3.mu / 100, 2) AS huber_mean,
        |  round((m0.mu - i3.mu) / m0.sigma, 6) AS shift_sigmas
        |FROM m0, i3""".stripMargin
  }

  /** C666 stat_xmr_chart — the Shewhart individuals/moving-range
    * chart on daily revenue: moving ranges |Δc| are exact integers
    * (one lag over the bounded frame), x̄ and mR̄ exact-sum means,
    * the 2.66·mR̄ individuals limits and the 3.267·mR̄ range UCL
    * applied in final doubles; violation census for both charts.
    */
  def statXmrChart(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val w = Window.orderBy("day")
    val withMr = bars
      .withColumn("mr", abs(col("c") - lag(col("c"), 1).over(w)))
    val tot = withMr.agg(count(lit(1)).cast("long").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("sc"),
      sum(col("mr")).cast("decimal(38,0)").as("smr"),
      count(col("mr")).cast("long").as("nmr"))
    withMr.crossJoin(broadcast(tot))
      .withColumn("xbar", expr("CAST(sc AS DOUBLE) / n"))
      .withColumn("mrbar", expr("CAST(smr AS DOUBLE) / nmr"))
      .agg(max(col("n")).as("n_days"),
        sum(expr("CASE WHEN abs(c - xbar) > 2.66 * mrbar THEN 1L ELSE 0L END"))
          .cast("long").as("x_violations"),
        sum(expr("CASE WHEN mr > 3.267 * mrbar THEN 1L ELSE 0L END"))
          .cast("long").as("mr_violations"),
        max(expr("round(xbar / 100, 2)")).as("x_bar"),
        max(expr("round(mrbar / 100, 2)")).as("mr_bar"))
  }
  val statXmrChartSql: String =
    """WITH bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |mr AS (
      |  SELECT c, abs(c - lag(c, 1) OVER (ORDER BY day)) AS mr FROM bars),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c) AS DECIMAL(38,0)) AS sc,
      |    CAST(sum(mr) AS DECIMAL(38,0)) AS smr,
      |    CAST(count(mr) AS BIGINT) AS nmr
      |  FROM mr)
      |SELECT max(n) AS n_days,
      |  CAST(sum(CASE WHEN abs(c - CAST(sc AS DOUBLE) / n) > 2.66 * (CAST(smr AS DOUBLE) / nmr) THEN 1 ELSE 0 END) AS BIGINT) AS x_violations,
      |  CAST(sum(CASE WHEN mr > 3.267 * (CAST(smr AS DOUBLE) / nmr) THEN 1 ELSE 0 END) AS BIGINT) AS mr_violations,
      |  max(round(CAST(sc AS DOUBLE) / n / 100, 2)) AS x_bar,
      |  max(round(CAST(smr AS DOUBLE) / nmr / 100, 2)) AS mr_bar
      |FROM mr, tot""".stripMargin

  /** C667 embed_centering_effect — how much of the mean pairwise
    * cosine is just the common-mean offset: BOTH means are CLOSED
    * FORMS from one fixed-point pass — before = (‖Σv‖²−Σ‖v‖²)/(n(n−1)),
    * after = −W/(n(n−1)) with W = Σ‖v−μ‖² (Huygens) — zero joins, zero
    * pairs at any scale. The before/after ratio is the debiasing
    * headline of embedding-anisotropy audits.
    */
  def embedCenteringEffect(s: SparkSession, d: String): DataFrame = {
    val comp = embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("pos"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1e9 + 0.5) AS BIGINT)").as("f"))
    val perDim = comp.groupBy("pos")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("f")).cast("decimal(38,0)").as("sf"),
        sum(expr("CAST(f AS DECIMAL(38,0)) * f")).cast("decimal(38,0)").as("qf"))
    // W is summed EXACTLY as DECIMAL(38,0) (n*qf - sf² per dim, n equal
    // across dims) and divided by n once at the end — the r10 ADVICE
    // fix: a distributed sum of raw doubles had partition-order-
    // dependent rounding, the only row in this batch that deviated from
    // the quantize-before-sum idiom.
    perDim.agg(max(col("n")).as("n"),
        sum(expr("sf * sf")).as("a2"),
        sum(col("qf")).cast("decimal(38,0)").as("b2"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * qf - sf * sf"))
          .cast("decimal(38,0)").as("w2"))
      .selectExpr("n",
        "(CAST(a2 AS DOUBLE) / 1e18 - CAST(b2 AS DOUBLE) / 1e18) / (CAST(n AS DOUBLE) * (n - 1)) AS before_",
        "-(CAST(w2 AS DOUBLE) / 1e18 / n) / (CAST(n AS DOUBLE) * (n - 1)) AS after_")
      .selectExpr("n AS n_vectors",
        "round(before_, 8) AS mean_dot_raw",
        "round(after_, 8) AS mean_dot_centered",
        "round(abs(after_) / abs(before_), 6) AS residual_ratio")
  }
  val embedCenteringEffectSql: String =
    """WITH comp AS (
      |  SELECT i.i AS pos,
      |    CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS f
      |  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i),
      |perdim AS (
      |  SELECT pos, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(f) AS DECIMAL(38,0)) AS sf,
      |    CAST(sum(CAST(f AS DECIMAL(38,0)) * f) AS DECIMAL(38,0)) AS qf
      |  FROM comp GROUP BY 1),
      |m AS (
      |  SELECT max(n) AS n,
      |    CAST(sum(sf * sf) AS DOUBLE) / 1e18 AS a,
      |    CAST(CAST(sum(qf) AS DECIMAL(38,0)) AS DOUBLE) / 1e18 AS b,
      |    CAST(CAST(sum(CAST(n AS DECIMAL(38,0)) * qf - sf * sf) AS DECIMAL(38,0)) AS DOUBLE) AS w2
      |  FROM perdim)
      |SELECT n AS n_vectors,
      |  round((a - b) / (CAST(n AS DOUBLE) * (n - 1)), 8) AS mean_dot_raw,
      |  round(-(w2 / 1e18 / n) / (CAST(n AS DOUBLE) * (n - 1)), 8) AS mean_dot_centered,
      |  round(abs(-(w2 / 1e18 / n) / (CAST(n AS DOUBLE) * (n - 1)))
      |    / abs((a - b) / (CAST(n AS DOUBLE) * (n - 1))), 6) AS residual_ratio
      |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_quade_test" -> (statQuadeTest _),
    "stat_huber_m_estimator" -> (statHuberMEstimator _),
    "stat_xmr_chart" -> (statXmrChart _),
    "embed_centering_effect" -> (embedCenteringEffect _),
  )

  val oracle: Map[String, String] = Map(
    "stat_quade_test" -> statQuadeTestSql,
    "stat_huber_m_estimator" -> statHuberMEstimatorSql,
    "stat_xmr_chart" -> statXmrChartSql,
    "embed_centering_effect" -> embedCenteringEffectSql,
  )
}
