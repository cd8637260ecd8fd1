package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 43 (C576–C579): variance-ratio random-walk test, discounted
  * LTV, exact EWM volatility, Grubbs extreme outlier.
  */
object Extras143 {

  private val VrQ = 5

  /** C576 stat_variance_ratio — Lo–MacKinlay variance ratio VR(5) on
    * daily revenue diffs: overlapping 5-period changes via lead over
    * the bounded daily frame, both population variances from exact
    * DECIMAL sums, the ratio and the iid z-stat in one fixed chain.
    * Complements C552/C557: DF asks unit root, KPSS asks
    * stationarity, VR asks random-walk scaling.
    */
  def statVarianceRatio(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val w = Window.orderBy("day")
    val diffs = daily
      .withColumn("r", lead(col("c"), 1).over(w) - col("c"))
      .withColumn("sq", lead(col("c"), VrQ).over(w) - col("c"))
    diffs.agg(
        sum(when(col("r").isNotNull, 1L).otherwise(0L)).cast("long").as("mr"),
        sum(expr("CAST(r AS DECIMAL(38,0))")).as("sr"),
        sum(expr("CAST(r AS DECIMAL(38,0)) * r")).as("srr"),
        sum(when(col("sq").isNotNull, 1L).otherwise(0L)).cast("long").as("ms"),
        sum(expr("CAST(sq AS DECIMAL(38,0))")).as("ss"),
        sum(expr("CAST(sq AS DECIMAL(38,0)) * sq")).as("sss"))
      .selectExpr("mr", "ms",
        """CAST(CAST(ms AS DECIMAL(38,0)) * sss - ss * ss AS DOUBLE)
          |  / (CAST(ms AS DOUBLE) * CAST(ms AS DOUBLE)) AS vs""".stripMargin,
        """CAST(CAST(mr AS DECIMAL(38,0)) * srr - sr * sr AS DOUBLE)
          |  / (CAST(mr AS DOUBLE) * CAST(mr AS DOUBLE)) AS vr1""".stripMargin)
      .selectExpr("mr AS n_diffs", s"vs / $VrQ / vr1 AS vr")
      .selectExpr("n_diffs", "round(vr, 6) AS variance_ratio",
        s"""round((vr - 1) / sqrt(2.0 * (2 * $VrQ - 1) * ($VrQ - 1)
           |  / (3.0 * $VrQ * n_diffs)), 6) AS z_stat""".stripMargin,
        s"""CASE WHEN abs((vr - 1) / sqrt(2.0 * (2 * $VrQ - 1) * ($VrQ - 1)
           |  / (3.0 * $VrQ * n_diffs))) > 1.96
           |  THEN 'reject_random_walk' ELSE 'random_walk_plausible' END
           |  AS verdict_5pct""".stripMargin)
  }
  val statVarianceRatioSql: String =
    s"""WITH daily AS (
       |  SELECT date_trunc('day', l_shipdate) AS day,
       |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
       |      AS BIGINT)) AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1),
       |diffs AS (
       |  SELECT lead(c, 1) OVER (ORDER BY day) - c AS r,
       |    lead(c, $VrQ) OVER (ORDER BY day) - c AS sq
       |  FROM daily),
       |sums AS (
       |  SELECT
       |    CAST(sum(CASE WHEN r IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS mr,
       |    sum(CAST(r AS DECIMAL(38,0))) AS sr,
       |    sum(CAST(r AS DECIMAL(38,0)) * r) AS srr,
       |    CAST(sum(CASE WHEN sq IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ms,
       |    sum(CAST(sq AS DECIMAL(38,0))) AS ss,
       |    sum(CAST(sq AS DECIMAL(38,0)) * sq) AS sss
       |  FROM diffs),
       |vv AS (
       |  SELECT mr, ms,
       |    CAST(CAST(ms AS DECIMAL(38,0)) * sss - ss * ss AS DOUBLE)
       |      / (CAST(ms AS DOUBLE) * CAST(ms AS DOUBLE)) AS vs,
       |    CAST(CAST(mr AS DECIMAL(38,0)) * srr - sr * sr AS DOUBLE)
       |      / (CAST(mr AS DOUBLE) * CAST(mr AS DOUBLE)) AS vr1
       |  FROM sums),
       |vrt AS (SELECT mr AS n_diffs, vs / $VrQ / vr1 AS vr FROM vv)
       |SELECT n_diffs, round(vr, 6) AS variance_ratio,
       |  round((vr - 1) / sqrt(2.0 * (2 * $VrQ - 1) * ($VrQ - 1)
       |    / (3.0 * $VrQ * n_diffs)), 6) AS z_stat,
       |  CASE WHEN abs((vr - 1) / sqrt(2.0 * (2 * $VrQ - 1) * ($VrQ - 1)
       |    / (3.0 * $VrQ * n_diffs))) > 1.96
       |    THEN 'reject_random_walk' ELSE 'random_walk_plausible' END
       |    AS verdict_5pct
       |FROM vrt""".stripMargin

  /** Nano-fixed-point 0.95^k constants, k = 0..119 — generated once in
    * Scala and injected into BOTH engines (the C562 twiddle trick:
    * transcendental parity is structural).
    */
  private val Gamma: Seq[Long] =
    (0 to 119).map(k => math.round(math.pow(0.95, k) * 1e9))

  /** C577 analytics_ltv_discounted — cohort LTV with monthly 0.95
    * discounting: month index arithmetic (never engine date-diff
    * quirks), cohort = each customer's first order month, and the
    * discounted sum Σ revₖ·γfx[k] is an EXACT DECIMAL dot product
    * against the injected constant table — one IEEE division per
    * cohort at the end. The per-customer cohort pass is one window
    * over the customer partition.
    */
  def analyticsLtvDiscounted(s: SparkSession, d: String): DataFrame = {
    val arr = Gamma.mkString("array(", "L, ", "L)")
    val om = orders(s, d).select(col("o_custkey"),
        expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1").as("m"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("r"))
      .withColumn("cm", min(col("m")).over(Window.partitionBy("o_custkey")))
      .withColumn("k", expr("CAST(least(m - cm, 119) AS INT)"))
    om.groupBy("cm")
      .agg(
        countDistinct(col("o_custkey")).cast("long").as("n_customers"),
        sum(col("r")).cast("long").as("cents"),
        sum(expr(s"CAST(r AS DECIMAL(38,0)) * element_at($arr, k + 1)")).as("dfx"))
      .selectExpr("CAST(cm AS BIGINT) AS cohort_month", "n_customers",
        "round(CAST(cents AS DOUBLE) / 100, 6) AS nominal_revenue",
        "round(CAST(dfx AS DOUBLE) / 1e9 / 100, 6) AS discounted_revenue",
        """round(CAST(dfx AS DOUBLE) / 1e9 / 100 / n_customers, 6)
          |  AS ltv_per_customer""".stripMargin)
      .orderBy("cohort_month")
  }
  val analyticsLtvDiscountedSql: String = {
    val arr = Gamma.mkString("[", ", ", "]")
    s"""WITH om AS (
       |  SELECT o_custkey,
       |    (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS m,
       |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS r
       |  FROM orders),
       |ck AS (
       |  SELECT o_custkey, m, r,
       |    min(m) OVER (PARTITION BY o_custkey) AS cm
       |  FROM om),
       |kk AS (
       |  SELECT o_custkey, cm, r,
       |    CAST(least(m - cm, 119) AS BIGINT) AS k
       |  FROM ck)
       |SELECT cm AS cohort_month,
       |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       |  round(CAST(CAST(sum(r) AS BIGINT) AS DOUBLE) / 100, 6)
       |    AS nominal_revenue,
       |  round(CAST(sum(CAST(r AS DECIMAL(38,0)) * ($arr)[k + 1])
       |    AS DOUBLE) / 1e9 / 100, 6) AS discounted_revenue,
       |  round(CAST(sum(CAST(r AS DECIMAL(38,0)) * ($arr)[k + 1])
       |    AS DOUBLE) / 1e9 / 100 / count(DISTINCT o_custkey), 6)
       |    AS ltv_per_customer
       |FROM kk GROUP BY cm ORDER BY cohort_month""".stripMargin
  }

  /** C578 win_ewm_variance — EWM volatility with α = 1/2 in EXACT
    * integer fixed point: working in 1/256 units, the 8-lag dyadic
    * mean is m256 = Σ c₋ₖ·2^(7−k) (an integer — no float until the
    * final sqrt) and the EWM second moment s256 likewise over c²
    * (DECIMAL — c² at sf1 exceeds a long under the ·128 weight), so
    * var·2¹⁶ = s256·256 − m256² is exact and one sqrt per row closes.
    * The exact-arithmetic upgrade of C75's dyadic EWMA. Last 30 days.
    */
  def winEwmVariance(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val w = Window.orderBy("day")
    def lc(i: Int) = coalesce(lag(col("c"), i).over(w), lit(0L))
    val m256 = (0 to 7).map(k => lc(k) * lit(1L << (7 - k)))
      .reduce(_ + _)
    val s256sql = (0 to 7).map(k =>
      s"coalesce(CAST(lag(c, $k) OVER (ORDER BY day) AS DECIMAL(38,0)), CAST(0 AS DECIMAL(38,0)))"
        + s" * coalesce(lag(c, $k) OVER (ORDER BY day), 0) * ${1L << (7 - k)}")
      .mkString(" + ")
    daily
      .withColumn("m256", m256)
      .withColumn("s256", expr(s256sql))
      .selectExpr("day",
        "CAST(s256 * 256 - CAST(m256 AS DECIMAL(38,0)) * m256 AS DOUBLE) AS v16")
      .selectExpr("day", "round(sqrt(v16) / 256 / 100, 6) AS ewm_volatility")
      .orderBy(col("day").desc).limit(30)
      .orderBy("day")
  }
  val winEwmVarianceSql: String = {
    val m256 = (0 to 7).map(k =>
      s"coalesce(lag(c, $k) OVER (ORDER BY day), 0) * ${1L << (7 - k)}")
      .mkString(" + ")
    val s256 = (0 to 7).map(k =>
      s"coalesce(CAST(lag(c, $k) OVER (ORDER BY day) AS DECIMAL(38,0)), CAST(0 AS DECIMAL(38,0)))"
        + s" * coalesce(lag(c, $k) OVER (ORDER BY day), 0) * ${1L << (7 - k)}")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT date_trunc('day', l_shipdate) AS day,
       |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
       |      AS BIGINT)) AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1),
       |mm AS (
       |  SELECT day, $m256 AS m256, $s256 AS s256
       |  FROM daily),
       |vv AS (
       |  SELECT day,
       |    CAST(s256 * 256 - CAST(m256 AS DECIMAL(38,0)) * m256 AS DOUBLE)
       |      AS v16
       |  FROM mm)
       |SELECT day, round(sqrt(v16) / 256 / 100, 6) AS ewm_volatility
       |FROM (SELECT * FROM vv ORDER BY day DESC LIMIT 30)
       |ORDER BY day""".stripMargin
  }

  /** C579 stat_grubbs_extreme — Grubbs' test for the single most
    * extreme daily-revenue outlier: the deviation maximizes as the
    * exact integer |c·n − Σc| (argmax tie → earliest day, via a
    * struct-min aggregate — no sort), and G = maxdev/√(nΣc²−(Σc)²)
    * closes in one chain (the n's cancel). Never materializes a
    * residual column.
    */
  def statGrubbsExtreme(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val tot = daily.agg(
      count(lit(1)).cast("long").as("n"),
      sum(expr("CAST(c AS DECIMAL(38,0))")).as("sc"),
      sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("scc"))
    daily.crossJoin(broadcast(tot))
      .selectExpr("day", "c", "n", "sc", "scc",
        "abs(CAST(c AS DECIMAL(38,0)) * n - sc) AS dev")
      .agg(
        max(col("n")).as("n"), max(col("sc")).as("sc"), max(col("scc")).as("scc"),
        min(struct(expr("-dev").as("nd"), col("day"), col("c"))).as("m"))
      .selectExpr("n AS n_days", "m.day AS outlier_day",
        "round(CAST(m.c AS DOUBLE) / 100, 6) AS outlier_revenue",
        """round(CAST(-m.nd AS DOUBLE)
          |  / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * scc - sc * sc AS DOUBLE))
          |  , 6) AS grubbs_g""".stripMargin)
  }
  val statGrubbsExtremeSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(c AS DECIMAL(38,0))) AS sc,
      |    sum(CAST(c AS DECIMAL(38,0)) * c) AS scc
      |  FROM daily),
      |dev AS (
      |  SELECT day, c, n, sc, scc,
      |    abs(CAST(c AS DECIMAL(38,0)) * n - sc) AS dev
      |  FROM daily, tot),
      |pick AS (
      |  SELECT * FROM dev ORDER BY dev DESC, day LIMIT 1)
      |SELECT n AS n_days, day AS outlier_day,
      |  round(CAST(c AS DOUBLE) / 100, 6) AS outlier_revenue,
      |  round(CAST(dev AS DOUBLE)
      |    / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * scc - sc * sc AS DOUBLE)), 6)
      |    AS grubbs_g
      |FROM pick""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_variance_ratio" -> (statVarianceRatio _),
    "analytics_ltv_discounted" -> (analyticsLtvDiscounted _),
    "win_ewm_variance" -> (winEwmVariance _),
    "stat_grubbs_extreme" -> (statGrubbsExtreme _),
  )

  val oracle: Map[String, String] = Map(
    "stat_variance_ratio" -> statVarianceRatioSql,
    "analytics_ltv_discounted" -> analyticsLtvDiscountedSql,
    "win_ewm_variance" -> winEwmVarianceSql,
    "stat_grubbs_extreme" -> statGrubbsExtremeSql,
  )
}
