package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 45 (C584–C587): dominant-period detection, power-law fit,
  * largest-remainder allocation, record-breaking days.
  */
object Extras145 {

  /** C584 time_dominant_period — seasonality detection by ACF argmax
    * over lags 2..30: the 29 lagged pairings stack from ONE window
    * pass (29 lead columns → an explode of (k, c, cₖ) structs over the
    * bounded daily frame — never a self-join), per-lag Pearson
    * numerator/denominators from exact DECIMAL sums, correlation as
    * one fixed chain, and the winner by (corr desc, k). Reports the
    * top-3 candidate periods.
    */
  def timeDominantPeriod(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val w = Window.orderBy("day")
    val withLags = (2 to 30).foldLeft(daily) { (df, k) =>
      df.withColumn(s"l$k", lead(col("c"), k).over(w))
    }
    val stacked = withLags.select(col("c"), explode(expr(
      "array(" + (2 to 30).map(k => s"named_struct('k', ${k}L, 'ck', l$k)").mkString(", ") + ")")).as("p"))
      .filter(col("p.ck").isNotNull)
      .selectExpr("p.k AS k", "c", "p.ck AS ck")
    stacked.groupBy("k")
      .agg(count(lit(1)).cast("long").as("m"),
        sum(expr("CAST(c AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(ck AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * ck")).as("sxy"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sxx"),
        sum(expr("CAST(ck AS DECIMAL(38,0)) * ck")).as("syy"))
      .selectExpr("k", "m",
        """CAST(CAST(m AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
          |  / sqrt(CAST(CAST(m AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE))
          |  / sqrt(CAST(CAST(m AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE))
          |  AS acf""".stripMargin)
      .orderBy(col("acf").desc, col("k"))
      .limit(3)
      .selectExpr("k AS period_days", "m AS n_pairs", "round(acf, 6) AS acf")
  }
  val timeDominantPeriodSql: String = {
    val leads = (2 to 30).map(k => s"lead(c, $k) OVER (ORDER BY day) AS l$k")
      .mkString(",\n      |    ")
    val structs = (2 to 30).map(k => s"{'k': CAST($k AS BIGINT), 'ck': l$k}")
      .mkString(", ")
    s"""WITH daily AS (
       |  SELECT date_trunc('day', l_shipdate) AS day,
       |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
       |      AS BIGINT)) AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1),
       |lagged AS (
       |  SELECT c,
       |    $leads
       |  FROM daily),
       |stacked AS (
       |  SELECT c, u.p.k AS k, u.p.ck AS ck
       |  FROM lagged, unnest([$structs]) AS u(p)
       |  WHERE u.p.ck IS NOT NULL),
       |sums AS (
       |  SELECT k, CAST(count(*) AS BIGINT) AS m,
       |    sum(CAST(c AS DECIMAL(38,0))) AS sx,
       |    sum(CAST(ck AS DECIMAL(38,0))) AS sy,
       |    sum(CAST(c AS DECIMAL(38,0)) * ck) AS sxy,
       |    sum(CAST(c AS DECIMAL(38,0)) * c) AS sxx,
       |    sum(CAST(ck AS DECIMAL(38,0)) * ck) AS syy
       |  FROM stacked GROUP BY k),
       |acfs AS (
       |  SELECT k, m,
       |    CAST(CAST(m AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
       |      / sqrt(CAST(CAST(m AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE))
       |      / sqrt(CAST(CAST(m AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE))
       |      AS acf
       |  FROM sums)
       |SELECT k AS period_days, m AS n_pairs, round(acf, 6) AS acf
       |FROM acfs ORDER BY acfs.acf DESC, k LIMIT 3""".stripMargin
  }

  /** C585 graph_powerlaw_fit — log–log degree-distribution fit of the
    * co-purchase projection: degrees from the STAGED
    * [[CoPurchaseStage]] artifact, per-degree counts over the bounded
    * distinct-degree frame, both logs QUANTIZED to nano fixed point
    * (ln on identical integer-derived doubles, then the wfx floor —
    * the sums of x·y products are exact DECIMALs, never a float sum),
    * closed-form OLS slope + r². Slope ≈ −α̂ of the power law.
    */
  def graphPowerlawFit(s: SparkSession, d: String): DataFrame = {
    val hist = CoPurchaseStage.degrees(s, d)
      .groupBy("deg").agg(count(lit(1)).cast("long").as("cnt"))
      .selectExpr(
        "CAST(floor(ln(CAST(deg AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS x",
        "CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS y")
    hist.agg(
        count(lit(1)).cast("long").as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .selectExpr("n",
        "CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE) AS num",
        "CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE) AS dx",
        "CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE) AS dy")
      .selectExpr("n AS n_degree_points",
        "round(num / dx, 6) AS loglog_slope",
        "round(num / dx * num / dy, 6) AS r_squared")
  }
  val graphPowerlawFitSql: String =
    """WITH edges AS (
      |  SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |degs AS (
      |  SELECT sk, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY sk),
      |hist AS (
      |  SELECT
      |    CAST(floor(ln(CAST(deg AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(ln(CAST(count(*) AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS y
      |  FROM degs GROUP BY deg),
      |sums AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(x AS DECIMAL(38,0))) AS sx,
      |    sum(CAST(y AS DECIMAL(38,0))) AS sy,
      |    sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
      |    sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
      |    sum(CAST(y AS DECIMAL(38,0)) * y) AS syy
      |  FROM hist),
      |dd AS (
      |  SELECT n,
      |    CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE) AS num,
      |    CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE) AS dx,
      |    CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE) AS dy
      |  FROM sums)
      |SELECT n AS n_degree_points, round(num / dx, 6) AS loglog_slope,
      |  round(num / dx * num / dy, 6) AS r_squared
      |FROM dd""".stripMargin

  /** C586 sample_largest_remainder — Hare-quota apportionment of 1000
    * sample slots across nation strata: base = floor(1000·nᵢ/N), the
    * leftover slots go to the largest remainders (1000·nᵢ mod N,
    * rank over the BOUNDED strata frame, tie → stratum key) — pure
    * integer arithmetic, and Σalloc = 1000 exactly by construction
    * (spec-asserted). The proportional sampler that never over- or
    * under-shoots its budget.
    */
  def sampleLargestRemainder(s: SparkSession, d: String): DataFrame = {
    val strata = customer(s, d).groupBy("c_nationkey")
      .agg(count(lit(1)).cast("long").as("n_members"))
    val tot = strata.agg(sum(col("n_members")).cast("long").as("nn"))
    strata.crossJoin(broadcast(tot))
      .selectExpr("c_nationkey", "n_members",
        "(1000 * n_members) div nn AS base",
        "(1000 * n_members) % nn AS rem")
      .withColumn("extra_rank", row_number().over(
        Window.orderBy(col("rem").desc, col("c_nationkey"))))
      .crossJoin(broadcast(
        strata.crossJoin(tot).agg(
          sum(expr("(1000 * n_members) div nn")).cast("long").as("base_sum"))))
      .selectExpr("c_nationkey", "n_members",
        "base + CASE WHEN extra_rank <= 1000 - base_sum THEN 1L ELSE 0L END AS alloc")
      .orderBy("c_nationkey")
  }
  val sampleLargestRemainderSql: String =
    """WITH strata AS (
      |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_members
      |  FROM customer GROUP BY c_nationkey),
      |tot AS (SELECT CAST(sum(n_members) AS BIGINT) AS nn FROM strata),
      |q AS (
      |  SELECT c_nationkey, n_members,
      |    (1000 * n_members) // nn AS base,
      |    (1000 * n_members) % nn AS rem
      |  FROM strata, tot),
      |bs AS (SELECT CAST(sum(base) AS BIGINT) AS base_sum FROM q),
      |r AS (
      |  SELECT c_nationkey, n_members, base,
      |    row_number() OVER (ORDER BY rem DESC, c_nationkey) AS extra_rank
      |  FROM q)
      |SELECT c_nationkey, n_members,
      |  base + CASE WHEN extra_rank <= 1000 - base_sum THEN 1 ELSE 0 END AS alloc
      |FROM r, bs ORDER BY c_nationkey""".stripMargin

  /** C587 time_record_breaking_days — how often daily revenue sets a
    * new all-time high, against the iid expectation H_n (a record at
    * day t has probability 1/t under exchangeability): records via a
    * strict running max over the bounded daily frame, H_n as the
    * EXACT pico fixed-point Σ 10¹² div t (a float harmonic sum would
    * be order-sensitive), and the record/expected ratio in one final
    * chain. The classic records test for trend, order-statistics
    * flavored.
    */
  def timeRecordBreakingDays(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    daily
      .withColumn("pmax", max(col("c")).over(w))
      .withColumn("t", row_number().over(Window.orderBy("day")).cast("long"))
      .selectExpr("t",
        "CASE WHEN pmax IS NULL OR c > pmax THEN 1L ELSE 0L END AS rec")
      .agg(
        count(lit(1)).cast("long").as("n_days"),
        sum(col("rec")).cast("long").as("n_records"),
        sum(expr("1000000000000L div t")).cast("long").as("hfx"))
      .selectExpr("n_days", "n_records",
        "round(CAST(hfx AS DOUBLE) / 1e12, 6) AS expected_records",
        """round(CAST(n_records AS DOUBLE)
          |  / (CAST(hfx AS DOUBLE) / 1e12), 6) AS record_ratio""".stripMargin)
  }
  val timeRecordBreakingDaysSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |rr AS (
      |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
      |    CASE WHEN max(c) OVER (ORDER BY day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR c > max(c) OVER (ORDER BY day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      THEN 1 ELSE 0 END AS rec
      |  FROM daily)
      |SELECT CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(rec) AS BIGINT) AS n_records,
      |  round(CAST(CAST(sum(1000000000000 // t) AS BIGINT) AS DOUBLE) / 1e12, 6)
      |    AS expected_records,
      |  round(CAST(CAST(sum(rec) AS BIGINT) AS DOUBLE)
      |    / (CAST(CAST(sum(1000000000000 // t) AS BIGINT) AS DOUBLE) / 1e12), 6)
      |    AS record_ratio
      |FROM rr""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_dominant_period" -> (timeDominantPeriod _),
    "graph_powerlaw_fit" -> (graphPowerlawFit _),
    "sample_largest_remainder" -> (sampleLargestRemainder _),
    "time_record_breaking_days" -> (timeRecordBreakingDays _),
  )

  val oracle: Map[String, String] = Map(
    "time_dominant_period" -> timeDominantPeriodSql,
    "graph_powerlaw_fit" -> graphPowerlawFitSql,
    "sample_largest_remainder" -> sampleLargestRemainderSql,
    "time_record_breaking_days" -> timeRecordBreakingDaysSql,
  )
}
