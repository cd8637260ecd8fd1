package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** 106th wave — classical time-series decomposition of the daily
  * revenue series (trend / day-of-week seasonal / residual) and the
  * STL-style seasonal/trend strength summary, both in fixed-point
  * integer arithmetic so every intermediate is order-free and
  * bit-identical across engines.
  */
object Extras106 {

  /** Decomposition fixed point: micro-cents (cents × 10⁶). Trend is an
    * integer division of a 7-day cent sum; seasonal is an integer
    * division of a micro-cent sum — no float enters the series.
    */
  val DecompQ = 1000000L

  /** The shared (day, cents, trend, detrended, seasonal, residual)
    * frame. Trend: centered 7-ROW moving average over the day-ordered
    * series (calendar gaps documented as row-adjacency — the series
    * is dense in practice); edge days with fewer than 7 neighbors get
    * NO trend and drop from the decomposition (the classical
    * convention). Seasonal: day-of-week mean of the detrended series.
    * All divisions are integer `div` on exact sums.
    */
  private def decomposed(s: SparkSession, d: String): DataFrame = {
    // o_totalprice is a DOUBLE holding an exact 2-decimal value: the
    // decimal cast is exact, and (dec * 100) -> bigint is exact in both
    // engines; a direct double*100 cast truncates in Spark but ROUNDS
    // in DuckDB (measured: 2-cent skew on ~25% of days)
    val daily = orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(14,2)") * 100)
        .cast("long")).as("cents"))
    val wd = Window.orderBy("day")
    val w7 = wd.rowsBetween(-3, 3)
    val t = daily
      .withColumn("w_cnt", count(lit(1)).over(w7))
      .withColumn("w_sum", sum(col("cents")).over(w7))
      .filter(col("w_cnt") === 7)
      .select(col("day"), col("cents"),
        expr(s"(w_sum * $DecompQ) div 7").as("trend_mc"))
      .withColumn("detr_mc", col("cents") * DecompQ - col("trend_mc"))
      .withColumn("dow", dayofweek(col("day")).cast("long"))
    val seas = t.groupBy("dow")
      .agg(expr("sum(detr_mc) div count(1)").as("seasonal_mc"))
    t.join(broadcast(seas), "dow")
      .select(col("day"), col("cents"), col("trend_mc"), col("detr_mc"),
        col("seasonal_mc"),
        (col("detr_mc") - col("seasonal_mc")).as("residual_mc"))
  }
  private val decomposedSql: String =
    s"""daily AS (
       |  SELECT o_orderdate AS day,
       |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
       |      AS BIGINT) AS cents
       |  FROM orders GROUP BY 1),
       |win AS (
       |  SELECT day, cents,
       |    count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
       |      AS w_cnt,
       |    sum(cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
       |      AS w_sum
       |  FROM daily),
       |t AS (
       |  SELECT day, cents,
       |    (w_sum * $DecompQ) // 7 AS trend_mc,
       |    cents * $DecompQ - (w_sum * $DecompQ) // 7 AS detr_mc,
       |    CAST(dayofweek(day) + 1 AS BIGINT) AS dow
       |  FROM win WHERE w_cnt = 7),
       |seas AS (
       |  SELECT dow, CAST(sum(detr_mc) // count(*) AS BIGINT) AS seasonal_mc
       |  FROM t GROUP BY 1),
       |dec AS (
       |  SELECT t.day, t.cents, CAST(t.trend_mc AS BIGINT) AS trend_mc,
       |    CAST(t.detr_mc AS BIGINT) AS detr_mc, seas.seasonal_mc,
       |    CAST(t.detr_mc - seas.seasonal_mc AS BIGINT) AS residual_mc
       |  FROM t JOIN seas ON seas.dow = t.dow)""".stripMargin

  /** time_seasonal_decompose — the per-day decomposition table:
    * cents = trend + seasonal + residual (in micro-cents, exactly, by
    * construction — the spec asserts the identity). One O(days)
    * ordered frame (the agg_equidepth shape: the day dimension is
    * thousands of rows at any corpus size, because it is TIME, not
    * data volume), one broadcast of the 7-row seasonal table.
    */
  def timeSeasonalDecompose(s: SparkSession, d: String): DataFrame =
    decomposed(s, d)
      .select("day", "cents", "trend_mc", "seasonal_mc", "residual_mc")
      .orderBy("day")
  val timeSeasonalDecomposeSql: String =
    s"""WITH $decomposedSql
       |SELECT day, cents, trend_mc, seasonal_mc, residual_mc
       |FROM dec ORDER BY day""".stripMargin

  /** time_seasonal_strength — Hyndman's STL strength summary:
    * F_T = max(0, 1 − Var(R)/Var(detrended+trend−seasonal…)) — concretely
    * F_T uses Var(R)/Var(T+R) and F_S uses Var(R)/Var(S+R), each a
    * single division of EXACT variances: every series is integer
    * micro-cents, so n·Σx² − (Σx)² is exact DECIMAL(38,0) arithmetic
    * (Σx² ≈ 10²⁶ at sf0.1 — far past long, inside decimal38) and only
    * the final ratio is IEEE. The one-row answer to "is this series
    * trending, and does weekday matter".
    */
  def timeSeasonalStrength(s: SparkSession, d: String): DataFrame = {
    val dec = decomposed(s, d)
      .select(col("residual_mc").as("r"),
        (col("trend_mc") + col("residual_mc")).as("tr"),
        (col("seasonal_mc") + col("residual_mc")).as("sr"))
    def varNum(c: String) =
      (count(lit(1)) * sum(col(c).cast("decimal(38,0)") * col(c).cast("decimal(38,0)"))
        - sum(col(c).cast("decimal(38,0)")) * sum(col(c).cast("decimal(38,0)")))
        .as(s"v_$c")
    val m = dec.agg(count(lit(1)).as("n"), varNum("r"), varNum("tr"), varNum("sr"))
    // n² cancels in the ratios, so the exact numerators divide directly
    m.select(col("n"),
        round(greatest(lit(0.0),
          lit(1.0) - col("v_r").cast("double") / col("v_tr").cast("double")), 6)
          .as("f_trend"),
        round(greatest(lit(0.0),
          lit(1.0) - col("v_r").cast("double") / col("v_sr").cast("double")), 6)
          .as("f_seasonal"))
  }
  val timeSeasonalStrengthSql: String =
    s"""WITH $decomposedSql,
       |ser AS (
       |  SELECT residual_mc AS r, trend_mc + residual_mc AS tr,
       |    seasonal_mc + residual_mc AS sr
       |  FROM dec),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    count(*) * sum(CAST(r AS DECIMAL(38,0)) * CAST(r AS DECIMAL(38,0)))
       |      - sum(CAST(r AS DECIMAL(38,0))) * sum(CAST(r AS DECIMAL(38,0))) AS v_r,
       |    count(*) * sum(CAST(tr AS DECIMAL(38,0)) * CAST(tr AS DECIMAL(38,0)))
       |      - sum(CAST(tr AS DECIMAL(38,0))) * sum(CAST(tr AS DECIMAL(38,0))) AS v_tr,
       |    count(*) * sum(CAST(sr AS DECIMAL(38,0)) * CAST(sr AS DECIMAL(38,0)))
       |      - sum(CAST(sr AS DECIMAL(38,0))) * sum(CAST(sr AS DECIMAL(38,0))) AS v_sr
       |  FROM ser)
       |SELECT n,
       |  round(greatest(0.0, 1.0 - CAST(v_r AS DOUBLE) / CAST(v_tr AS DOUBLE)), 6)
       |    AS f_trend,
       |  round(greatest(0.0, 1.0 - CAST(v_r AS DOUBLE) / CAST(v_sr AS DOUBLE)), 6)
       |    AS f_seasonal
       |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_seasonal_decompose" -> (timeSeasonalDecompose _),
    "time_seasonal_strength" -> (timeSeasonalStrength _))

  val oracle: Map[String, String] = Map(
    "time_seasonal_decompose" -> timeSeasonalDecomposeSql,
    "time_seasonal_strength" -> timeSeasonalStrengthSql)
}
