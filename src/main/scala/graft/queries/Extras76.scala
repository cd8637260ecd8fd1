package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Seventy-sixth wave: lag-k autocorrelation of the daily revenue
  * series, a decile Q-Q drift check, and per-stream calibration-drift
  * regression.
  */
object Extras76 {

  /** stat_autocorr_lag — lag-1/2/3 autocorrelation of the daily
    * purchase-revenue series (the seasonality probe behind anomaly
    * alerting): daily totals are exact decimal sums; the mean is one
    * IEEE division off exact parts; lagged cross-terms come from a
    * window over the DAY frame (bounded by the calendar — a few
    * hundred rows — not the event count, so the unpartitioned sort is
    * O(days)); the four order-sensitive IEEE sums each walk ONE
    * day-sorted collected list in a fixed-order fold (the agg_entropy
    * pattern). Standard denominator Σ(x−x̄)² shared by all lags.
    */
  def statAutocorrLag(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d).filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(dsum(col("value")).as("x"))
    val m = daily.agg(
      sum(col("x").cast("decimal(18,2)")).cast("double").as("sx"),
      count(lit(1)).as("n"))
    val w = Window.orderBy("day")
    val t = daily.crossJoin(broadcast(m))
      .withColumn("mean", col("sx") / col("n"))
      .select(col("day"), col("n"),
        ((col("x") - col("mean")) * (col("x") - col("mean"))).as("t0"),
        ((col("x") - col("mean")) * (lag(col("x"), 1).over(w) - col("mean")))
          .as("t1"),
        ((col("x") - col("mean")) * (lag(col("x"), 2).over(w) - col("mean")))
          .as("t2"),
        ((col("x") - col("mean")) * (lag(col("x"), 3).over(w) - col("mean")))
          .as("t3"))
    t.groupBy("n")
      .agg(sort_array(collect_list(struct(col("day"), col("t0"), col("t1"),
        col("t2"), col("t3")))).as("ts"))
      .select(col("n").as("n_days"),
        round(expr("aggregate(ts, 0D, (a, t) -> a + coalesce(t.t1, 0D))")
          / expr("aggregate(ts, 0D, (a, t) -> a + t.t0)"), 6).as("r1"),
        round(expr("aggregate(ts, 0D, (a, t) -> a + coalesce(t.t2, 0D))")
          / expr("aggregate(ts, 0D, (a, t) -> a + t.t0)"), 6).as("r2"),
        round(expr("aggregate(ts, 0D, (a, t) -> a + coalesce(t.t3, 0D))")
          / expr("aggregate(ts, 0D, (a, t) -> a + t.t0)"), 6).as("r3"))
  }
  val statAutocorrLagSql: String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day, ${dsumSql("value")} AS x
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |m AS (
       |  SELECT CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
       |    count(*) AS n FROM daily),
       |t AS (
       |  SELECT day, n,
       |    (x - sx / n) * (x - sx / n) AS t0,
       |    (x - sx / n) * (lag(x, 1) OVER (ORDER BY day) - sx / n) AS t1,
       |    (x - sx / n) * (lag(x, 2) OVER (ORDER BY day) - sx / n) AS t2,
       |    (x - sx / n) * (lag(x, 3) OVER (ORDER BY day) - sx / n) AS t3
       |  FROM daily, m),
       |l AS (
       |  SELECT n,
       |    list(t0 ORDER BY day) AS l0, list(t1 ORDER BY day) AS l1,
       |    list(t2 ORDER BY day) AS l2, list(t3 ORDER BY day) AS l3
       |  FROM t GROUP BY 1)
       |SELECT n AS n_days,
       |  round(list_reduce(list_prepend(0.0, list_transform(l1,
       |      x -> coalesce(x, 0.0))), (a, b) -> a + b)
       |    / list_reduce(list_prepend(0.0, l0), (a, b) -> a + b), 6) AS r1,
       |  round(list_reduce(list_prepend(0.0, list_transform(l2,
       |      x -> coalesce(x, 0.0))), (a, b) -> a + b)
       |    / list_reduce(list_prepend(0.0, l0), (a, b) -> a + b), 6) AS r2,
       |  round(list_reduce(list_prepend(0.0, list_transform(l3,
       |      x -> coalesce(x, 0.0))), (a, b) -> a + b)
       |    / list_reduce(list_prepend(0.0, l0), (a, b) -> a + b), 6) AS r3
       |FROM l""".stripMargin

  /** stat_qq_deciles — decile Q-Q drift check between the two
    * doc_id-parity halves of the corpus (the distribution-shift gate a
    * pipeline runs between snapshots): percentile_disc is ELEMENT
    * selection (exact integers, no interpolation — both engines pick
    * the smallest value with cume_dist ≥ q), nine deciles per half in
    * ONE grouped aggregate, the 2×9 frame joins to itself on the
    * decile index. Scale: one keyed aggregate over the corpus; the
    * Q-Q frame is 9 rows.
    */
  def statQqDeciles(s: SparkSession, d: String): DataFrame = {
    val q = documents(s, d)
      .groupBy((col("doc_id") % 2).as("half"))
      .agg(array((1 to 9).map(i =>
        expr(s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY n_chars)")
          .cast("long")): _*).as("ps"))
    val e = q.filter(col("half") === 0).select(col("ps").as("pe"))
    val o = q.filter(col("half") === 1).select(col("ps").as("po"))
    e.crossJoin(o)
      .select(explode(sequence(lit(1L), lit(9L))).as("decile"),
        col("pe"), col("po"))
      .select(col("decile"),
        element_at(col("pe"), col("decile").cast("int")).as("v_even"),
        element_at(col("po"), col("decile").cast("int")).as("v_odd"))
      .withColumn("gap", col("v_even") - col("v_odd"))
      .orderBy("decile")
  }
  val statQqDecilesSql: String =
    """WITH q AS (
      |  SELECT doc_id % 2 AS half,
      |    percentile_disc([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
      |      WITHIN GROUP (ORDER BY n_chars) AS ps
      |  FROM documents GROUP BY 1),
      |idx AS (SELECT unnest(generate_series(1, 9)) AS decile)
      |SELECT idx.decile,
      |  CAST(e.ps[idx.decile] AS BIGINT) AS v_even,
      |  CAST(o.ps[idx.decile] AS BIGINT) AS v_odd,
      |  CAST(e.ps[idx.decile] - o.ps[idx.decile] AS BIGINT) AS gap
      |FROM idx, (SELECT ps FROM q WHERE half = 0) e,
      |  (SELECT ps FROM q WHERE half = 1) o
      |ORDER BY 1""".stripMargin

  /** ref_calibration_drift — the instrument-drift screen the reference
    * applies to submitted series (a sensor whose values trend with
    * time is flagged for recalibration): per event stream, least-
    * squares slope/intercept/R² of value against the day index. Every
    * moment sum is EXACT — day index × DECIMAL(14,2) value products
    * accumulate as decimals, squares cast decimal BEFORE the product
    * (the C341 int64-wrap lesson) — then slope/intercept/R² assemble
    * in one final IEEE block from identical operands in both engines.
    * Scale: one partial-aggregating pass, state O(streams).
    */
  def refCalibrationDrift(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("xi")
          .cast("long"),
        col("value"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("xi")).as("sx"),
        sum(col("value").cast("decimal(14,2)")).as("sy_d"),
        sum(col("xi").cast("decimal(18,0)")
          * col("value").cast("decimal(14,2)")).as("sxy_d"),
        sum(col("xi").cast("decimal(19,0)") * col("xi").cast("decimal(19,0)"))
          .as("sxx_d"),
        sum(col("value").cast("decimal(14,2)")
          * col("value").cast("decimal(14,2)")).as("syy_d"))
      .select(col("event_type"), col("n"),
        round((col("n").cast("double") * col("sxy_d").cast("double")
            - col("sx").cast("double") * col("sy_d").cast("double"))
          / (col("n").cast("double") * col("sxx_d").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")), 6)
          .as("slope"),
        round((col("sy_d").cast("double")
            - ((col("n").cast("double") * col("sxy_d").cast("double")
                - col("sx").cast("double") * col("sy_d").cast("double"))
              / (col("n").cast("double") * col("sxx_d").cast("double")
                - col("sx").cast("double") * col("sx").cast("double")))
              * col("sx").cast("double")) / col("n").cast("double"), 6)
          .as("intercept"),
        round(((col("n").cast("double") * col("sxy_d").cast("double")
              - col("sx").cast("double") * col("sy_d").cast("double"))
            * (col("n").cast("double") * col("sxy_d").cast("double")
              - col("sx").cast("double") * col("sy_d").cast("double")))
          / ((col("n").cast("double") * col("sxx_d").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
            * (col("n").cast("double") * col("syy_d").cast("double")
              - col("sy_d").cast("double") * col("sy_d").cast("double"))), 6)
          .as("r2"))
      .orderBy("event_type")
  val refCalibrationDriftSql: String =
    """WITH g AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(xi) AS BIGINT) AS sx,
      |    sum(CAST(value AS DECIMAL(14,2))) AS sy_d,
      |    sum(CAST(xi AS DECIMAL(18,0)) * CAST(value AS DECIMAL(14,2)))
      |      AS sxy_d,
      |    sum(CAST(xi AS DECIMAL(19,0)) * CAST(xi AS DECIMAL(19,0))) AS sxx_d,
      |    sum(CAST(value AS DECIMAL(14,2)) * CAST(value AS DECIMAL(14,2)))
      |      AS syy_d
      |  FROM (SELECT event_type,
      |          datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS xi,
      |          value
      |        FROM events)
      |  GROUP BY 1)
      |SELECT event_type, n,
      |  round((CAST(n AS DOUBLE) * CAST(sxy_d AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy_d AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(sxx_d AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
      |  round((CAST(sy_d AS DOUBLE)
      |      - ((CAST(n AS DOUBLE) * CAST(sxy_d AS DOUBLE)
      |          - CAST(sx AS DOUBLE) * CAST(sy_d AS DOUBLE))
      |        / (CAST(n AS DOUBLE) * CAST(sxx_d AS DOUBLE)
      |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
      |  round(((CAST(n AS DOUBLE) * CAST(sxy_d AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy_d AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(sxy_d AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy_d AS DOUBLE)))
      |    / ((CAST(n AS DOUBLE) * CAST(sxx_d AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(syy_d AS DOUBLE)
      |        - CAST(sy_d AS DOUBLE) * CAST(sy_d AS DOUBLE))), 6) AS r2
      |FROM g ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_autocorr_lag" -> (statAutocorrLag _),
    "stat_qq_deciles" -> (statQqDeciles _),
    "ref_calibration_drift" -> (refCalibrationDrift _))

  val oracle: Map[String, String] = Map(
    "stat_autocorr_lag" -> statAutocorrLagSql,
    "stat_qq_deciles" -> statQqDecilesSql,
    "ref_calibration_drift" -> refCalibrationDriftSql)
}
