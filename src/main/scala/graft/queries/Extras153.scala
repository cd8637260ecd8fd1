package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 53 (C616–C619): segment uplift, Higuchi fractal dimension,
  * cross-source duplicate matrix, runs up/down test.
  */
object Extras153 {

  /** C616 analytics_uplift_by_segment — the CATE table of campaign
    * analytics (treatment = discount ≥ 5%, outcome = item returned,
    * segments = quantity decade buckets): per-segment treated/control
    * counts and successes are exact conditional integer sums in ONE
    * corpus pass over the grouped frame; uplift and relative risk are
    * two final divisions per bounded segment row. No per-segment scan,
    * no float before the report.
    */
  def analyticsUpliftBySegment(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).select(
        expr("CAST(floor((l_quantity - 1) / 10) AS BIGINT)").as("segment"),
        expr("CASE WHEN l_discount >= 0.05 THEN 1L ELSE 0L END").as("t"),
        expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END").as("y"))
      .groupBy("segment")
      .agg(sum(col("t")).cast("long").as("n_treat"),
        sum(expr("1L - t")).cast("long").as("n_ctrl"),
        sum(expr("t * y")).cast("long").as("r_treat"),
        sum(expr("(1L - t) * y")).cast("long").as("r_ctrl"))
      .selectExpr("segment", "n_treat", "n_ctrl",
        """round(CAST(r_treat AS DOUBLE) / n_treat
          |  - CAST(r_ctrl AS DOUBLE) / n_ctrl, 6) AS uplift""".stripMargin,
        """round((CAST(r_treat AS DOUBLE) / n_treat)
          |  / (CAST(r_ctrl AS DOUBLE) / n_ctrl), 6) AS rel_risk""".stripMargin)
      .orderBy("segment")
  }
  val analyticsUpliftBySegmentSql: String =
    """WITH v AS (
      |  SELECT CAST(floor((l_quantity - 1) / 10) AS BIGINT) AS segment,
      |    CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS t,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem)
      |SELECT segment,
      |  CAST(sum(t) AS BIGINT) AS n_treat,
      |  CAST(sum(1 - t) AS BIGINT) AS n_ctrl,
      |  round(CAST(sum(t * y) AS DOUBLE) / sum(t)
      |    - CAST(sum((1 - t) * y) AS DOUBLE) / sum(1 - t), 6) AS uplift,
      |  round((CAST(sum(t * y) AS DOUBLE) / sum(t))
      |    / (CAST(sum((1 - t) * y) AS DOUBLE) / sum(1 - t)), 6) AS rel_risk
      |FROM v GROUP BY 1 ORDER BY 1""".stripMargin

  /** C617 time_higuchi_fd — Higuchi fractal dimension of the daily-
    * revenue series, k = 1..5: all curve lengths come from ONE
    * bounded-frame self-join (rn → rn+k pairs, k exploded — calendar
    * cardinality, never corpus), per-(k, offset m) lengths quantized
    * to milli-units as exact integers so the over-m mean is an exact
    * sum + ONE division, the five L̄(k) PIVOT into a single row
    * (conditional max — no float-ordered aggregation anywhere), and
    * the log-log OLS slope is one explicit scalar expression over the
    * five named columns — deterministic by construction. FD = −slope.
    */
  def timeHiguchiFd(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    val rn = bars.withColumn("rn", row_number().over(w).cast("long"))
    val tot = rn.agg(max(col("rn")).as("nd"))
    val b2 = rn.selectExpr("rn AS rn2", "c AS c2")
    val pairs = rn.crossJoin(broadcast(tot))
      .select(col("rn"), col("c"), col("nd"),
        explode(array((1 to 5).map(k => lit(k.toLong)): _*)).as("k"))
      .join(b2, expr("rn2 = rn + k"))
      .selectExpr("k", "((rn - 1) % k) AS m", "abs(c2 - c) AS ad", "nd")
    val lm = pairs.groupBy("k", "m")
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("ad")).cast("decimal(38,0)").as("sad"),
        max(col("nd")).as("nd"))
      // L_m(k) = sad*(nd-1)/(cnt*k^2), milli-quantized to an exact long
      .selectExpr("k",
        """CAST(floor(CAST(sad AS DOUBLE) * (nd - 1)
          |  / (CAST(cnt AS DOUBLE) * k * k) * 1000 + 0.5) AS BIGINT)
          |  AS lq""".stripMargin)
    val lk = lm.groupBy("k")
      .agg(count(lit(1)).cast("long").as("nm"),
        sum(col("lq")).cast("long").as("slq"))
      .selectExpr("k", "CAST(slq AS DOUBLE) / nm / 1000 AS lbar")
    val piv = lk.agg(
      max(expr("CASE WHEN k = 1 THEN lbar END")).as("l1"),
      max(expr("CASE WHEN k = 2 THEN lbar END")).as("l2"),
      max(expr("CASE WHEN k = 3 THEN lbar END")).as("l3"),
      max(expr("CASE WHEN k = 4 THEN lbar END")).as("l4"),
      max(expr("CASE WHEN k = 5 THEN lbar END")).as("l5"))
    piv.selectExpr(
        "ln(l1) AS w1", "ln(l2) AS w2", "ln(l3) AS w3", "ln(l4) AS w4", "ln(l5) AS w5",
        "ln(1.0) AS u1", "ln(0.5) AS u2", "ln(1.0/3) AS u3", "ln(0.25) AS u4", "ln(0.2) AS u5")
      .selectExpr(
        "(u1 + u2 + u3 + u4 + u5) / 5 AS ub",
        "(w1 + w2 + w3 + w4 + w5) / 5 AS wb",
        "u1", "u2", "u3", "u4", "u5", "w1", "w2", "w3", "w4", "w5")
      .selectExpr(
        """((u1 - ub) * (w1 - wb) + (u2 - ub) * (w2 - wb) + (u3 - ub) * (w3 - wb)
          | + (u4 - ub) * (w4 - wb) + (u5 - ub) * (w5 - wb))
          |/ ((u1 - ub) * (u1 - ub) + (u2 - ub) * (u2 - ub) + (u3 - ub) * (u3 - ub)
          | + (u4 - ub) * (u4 - ub) + (u5 - ub) * (u5 - ub)) AS slope""".stripMargin)
      .selectExpr("round(slope, 6) AS higuchi_fd")
  }
  val timeHiguchiFdSql: String =
    """WITH bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |rn AS (
      |  SELECT c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
      |  FROM bars),
      |tot AS (SELECT max(rn) AS nd FROM rn),
      |pairs AS (
      |  SELECT k.k, ((a.rn - 1) % k.k) AS m, abs(b.c - a.c) AS ad, t.nd
      |  FROM rn a, (SELECT unnest([1, 2, 3, 4, 5]) AS k) k, tot t, rn b
      |  WHERE b.rn = a.rn + k.k),
      |lm AS (
      |  SELECT k,
      |    CAST(floor(CAST(CAST(sum(ad) AS DECIMAL(38,0)) AS DOUBLE) * (max(nd) - 1)
      |      / (CAST(count(*) AS DOUBLE) * k * k) * 1000 + 0.5) AS BIGINT) AS lq
      |  FROM pairs GROUP BY k, m),
      |lk AS (
      |  SELECT k, CAST(CAST(sum(lq) AS BIGINT) AS DOUBLE) / count(*) / 1000 AS lbar
      |  FROM lm GROUP BY k),
      |piv AS (
      |  SELECT max(CASE WHEN k = 1 THEN lbar END) AS l1,
      |    max(CASE WHEN k = 2 THEN lbar END) AS l2,
      |    max(CASE WHEN k = 3 THEN lbar END) AS l3,
      |    max(CASE WHEN k = 4 THEN lbar END) AS l4,
      |    max(CASE WHEN k = 5 THEN lbar END) AS l5
      |  FROM lk),
      |logs AS (
      |  SELECT ln(l1) AS w1, ln(l2) AS w2, ln(l3) AS w3, ln(l4) AS w4, ln(l5) AS w5,
      |    ln(1.0) AS u1, ln(0.5) AS u2, ln(1.0/3) AS u3, ln(0.25) AS u4, ln(0.2) AS u5
      |  FROM piv),
      |mb AS (
      |  SELECT (u1 + u2 + u3 + u4 + u5) / 5 AS ub,
      |    (w1 + w2 + w3 + w4 + w5) / 5 AS wb,
      |    u1, u2, u3, u4, u5, w1, w2, w3, w4, w5
      |  FROM logs)
      |SELECT round(
      |  ((u1 - ub) * (w1 - wb) + (u2 - ub) * (w2 - wb) + (u3 - ub) * (w3 - wb)
      |   + (u4 - ub) * (w4 - wb) + (u5 - ub) * (w5 - wb))
      |  / ((u1 - ub) * (u1 - ub) + (u2 - ub) * (u2 - ub) + (u3 - ub) * (u3 - ub)
      |   + (u4 - ub) * (u4 - ub) + (u5 - ub) * (u5 - ub)), 6) AS higuchi_fd
      |FROM mb""".stripMargin

  /** C618 dedup_cross_source_matrix — the provenance diagnostic of
    * corpus curation (which sources copy from which): leading-40-char
    * fingerprints (md5) hash-bucket the corpus in one pass; the pair
    * matrix joins only WITHIN duplicate buckets on the fingerprint
    * equi-key (candidates bounded by bucket sizes — never all-pairs),
    * source-ordered s1 < s2 so each unordered pair counts once.
    * Counts are distinct fingerprints per cell — exact integers end
    * to end.
    */
  def dedupCrossSourceMatrix(s: SparkSession, d: String): DataFrame = {
    val fp = documents(s, d)
      .select(col("source"), md5(expr("substring(text, 1, 40)")).as("fp"))
      .distinct()
    val dupFp = fp.groupBy("fp").agg(count(lit(1)).as("nsrc"))
      .filter(col("nsrc") > 1).select("fp")
    val inBucket = fp.join(dupFp, "fp")
    val pairs = inBucket.as("a")
      .join(inBucket.as("b"),
        expr("a.fp = b.fp AND a.source < b.source"))
      .selectExpr("a.source AS s1", "b.source AS s2", "a.fp AS fp")
      .groupBy("s1", "s2")
      .agg(countDistinct(col("fp")).cast("long").as("shared_fps"))
    pairs.orderBy("s1", "s2")
  }
  val dedupCrossSourceMatrixSql: String =
    """WITH fp AS (
      |  SELECT DISTINCT source, md5(substring(text, 1, 40)) AS fp
      |  FROM documents),
      |dupfp AS (
      |  SELECT fp FROM fp GROUP BY fp HAVING count(*) > 1),
      |inb AS (SELECT f.source, f.fp FROM fp f JOIN dupfp USING (fp))
      |SELECT a.source AS s1, b.source AS s2,
      |  CAST(count(DISTINCT a.fp) AS BIGINT) AS shared_fps
      |FROM inb a JOIN inb b ON a.fp = b.fp AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** C619 stat_runs_updown — the runs test on DIRECTIONS (up/down
    * moves of the daily-revenue series, the trend-vs-noise companion
    * to the above/below-median runs row): zero diffs drop (textbook),
    * the run count is 1 + Σ[sign_t ≠ sign_{t+1}] via one lead over the
    * bounded frame, E = (2n−1)/3 and Var = (16n−29)/90 exact, z in one
    * final double expression.
    */
  def statRunsUpdown(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    val signs = bars
      .withColumn("diff", lead(col("c"), 1).over(w) - col("c"))
      .filter(col("diff").isNotNull && col("diff") =!= 0)
      .withColumn("sgn", expr("CASE WHEN diff > 0 THEN 1 ELSE -1 END"))
    val w2 = org.apache.spark.sql.expressions.Window.orderBy("day")
    signs
      .withColumn("nxt", lead(col("sgn"), 1).over(w2))
      .agg(count(lit(1)).cast("long").as("n_moves"),
        sum(expr("CASE WHEN nxt IS NOT NULL AND nxt <> sgn THEN 1L ELSE 0L END"))
          .cast("long").as("changes"))
      .selectExpr("n_moves", "changes + 1 AS n_runs",
        """round((changes + 1 - (2.0 * n_moves - 1) / 3)
          |  / sqrt((16.0 * n_moves - 29) / 90), 4) AS z_stat""".stripMargin,
        """abs((changes + 1 - (2.0 * n_moves - 1) / 3)
          |  / sqrt((16.0 * n_moves - 29) / 90)) > 1.96 AS reject_random""".stripMargin)
  }
  val statRunsUpdownSql: String =
    """WITH bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |diffs AS (
      |  SELECT day, lead(c, 1) OVER (ORDER BY day) - c AS diff FROM bars),
      |signs AS (
      |  SELECT day, CASE WHEN diff > 0 THEN 1 ELSE -1 END AS sgn
      |  FROM diffs WHERE diff IS NOT NULL AND diff <> 0),
      |nxt AS (
      |  SELECT sgn, lead(sgn, 1) OVER (ORDER BY day) AS nxt FROM signs),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_moves,
      |    CAST(sum(CASE WHEN nxt IS NOT NULL AND nxt <> sgn THEN 1 ELSE 0 END)
      |      AS BIGINT) AS changes
      |  FROM nxt)
      |SELECT n_moves, changes + 1 AS n_runs,
      |  round((changes + 1 - (2.0 * n_moves - 1) / 3)
      |    / sqrt((16.0 * n_moves - 29) / 90), 4) AS z_stat,
      |  abs((changes + 1 - (2.0 * n_moves - 1) / 3)
      |    / sqrt((16.0 * n_moves - 29) / 90)) > 1.96 AS reject_random
      |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_uplift_by_segment" -> (analyticsUpliftBySegment _),
    "time_higuchi_fd" -> (timeHiguchiFd _),
    "dedup_cross_source_matrix" -> (dedupCrossSourceMatrix _),
    "stat_runs_updown" -> (statRunsUpdown _),
  )

  val oracle: Map[String, String] = Map(
    "analytics_uplift_by_segment" -> analyticsUpliftBySegmentSql,
    "time_higuchi_fd" -> timeHiguchiFdSql,
    "dedup_cross_source_matrix" -> dedupCrossSourceMatrixSql,
    "stat_runs_updown" -> statRunsUpdownSql,
  )
}
