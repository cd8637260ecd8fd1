package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 19 (C470–C474): vocabulary coverage curves, token entropy,
  * experiment health checks, class-balanced sampling, and track-speed
  * QC.
  */
object Extras119 {

  /** C470 text_topk_coverage — the Zipf COVERAGE CURVE: what share of
    * all token occurrences do the top-k vocabulary entries cover, at
    * k ∈ {1, 5, 10, 25, 100}? Drives tokenizer/vocab sizing. Shape:
    * one token count aggregate (map-side combinable), then rank +
    * running share over the O(vocab) frame — the empty-partition
    * window sits above the aggregate, the shape the plan gate's rule
    * recognizes. k rows beyond the vocab size are absent in BOTH
    * engines (same rank filter).
    */
  def textTopkCoverage(s: SparkSession, d: String): DataFrame = {
    val counts = documents(s, d)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("term").asc)
    val wc = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val total = counts.agg(sum(col("cnt")).cast("long").as("total"))
    // only ranks <= 100 survive the filter: pre-prune the O(vocab)
    // frame with a distributed top-k (TakeOrderedAndProject — map-side
    // partial top-100 per partition), so the rank/cum window runs over
    // a LIMIT-bounded 100-row frame, never the whole vocabulary
    counts.orderBy(col("cnt").desc, col("term").asc).limit(100)
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("cnt")).over(wc).cast("long"))
      .filter(col("rk").isin(1L, 5L, 10L, 25L, 100L))
      .crossJoin(broadcast(total))
      .select(col("rk").as("k"), col("cum").as("covered"), col("total"),
        round(col("cum").cast("double") / col("total"), 6).as("share"))
      .orderBy("k")
  }
  val textTopkCoverageSql: String =
    """WITH counts AS (
      |  SELECT term, count(*) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY term),
      |ranked AS (
      |  SELECT cnt,
      |    row_number() OVER (ORDER BY cnt DESC, term ASC) AS rk,
      |    sum(cnt) OVER (ORDER BY cnt DESC, term ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM counts),
      |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts)
      |SELECT rk AS k, CAST(cum AS BIGINT) AS covered, t.total,
      |  round(CAST(cum AS DOUBLE) / t.total, 6) AS share
      |FROM ranked CROSS JOIN t
      |WHERE rk IN (1, 5, 10, 25, 100)
      |ORDER BY k""".stripMargin

  /** C471 text_token_entropy — per-document TOKEN ENTROPY (the
    * repetitive-document quality filter: low entropy = boilerplate or
    * token loops), histogrammed per language in 0.5-bit bands.
    * Determinism: entropy = log2(n) − (Σ c·log2(c))/n where the c are
    * integer token counts — the Σ runs over a per-doc GROUP-BY frame,
    * so instead of an order-sensitive float sum the per-(doc, token)
    * terms round to a 1e-9 fixed-point grain and sum as EXACT BIGINTs
    * (the micro-cents discipline); libm log2 differences (~1e-16
    * relative) vanish under the grain. One explode + two keyed
    * aggregates; the band histogram is O(langs × bands).
    */
  def textTokenEntropy(s: SparkSession, d: String): DataFrame = {
    val tok = documents(s, d)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("term"))
    val perTerm = tok.groupBy("doc_id", "lang", "term")
      .agg(count(lit(1)).as("c"))
      .select(col("doc_id"), col("lang"), col("c"),
        expr("CAST(floor(c * log2(c) * 1000000000 + 0.5) AS BIGINT)").as("fx"))
    perTerm.groupBy("doc_id", "lang")
      .agg(sum(col("c")).cast("long").as("n"),
        sum(col("fx")).cast("long").as("sfx"))
      .withColumn("entropy",
        round(log2(col("n")) - col("sfx").cast("double") / 1e9 / col("n"), 6))
      .withColumn("band", floor(col("entropy") * 2).cast("long"))
      .groupBy("lang", "band")
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("entropy")), 6).as("min_entropy"),
        round(max(col("entropy")), 6).as("max_entropy"))
      .orderBy("lang", "band")
  }
  val textTokenEntropySql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |perterm AS (
      |  SELECT doc_id, lang, count(*) AS c,
      |    CAST(floor(count(*) * log2(count(*)) * 1000000000 + 0.5) AS BIGINT) AS fx
      |  FROM tok GROUP BY doc_id, lang, term),
      |perdoc AS (
      |  SELECT doc_id, lang,
      |    CAST(sum(c) AS BIGINT) AS n, CAST(sum(fx) AS BIGINT) AS sfx
      |  FROM perterm GROUP BY doc_id, lang),
      |e AS (
      |  SELECT lang,
      |    round(log2(n) - CAST(sfx AS DOUBLE) / 1e9 / n, 6) AS entropy
      |  FROM perdoc)
      |SELECT lang, CAST(floor(entropy * 2) AS BIGINT) AS band,
      |  count(*) AS n_docs,
      |  round(min(entropy), 6) AS min_entropy,
      |  round(max(entropy), 6) AS max_entropy
      |FROM e GROUP BY 1, 2 ORDER BY lang, band""".stripMargin

  /** C472 stat_ab_srm — the SAMPLE-RATIO-MISMATCH health check every
    * experimentation platform runs before reading an A/B test: users
    * hash-assigned 50/50 (deterministic md5 fraction — the assignment
    * IS the production mechanism, not a simulation), then the 1-dof
    * chi-square (n_a−n_b)²/(n_a+n_b) in exact integers with one final
    * IEEE division. A large statistic means the assignment plumbing is
    * dropping one arm's traffic. One distinct + one aggregate.
    */
  def statAbSrm(s: SparkSession, d: String): DataFrame =
    events(s, d).select(col("user_id")).distinct()
      .withColumn("arm_a",
        conv(substring(md5(col("user_id").cast("string")), 1, 6), 16, 10)
          .cast("double") / lit(16777216.0) < 0.5)
      .agg(
        sum(when(col("arm_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("arm_a"), 1L).otherwise(0L)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        round(((col("n_a") - col("n_b")) * (col("n_a") - col("n_b"))).cast("double")
          / expr("nullif(n_a + n_b, 0)").cast("double"), 6).as("srm_chi2"))
  val statAbSrmSql: String =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |arms AS (
      |  SELECT CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 6) AS BIGINT)
      |    AS DOUBLE) / 16777216.0 < 0.5 AS arm_a FROM u),
      |agg AS (
      |  SELECT CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |         CAST(sum(CASE WHEN NOT arm_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM arms)
      |SELECT n_a, n_b,
      |  round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
      |    / CAST(nullif(n_a + n_b, 0) AS DOUBLE), 6) AS srm_chi2
      |FROM agg""".stripMargin

  /** C473 sample_class_balance — BALANCED per-class downsampling: every
    * language keeps exactly min-class-count documents, chosen by a
    * deterministic md5 rank within the class (reproducible across
    * engines/reruns — the C319 discipline applied to rank order).
    * Shape: one per-class count, a 1-row broadcast of the min, one
    * class-partitioned window — no corpus-global ordering anywhere.
    * The under-represented class is kept whole; the rest shed their
    * tail. Outputs the per-class before/after profile.
    */
  def sampleClassBalance(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val minCount = documents(s, d).groupBy("lang").agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("min_n"))
    documents(s, d)
      .withColumn("rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(minCount))
      .withColumn("kept", col("rk") <= col("min_n"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_after"),
        sum(when(col("kept"), col("n_chars")).otherwise(0L)).cast("long")
          .as("chars_after"))
      .orderBy("lang")
  }
  val sampleClassBalanceSql: String =
    """WITH mn AS (
      |  SELECT min(n) AS min_n FROM (
      |    SELECT count(*) AS n FROM documents GROUP BY lang)),
      |ranked AS (
      |  SELECT lang, n_chars,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |SELECT lang, count(*) AS n_before,
      |  CAST(sum(CASE WHEN rk <= mn.min_n THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
      |  CAST(sum(CASE WHEN rk <= mn.min_n THEN n_chars ELSE 0 END) AS BIGINT)
      |    AS chars_after
      |FROM ranked CROSS JOIN mn
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** C474 ref_track_speed_qc — the IMPOSSIBLE-SPEED QC between
    * consecutive fixes of a platform track (the reference's
    * cruise-track screening): leg speed = haversine km (3 dp, the C?
    * geo row's exact-decimal discipline) over the exact-µs time gap;
    * legs above 200 km/h flag. Per-device window (partitioned, never
    * global), report = the 20 devices with the most violations.
    */
  def refTrackSpeedQc(s: SparkSession, d: String): DataFrame = {
    val pts = events(s, d).select(col("user_id"), col("ts"), col("event_id"),
      floor(col("value") % 360 - 180).cast("double").as("lon"),
      floor((col("event_id") * 7919L) % 180 - 90).cast("double").as("lat"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val legs = pts
      .withColumn("plon", lag("lon", 1).over(w))
      .withColumn("plat", lag("lat", 1).over(w))
      .withColumn("pts", lag("ts", 1).over(w))
      .filter(col("plon").isNotNull)
    val a = pow(sin(radians((col("lat") - col("plat")) / 2)), 2) +
      cos(radians(col("plat"))) * cos(radians(col("lat"))) *
        pow(sin(radians((col("lon") - col("plon")) / 2)), 2)
    legs
      .withColumn("leg_km", round(lit(2 * 6371.0088) * asin(least(lit(1.0), sqrt(a))), 3))
      .withColumn("gap_h",
        expr("unix_micros(cast(ts AS TIMESTAMP)) - unix_micros(cast(pts AS TIMESTAMP))")
          .cast("double") / 3600000000.0)
      .withColumn("kmh", col("leg_km") / expr("nullif(gap_h, 0.0)"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_legs"),
        sum(when(col("kmh") > 200.0, 1L).otherwise(0L)).as("n_impossible"),
        round(max(col("kmh")), 3).as("max_kmh"))
      .orderBy(col("n_impossible").desc, col("user_id").asc)
      .limit(20)
  }
  val refTrackSpeedQcSql: String =
    """WITH pts AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(floor(value % 360 - 180) AS DOUBLE) AS lon,
      |    CAST(floor((event_id * 7919) % 180 - 90) AS DOUBLE) AS lat
      |  FROM events),
      |legs AS (
      |  SELECT user_id, ts, lat, lon,
      |    lag(lon) OVER w AS plon, lag(lat) OVER w AS plat, lag(ts) OVER w AS pts
      |  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |scored AS (
      |  SELECT user_id,
      |    round(2 * 6371.0088 * asin(least(1.0,
      |      sqrt(pow(sin(radians((lat - plat) / 2)), 2)
      |        + cos(radians(plat)) * cos(radians(lat))
      |          * pow(sin(radians((lon - plon) / 2)), 2)))), 3)
      |    / nullif(CAST(epoch_us(ts) - epoch_us(pts) AS DOUBLE) / 3600000000.0, 0.0)
      |      AS kmh
      |  FROM legs WHERE plon IS NOT NULL)
      |SELECT user_id, count(*) AS n_legs,
      |  CAST(sum(CASE WHEN kmh > 200.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_impossible,
      |  round(max(kmh), 3) AS max_kmh
      |FROM scored GROUP BY user_id
      |ORDER BY n_impossible DESC, user_id ASC LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_topk_coverage" -> (textTopkCoverage _),
    "text_token_entropy" -> (textTokenEntropy _),
    "stat_ab_srm" -> (statAbSrm _),
    "sample_class_balance" -> (sampleClassBalance _),
    "ref_track_speed_qc" -> (refTrackSpeedQc _),
  )

  val oracle: Map[String, String] = Map(
    "text_topk_coverage" -> textTopkCoverageSql,
    "text_token_entropy" -> textTokenEntropySql,
    "stat_ab_srm" -> statAbSrmSql,
    "sample_class_balance" -> sampleClassBalanceSql,
    "ref_track_speed_qc" -> refTrackSpeedQcSql,
  )
}
