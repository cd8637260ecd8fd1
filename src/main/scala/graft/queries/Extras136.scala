package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 36 (C548–C551): weighted reservoir sampling, geohash
  * clustering, prefix-filtered similarity join, and swing-point
  * detection.
  */
object Extras136 {

  /** C548 sample_weighted_reservoir — Efraimidis–Spirakis weighted
    * sampling without replacement, the DISTRIBUTED form: each order
    * draws key = u^(1/w) from its DETERMINISTIC md5-fraction uniform
    * (w = order value in dollars), and the sample is the global
    * top-100 by key — a TakeOrdered, never a sort of the corpus.
    * Selection probability ∝ weight; reproducible across engines,
    * executors, and reruns (no RNG state). The ES key identity makes
    * map-side top-k pruning exact — each partition keeps its local
    * top-100, the driver merges.
    */
  def sampleWeightedReservoir(s: SparkSession, d: String): DataFrame = {
    orders(s, d)
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
      .withColumn("u", expr(
        "conv(substring(md5(concat('esw:', o_orderkey)), 1, 6), 16, 10) / 16777216.0"))
      .withColumn("k", expr("pow(u, 100.0 / cents)"))
      .orderBy(col("k").desc, col("o_orderkey"))
      .limit(100)
      .selectExpr("o_orderkey",
        "round(CAST(cents AS DOUBLE) / 100, 6) AS weight",
        "round(k, 9) AS es_key")
  }
  val sampleWeightedReservoirSql: String =
    """WITH keyed AS (
      |  SELECT o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents,
      |    pow(CAST('0x' || substr(md5('esw:' || o_orderkey), 1, 6) AS BIGINT)
      |      / 16777216.0, 100.0 /
      |      CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS k
      |  FROM orders)
      |SELECT o_orderkey, round(CAST(cents AS DOUBLE) / 100, 6) AS weight,
      |  round(k, 9) AS es_key
      |FROM keyed ORDER BY k DESC, o_orderkey LIMIT 100""".stripMargin

  /** C549 geo_geohash_cluster — standard base-32 geohash (precision
    * 6 = 30 bits) over the event-derived lon/lat field, top-20 cells
    * by density: 15-bit lat/lon quantization (floor of an exact
    * product — identical doubles both engines), bit interleaving via
    * an integer HOF fold (lon on even bit positions from the MSB, per
    * the geohash spec), base-32 digits by substring lookup. All
    * integer arithmetic after the two floors; the top-20 is a
    * TakeOrdered above a cell group-by.
    */
  def geoGeohashCluster(s: SparkSession, d: String): DataFrame = {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    val pts = events(s, d).select(
        (col("value") % 360.0 - lit(180.0)).as("lon"),
        ((col("user_id") % 180).cast("double") - lit(90.0)).as("lat"))
      .selectExpr(
        "CAST(floor((lon + 180) / 360 * 32768) AS BIGINT) AS lonb",
        "CAST(floor((lat + 90) / 180 * 32768) AS BIGINT) AS latb")
      .selectExpr(
        """aggregate(sequence(0, 14), 0L, (acc, k) ->
          |  acc + shiftleft(shiftright(lonb, k) % 2, 2 * k + 1)
          |      + shiftleft(shiftright(latb, k) % 2, 2 * k)) AS code""".stripMargin)
      .selectExpr(
        s"""concat(
           |  substring('$alpha', CAST(shiftright(code, 25) % 32 AS INT) + 1, 1),
           |  substring('$alpha', CAST(shiftright(code, 20) % 32 AS INT) + 1, 1),
           |  substring('$alpha', CAST(shiftright(code, 15) % 32 AS INT) + 1, 1),
           |  substring('$alpha', CAST(shiftright(code, 10) % 32 AS INT) + 1, 1),
           |  substring('$alpha', CAST(shiftright(code, 5) % 32 AS INT) + 1, 1),
           |  substring('$alpha', CAST(code % 32 AS INT) + 1, 1)) AS geohash""".stripMargin)
    pts.groupBy("geohash").agg(count(lit(1)).cast("long").as("n_events"))
      .orderBy(col("n_events").desc, col("geohash"))
      .limit(20)
  }
  val geoGeohashClusterSql: String = {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    s"""WITH pts AS (
       |  SELECT CAST(floor((value % 360.0 - 180.0 + 180) / 360 * 32768)
       |      AS BIGINT) AS lonb,
       |    CAST(floor((CAST(user_id % 180 AS DOUBLE) - 90.0 + 90) / 180 * 32768)
       |      AS BIGINT) AS latb
       |  FROM events),
       |codes AS (
       |  SELECT list_reduce(list_transform(generate_series(0, 14), k ->
       |      ((lonb >> k) % 2) * (CAST(2 AS BIGINT) << (2 * k))
       |      + ((latb >> k) % 2) * (CAST(1 AS BIGINT) << (2 * k))),
       |    (a, b) -> a + b) AS code
       |  FROM pts),
       |gh AS (
       |  SELECT substr('$alpha', CAST((code >> 25) % 32 AS INT) + 1, 1)
       |    || substr('$alpha', CAST((code >> 20) % 32 AS INT) + 1, 1)
       |    || substr('$alpha', CAST((code >> 15) % 32 AS INT) + 1, 1)
       |    || substr('$alpha', CAST((code >> 10) % 32 AS INT) + 1, 1)
       |    || substr('$alpha', CAST((code >> 5) % 32 AS INT) + 1, 1)
       |    || substr('$alpha', CAST(code % 32 AS INT) + 1, 1) AS geohash
       |  FROM codes)
       |SELECT geohash, CAST(count(*) AS BIGINT) AS n_events
       |FROM gh GROUP BY 1 ORDER BY n_events DESC, geohash LIMIT 20""".stripMargin
  }

  /** C550 dedup_prefix_filter_join — PPJoin-style PREFIX-FILTERED
    * similarity join, the third candidate-generation tier beside
    * MinHash banding and SimHash bands: each doc's trigram set is
    * ordered by global rarity (df asc, term), the first
    * sz − ⌈0.6·sz⌉ + 1 tokens (integer-exact: sz − (6·sz+9) div 10 + 1)
    * form its prefix, and two docs are candidates only if their
    * prefixes SHARE a token (an equi-join on the token — provably
    * COMPLETE for Jaccard ≥ 0.6 by pigeonhole: disjoint prefixes bound
    * the overlap below the threshold). Candidates then verify by exact
    * intersection counting.
    *
    * This row runs the miner LIVE as the graded exhibit of the prefix
    * tier, over the SHARED staged shingle aggregates ([[ShingleStage]]
    * sizes/dfreq — r9 recomputed the exploded trigram frame's shuffles
    * three times; the staged route computes each once per corpus). The
    * C5 `dedup_ngram_jaccard` row reads the STAGED pair artifact of
    * this same miner — production shape vs live exhibit. Candidate
    * count is spec-checked far below n²/2 and pigeonhole completeness
    * is spec-checked against the staged true pair set (Extras136Spec).
    */
  def dedupPrefixFilterJoin(s: SparkSession, d: String): DataFrame =
    DedupExtras.mineNgramJaccardAt(s, d, 6, 10)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  val dedupPrefixFilterJoinSql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
      |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS g
      |  FROM documents)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |    / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |    / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin

  /** C551 win_swing_points — swing-high/low detection on daily
    * revenue: a day is a swing high when it STRICTLY exceeds every
    * neighbor in its ±3-day window (the strict test on the split
    * prev/next frames — C493's EXCLUDE CURRENT ROW emulation — makes
    * tie-disqualification automatic), symmetrically for lows. Both
    * flank frames must be full. All comparisons exact integer cents.
    */
  def winSwingPoints(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val prev = Window.orderBy("day").rowsBetween(-3, -1)
    val next = Window.orderBy("day").rowsBetween(1, 3)
    daily
      .withColumn("pmax", max(col("c")).over(prev))
      .withColumn("nmax", max(col("c")).over(next))
      .withColumn("pmin", min(col("c")).over(prev))
      .withColumn("nmin", min(col("c")).over(next))
      .withColumn("pcnt", count(lit(1)).over(prev))
      .withColumn("ncnt", count(lit(1)).over(next))
      .filter(col("pcnt") === 3 && col("ncnt") === 3)
      .withColumn("kind",
        when(col("c") > col("pmax") && col("c") > col("nmax"), "swing_high")
          .when(col("c") < col("pmin") && col("c") < col("nmin"), "swing_low"))
      .filter(col("kind").isNotNull)
      .selectExpr("day", "kind", "round(CAST(c AS DOUBLE) / 100, 6) AS revenue")
      .orderBy("day")
  }
  val winSwingPointsSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |w AS (
      |  SELECT day, c,
      |    max(c) OVER p AS pmax, max(c) OVER n AS nmax,
      |    min(c) OVER p AS pmin, min(c) OVER n AS nmin,
      |    count(*) OVER p AS pcnt, count(*) OVER n AS ncnt
      |  FROM daily
      |  WINDOW p AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING),
      |         n AS (ORDER BY day ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING))
      |SELECT day,
      |  CASE WHEN c > pmax AND c > nmax THEN 'swing_high'
      |    ELSE 'swing_low' END AS kind,
      |  round(CAST(c AS DOUBLE) / 100, 6) AS revenue
      |FROM w
      |WHERE pcnt = 3 AND ncnt = 3
      |  AND ((c > pmax AND c > nmax) OR (c < pmin AND c < nmin))
      |ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_weighted_reservoir" -> (sampleWeightedReservoir _),
    "geo_geohash_cluster" -> (geoGeohashCluster _),
    "dedup_prefix_filter_join" -> (dedupPrefixFilterJoin _),
    "win_swing_points" -> (winSwingPoints _),
  )

  val oracle: Map[String, String] = Map(
    "sample_weighted_reservoir" -> sampleWeightedReservoirSql,
    "geo_geohash_cluster" -> geoGeohashClusterSql,
    "dedup_prefix_filter_join" -> dedupPrefixFilterJoinSql,
    "win_swing_points" -> winSwingPointsSql,
  )
}
