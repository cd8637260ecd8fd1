package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 39 (C560–C563): Shapley channel attribution, perceptual-hash
  * media dedup, a quantized weekly spectrum, and purged k-fold
  * time-series splitting.
  */
object Extras139 {

  /** C560 analytics_shapley_attribution — exact Shapley values for the
    * four marketing channels (click/signup/view/error; outcome =
    * purchase) under the explainability game v(S) = converters whose
    * channel set ⊆ S. The per-user channel BITMASK is one conditional
    * aggregate; v materializes for all 16 coalitions by exploding each
    * mask's ≤16 supersets (equi-shuffle, never a θ-join); the Shapley
    * sum runs over 8 subsets/channel with weights |S|!·(3−|S|)! — an
    * INTEGER in 24ths (exact; one final division). Efficiency
    * (Σφ = v(N) − v(∅)) is spec-asserted.
    */
  def analyticsShapleyAttribution(s: SparkSession, d: String): DataFrame = {
    val userMask = events(s, d).groupBy("user_id").agg(
      (max(when(col("event_type") === "click", 1L).otherwise(0L)) +
        max(when(col("event_type") === "signup", 2L).otherwise(0L)) * 1L +
        max(when(col("event_type") === "view", 4L).otherwise(0L)) +
        max(when(col("event_type") === "error", 8L).otherwise(0L))).as("mask"),
      max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
    val cnt = userMask.filter(col("conv") === 1L)
      .groupBy("mask").agg(count(lit(1)).cast("long").as("cm"))
    // v(S) = Σ_{m ⊆ S} cm(m): each mask row fans out to its supersets
    // S = m | t over the 16 complement subsets t — bounded explode
    val v = cnt.select(col("cm"), explode(expr(
        """filter(sequence(0, 15), t -> (t & mask) = 0)""")).as("t"),
        col("mask"))
      .selectExpr("CAST(mask + t AS BIGINT) AS S", "cm") // disjoint bits: | == +
      .groupBy("S").agg(sum(col("cm")).cast("long").as("v"))
    val channels = s.range(1)
      .select(explode(expr(
        """array(named_struct('channel', 'click', 'bit', 1L),
          |  named_struct('channel', 'signup', 'bit', 2L),
          |  named_struct('channel', 'view', 'bit', 4L),
          |  named_struct('channel', 'error', 'bit', 8L))""".stripMargin)).as("c"))
      .select(col("c.channel").as("channel"), col("c.bit").as("bit"))
    val terms = channels
      .select(col("channel"), col("bit"), explode(expr(
        "filter(sequence(0, 15), S -> (S & bit) = 0)")).as("S"))
      .join(v.selectExpr("S", "v AS v0"), Seq("S"), "left")
      .join(v.selectExpr("S AS S1", "v AS v1"),
        expr("S + bit = S1"), "left")
      .selectExpr("channel",
        """CASE bit_count(S) WHEN 0 THEN 6L WHEN 1 THEN 2L
          |  WHEN 2 THEN 2L ELSE 6L END
          |  * (coalesce(v1, 0L) - coalesce(v0, 0L)) AS term_fx""".stripMargin)
    terms.groupBy("channel")
      .agg(sum(col("term_fx")).cast("long").as("shapley_fx24"))
      .selectExpr("channel", "shapley_fx24",
        "round(CAST(shapley_fx24 AS DOUBLE) / 24, 6) AS shapley_conversions")
      .orderBy("channel")
  }
  val analyticsShapleyAttributionSql: String =
    """WITH um AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |    + max(CASE WHEN event_type = 'signup' THEN 2 ELSE 0 END)
      |    + max(CASE WHEN event_type = 'view' THEN 4 ELSE 0 END)
      |    + max(CASE WHEN event_type = 'error' THEN 8 ELSE 0 END) AS mask,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |cnt AS (
      |  SELECT mask, CAST(count(*) AS BIGINT) AS cm
      |  FROM um WHERE conv = 1 GROUP BY mask),
      |v AS (
      |  SELECT CAST(mask + u.t AS BIGINT) AS S, CAST(sum(cm) AS BIGINT) AS v
      |  FROM cnt, unnest(generate_series(0, 15)) AS u(t)
      |  WHERE (u.t & mask) = 0
      |  GROUP BY 1),
      |ch AS (
      |  SELECT * FROM (VALUES ('click', 1), ('signup', 2),
      |    ('view', 4), ('error', 8)) AS t(channel, cbit)),
      |pairs AS (
      |  SELECT channel, cbit, u.S AS S
      |  FROM ch, unnest(generate_series(0, 15)) AS u(S)
      |  WHERE (u.S & cbit) = 0),
      |terms AS (
      |  SELECT channel,
      |    CASE bit_count(CAST(p.S AS BIGINT)) WHEN 0 THEN 6 WHEN 1 THEN 2
      |      WHEN 2 THEN 2 ELSE 6 END
      |    * (coalesce(v1.v, 0) - coalesce(v0.v, 0)) AS term_fx
      |  FROM pairs p
      |  LEFT JOIN v v0 ON v0.S = p.S
      |  LEFT JOIN v v1 ON v1.S = p.S + p.cbit)
      |SELECT channel, CAST(sum(term_fx) AS BIGINT) AS shapley_fx24,
      |  round(CAST(CAST(sum(term_fx) AS BIGINT) AS DOUBLE) / 24, 6)
      |    AS shapley_conversions
      |FROM terms GROUP BY channel ORDER BY channel""".stripMargin

  /** C561 multimodal_ahash_near_dup — average-hash perceptual
    * signatures over the media payload bytes: 63 equal byte chunks per
    * doc (integer boundaries (k·n) div 63 — 63 bits, because a 64th
    * bit at position 63 overflows DuckDB's checked `<<` while Spark
    * wraps: a measured cross-engine trap), bit k set when the chunk's
    * byte sum beats the global mean CROSS-MULTIPLIED (sum_k·n >
    * total·len_k — no division). Graded output: the 20 closest pairs
    * of the FIXED 500-doc probe sample by bit_count(xor) — the
    * signature-quality evaluation shape of
    * dedup_simhash_hamming_profile (probe² is O(1) in the corpus).
    * MEASURED floor on this corpus: word-level edit noise lands true
    * near-dups at hamming 9–15 (positional chunks shift under
    * insertions), so a banded ≤7 join — exact by pigeonhole and the
    * scale path for re-encoded/pixel-identical media — returns empty
    * here; the probe top-k grades the signature itself instead. The
    * per-doc pass is one HOF chain over the char array (split once,
    * slice is O(1); Spark's split('') emits a trailing "" the slice
    * drops).
    */
  def multimodalAhashNearDup(s: SparkSession, d: String): DataFrame = {
    val hashed = documents(s, d)
      .filter(col("doc_id") < 500)
      .withColumn("n", length(col("text")).cast("long"))
      .withColumn("vals", expr(
        "transform(slice(split(text, ''), 1, CAST(n AS INT)), ch -> ascii(ch))"))
      .withColumn("total", expr("aggregate(vals, 0L, (a, x) -> a + x)"))
      .withColumn("h", expr(
        """aggregate(sequence(0, 62), 0L, (acc, k) -> acc + shiftleft(
          |  CASE WHEN ((k + 1) * n) div 63 > (k * n) div 63 AND
          |    aggregate(slice(vals, CAST((k * n) div 63 AS INT) + 1,
          |      CAST(((k + 1) * n) div 63 - (k * n) div 63 AS INT)),
          |      0L, (a, x) -> a + x) * n
          |    > total * (((k + 1) * n) div 63 - (k * n) div 63)
          |  THEN 1L ELSE 0L END, k))""".stripMargin))
      .select(col("doc_id"), col("h"))
    hashed.select(col("doc_id").as("doc_a"), col("h").as("ha"))
      .join(hashed.select(col("doc_id").as("doc_b"), col("h").as("hb")),
        col("doc_a") < col("doc_b"))
      .selectExpr("doc_a", "doc_b",
        "CAST(bit_count(ha ^ hb) AS BIGINT) AS hamming")
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      .limit(20)
  }
  val multimodalAhashNearDupSql: String =
    """WITH hashed AS (
      |  SELECT doc_id,
      |    list_reduce(list_transform(generate_series(0, 62), k ->
      |      CASE WHEN ((k + 1) * n) // 63 > (k * n) // 63 AND
      |        list_aggregate(vals[CAST((k * n) // 63 AS BIGINT) + 1 :
      |          CAST(((k + 1) * n) // 63 AS BIGINT)], 'sum') * n
      |        > total * (((k + 1) * n) // 63 - (k * n) // 63)
      |      THEN CAST(1 AS BIGINT) << k ELSE CAST(0 AS BIGINT) END),
      |      (a, b) -> a + b) AS h
      |  FROM (
      |    SELECT doc_id,
      |      list_transform(generate_series(1, strlen(text)),
      |        p -> ascii(text[p])) AS vals,
      |      CAST(strlen(text) AS BIGINT) AS n,
      |      CAST(list_aggregate(list_transform(generate_series(1, strlen(text)),
      |        p -> ascii(text[p])), 'sum') AS BIGINT) AS total
      |    FROM documents WHERE doc_id < 500))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
      |FROM hashed a JOIN hashed b ON a.doc_id < b.doc_id
      |ORDER BY hamming, doc_a, doc_b LIMIT 20""".stripMargin

  private val SpecQ: Seq[(Seq[Long], Seq[Long])] = (1 to 3).map { k =>
    val cs = (0 to 6).map(dd =>
      math.round(math.cos(2 * math.Pi * k * dd / 7) * 1e9))
    val sn = (0 to 6).map(dd =>
      math.round(math.sin(2 * math.Pi * k * dd / 7) * 1e9))
    (cs, sn)
  }

  /** C562 time_dow_spectrum — 7-point DFT power spectrum of the
    * weekly revenue profile. The twiddle factors are NANO-QUANTIZED
    * CONSTANTS generated once in Scala and injected into BOTH engines'
    * expressions (transcendental parity is structurally impossible to
    * lose), so a_k = Σ_d s_d·cos_fx[k,d] is an exact DECIMAL dot
    * product over the 7 day-of-week totals; powers square in DOUBLE
    * (same fixed chain), relative power + spectral entropy assemble in
    * one ordered expression. Day-of-week via datediff-mod-7 from a
    * fixed epoch — immune to the Spark↔DuckDB dayofweek offset.
    */
  def timeDowSpectrum(s: SparkSession, d: String): DataFrame = {
    val dow = lineitem(s, d)
      .groupBy(expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE'1992-01-06') % 7 AS BIGINT)").as("dw"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("sd"))
    def dot(coef: Seq[Long]): String =
      (0 to 6).map(dd =>
        s"sum(CASE WHEN dw = $dd THEN CAST(sd AS DECIMAL(38,0)) * ${coef(dd)} ELSE CAST(0 AS DECIMAL(38,0)) END)")
        .mkString(" + ")
    val aggs = (1 to 3).flatMap { k =>
      val (cs, sn) = SpecQ(k - 1)
      Seq(s"CAST(${dot(cs)} AS DOUBLE) AS a$k", s"CAST(${dot(sn)} AS DOUBLE) AS b$k")
    }
    val powers = dow.selectExpr(aggs: _*)
      .selectExpr((1 to 3).map(k => s"a$k * a$k + b$k * b$k AS p$k"): _*)
      .selectExpr("p1", "p2", "p3", "p1 + p2 + p3 AS pt")
    powers.selectExpr(
      "round(p1 / pt, 6) AS rel_power_1",
      "round(p2 / pt, 6) AS rel_power_2",
      "round(p3 / pt, 6) AS rel_power_3",
      """round(-((CASE WHEN p1 > 0 THEN p1 / pt * ln(p1 / pt) ELSE 0.0 END)
        |  + (CASE WHEN p2 > 0 THEN p2 / pt * ln(p2 / pt) ELSE 0.0 END)
        |  + (CASE WHEN p3 > 0 THEN p3 / pt * ln(p3 / pt) ELSE 0.0 END)), 6)
        |  AS spectral_entropy""".stripMargin)
  }
  val timeDowSpectrumSql: String = {
    def dot(coef: Seq[Long]): String =
      (0 to 6).map(dd =>
        s"sum(CASE WHEN dw = $dd THEN CAST(sd AS DECIMAL(38,0)) * ${coef(dd)} ELSE CAST(0 AS DECIMAL(38,0)) END)")
        .mkString(" + ")
    val aggs = (1 to 3).flatMap { k =>
      val (cs, sn) = SpecQ(k - 1)
      Seq(s"CAST(${dot(cs)} AS DOUBLE) AS a$k", s"CAST(${dot(sn)} AS DOUBLE) AS b$k")
    }.mkString(",\n      |    ")
    s"""WITH dow AS (
       |  SELECT CAST(date_diff('day', DATE '1992-01-06',
       |      CAST(l_shipdate AS DATE)) % 7 AS BIGINT) AS dw,
       |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
       |      AS BIGINT)) AS BIGINT) AS sd
       |  FROM lineitem GROUP BY 1),
       |ab AS (
       |  SELECT $aggs
       |  FROM dow),
       |pw AS (
       |  SELECT a1 * a1 + b1 * b1 AS p1, a2 * a2 + b2 * b2 AS p2,
       |    a3 * a3 + b3 * b3 AS p3,
       |    a1 * a1 + b1 * b1 + a2 * a2 + b2 * b2 + a3 * a3 + b3 * b3 AS pt
       |  FROM ab)
       |SELECT round(p1 / pt, 6) AS rel_power_1,
       |  round(p2 / pt, 6) AS rel_power_2,
       |  round(p3 / pt, 6) AS rel_power_3,
       |  round(-((CASE WHEN p1 > 0 THEN p1 / pt * ln(p1 / pt) ELSE 0.0 END)
       |    + (CASE WHEN p2 > 0 THEN p2 / pt * ln(p2 / pt) ELSE 0.0 END)
       |    + (CASE WHEN p3 > 0 THEN p3 / pt * ln(p3 / pt) ELSE 0.0 END)), 6)
       |    AS spectral_entropy
       |FROM pw""".stripMargin
  }

  /** C563 sample_kfold_purged — purged k-fold splitting for
    * time-series training (the leakage-safe CV scheme): 5 contiguous
    * day blocks, a ±3-day EMBARGO around each test block excluded
    * from that fold's train set. Fold bounds derive from integer
    * arithmetic on the day index (fold = ((t−1)·5) div n); the
    * classification is a 5×n_days bounded fan-out (explode of the
    * 5 fold ids — linear, no self-join). Census + exact test-revenue
    * checksum per fold.
    */
  def sampleKfoldPurged(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .withColumn("t", row_number().over(Window.orderBy("day")).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
    daily
      .select(col("t"), col("n"), col("c"),
        explode(expr("sequence(0L, 4L)")).as("fold"))
      .selectExpr("fold", "c",
        "(fold * n) div 5 + 1 AS lo", "((fold + 1) * n) div 5 AS hi", "t")
      .selectExpr("fold", "c",
        """CASE WHEN t >= lo AND t <= hi THEN 'test'
          |  WHEN t >= lo - 3 AND t <= hi + 3 THEN 'embargo'
          |  ELSE 'train' END AS role""".stripMargin)
      .groupBy("fold")
      .agg(
        sum(when(col("role") === "test", 1L).otherwise(0L)).cast("long").as("n_test"),
        sum(when(col("role") === "embargo", 1L).otherwise(0L)).cast("long").as("n_embargo"),
        sum(when(col("role") === "train", 1L).otherwise(0L)).cast("long").as("n_train"),
        sum(when(col("role") === "test", col("c")).otherwise(0L)).cast("long").as("test_cents"))
      .selectExpr("fold", "n_test", "n_embargo", "n_train",
        "round(CAST(test_cents AS DOUBLE) / 100, 6) AS test_revenue")
      .orderBy("fold")
  }
  val sampleKfoldPurgedSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |idx AS (
      |  SELECT c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
      |    CAST(count(*) OVER () AS BIGINT) AS n
      |  FROM daily),
      |fanned AS (
      |  SELECT fold, c, t,
      |    (fold * n) // 5 + 1 AS lo, ((fold + 1) * n) // 5 AS hi
      |  FROM idx, unnest(generate_series(CAST(0 AS BIGINT),
      |    CAST(4 AS BIGINT))) AS u(fold)),
      |roles AS (
      |  SELECT fold, c,
      |    CASE WHEN t >= lo AND t <= hi THEN 'test'
      |      WHEN t >= lo - 3 AND t <= hi + 3 THEN 'embargo'
      |      ELSE 'train' END AS role
      |  FROM fanned)
      |SELECT fold,
      |  CAST(sum(CASE WHEN role = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
      |  CAST(sum(CASE WHEN role = 'embargo' THEN 1 ELSE 0 END) AS BIGINT) AS n_embargo,
      |  CAST(sum(CASE WHEN role = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
      |  round(CAST(CAST(sum(CASE WHEN role = 'test' THEN c ELSE 0 END)
      |    AS BIGINT) AS DOUBLE) / 100, 6) AS test_revenue
      |FROM roles GROUP BY fold ORDER BY fold""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_shapley_attribution" -> (analyticsShapleyAttribution _),
    "multimodal_ahash_near_dup" -> (multimodalAhashNearDup _),
    "time_dow_spectrum" -> (timeDowSpectrum _),
    "sample_kfold_purged" -> (sampleKfoldPurged _),
  )

  val oracle: Map[String, String] = Map(
    "analytics_shapley_attribution" -> analyticsShapleyAttributionSql,
    "multimodal_ahash_near_dup" -> multimodalAhashNearDupSql,
    "time_dow_spectrum" -> timeDowSpectrumSql,
    "sample_kfold_purged" -> sampleKfoldPurgedSql,
  )
}
