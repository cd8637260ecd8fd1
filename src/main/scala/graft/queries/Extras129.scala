package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 29 (C522–C524): bigram conditional entropy, the two-proportion
  * z readout, and a float-free LTTB downsampler.
  */
object Extras129 {

  /** C522 text_bigram_cond_entropy — conditional next-token entropy
    * H(w₂|w₁) per language (how predictable the corpus is one token
    * out — the model-free companion to C*_ngram_lm/C471): H =
    * Σ c₁₂·log2(c₁/c₁₂) / N with c₁ the bigram-marginal unigram
    * count. Per-bigram terms round to a 1e-9 fixed-point BIGINT and
    * sum EXACTLY (shuffle-order-proof); c₁ arrives by a window sum
    * over the (lang, w1) partition of the bigram aggregate — no
    * second pass over the corpus.
    */
  def textBigramCondEntropy(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d).select(col("doc_id"), col("lang"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val big = toks.withColumn("w2", lead("w1", 1).over(byPos))
      .filter(col("w2").isNotNull)
      .groupBy("lang", "w1", "w2").agg(count(lit(1)).cast("long").as("c12"))
    big
      .withColumn("c1", sum(col("c12")).over(
        Window.partitionBy("lang", "w1")).cast("long"))
      .withColumn("fx", expr(
        "CAST(floor(c12 * log2(CAST(c1 AS DOUBLE) / c12) * 1e9 + 0.5) AS BIGINT)"))
      .groupBy("lang")
      .agg(
        sum(col("c12")).cast("long").as("n_bigrams"),
        count(lit(1)).cast("long").as("vocab_bigrams"),
        round(sum(col("fx")).cast("double") / 1e9 / sum(col("c12")), 6)
          .as("cond_entropy"))
      .orderBy("lang")
  }
  val textBigramCondEntropySql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, pos, string_split(text, ' ')[pos] AS w1
      |  FROM (SELECT doc_id, lang, text,
      |          unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      |        FROM documents)),
      |big AS (
      |  SELECT a.lang, a.w1, b.w1 AS w2, count(*) AS c12
      |  FROM toks a JOIN toks b
      |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      |  GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT lang, c12,
      |    CAST(sum(c12) OVER (PARTITION BY lang, w1) AS BIGINT) AS c1
      |  FROM big),
      |fx AS (
      |  SELECT lang, c12,
      |    CAST(floor(c12 * log2(CAST(c1 AS DOUBLE) / c12) * 1e9 + 0.5) AS BIGINT)
      |      AS fx
      |  FROM m)
      |SELECT lang, CAST(sum(c12) AS BIGINT) AS n_bigrams,
      |  count(*) AS vocab_bigrams,
      |  round(CAST(sum(fx) AS DOUBLE) / 1e9 / CAST(sum(c12) AS BIGINT), 6)
      |    AS cond_entropy
      |FROM fx GROUP BY lang ORDER BY lang""".stripMargin

  /** C523 stat_two_proportion_z — the A/B conversion readout beside
    * C472's SRM gate: users hash-split 50/50 by the SAME md5-fraction
    * mechanism, converted = has ≥1 purchase event; z = (p̂₁−p̂₂)/
    * √(p̂(1−p̂)(1/n₁+1/n₂)) as ONE IEEE formula over four exact
    * integers. One distinct-user aggregate, two scalar broadcasts.
    */
  def statTwoProportionZ(s: SparkSession, d: String): DataFrame = {
    // converted = ≥14 purchase events (≈ the per-user-type median of
    // this fixture — the bare ≥1 flag saturates at p̂ = 1, zeroing the
    // pooled variance; the nullif guard still covers that edge)
    val users = events(s, d).groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .cast("long").as("np"))
      .select(col("user_id"),
        when(col("np") >= 14, 1L).otherwise(0L).as("converted"))
      .withColumn("arm", expr(
        "CASE WHEN conv(substring(md5(CAST(user_id AS STRING)), 1, 6), 16, 10) " +
          "/ 16777216.0 < 0.5 THEN 'A' ELSE 'B' END"))
    users.groupBy("arm")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("converted")).cast("long").as("conv"))
      .agg(
        max(when(col("arm") === "A", col("n"))).as("n_a"),
        max(when(col("arm") === "A", col("conv"))).as("conv_a"),
        max(when(col("arm") === "B", col("n"))).as("n_b"),
        max(when(col("arm") === "B", col("conv"))).as("conv_b"))
      .selectExpr("n_a", "conv_a", "n_b", "conv_b",
        """round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
          |  / nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
          |    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
          |    * (1.0 / n_a + 1.0 / n_b)), 0.0), 4) AS z_stat""".stripMargin)
      .selectExpr("n_a", "conv_a", "n_b", "conv_b", "z_stat",
        "abs(z_stat) > 1.96 AS reject_equal_rates")
  }
  val statTwoProportionZSql: String =
    """WITH users AS (
      |  SELECT user_id,
      |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
      |      THEN 1 ELSE 0 END AS converted,
      |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 6)
      |        AS BIGINT) / 16777216.0 < 0.5 THEN 'A' ELSE 'B' END AS arm
      |  FROM events GROUP BY user_id),
      |arms AS (
      |  SELECT arm, count(*) AS n, CAST(sum(converted) AS BIGINT) AS conv
      |  FROM users GROUP BY arm),
      |w AS (
      |  SELECT
      |    max(CASE WHEN arm = 'A' THEN n END) AS n_a,
      |    max(CASE WHEN arm = 'A' THEN conv END) AS conv_a,
      |    max(CASE WHEN arm = 'B' THEN n END) AS n_b,
      |    max(CASE WHEN arm = 'B' THEN conv END) AS conv_b
      |  FROM arms)
      |SELECT CAST(n_a AS BIGINT) AS n_a, conv_a,
      |  CAST(n_b AS BIGINT) AS n_b, conv_b,
      |  round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
      |    / nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
      |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
      |      * (1.0 / n_a + 1.0 / n_b)), 0.0), 4) AS z_stat,
      |  abs(round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
      |    / nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
      |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
      |      * (1.0 / n_a + 1.0 / n_b)), 0.0), 4)) > 1.96 AS reject_equal_rates
      |FROM w""".stripMargin

  /** C524 time_downsample_lttb — Largest-Triangle-Three-Buckets
    * downsampling of the daily revenue series (the visually-faithful
    * alternative to C*_M4's min/max envelope), in the parallel
    * prev-bucket-AVERAGE variant (classic LTTB anchors on the
    * previously SELECTED point — a sequential dependency; the average
    * anchor is the standard distributed relaxation) — and with ZERO
    * floating point: the candidate triangle area, cleared of the two
    * rational bucket-average denominators, is the exact DECIMAL(38,0)
    * integer A' = (Sxp·nn − Sxn·np)(y·np − Syp) − (Sxp − x·np)(Syn·np
    * − Syp·nn); argmax ranks on (|A'|, day). Endpoints are kept
    * verbatim per LTTB. Windows and joins run over the O(days)
    * aggregate and the O(days/30) bucket table.
    */
  def timeDownsampleLttb(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .withColumn("x", row_number().over(Window.orderBy("day")).cast("long"))
      .withColumn("nn_tot", count(lit(1)).over(Window.partitionBy()))
      .withColumn("b", expr("(x - 1) div 30"))
    val buckets = daily.groupBy("b")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("c")).cast("decimal(38,0)").as("sy"))
    val cand = daily
      .join(buckets.select((col("b") + 1).as("b"), col("n").as("np"),
        col("sx").as("sxp"), col("sy").as("syp")), "b")
      .join(buckets.select((col("b") - 1).as("b"), col("n").as("nn"),
        col("sx").as("sxn"), col("sy").as("syn")), "b")
      .withColumn("a2", expr(
        """abs(CAST(sxp * nn - sxn * np AS DECIMAL(38,0)) * (CAST(c AS DECIMAL(38,0)) * np - syp)
          |  - CAST(sxp - x * np AS DECIMAL(38,0)) * (syn * np - syp * CAST(nn AS DECIMAL(38,0))))"""
          .stripMargin))
      .withColumn("rn", row_number().over(
        Window.partitionBy("b").orderBy(col("a2").desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("day"), col("c"))
    val endpoints = daily
      .filter(col("x") === 1 || col("x") === col("nn_tot"))
      .select(col("day"), col("c"))
    endpoints.unionAll(cand).distinct()
      .select(col("day"), round(col("c").cast("double") / 100, 6).as("revenue"))
      .orderBy("day")
  }
  val timeDownsampleLttbSql: String =
    """WITH daily AS (
      |  SELECT day, c,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS x,
      |    count(*) OVER () AS nn_tot
      |  FROM (
      |    SELECT date_trunc('day', l_shipdate) AS day,
      |      CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |        AS BIGINT) AS c
      |    FROM lineitem GROUP BY 1)),
      |db AS (SELECT *, (x - 1) // 30 AS b FROM daily),
      |buckets AS (
      |  SELECT b, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(c) AS DECIMAL(38,0)) AS sy
      |  FROM db GROUP BY b),
      |cand AS (
      |  SELECT db.day, db.c,
      |    row_number() OVER (PARTITION BY db.b ORDER BY
      |      abs(CAST(p.sx * nx.n - nx.sx * p.n AS DECIMAL(38,0))
      |            * (CAST(db.c AS DECIMAL(38,0)) * p.n - p.sy)
      |          - CAST(p.sx - db.x * p.n AS DECIMAL(38,0))
      |            * (nx.sy * p.n - p.sy * CAST(nx.n AS DECIMAL(38,0)))) DESC,
      |      db.day) AS rn
      |  FROM db
      |  JOIN buckets p ON p.b = db.b - 1
      |  JOIN buckets nx ON nx.b = db.b + 1),
      |sel AS (
      |  SELECT day, c FROM cand WHERE rn = 1
      |  UNION
      |  SELECT day, c FROM db WHERE x = 1 OR x = nn_tot)
      |SELECT day, round(CAST(c AS DOUBLE) / 100, 6) AS revenue
      |FROM sel ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bigram_cond_entropy" -> (textBigramCondEntropy _),
    "stat_two_proportion_z" -> (statTwoProportionZ _),
    "time_downsample_lttb" -> (timeDownsampleLttb _),
  )

  val oracle: Map[String, String] = Map(
    "text_bigram_cond_entropy" -> textBigramCondEntropySql,
    "stat_two_proportion_z" -> statTwoProportionZSql,
    "time_downsample_lttb" -> timeDownsampleLttbSql,
  )
}
