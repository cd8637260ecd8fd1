package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 59 (C640–C643): Tarone overdispersion test, linear CKA,
  * business-day arithmetic, WAV clipping census.
  */
object Extras159 {

  /** C641 embed_cka_linear — linear Centered Kernel Alignment between
    * the first-32 and last-32 embedding dimensions (the representation
    * -similarity diagnostic): all 64×64 cross-moments from ONE
    * vec_id-keyed self-join of the component frame (n·d² products,
    * exact DECIMAL sums), centered covariances cleared (nM−SᵢSⱼ),
    * cells pico-quantized to exact longs so the three Frobenius sums
    * are exact integer sums over the BOUNDED 64×64 cell frame,
    * CKA = ‖C_AB‖²/(‖C_AA‖·‖C_BB‖) in one final expression.
    */
  def embedCkaLinear(s: SparkSession, d: String): DataFrame = {
    val comp = embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1e9 + 0.5) AS BIGINT)").as("f"))
    val n = embeddings(s, d).count()
    val cross = comp.as("a")
      .join(comp.selectExpr("vec_id", "pos AS pos2", "f AS f2").as("b"), Seq("vec_id"))
      .groupBy("pos", "pos2")
      .agg(sum(expr("CAST(f AS DECIMAL(38,0)) * f2")).cast("decimal(38,0)").as("m"))
    val sums = comp.groupBy("pos")
      .agg(sum(col("f")).cast("decimal(38,0)").as("sf"))
    val cells = cross
      .join(broadcast(sums), Seq("pos"))
      .join(broadcast(sums.selectExpr("pos AS pos2", "sf AS sf2")), Seq("pos2"))
      .selectExpr("pos", "pos2",
        s"CAST((CAST($n AS DECIMAL(38,0)) * m - sf * sf2) div 1000000000000 AS BIGINT) AS cq")
    cells.agg(
        sum(expr("CASE WHEN pos < 32 AND pos2 >= 32 THEN CAST(cq AS DECIMAL(38,0)) * cq END")).as("sab"),
        sum(expr("CASE WHEN pos < 32 AND pos2 < 32 THEN CAST(cq AS DECIMAL(38,0)) * cq END")).as("saa"),
        sum(expr("CASE WHEN pos >= 32 AND pos2 >= 32 THEN CAST(cq AS DECIMAL(38,0)) * cq END")).as("sbb"))
      .selectExpr(s"CAST($n AS BIGINT) AS n_vectors",
        """round(CAST(sab AS DOUBLE)
          |  / (sqrt(CAST(saa AS DOUBLE)) * sqrt(CAST(sbb AS DOUBLE))), 6)
          |  AS cka""".stripMargin)
  }
  val embedCkaLinearSql: String =
    """WITH comp AS (
      |  SELECT e.vec_id, i.i - 1 AS pos,
      |    CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS f
      |  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
      |cross_ AS (
      |  SELECT a.pos, b.pos AS pos2,
      |    CAST(sum(CAST(a.f AS DECIMAL(38,0)) * b.f) AS DECIMAL(38,0)) AS m
      |  FROM comp a JOIN comp b USING (vec_id)
      |  GROUP BY 1, 2),
      |sums AS (
      |  SELECT pos, CAST(sum(f) AS DECIMAL(38,0)) AS sf FROM comp GROUP BY 1),
      |cells AS (
      |  SELECT c.pos, c.pos2,
      |    CAST(CAST(CAST(nn.n AS DECIMAL(38,0)) * c.m - s1.sf * s2.sf AS HUGEINT)
      |      // 1000000000000 AS BIGINT) AS cq
      |  FROM cross_ c
      |  JOIN sums s1 ON s1.pos = c.pos
      |  JOIN sums s2 ON s2.pos = c.pos2, nn),
      |m AS (
      |  SELECT
      |    sum(CASE WHEN pos < 32 AND pos2 >= 32 THEN CAST(cq AS DECIMAL(38,0)) * cq END) AS sab,
      |    sum(CASE WHEN pos < 32 AND pos2 < 32 THEN CAST(cq AS DECIMAL(38,0)) * cq END) AS saa,
      |    sum(CASE WHEN pos >= 32 AND pos2 >= 32 THEN CAST(cq AS DECIMAL(38,0)) * cq END) AS sbb
      |  FROM cells)
      |SELECT (SELECT n FROM nn) AS n_vectors,
      |  round(CAST(sab AS DOUBLE)
      |    / (sqrt(CAST(saa AS DOUBLE)) * sqrt(CAST(sbb AS DOUBLE))), 6) AS cka
      |FROM m""".stripMargin

  /** C642 date_add_business_days — the add-N-business-days scalar in
    * pure weekday arithmetic (no calendar table, no iteration):
    * promised-ship = order date (weekend-start shifted to Monday) +
    * 10 business days via cal = 10 + 2·((w+10) div 5) with w =
    * Monday-based weekday — the same closed form in both engines
    * (Spark weekday() vs DuckDB isodow−1). Census: due weekday
    * distribution (spec asserts NO weekend dues) and span histogram.
    */
  def dateAddBusinessDays(s: SparkSession, d: String): DataFrame = {
    orders(s, d)
      .withColumn("w0", expr("weekday(o_orderdate)"))
      .withColumn("shift", expr("CASE WHEN w0 >= 5 THEN 7 - w0 ELSE 0 END"))
      .withColumn("w", expr("CASE WHEN w0 >= 5 THEN 0 ELSE w0 END"))
      .withColumn("cal", expr("shift + 10 + 2 * ((w + 10) div 5)"))
      .withColumn("due", expr("date_add(CAST(o_orderdate AS DATE), CAST(cal AS INT))"))
      .groupBy(expr("weekday(due)").as("due_weekday"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        min(col("cal")).cast("long").as("min_span"),
        max(col("cal")).cast("long").as("max_span"))
      .orderBy("due_weekday")
  }
  val dateAddBusinessDaysSql: String =
    """WITH v AS (
      |  SELECT isodow(o_orderdate) - 1 AS w0, CAST(o_orderdate AS DATE) AS od
      |  FROM orders),
      |c AS (
      |  SELECT od,
      |    CASE WHEN w0 >= 5 THEN 7 - w0 ELSE 0 END
      |      + 10 + 2 * ((CASE WHEN w0 >= 5 THEN 0 ELSE w0 END + 10) // 5) AS cal
      |  FROM v),
      |due AS (SELECT od + CAST(cal AS INT) AS due, cal FROM c)
      |SELECT CAST(isodow(due) - 1 AS INT) AS due_weekday,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(min(cal) AS BIGINT) AS min_span,
      |  CAST(max(cal) AS BIGINT) AS max_span
      |FROM due GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-doc clipping partial through the real WAV container. */
  case class ClipStats(doc_id: Long, lang: String, n_samples: Long,
    n_clipped: Long, clip_ppm: Long)

  /** C643 multimodal_audio_clipping — clipping census through the REAL
    * WAV codec (8-bit PCM convention of the audio rows): samples at
    * the rails (≤5 or ≥250) counted inside the typed mapPartitions
    * boundary (bytes never shuffle; per-doc ppm = clipped·1e6 div n is
    * an exact integer so the per-lang max is exact), corpus share one
    * final division. Oracle mirrors the byte arithmetic on the ASCII
    * fixture (every multimodal row's convention).
    */
  def multimodalAudioClipping(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val partials = documents(s, d)
      .select(col("doc_id"), col("lang"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, lang, payload) =>
          val blob = graft.sources.MediaCodec.encodeWav(payload)
          val pcm = graft.sources.MediaCodec.decodePayload(id, blob)
          var clipped = 0L
          pcm.foreach { b => val u = b & 0xff; if (u <= 5 || u >= 250) clipped += 1 }
          ClipStats(id, lang, pcm.length.toLong, clipped,
            if (pcm.length == 0) 0L else clipped * 1000000L / pcm.length)
        }
      }
      .toDF()
    partials.groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_samples")).cast("long").as("total_samples"),
        sum(col("n_clipped")).cast("long").as("total_clipped"),
        max(col("clip_ppm")).cast("long").as("max_doc_clip_ppm"))
      .selectExpr("lang", "n_docs", "total_samples", "total_clipped",
        "round(CAST(total_clipped AS DOUBLE) / total_samples, 6) AS clip_share",
        "max_doc_clip_ppm")
      .orderBy("lang")
  }
  val multimodalAudioClippingSql: String =
    """WITH per AS (
      |  SELECT lang,
      |    CAST(strlen(text) AS BIGINT) AS n_samples,
      |    CAST(coalesce(list_aggregate(list_transform(
      |      generate_series(1, strlen(text)),
      |      p -> CASE WHEN ascii(text[p]) <= 5 OR ascii(text[p]) >= 250
      |           THEN 1 ELSE 0 END), 'sum'), 0) AS BIGINT) AS n_clipped
      |  FROM documents),
      |q AS (
      |  SELECT lang, n_samples, n_clipped,
      |    CASE WHEN n_samples = 0 THEN 0
      |         ELSE n_clipped * 1000000 // n_samples END AS clip_ppm
      |  FROM per)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_samples) AS BIGINT) AS total_samples,
      |  CAST(sum(n_clipped) AS BIGINT) AS total_clipped,
      |  round(CAST(sum(n_clipped) AS DOUBLE) / sum(n_samples), 6) AS clip_share,
      |  CAST(max(clip_ppm) AS BIGINT) AS max_doc_clip_ppm
      |FROM q GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_tarone_overdispersion" -> (statTarone _),
    "embed_cka_linear" -> (embedCkaLinear _),
    "date_add_business_days" -> (dateAddBusinessDays _),
    "multimodal_audio_clipping" -> (multimodalAudioClipping _),
  )

  /** C640 stat_tarone_overdispersion — Tarone's Z test for binomial
    * overdispersion in per-order return rates (are returns clumpier
    * than independent-trials?): with p̂ = X/N the statistic's sum is
    * denominator-cleared — Σ(x_iN − n_iX)² is an exact DECIMAL sum in
    * one grouped pass — S = that/(X(N−X)), Z = (S−N)/√(2Σn_i(n_i−1)),
    * final double expressions only.
    */
  def statTarone(s: SparkSession, d: String): DataFrame = {
    val units = lineitem(s, d).groupBy("l_orderkey")
      .agg(count(lit(1)).cast("long").as("ni"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END"))
          .cast("long").as("xi"))
    val tot = units.agg(sum(col("ni")).cast("long").as("n"),
      sum(col("xi")).cast("long").as("x"))
    units.crossJoin(broadcast(tot))
      .agg(count(lit(1)).cast("long").as("n_units"),
        max(col("n")).as("n"), max(col("x")).as("x"),
        sum(expr(
          "CAST(xi * n - ni * x AS DECIMAL(38,0)) * (xi * n - ni * x)"))
          .cast("decimal(38,0)").as("ss"),
        sum(expr("ni * (ni - 1)")).cast("long").as("nn1"))
      .selectExpr("n_units", "n", "x", "nn1",
        "CAST(ss AS DOUBLE) / (CAST(x AS DOUBLE) * (n - x)) AS s")
      .selectExpr("n_units",
        "round(CAST(x AS DOUBLE) / n, 6) AS p_hat",
        "round(s, 4) AS tarone_s",
        "round((s - n) / sqrt(2.0 * nn1), 4) AS tarone_z",
        "abs((s - n) / sqrt(2.0 * nn1)) > 1.96 AS reject_binomial")
  }
  val statTaroneSql: String =
    """WITH units AS (
      |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS ni,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS xi
      |  FROM lineitem GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(ni) AS BIGINT) AS n, CAST(sum(xi) AS BIGINT) AS x
      |  FROM units),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_units,
      |    max(n) AS n, max(x) AS x,
      |    CAST(sum(CAST(xi * n - ni * x AS DECIMAL(38,0)) * (xi * n - ni * x))
      |      AS DECIMAL(38,0)) AS ss,
      |    CAST(sum(ni * (ni - 1)) AS BIGINT) AS nn1
      |  FROM units, tot),
      |t AS (
      |  SELECT n_units, n, x, nn1,
      |    CAST(ss AS DOUBLE) / (CAST(x AS DOUBLE) * (n - x)) AS s
      |  FROM m)
      |SELECT n_units,
      |  round(CAST(x AS DOUBLE) / n, 6) AS p_hat,
      |  round(s, 4) AS tarone_s,
      |  round((s - n) / sqrt(2.0 * nn1), 4) AS tarone_z,
      |  abs((s - n) / sqrt(2.0 * nn1)) > 1.96 AS reject_binomial
      |FROM t""".stripMargin

  val oracle: Map[String, String] = Map(
    "stat_tarone_overdispersion" -> statTaroneSql,
    "embed_cka_linear" -> embedCkaLinearSql,
    "date_add_business_days" -> dateAddBusinessDaysSql,
    "multimodal_audio_clipping" -> multimodalAudioClippingSql,
  )
}
