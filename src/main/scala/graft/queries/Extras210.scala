package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 110 (C844–C847): ANN recall engineering + compression +
  * media + dedup prescreening — multiprobe LSH (query the 1-bit-flip
  * neighborhood of each band), two-stage residual quantization,
  * audio crest factor through the real WAV codec, and a Bloom-filter
  * dedup prescreen with measured-vs-theoretical false-positive rate.
  *
  * Shared discipline: every candidate set comes from an equi-join on
  * hash keys (bands, codebook ids, bit positions) — never a per-probe
  * scan or an all-pairs product; per-item floats are floored to
  * integers before any cross-item sum; md5-derived bits use the
  * conv/'0x'-cast pair proven bit-identical across engines since C543.
  */
object Extras210 {

  /** C844 sim_lsh_multiprobe — multiprobe LSH over the C-line sign-bit
    * signature: each probe queries its 16 4-bit bands AND the four
    * 1-bit-flip perturbations of each band value (80 keys total) — the
    * standard trick that buys recall at a fixed table count instead of
    * more tables (Lv et al., VLDB'07). Reports, per probe, the
    * single-probe vs multiprobe candidate counts and the multiprobe
    * top-1 by exact dot — the recall/candidate-volume trade the ANN
    * rows are tuned by.
    */
  def simLshMultiprobe(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val sigd = e.withColumn("sig", expr(
      """aggregate(sequence(0, 63), 0L,
        |  (acc, i) -> acc | IF(element_at(embedding, i + 1) >= CAST(0 AS FLOAT),
        |                       shiftleft(1L, i), 0L))""".stripMargin))
    val bands = sigd.select(
      col("vec_id"), col("embedding"),
      posexplode(expr("transform(sequence(0, 15), j -> (sig >> (j * 4)) & 15)")))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    // probe keys: the original band value (flip = -1) + its four
    // 1-bit flips — 80 (band_idx, key) rows per probe
    val probeKeys = bands.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"),
        col("band_idx"),
        explode(expr(
          """transform(sequence(-1, 3), k ->
            |  named_struct('pv', CASE WHEN k = -1 THEN band_val
            |                     ELSE band_val ^ shiftleft(1, k) END,
            |               'exact', k = -1))""".stripMargin)).as("s"))
      .select(col("probe_id"), col("probe_emb"), col("band_idx"),
        col("s.pv").as("band_val"), col("s.exact").as("is_exact"))
    val corpus = bands.select(col("band_idx"), col("band_val"),
      col("vec_id"), col("embedding"))
    val cands = probeKeys.join(corpus, Seq("band_idx", "band_val"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim0", expr(
        """round(aggregate(sequence(1, 64), 0.0D,
          |  (acc, i) -> acc + CAST(element_at(probe_emb, i) AS DOUBLE)
          |                    * CAST(element_at(embedding, i) AS DOUBLE)), 6)""".stripMargin))
      .groupBy("probe_id", "vec_id")
      .agg(max(col("is_exact")).as("hit_exact"), min(col("sim0")).as("sim"))
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("vec_id").asc)
    cands
      .withColumn("rn", row_number().over(w))
      .groupBy("probe_id")
      .agg(sum(expr("CASE WHEN hit_exact THEN 1L ELSE 0L END")).cast("long").as("cand_single"),
        count(lit(1)).cast("long").as("cand_multi"),
        min(expr("CASE WHEN rn = 1 THEN vec_id END")).cast("long").as("top1_vec"),
        min(expr("CASE WHEN rn = 1 THEN sim END")).as("top1_sim"))
      .orderBy("probe_id")
  }
  val simLshMultiprobeSql: String = {
    def dd(a: String, b: String): String =
      s"""list_reduce(list_transform(generate_series(1, 64),
         |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
         |      (x, y) -> x + y)""".stripMargin
    s"""WITH b AS (
       |  SELECT e.vec_id, e.embedding, js.bidx AS band_idx,
       |        (CASE WHEN e.embedding[4 * js.bidx + 1] >= 0 THEN 1 ELSE 0 END)
       |    + 2 * (CASE WHEN e.embedding[4 * js.bidx + 2] >= 0 THEN 1 ELSE 0 END)
       |    + 4 * (CASE WHEN e.embedding[4 * js.bidx + 3] >= 0 THEN 1 ELSE 0 END)
       |    + 8 * (CASE WHEN e.embedding[4 * js.bidx + 4] >= 0 THEN 1 ELSE 0 END) AS band_val
       |  FROM embeddings e
       |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bidx) js),
       |pk AS (
       |  SELECT p.vec_id AS probe_id, p.embedding AS probe_emb, p.band_idx,
       |    CASE WHEN ks.k = -1 THEN p.band_val ELSE xor(p.band_val, 1 << ks.k) END AS band_val,
       |    ks.k = -1 AS is_exact
       |  FROM b p CROSS JOIN (SELECT unnest(generate_series(-1, 3)) AS k) ks
       |  WHERE p.vec_id < 10),
       |cand0 AS (
       |  SELECT pk.probe_id, c.vec_id, pk.is_exact,
       |    round(${dd("pk.probe_emb", "c.embedding")}, 6) AS sim0
       |  FROM pk JOIN b c ON c.band_idx = pk.band_idx AND c.band_val = pk.band_val
       |    AND c.vec_id <> pk.probe_id),
       |cand AS (
       |  SELECT probe_id, vec_id, max(is_exact) AS hit_exact, min(sim0) AS sim
       |  FROM cand0 GROUP BY 1, 2),
       |rk AS (
       |  SELECT probe_id, vec_id, hit_exact, sim,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id ASC) AS rn
       |  FROM cand)
       |SELECT probe_id,
       |  CAST(sum(CASE WHEN hit_exact THEN 1 ELSE 0 END) AS BIGINT) AS cand_single,
       |  CAST(count(*) AS BIGINT) AS cand_multi,
       |  CAST(min(CASE WHEN rn = 1 THEN vec_id END) AS BIGINT) AS top1_vec,
       |  min(CASE WHEN rn = 1 THEN sim END) AS top1_sim
       |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** C845 embed_residual_quantize — two-stage residual quantization
    * (the RQ ladder between C-line PQ and exact storage): coarse
    * 16-centroid codebook (deterministic vec_id<16 convention), exact
    * argmin assignment, residual vectors, a second 16-entry codebook
    * from the next sixteen vectors' OWN residuals, stage-2 argmin —
    * report stage-1 vs stage-2 reconstruction MSE and the improvement
    * share. Per-vector errors floored ·10⁶ to integers before the
    * corpus sum (no float-reduction ordering).
    */
  def embedResidualQuantize(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    def sq(a: String, b: String) =
      s"""aggregate(sequence(1, 64), 0.0D,
         |  (acc, i) -> acc + pow(CAST(element_at($a, i) AS DOUBLE)
         |                        - CAST(element_at($b, i) AS DOUBLE), 2))""".stripMargin
    val cb1 = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c1_id"), col("embedding").as("c1"))
    val w1 = Window.partitionBy("vec_id").orderBy(col("d1").asc, col("c1_id").asc)
    val a1 = e.crossJoin(broadcast(cb1))
      .withColumn("d1", expr(sq("embedding", "c1")))
      .withColumn("rn", row_number().over(w1))
      .filter(col("rn") === 1)
      .withColumn("resid", expr(
        """transform(sequence(1, 64), i -> CAST(element_at(embedding, i) AS DOUBLE)
          |                                - CAST(element_at(c1, i) AS DOUBLE))""".stripMargin))
      .select(col("vec_id"), col("d1"), col("resid"))
    // a real RQ always carries the ZERO codeword (stage 2 may decline
    // to correct) — this also guarantees mse_stage2 <= mse_stage1
    val cb2 = a1.filter(col("vec_id") >= 16 && col("vec_id") < 32)
      .select(col("vec_id").as("c2_id"), col("resid").as("c2"))
      .unionAll(e.limit(1).select(lit(-1L).as("c2_id"),
        expr("transform(sequence(1, 64), i -> 0.0D)").as("c2")))
    def sqd(a: String, b: String) =
      s"""aggregate(sequence(1, 64), 0.0D,
         |  (acc, i) -> acc + pow(element_at($a, i) - element_at($b, i), 2))""".stripMargin
    val w2 = Window.partitionBy("vec_id").orderBy(col("d2").asc, col("c2_id").asc)
    val a2 = a1.crossJoin(broadcast(cb2))
      .withColumn("d2", expr(sqd("resid", "c2")))
      .withColumn("rn", row_number().over(w2))
      .filter(col("rn") === 1)
      .select(col("vec_id"),
        expr("CAST(floor(d1 * 1e6) AS BIGINT)").as("q1"),
        expr("CAST(floor(d2 * 1e6) AS BIGINT)").as("q2"))
    a2.agg(count(lit(1)).cast("long").as("n_vectors"),
        sum(col("q1")).cast("decimal(38,0)").as("s1"),
        sum(col("q2")).cast("decimal(38,0)").as("s2"))
      .selectExpr("n_vectors",
        "round(CAST(s1 AS DOUBLE) / 1e6 / n_vectors, 6) AS mse_stage1",
        "round(CAST(s2 AS DOUBLE) / 1e6 / n_vectors, 6) AS mse_stage2",
        """round(1 - CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE), 6)
          |AS improvement_share""".stripMargin)
  }
  val embedResidualQuantizeSql: String = {
    def sq(a: String, b: String) =
      s"""list_reduce(list_transform(generate_series(1, 64),
         |    i -> pow(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE), 2)),
         |    (x, y) -> x + y)""".stripMargin
    def sqd(a: String, b: String) =
      s"""list_reduce(list_transform(generate_series(1, 64),
         |    i -> pow($a[i] - $b[i], 2)),
         |    (x, y) -> x + y)""".stripMargin
    s"""WITH cb1 AS (
       |  SELECT vec_id AS c1_id, embedding AS c1 FROM embeddings WHERE vec_id < 16),
       |a1 AS (
       |  SELECT vec_id, d1, resid FROM (
       |    SELECT e.vec_id, ${sq("e.embedding", "k.c1")} AS d1,
       |      list_transform(generate_series(1, 64),
       |        i -> CAST(e.embedding[i] AS DOUBLE) - CAST(k.c1[i] AS DOUBLE)) AS resid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${sq("e.embedding", "k.c1")} ASC, k.c1_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN cb1 k)
       |  WHERE rn = 1),
       |cb2 AS (
       |  SELECT vec_id AS c2_id, resid AS c2 FROM a1
       |  WHERE vec_id >= 16 AND vec_id < 32
       |  UNION ALL
       |  SELECT CAST(-1 AS BIGINT),
       |    list_transform(generate_series(1, 64), i -> 0.0)),
       |a2 AS (
       |  SELECT vec_id, CAST(floor(d1 * 1e6) AS BIGINT) AS q1,
       |    CAST(floor(d2 * 1e6) AS BIGINT) AS q2
       |  FROM (
       |    SELECT a.vec_id, a.d1, ${sqd("a.resid", "k.c2")} AS d2,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${sqd("a.resid", "k.c2")} ASC, k.c2_id ASC) AS rn
       |    FROM a1 a CROSS JOIN cb2 k)
       |  WHERE rn = 1),
       |ag AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       |    CAST(sum(q1) AS DECIMAL(38,0)) AS s1,
       |    CAST(sum(q2) AS DECIMAL(38,0)) AS s2
       |  FROM a2)
       |SELECT n_vectors,
       |  round(CAST(s1 AS DOUBLE) / 1e6 / n_vectors, 6) AS mse_stage1,
       |  round(CAST(s2 AS DOUBLE) / 1e6 / n_vectors, 6) AS mse_stage2,
       |  round(1 - CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE), 6) AS improvement_share
       |FROM ag""".stripMargin
  }

  /** Per-doc crest partial through the real WAV container. */
  case class CrestStats(doc_id: Long, lang: String, n_samples: Long,
    peak: Long, sumsq: Long, crest_q: Long)

  /** C846 multimodal_audio_crest — crest factor (peak/RMS) census
    * through the REAL WAV codec (8-bit PCM around the 128 rail, same
    * convention as C643): per-doc peak |s−128|, exact Σ(s−128)², crest
    * floored ·10⁶ inside the typed mapPartitions boundary (identical
    * IEEE text in the oracle), per-language mean/max. High crest =
    * transient-heavy audio; crest ≈ 1 = square-wave/clipped — the
    * dynamic-range sibling of the clipping census.
    */
  def multimodalAudioCrest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val partials = documents(s, d)
      .select(col("doc_id"), col("lang"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, lang, payload) =>
          val blob = graft.sources.MediaCodec.encodeWav(payload)
          val pcm = graft.sources.MediaCodec.decodePayload(id, blob)
          var peak = 0L; var sumsq = 0L
          pcm.foreach { b =>
            val v = (b & 0xff) - 128L
            val a = math.abs(v)
            if (a > peak) peak = a
            sumsq += v * v
          }
          val n = pcm.length.toLong
          val cq = if (n == 0 || sumsq == 0) 0L
            else math.floor(peak.toDouble * 1e6 / math.sqrt(sumsq.toDouble / n)).toLong
          CrestStats(id, lang, n, peak, sumsq, cq)
        }
      }
      .toDF()
    partials.groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("crest_q")).cast("long").as("scq"),
        max(col("crest_q")).cast("long").as("max_cq"),
        max(col("peak")).cast("long").as("max_peak"))
      .selectExpr("lang", "n_docs",
        "round(CAST(scq AS DOUBLE) / 1e6 / n_docs, 6) AS mean_crest",
        "round(CAST(max_cq AS DOUBLE) / 1e6, 6) AS max_crest",
        "max_peak")
      .orderBy("lang")
  }
  val multimodalAudioCrestSql: String =
    """WITH per AS (
      |  SELECT lang,
      |    CAST(strlen(text) AS BIGINT) AS n,
      |    CAST(coalesce(list_aggregate(list_transform(
      |      generate_series(1, strlen(text)),
      |      p -> abs(ascii(text[p]) - 128)), 'max'), 0) AS BIGINT) AS peak,
      |    CAST(coalesce(list_aggregate(list_transform(
      |      generate_series(1, strlen(text)),
      |      p -> (ascii(text[p]) - 128) * (ascii(text[p]) - 128)), 'sum'), 0)
      |      AS BIGINT) AS sumsq
      |  FROM documents),
      |q AS (
      |  SELECT lang, peak,
      |    CASE WHEN n = 0 OR sumsq = 0 THEN 0
      |    ELSE CAST(floor(CAST(peak AS DOUBLE) * 1e6
      |      / sqrt(CAST(sumsq AS DOUBLE) / n)) AS BIGINT) END AS crest_q
      |  FROM per)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(CAST(sum(crest_q) AS DOUBLE) / 1e6 / count(*), 6) AS mean_crest,
      |  round(CAST(max(crest_q) AS DOUBLE) / 1e6, 6) AS max_crest,
      |  CAST(max(peak) AS BIGINT) AS max_peak
      |FROM q GROUP BY 1 ORDER BY 1""".stripMargin

  /** C847 dedup_bloom_prescreen — the Bloom-filter prescreen every
    * at-scale exact-dedup pass runs before touching content: k=3
    * 12-bit positions per document from disjoint md5 hex ranges
    * (m = 4096 bits — sized so the sf-fixture FP rate is measurable), a document is FLAGGED iff all three positions
    * were set by some strictly-earlier doc_id (min-setter semantics —
    * exactly the sequential-insert Bloom check, computed as one
    * distributed groupBy + join, no sequential state). Reports the
    * measured false-positive rate against the END-STATE
    * (1−e^{−kn/m})^k theory line — the sequential measurement sits
    * BELOW it by construction (the filter is half-full on average
    * during inserts), so theory is the upper bound the planner sizes
    * against. The candidate-volume planner for the exact pass.
    */
  def dedupBloomPrescreen(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d)
      .select(col("doc_id"), col("text"),
        expr("md5(text)").as("h"))
    val firsts = base.groupBy("h").agg(min(col("doc_id")).as("first_id"))
    val slots = base.select(col("doc_id"),
      explode(expr(
        """array(conv(substring(md5(text), 1, 3), 16, 10),
          |      conv(substring(md5(text), 6, 3), 16, 10),
          |      conv(substring(md5(text), 11, 3), 16, 10))""".stripMargin)).as("p0"))
      .select(col("doc_id"), expr("CAST(p0 AS BIGINT) % 4096").as("p"))
    val setters = slots.groupBy("p").agg(min(col("doc_id")).as("min_setter"))
    val flagged = slots.join(setters, Seq("p"))
      .groupBy("doc_id")
      .agg(min(expr("CASE WHEN min_setter < doc_id THEN 1L ELSE 0L END")).as("flag"))
    base.join(firsts, Seq("h"))
      .join(flagged, Seq("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(expr("CASE WHEN doc_id > first_id THEN 1L ELSE 0L END")).cast("long").as("n_dup_exact"),
        sum(col("flag")).cast("long").as("n_flagged"),
        sum(expr("CASE WHEN flag = 1 AND doc_id = first_id THEN 1L ELSE 0L END"))
          .cast("long").as("n_false_pos"))
      .selectExpr("n_docs", "n_dup_exact", "n_flagged", "n_false_pos",
        """round(CAST(n_false_pos AS DOUBLE)
          |/ (CAST(n_docs AS DOUBLE) - n_dup_exact), 6) AS fp_rate_measured""".stripMargin,
        """round(pow(1 - exp(-3.0 * CAST(n_docs AS DOUBLE) / 4096), 3), 6)
          |AS fp_rate_theory""".stripMargin)
  }
  val dedupBloomPrescreenSql: String =
    """WITH base AS (
      |  SELECT doc_id, md5(text) AS h FROM documents),
      |firsts AS (SELECT h, min(doc_id) AS first_id FROM base GROUP BY 1),
      |slots AS (
      |  SELECT doc_id, CAST('0x' || substr(h, 1, 3) AS BIGINT) % 4096 AS p FROM base
      |  UNION ALL
      |  SELECT doc_id, CAST('0x' || substr(h, 6, 3) AS BIGINT) % 4096 FROM base
      |  UNION ALL
      |  SELECT doc_id, CAST('0x' || substr(h, 11, 3) AS BIGINT) % 4096 FROM base),
      |setters AS (SELECT p, min(doc_id) AS min_setter FROM slots GROUP BY 1),
      |flagged AS (
      |  SELECT s.doc_id,
      |    min(CASE WHEN st.min_setter < s.doc_id THEN 1 ELSE 0 END) AS flag
      |  FROM slots s JOIN setters st ON st.p = s.p
      |  GROUP BY 1),
      |ag AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(CASE WHEN b.doc_id > f.first_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_exact,
      |    CAST(sum(fl.flag) AS BIGINT) AS n_flagged,
      |    CAST(sum(CASE WHEN fl.flag = 1 AND b.doc_id = f.first_id THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_false_pos
      |  FROM base b JOIN firsts f ON f.h = b.h JOIN flagged fl ON fl.doc_id = b.doc_id)
      |SELECT n_docs, n_dup_exact, n_flagged, n_false_pos,
      |  round(CAST(n_false_pos AS DOUBLE) / (CAST(n_docs AS DOUBLE) - n_dup_exact), 6)
      |    AS fp_rate_measured,
      |  round(pow(1 - exp(-3.0 * CAST(n_docs AS DOUBLE) / 4096), 3), 6) AS fp_rate_theory
      |FROM ag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_lsh_multiprobe" -> (simLshMultiprobe _),
    "embed_residual_quantize" -> (embedResidualQuantize _),
    "multimodal_audio_crest" -> (multimodalAudioCrest _),
    "dedup_bloom_prescreen" -> (dedupBloomPrescreen _),
  )

  val oracle: Map[String, String] = Map(
    "sim_lsh_multiprobe" -> simLshMultiprobeSql,
    "embed_residual_quantize" -> embedResidualQuantizeSql,
    "multimodal_audio_crest" -> multimodalAudioCrestSql,
    "dedup_bloom_prescreen" -> dedupBloomPrescreenSql,
  )
}
