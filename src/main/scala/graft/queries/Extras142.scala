package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** One row per doc from the shot-boundary stage. */
case class ShotStats(doc_id: Long, n_frames: Long, n_shots: Long, max_delta: Long)

/** Wave 42 (C572–C575): shot boundaries, bag symmetric difference,
  * cluster purity, junk-dimension encoding.
  */
object Extras142 {

  /** C572 multimodal_shot_boundaries — video-style shot-cut detection
    * over the blob's 16-byte frames (the [[Multimodal]] fixture): a
    * cut lands between consecutive frames when the byte-sum delta
    * exceeds twice the mean frame sum, CROSS-MULTIPLIED
    * (|Δ|·nFrames > 2·total — integers only); shots = cuts + 1. The
    * whole detection runs inside the typed mapPartitions boundary —
    * at 100 TB the blob never leaves its partition, only the 4-column
    * stats row shuffles. Oracle replays the frame arithmetic on the
    * ASCII fixture with list slices.
    */
  def multimodalShotBoundaries(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          val n = blob.length
          val nF = (n + 15) / 16
          val sums = new Array[Long](nF)
          var i = 0
          while (i < n) { sums(i / 16) += (blob(i) & 0xff); i += 1 }
          val total = sums.sum
          var cuts = 0L
          var maxD = 0L
          var f = 1
          while (f < nF) {
            val dlt = math.abs(sums(f) - sums(f - 1))
            if (dlt > maxD) maxD = dlt
            if (dlt * nF > 2 * total) cuts += 1
            f += 1
          }
          ShotStats(id, nF.toLong, if (nF > 0) cuts + 1 else 0L, maxD)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }
  val multimodalShotBoundariesSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(0, (strlen(text) + 15) // 16 - 1),
      |      k -> list_aggregate(list_transform(
      |        generate_series(k * 16 + 1,
      |          least(k * 16 + 16, strlen(text))),
      |        p -> ascii(text[p])), 'sum')) AS sums
      |  FROM documents),
      |st AS (
      |  SELECT doc_id,
      |    CAST(len(sums) AS BIGINT) AS n_frames,
      |    CAST(list_aggregate(sums, 'sum') AS BIGINT) AS total,
      |    list_transform(generate_series(2, len(sums)),
      |      i -> abs(sums[i] - sums[i - 1])) AS deltas
      |  FROM f)
      |SELECT doc_id, n_frames,
      |  CAST(CASE WHEN n_frames > 0 THEN
      |    coalesce(len(list_filter(deltas, x -> x * n_frames > 2 * total)), 0) + 1
      |    ELSE 0 END AS BIGINT) AS n_shots,
      |  CAST(coalesce(list_aggregate(deltas, 'max'), 0) AS BIGINT) AS max_delta
      |FROM st ORDER BY doc_id""".stripMargin

  /** C573 set_except_all_sym — BAG symmetric difference with
    * multiplicities: the even-key and odd-key order streams' priority
    * multisets, `exceptAll` run BOTH directions (Spark's bag EXCEPT
    * ALL keeps surviving multiplicities — the SQL:2003 semantics
    * DISTINCT except destroys), unioned with a side tag and
    * re-counted. Verifies surviving multiplicity = |countA − countB|
    * per value on the correct side.
    */
  def setExceptAllSym(s: SparkSession, d: String): DataFrame = {
    val a = orders(s, d).filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderpriority").as("pri"))
    val b = orders(s, d).filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderpriority").as("pri"))
    a.exceptAll(b).select(lit("a_minus_b").as("side"), col("pri"))
      .unionAll(b.exceptAll(a).select(lit("b_minus_a").as("side"), col("pri")))
      .groupBy("side", "pri")
      .agg(count(lit(1)).cast("long").as("surviving"))
      .orderBy("side", "pri")
  }
  val setExceptAllSymSql: String =
    """WITH a AS (SELECT o_orderpriority AS pri FROM orders WHERE o_orderkey % 2 = 0),
      |b AS (SELECT o_orderpriority AS pri FROM orders WHERE o_orderkey % 2 = 1),
      |sym AS (
      |  SELECT 'a_minus_b' AS side, pri FROM (SELECT pri FROM a EXCEPT ALL SELECT pri FROM b)
      |  UNION ALL
      |  SELECT 'b_minus_a' AS side, pri FROM (SELECT pri FROM b EXCEPT ALL SELECT pri FROM a))
      |SELECT side, pri, CAST(count(*) AS BIGINT) AS surviving
      |FROM sym GROUP BY side, pri ORDER BY side, pri""".stripMargin

  /** C574 embed_cluster_purity — external cluster validation of the
    * C159 fixed-point k-means against the label column: per-cluster
    * majority label (ties → lowest label, the row_number spelling in
    * both engines) and the corpus purity Σ_c max_l n_cl / N — exact
    * integer counts, ONE final division. Both rows grade the SAME
    * fitted model: the assignments come from [[Extras36.kmeansFit]]
    * and the oracle reuses the identical CTE chain.
    */
  def embedClusterPurity(s: SparkSession, d: String): DataFrame = {
    val (assign, _) = Extras36.kmeansFit(s, d)
    val lab = embeddings(s, d).select(col("vec_id"), col("label"))
    val cl = assign.join(lab, "vec_id")
      .groupBy(col("c"), col("label"))
      .agg(count(lit(1)).cast("long").as("n_cl"))
    val maj = cl.withColumn("rn", row_number().over(
        Window.partitionBy("c").orderBy(col("n_cl").desc, col("label"))))
      .filter(col("rn") === 1)
      .select(col("c"), col("label").as("majority_label"),
        col("n_cl").as("majority_n"))
    val tot = cl.agg(sum(col("n_cl")).cast("long").as("nn"))
    val pur = maj.agg(sum(col("majority_n")).cast("long").as("mn"))
    maj
      .join(cl.groupBy("c").agg(sum(col("n_cl")).cast("long").as("n_vecs")), "c")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(pur))
      .selectExpr("c", "n_vecs", "majority_label", "majority_n",
        "round(CAST(mn AS DOUBLE) / nn, 6) AS corpus_purity")
      .orderBy("c")
  }
  val embedClusterPuritySql: String =
    s"""${Extras36.kmeansCtesSql},
       |cl AS (
       |  SELECT af.c, e.label, CAST(count(*) AS BIGINT) AS n_cl
       |  FROM af JOIN embeddings e ON af.vec_id = e.vec_id
       |  GROUP BY 1, 2),
       |maj AS (
       |  SELECT c, label AS majority_label, n_cl AS majority_n FROM (
       |    SELECT c, label, n_cl,
       |      row_number() OVER (PARTITION BY c ORDER BY n_cl DESC, label) AS rn
       |    FROM cl) WHERE rn = 1),
       |tot AS (SELECT CAST(sum(n_cl) AS BIGINT) AS nn FROM cl),
       |pur AS (SELECT CAST(sum(majority_n) AS BIGINT) AS mn FROM maj),
       |nv AS (SELECT c, CAST(sum(n_cl) AS BIGINT) AS n_vecs FROM cl GROUP BY c)
       |SELECT maj.c AS c, n_vecs, majority_label, majority_n,
       |  round(CAST(mn AS DOUBLE) / nn, 6) AS corpus_purity
       |FROM maj JOIN nv ON maj.c = nv.c, tot, pur
       |ORDER BY c""".stripMargin

  /** C575 dim_junk_encode — the star-schema JUNK DIMENSION: the
    * low-cardinality flag combos (o_orderstatus × o_orderpriority)
    * collapse into one surrogate-keyed dim (row_number over the
    * BOUNDED distinct frame, ordered — deterministic surrogate keys),
    * and the fact side re-joins on the natural combo to carry the
    * surrogate. Report = the dim with fact counts + exact revenue per
    * junk key, proving the encode/decode roundtrip loses nothing.
    */
  def dimJunkEncode(s: SparkSession, d: String): DataFrame = {
    val combos = orders(s, d).select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .withColumn("junk_id", row_number().over(
        Window.orderBy("o_orderstatus", "o_orderpriority")).cast("long"))
    orders(s, d)
      .join(broadcast(combos), Seq("o_orderstatus", "o_orderpriority"))
      .groupBy("junk_id", "o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).cast("long").as("n_orders"),
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("long").as("cents"))
      .selectExpr("junk_id", "o_orderstatus", "o_orderpriority", "n_orders",
        "round(CAST(cents AS DOUBLE) / 100, 6) AS revenue")
      .orderBy("junk_id")
  }
  val dimJunkEncodeSql: String =
    """WITH combos AS (
      |  SELECT o_orderstatus, o_orderpriority,
      |    CAST(row_number() OVER (ORDER BY o_orderstatus, o_orderpriority)
      |      AS BIGINT) AS junk_id
      |  FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders))
      |SELECT junk_id, o.o_orderstatus, o.o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  round(CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
      |    AS BIGINT)) AS BIGINT) AS DOUBLE) / 100, 6) AS revenue
      |FROM orders o JOIN combos
      |  ON o.o_orderstatus = combos.o_orderstatus
      |  AND o.o_orderpriority = combos.o_orderpriority
      |GROUP BY 1, 2, 3 ORDER BY junk_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_shot_boundaries" -> (multimodalShotBoundaries _),
    "set_except_all_sym" -> (setExceptAllSym _),
    "embed_cluster_purity" -> (embedClusterPurity _),
    "dim_junk_encode" -> (dimJunkEncode _),
  )

  val oracle: Map[String, String] = Map(
    "multimodal_shot_boundaries" -> multimodalShotBoundariesSql,
    "set_except_all_sym" -> setExceptAllSymSql,
    "embed_cluster_purity" -> embedClusterPuritySql,
    "dim_junk_encode" -> dimJunkEncodeSql,
  )
}
