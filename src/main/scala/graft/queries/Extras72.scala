package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Seventy-second wave: sequence-packing census (the tokens→training-
  * sequences layout step), the SQL named-WINDOW surface, and a
  * deterministic subsample-replication confidence interval.
  */
object Extras72 {

  /** pipeline_sequence_pack — concat-and-chunk SEQUENCE PACKING (the
    * layout step between a tokenized corpus and fixed-length training
    * sequences): documents concatenate in deterministic md5 order and
    * chop into 512-token sequences; a document whose span straddles a
    * boundary is split across two sequences. The per-doc start offset
    * is GlobalRank's distributed prefix-sum (the C129 machinery — no
    * single-partition window), sequence ids are pure arithmetic on the
    * offset, and the census (docs, sequences, boundary-crossing docs,
    * tail fill) is what a packing run reports before training starts.
    */
  def pipelineSequencePack(s: SparkSession, d: String): DataFrame = {
    val cap = 512L
    val docs = documents(s, d).select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"),
      md5(col("doc_id").cast("string")).as("h"))
    graft.plans.GlobalRank.withExclusivePrefixSum(
        docs, "tok_before", col("n_tok"), Seq(col("h").asc))
      .select(col("n_tok"), col("tok_before"),
        (col("tok_before") / cap).cast("long").as("seq_first"),
        ((col("tok_before") + col("n_tok") - 1) / cap).cast("long").as("seq_last"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        (ceil(sum(col("n_tok")).cast("double") / cap)).cast("long").as("n_seqs"),
        sum(when(col("seq_last") > col("seq_first"), 1L).otherwise(0L))
          .as("n_crossing"),
        (sum(col("n_tok")) % cap).as("tail_fill_tok"))
  }
  val pipelineSequencePackSql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
      |    md5(CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |pre AS (
      |  SELECT n_tok,
      |    coalesce(sum(n_tok) OVER (ORDER BY h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
      |  FROM docs)
      |SELECT count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(ceil(CAST(sum(n_tok) AS DOUBLE) / 512) AS BIGINT) AS n_seqs,
      |  CAST(sum(CASE WHEN (tok_before + n_tok - 1) // 512 > tok_before // 512
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing,
      |  CAST(sum(n_tok) % 512 AS BIGINT) AS tail_fill_tok
      |FROM pre""".stripMargin

  /** sql_named_window — the SQL WINDOW clause: one named frame
    * definition shared by three window functions (rank, running sum,
    * lead) instead of three inline OVER copies — the spelling every
    * analyst-facing SQL surface must parse, and a single-definition
    * guarantee that all three functions see the SAME partitioning and
    * ORDER (divergent inline copies are a classic silent bug; the
    * unique (ts, event_id) order makes the default RANGE frame
    * row-equivalent). The window partitions by user — Spark plans ONE
    * exchange + sort for all three functions.
    */
  def sqlNamedWindow(s: SparkSession, d: String): DataFrame = {
    events(s, d).createOrReplaceTempView("nw_events")
    s.sql("""
      SELECT user_id,
        count(*) AS n,
        CAST(max(rk) AS BIGINT) AS max_rk,
        CAST(max(run_cnt) AS BIGINT) AS final_cnt,
        CAST(sum(CASE WHEN nxt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_last
      FROM (
        SELECT user_id,
          rank()        OVER w AS rk,
          count(*)      OVER w AS run_cnt,
          lead(event_id) OVER w AS nxt
        FROM nw_events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
      WHERE user_id % 7 = 0
      GROUP BY user_id ORDER BY user_id""")
  }
  val sqlNamedWindowSql: String =
    """SELECT user_id,
      |  count(*) AS n,
      |  max(rk) AS max_rk,
      |  CAST(max(run_cnt) AS BIGINT) AS final_cnt,
      |  CAST(sum(CASE WHEN nxt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_last
      |FROM (
      |  SELECT user_id,
      |    rank()        OVER w AS rk,
      |    count(*)      OVER w AS run_cnt,
      |    lead(event_id) OVER w AS nxt
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
      |WHERE user_id % 7 = 0
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** stat_subsample_ci — a DETERMINISTIC subsample-replication
    * confidence interval for the mean (the hash-replicate cousin of
    * the Poisson bootstrap used on clusters precisely because it needs
    * no RNG state): 64 half-sample replicates, row membership in
    * replicate r decided by bit r of the row's ONE md5 digest (hex
    * digit r/4, bit r%4 — 64 independent fair bits per row, ONE hash
    * per row instead of one per (row, replicate); the per-pair md5
    * spelling this replaced spent its whole 3.2 s hashing 64× the
    * corpus) — reproducible across engines, reruns, and
    * partitionings, unlike rand(). Each
    * replicate's mean is an exact-decimal sum with ONE final IEEE
    * division; the CI bounds are ELEMENT selections
    * (percentile_disc) from the 64-row replicate frame — never
    * interpolated float math over an order-dependent collection.
    * Scale: the 64× expansion is map-side generate + immediate partial
    * aggregation into 64 groups; nothing corpus-sized shuffles.
    */
  def statSubsampleCi(s: SparkSession, d: String): DataFrame = {
    val reps = events(s, d)
      .select(col("event_id"), dec(col("value")).as(("v")))
      .withColumn("hx", md5(col("event_id").cast("string")))
      .withColumn("r", explode(sequence(lit(0), lit(63))))
      .filter(expr(
        """(shiftright(
          |   instr('0123456789abcdef',
          |     substring(hx, CAST(r DIV 4 AS INT) + 1, 1)) - 1,
          |   CAST(r % 4 AS INT)) & 1) = 1""".stripMargin))
      .groupBy("r")
      .agg((sum(col("v")).cast("double") / count(lit(1))).as("m"))
    val full = events(s, d).agg(davg(col("value")).as("mean_full"))
    reps.agg(
        count(lit(1)).as("n_replicates"),
        round(expr("percentile_disc(0.03125) WITHIN GROUP (ORDER BY m)"), 6)
          .as("ci_lo"),
        round(expr("percentile_disc(0.96875) WITHIN GROUP (ORDER BY m)"), 6)
          .as("ci_hi"))
      .crossJoin(broadcast(full))
      .select(col("n_replicates"), round(col("mean_full"), 6).as("mean_full"),
        col("ci_lo"), col("ci_hi"))
  }
  val statSubsampleCiSql: String =
    """WITH reps AS (
      |  SELECT r,
      |    CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS m
      |  FROM (SELECT *, md5(CAST(event_id AS VARCHAR)) AS hx FROM events),
      |    (SELECT unnest(generate_series(0, 63)) AS r)
      |  WHERE ((instr('0123456789abcdef',
      |      substr(hx, CAST(r // 4 AS INT) + 1, 1)) - 1)
      |      >> CAST(r % 4 AS INT)) & 1 = 1
      |  GROUP BY 1)
      |SELECT count(*) AS n_replicates,
      |  (SELECT round(CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE)
      |     / count(*), 6) FROM events) AS mean_full,
      |  round(percentile_disc(0.03125) WITHIN GROUP (ORDER BY m), 6) AS ci_lo,
      |  round(percentile_disc(0.96875) WITHIN GROUP (ORDER BY m), 6) AS ci_hi
      |FROM reps""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_sequence_pack" -> (pipelineSequencePack _),
    "sql_named_window" -> (sqlNamedWindow _),
    "stat_subsample_ci" -> (statSubsampleCi _))

  val oracle: Map[String, String] = Map(
    "pipeline_sequence_pack" -> pipelineSequencePackSql,
    "sql_named_window" -> sqlNamedWindowSql,
    "stat_subsample_ci" -> statSubsampleCiSql)
}
