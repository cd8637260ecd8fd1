package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 125 (C904–C907): retrieval evaluation + summarization overlap +
  * probabilistic record linkage — MRR, MAP@10/P@10/recall@10, corpus
  * ROUGE-1/2, and the Fellegi–Sunter agreement-weight table.
  *
  * Shared discipline: MRR never materializes a per-query ranking — the
  * first relevant rank is reconstructed from a 25-row argmax broadcast
  * plus one conditional count; MAP@10 rides WindowGroupLimit (rank
  * filter pushed to per-partition partial top-k, never a full
  * per-brand sort on one task); per-query/per-pair fractions are
  * quantized (·10⁹, or exact 2520-LCM integer numerators) before the
  * corpus mean so both engines sum identical integers; FS u-weights
  * come from exact value histograms, never from pair enumeration.
  */
object Extras225 {

  /** C904 analytics_mrr — mean reciprocal rank over the 25 brand
    * "queries": per brand, parts ranked by (retailprice desc, partkey)
    * and a part is relevant when p_size > 25; MRR = mean of 1/rank of
    * the first relevant part, with 1/rank the EXACT integer division
    * 10⁹ div rank. The leaderboard metric for any first-answer
    * retrieval stack.
    * Scale: the first relevant part per brand is an argmax (max_by on
    * the order key), its rank = 1 + one conditional count against the
    * 25-row broadcast — no per-brand global sort anywhere.
    */
  def analyticsMrr(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).select(col("p_brand"), col("p_partkey"),
      expr("CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("pr"),
      expr("CASE WHEN p_size > 25 THEN 1L ELSE 0L END").as("rel"))
    // first relevant per brand in (pr desc, partkey asc) order: max_by
    // over the order-embedding key (pr, -partkey)
    val star = p.filter(col("rel") === 1L)
      .groupBy("p_brand")
      .agg(max(struct(col("pr"), (-col("p_partkey")).as("nk"))).as("k"))
      .select(col("p_brand"), col("k.pr").as("spr"), (-col("k.nk")).as("skey"))
    val ranked = p.join(broadcast(star), Seq("p_brand"))
      .groupBy("p_brand")
      .agg((sum(expr("CASE WHEN pr > spr OR (pr = spr AND p_partkey < skey) THEN 1L ELSE 0L END"))
        + 1L).cast("long").as("first_rank"))
    ranked.agg(count(lit(1)).cast("long").as("n_queries"),
        sum(expr("1000000000L div first_rank")).cast("long").as("rrq"),
        sum(col("first_rank")).cast("long").as("sfr"))
      .selectExpr("n_queries",
        "round(CAST(rrq AS DOUBLE) / n_queries / 1e9, 6) AS mrr",
        "round(CAST(sfr AS DOUBLE) / n_queries, 2) AS mean_first_rank")
  }
  val analyticsMrrSql: String =
    """WITH p AS (
      |  SELECT p_brand, p_partkey,
      |    CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS pr,
      |    CASE WHEN p_size > 25 THEN 1 ELSE 0 END AS rel
      |  FROM part),
      |star AS (
      |  SELECT p_brand, pr AS spr, p_partkey AS skey FROM (
      |    SELECT p_brand, pr, p_partkey,
      |      row_number() OVER (PARTITION BY p_brand ORDER BY pr DESC, p_partkey) AS rr
      |    FROM p WHERE rel = 1) WHERE rr = 1),
      |ranked AS (
      |  SELECT p.p_brand,
      |    CAST(sum(CASE WHEN pr > spr OR (pr = spr AND p_partkey < skey) THEN 1 ELSE 0 END) + 1 AS BIGINT) AS first_rank
      |  FROM p JOIN star ON p.p_brand = star.p_brand GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_queries,
      |  round(CAST(sum(1000000000 // first_rank) AS DOUBLE) / count(*) / 1e9, 6) AS mrr,
      |  round(CAST(sum(first_rank) AS DOUBLE) / count(*), 2) AS mean_first_rank
      |FROM ranked""".stripMargin

  /** C905 analytics_map_at_k — MAP@10, precision@10 and recall@10 over
    * the same 25 brand queries: row_number within brand ordered
    * (retailprice desc, partkey), rank ≤ 10 filter (planned as
    * WindowGroupLimit — each map task keeps a local top-10 per brand
    * BEFORE the shuffle, so no brand ever needs a full single-task
    * sort), AP@10 with the exact 2520-LCM integer numerator
    * Σ rel(k)·cumrel(k)·(2520/k) so the per-query fraction is a
    * rational of exact integers. The ranking-quality triple every
    * retrieval eval reports.
    */
  def analyticsMapAtK(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).select(col("p_brand"), col("p_partkey"),
      expr("CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("pr"),
      expr("CASE WHEN p_size > 25 THEN 1L ELSE 0L END").as("rel"))
    val relTot = p.groupBy("p_brand").agg(sum(col("rel")).cast("long").as("nrel"))
    val top = p.withColumn("rn", row_number().over(
        Window.partitionBy("p_brand").orderBy(col("pr").desc, col("p_partkey").asc)))
      .filter(col("rn") <= 10)
      .withColumn("cumrel", sum(col("rel")).over(
        Window.partitionBy("p_brand").orderBy("rn")
          .rowsBetween(Window.unboundedPreceding, 0)))
    val perQ = top.groupBy("p_brand")
      .agg(sum(expr("CASE WHEN rel = 1 THEN cumrel * (2520L div rn) ELSE 0L END"))
          .cast("long").as("apnum"),
        sum(col("rel")).cast("long").as("rel10"))
      .join(relTot, Seq("p_brand"))
      .select(
        expr("""CAST(floor(CASE WHEN nrel = 0 THEN CAST(0 AS DOUBLE)
          |ELSE CAST(apnum AS DOUBLE) / 2520 / least(nrel, 10L) END * 1e9 + 0.5) AS BIGINT)""".stripMargin)
          .as("apq"),
        col("rel10"),
        expr("""CAST(floor(CASE WHEN nrel = 0 THEN CAST(0 AS DOUBLE)
          |ELSE CAST(rel10 AS DOUBLE) / nrel END * 1e9 + 0.5) AS BIGINT)""".stripMargin).as("recq"))
    perQ.agg(count(lit(1)).cast("long").as("n_queries"),
        sum(col("apq")).cast("long").as("sap"),
        sum(col("rel10")).cast("long").as("srel10"),
        sum(col("recq")).cast("long").as("srec"))
      .selectExpr("n_queries",
        "round(CAST(sap AS DOUBLE) / n_queries / 1e9, 6) AS map_at_10",
        "round(CAST(srel10 AS DOUBLE) / n_queries / 10, 6) AS p_at_10",
        "round(CAST(srec AS DOUBLE) / n_queries / 1e9, 6) AS recall_at_10")
  }
  val analyticsMapAtKSql: String =
    """WITH p AS (
      |  SELECT p_brand, p_partkey,
      |    CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS pr,
      |    CASE WHEN p_size > 25 THEN 1 ELSE 0 END AS rel
      |  FROM part),
      |reltot AS (SELECT p_brand, CAST(sum(rel) AS BIGINT) AS nrel FROM p GROUP BY 1),
      |top AS (
      |  SELECT * FROM (
      |    SELECT p_brand, rel,
      |      row_number() OVER (PARTITION BY p_brand ORDER BY pr DESC, p_partkey) AS rn
      |    FROM p) WHERE rn <= 10),
      |cum AS (
      |  SELECT p_brand, rel, rn,
      |    sum(rel) OVER (PARTITION BY p_brand ORDER BY rn
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumrel
      |  FROM top),
      |perq AS (
      |  SELECT c.p_brand,
      |    CAST(floor(CASE WHEN max(nrel) = 0 THEN CAST(0 AS DOUBLE)
      |      ELSE CAST(sum(CASE WHEN rel = 1 THEN cumrel * (2520 // rn) ELSE 0 END) AS DOUBLE)
      |      / 2520 / least(max(nrel), 10) END * 1e9 + 0.5) AS BIGINT) AS apq,
      |    CAST(sum(rel) AS BIGINT) AS rel10,
      |    CAST(floor(CASE WHEN max(nrel) = 0 THEN CAST(0 AS DOUBLE)
      |      ELSE CAST(sum(rel) AS DOUBLE) / max(nrel) END * 1e9 + 0.5) AS BIGINT) AS recq
      |  FROM cum c JOIN reltot r ON c.p_brand = r.p_brand GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_queries,
      |  round(CAST(sum(apq) AS DOUBLE) / count(*) / 1e9, 6) AS map_at_10,
      |  round(CAST(sum(rel10) AS DOUBLE) / count(*) / 10, 6) AS p_at_10,
      |  round(CAST(sum(recq) AS DOUBLE) / count(*) / 1e9, 6) AS recall_at_10
      |FROM perq""".stripMargin

  /** C906 text_rouge_n — corpus ROUGE-1 and ROUGE-2 (clipped n-gram
    * overlap) between each document and its doc_id+1 successor as the
    * reference: per pair, overlap = Σ_g min(count_cand, count_ref)
    * over an equi-join of per-gram counts, recall = ov/ref_total,
    * precision = ov/cand_total, F1 — each quantized ·10⁹ per pair
    * before the corpus mean. The summarization/near-dup overlap
    * metric, exact and engine-identical.
    * Scale: pairing is an equi-join on doc_id+1 (never a per-lang
    * single-task window); gram counting is explode + groupBy — linear,
    * shuffled on (pair, gram).
    */
  def textRougeN(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
    def grams(n: Int) = {
      // size >= 2 filter BEFORE the sequence: Spark's sequence(1, 0)
      // would generate the DESCENDING [1, 0] rather than the empty list
      val g = if (n == 1) docs.select(col("doc_id"), explode(col("toks")).as("g"))
      else docs.filter(size(col("toks")) >= 2).select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
        .as("g"))
      g.groupBy("doc_id", "g").agg(count(lit(1)).cast("long").as("c"))
    }
    def rouge(n: Int, tag: String) = {
      val cand = grams(n)
      val ref = grams(n).select((col("doc_id") - 1).as("doc_id"), col("g"), col("c").as("rc"))
      val ov = cand.join(ref, Seq("doc_id", "g"))
        .groupBy("doc_id").agg(sum(least(col("c"), col("rc"))).cast("long").as("ov"))
      val ct = cand.groupBy("doc_id").agg(sum(col("c")).cast("long").as("ct"))
      val rt = ref.groupBy("doc_id").agg(sum(col("rc")).cast("long").as("rt"))
      ct.join(rt, Seq("doc_id")).join(ov, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("ov"), lit(0L)).as("ov"), col("ct"), col("rt"))
        .select(
          expr("CAST(floor(CAST(ov AS DOUBLE) / rt * 1e9 + 0.5) AS BIGINT)").as(s"${tag}_recq"),
          expr(s"""CAST(floor(CASE WHEN ov = 0 THEN CAST(0 AS DOUBLE)
            |ELSE CAST(2 AS DOUBLE) * ov / (ct + rt) END * 1e9 + 0.5) AS BIGINT)""".stripMargin).as(s"${tag}_f1q"))
        .agg(count(lit(1)).cast("long").as(s"${tag}_pairs"),
          sum(col(s"${tag}_recq")).cast("long").as(s"${tag}_rec"),
          sum(col(s"${tag}_f1q")).cast("long").as(s"${tag}_f1"))
    }
    rouge(1, "r1").crossJoin(broadcast(rouge(2, "r2")))
      .selectExpr("r1_pairs AS n_pairs",
        "round(CAST(r1_rec AS DOUBLE) / r1_pairs / 1e9, 6) AS rouge1_recall",
        "round(CAST(r1_f1 AS DOUBLE) / r1_pairs / 1e9, 6) AS rouge1_f1",
        "round(CAST(r2_rec AS DOUBLE) / r2_pairs / 1e9, 6) AS rouge2_recall",
        "round(CAST(r2_f1 AS DOUBLE) / r2_pairs / 1e9, 6) AS rouge2_f1")
  }
  val textRougeNSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |u1 AS (
      |  SELECT doc_id, unnest(t) AS g FROM toks),
      |u2 AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
      |    i -> t[i] || ' ' || t[i + 1])) AS g
      |  FROM toks),
      |c1 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM u1 GROUP BY 1, 2),
      |c2 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM u2 GROUP BY 1, 2),
      |p1 AS (
      |  SELECT ct.doc_id,
      |    coalesce(ov.ov, 0) AS ov, ct.ct, rt.rt
      |  FROM (SELECT doc_id, CAST(sum(c) AS BIGINT) AS ct FROM c1 GROUP BY 1) ct
      |  JOIN (SELECT doc_id - 1 AS doc_id, CAST(sum(c) AS BIGINT) AS rt FROM c1 GROUP BY 1) rt
      |    ON ct.doc_id = rt.doc_id
      |  LEFT JOIN (
      |    SELECT a.doc_id, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
      |    FROM c1 a JOIN (SELECT doc_id - 1 AS doc_id, g, c FROM c1) b
      |      ON a.doc_id = b.doc_id AND a.g = b.g GROUP BY 1) ov
      |    ON ct.doc_id = ov.doc_id),
      |p2 AS (
      |  SELECT ct.doc_id,
      |    coalesce(ov.ov, 0) AS ov, ct.ct, rt.rt
      |  FROM (SELECT doc_id, CAST(sum(c) AS BIGINT) AS ct FROM c2 GROUP BY 1) ct
      |  JOIN (SELECT doc_id - 1 AS doc_id, CAST(sum(c) AS BIGINT) AS rt FROM c2 GROUP BY 1) rt
      |    ON ct.doc_id = rt.doc_id
      |  LEFT JOIN (
      |    SELECT a.doc_id, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
      |    FROM c2 a JOIN (SELECT doc_id - 1 AS doc_id, g, c FROM c2) b
      |      ON a.doc_id = b.doc_id AND a.g = b.g GROUP BY 1) ov
      |    ON ct.doc_id = ov.doc_id),
      |a1 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n1,
      |    CAST(sum(CAST(floor(CAST(ov AS DOUBLE) / rt * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS rec,
      |    CAST(sum(CAST(floor(CASE WHEN ov = 0 THEN CAST(0 AS DOUBLE)
      |      ELSE CAST(2 AS DOUBLE) * ov / (ct + rt) END * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS f1
      |  FROM p1),
      |a2 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n2,
      |    CAST(sum(CAST(floor(CAST(ov AS DOUBLE) / rt * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS rec,
      |    CAST(sum(CAST(floor(CASE WHEN ov = 0 THEN CAST(0 AS DOUBLE)
      |      ELSE CAST(2 AS DOUBLE) * ov / (ct + rt) END * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS f1
      |  FROM p2)
      |SELECT n1 AS n_pairs,
      |  round(CAST(a1.rec AS DOUBLE) / n1 / 1e9, 6) AS rouge1_recall,
      |  round(CAST(a1.f1 AS DOUBLE) / n1 / 1e9, 6) AS rouge1_f1,
      |  round(CAST(a2.rec AS DOUBLE) / n2 / 1e9, 6) AS rouge2_recall,
      |  round(CAST(a2.f1 AS DOUBLE) / n2 / 1e9, 6) AS rouge2_f1
      |FROM a1, a2""".stripMargin

  /** C907 dedup_fellegi_sunter — the Fellegi–Sunter agreement-weight
    * table for part-record linkage on (brand, type, size): chance-
    * agreement probabilities u_f = Σc(c−1)/(n(n−1)) from EXACT value
    * histograms (never pair enumeration), literature-default
    * m-probabilities (brand .95 / type .90 / size .85, documented),
    * per-field log₂ agree/disagree weights, and the composite weight
    * of each of the 8 agreement patterns with its match/possible/
    * non-match band (±6 bits). The blocking-free half of a linkage
    * deployment: the weights any pair scorer would apply.
    * Scale: three value-histogram aggregates + an 8-row literal
    * pattern explode — O(n) with a 1-row broadcast.
    */
  def dedupFellegiSunter(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d)
    def u(c: String) = p.groupBy(col(c)).agg(count(lit(1)).cast("long").as("c"))
      .agg(sum(expr("c * (c - 1)")).cast("decimal(38,0)").as("a"),
        sum(col("c")).cast("long").as("n"))
      .selectExpr("CAST(a AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)) AS u")
    val us = u("p_brand").selectExpr("u AS ub")
      .crossJoin(broadcast(u("p_type").selectExpr("u AS ut")))
      .crossJoin(broadcast(u("p_size").selectExpr("u AS us")))
    val pats = us.select(explode(expr("sequence(0L, 7L)")).as("pid"),
      col("ub"), col("ut"), col("us"))
    pats.selectExpr("pid",
        "CAST(pid div 4 AS BIGINT) AS agree_brand",
        "CAST((pid div 2) % 2 AS BIGINT) AS agree_type",
        "CAST(pid % 2 AS BIGINT) AS agree_size",
        """round(
          |  (CASE WHEN pid div 4 = 1 THEN log2(0.95 / ub) ELSE log2(0.05 / (1 - ub)) END)
          |+ (CASE WHEN (pid div 2) % 2 = 1 THEN log2(0.90 / ut) ELSE log2(0.10 / (1 - ut)) END)
          |+ (CASE WHEN pid % 2 = 1 THEN log2(0.85 / us) ELSE log2(0.15 / (1 - us)) END), 6)
          |AS weight_bits""".stripMargin)
      .withColumn("band", expr(
        """CASE WHEN weight_bits >= 6 THEN 'match'
          |WHEN weight_bits <= -6 THEN 'non_match'
          |ELSE 'possible' END""".stripMargin))
      .orderBy("pid")
  }
  val dedupFellegiSunterSql: String =
    """WITH ub AS (
      |  SELECT CAST(sum(c * (c - 1)) AS DOUBLE)
      |    / (CAST(sum(c) AS DOUBLE) * (sum(c) - 1)) AS ub
      |  FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM part GROUP BY p_brand)),
      |ut AS (
      |  SELECT CAST(sum(c * (c - 1)) AS DOUBLE)
      |    / (CAST(sum(c) AS DOUBLE) * (sum(c) - 1)) AS ut
      |  FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM part GROUP BY p_type)),
      |us AS (
      |  SELECT CAST(sum(c * (c - 1)) AS DOUBLE)
      |    / (CAST(sum(c) AS DOUBLE) * (sum(c) - 1)) AS us
      |  FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM part GROUP BY p_size)),
      |pats AS (
      |  SELECT unnest(generate_series(0, 7)) AS pid, ub, ut, us FROM ub, ut, us),
      |w AS (
      |  SELECT pid,
      |    CAST(pid // 4 AS BIGINT) AS agree_brand,
      |    CAST((pid // 2) % 2 AS BIGINT) AS agree_type,
      |    CAST(pid % 2 AS BIGINT) AS agree_size,
      |    round(
      |      (CASE WHEN pid // 4 = 1 THEN log2(0.95 / ub) ELSE log2(0.05 / (1 - ub)) END)
      |    + (CASE WHEN (pid // 2) % 2 = 1 THEN log2(0.90 / ut) ELSE log2(0.10 / (1 - ut)) END)
      |    + (CASE WHEN pid % 2 = 1 THEN log2(0.85 / us) ELSE log2(0.15 / (1 - us)) END), 6)
      |    AS weight_bits
      |  FROM pats)
      |SELECT pid, agree_brand, agree_type, agree_size, weight_bits,
      |  CASE WHEN weight_bits >= 6 THEN 'match'
      |  WHEN weight_bits <= -6 THEN 'non_match'
      |  ELSE 'possible' END AS band
      |FROM w ORDER BY pid""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_mrr" -> (analyticsMrr _),
    "analytics_map_at_k" -> (analyticsMapAtK _),
    "text_rouge_n" -> (textRougeN _),
    "dedup_fellegi_sunter" -> (dedupFellegiSunter _),
  )

  val oracle: Map[String, String] = Map(
    "analytics_mrr" -> analyticsMrrSql,
    "analytics_map_at_k" -> analyticsMapAtKSql,
    "text_rouge_n" -> textRougeNSql,
    "dedup_fellegi_sunter" -> dedupFellegiSunterSql,
  )
}
