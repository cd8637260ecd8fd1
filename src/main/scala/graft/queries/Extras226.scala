package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 126 (C908–C911): motif discovery + translation overlap +
  * paired effect size + competing risks — the matrix profile on the
  * monthly series, corpus BLEU-2, the matched-pairs rank-biserial
  * correlation, and the Aalen–Johansen cumulative-incidence functions.
  *
  * Shared discipline: the matrix profile runs on the calendar-bounded
  * monthly grid (≤(months−5)² pairs, window arrays of exact cents,
  * BIGINT HOF dots); BLEU sums clipped counts at CORPUS level so no
  * per-pair float ever mixes engines; signed ranks ride GlobalRank
  * with tie-averages as exact (min+max) integers; the AJ estimator
  * quantizes per-day ln-survival terms and CIF increments before any
  * cumulative sum.
  */
object Extras226 {

  /** C908 time_matrix_profile — the z-normalized matrix profile (m=6)
    * of monthly revenue: for every 6-month window, the distance to its
    * nearest non-trivial neighbor (exclusion zone |i−j| ≤ 3), from
    * d²(i,j) = 2m(1−ρ) with ρ built out of exact integer window
    * moments and a BIGINT zip_with dot; the global motif (closest
    * repeated shape) and discord (most anomalous window) with
    * deterministic index tiebreaks. THE modern primitive for motif /
    * anomaly mining on series.
    * Scale: the subsequence grid is calendar-bounded (≤79×79 here and
    * at ANY sf) — whitelisted bounded BNLJ; the corpus pass is one
    * monthly groupBy.
    */
  def timeMatrixProfile(s: SparkSession, d: String): DataFrame = {
    val mf = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .withColumn("idx", row_number().over(Window.orderBy("m")).cast("long"))
    val wArr = Window.orderBy("idx").rowsBetween(0, 5)
    val starts = mf
      .withColumn("arr", collect_list(col("v")).over(wArr))
      .withColumn("nm", max(col("idx")).over(
        Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(expr("idx <= nm - 5"))
      .select(col("idx").as("i"), col("arr"),
        expr("aggregate(arr, 0L, (a, x) -> a + x)").as("s1"),
        // DECIMAL accumulator: Σv² of monthly cents is ~1e21 at sf100 —
        // past BIGINT; the frame is ≤79 rows so the boxed path is free
        expr("aggregate(arr, CAST(0 AS DECIMAL(38,0)), (a, x) -> a + CAST(x AS DECIMAL(38,0)) * x)").as("s2"))
    val b = starts.select(col("i").as("j"), col("arr").as("brr"),
      col("s1").as("t1"), col("s2").as("t2"))
    val pairs = starts.crossJoin(broadcast(b))
      .filter(expr("abs(i - j) > 3"))
      .select(col("i"), col("j"),
        expr("aggregate(zip_with(arr, brr, (x, y) -> CAST(x AS DECIMAL(38,0)) * y), CAST(0 AS DECIMAL(38,0)), (a, t) -> a + t)").as("dot"),
        col("s1"), col("s2"), col("t1"), col("t2"))
      .select(col("i"), col("j"), expr(
        """CAST(floor(CASE
          |WHEN 6 * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 <= 0
          |  OR 6 * CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * t1 <= 0 THEN CAST(12 AS DOUBLE)
          |ELSE 12 * (1 - (6 * CAST(dot AS DOUBLE) - CAST(s1 AS DOUBLE) * t1)
          |  / (sqrt(6 * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1)
          |     * sqrt(6 * CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * t1)))
          |END * 1e9 + 0.5) AS BIGINT)""".stripMargin).as("dq"))
    val prof = pairs.groupBy("i").agg(min(col("dq")).as("md"))
    val profJ = prof.join(pairs, Seq("i"))
      .filter(col("dq") === col("md"))
      .groupBy("i").agg(min(col("md")).as("md"), min(col("j")).as("nj"))
    val motif = profJ
      .agg(min(struct(col("md"), col("i"), col("nj"))).as("k"),
        // negate i so max-struct tiebreaks by SMALLEST index, matching
        // the oracle's min(i) among md = max
        max(struct(col("md"), (-col("i")).as("ni"))).as("x"),
        count(lit(1)).cast("long").as("n_subseq"))
    motif.selectExpr("n_subseq",
      "k.i AS motif_i", "k.nj AS motif_j",
      "round(CAST(k.md AS DOUBLE) / 1e9, 6) AS motif_d2",
      "-x.ni AS discord_i",
      "round(CAST(x.md AS DOUBLE) / 1e9, 6) AS discord_d2")
  }
  val timeMatrixProfileSql: String =
    """WITH mf AS (
      |  SELECT m, v, CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS idx FROM (
      |    SELECT date_trunc('month', o_orderdate) AS m,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1)),
      |starts AS (
      |  SELECT idx AS i, arr,
      |    CAST(list_sum(arr) AS BIGINT) AS s1,
      |    CAST(list_sum(list_transform(arr, x -> CAST(x AS HUGEINT) * x)) AS HUGEINT) AS s2
      |  FROM (
      |    SELECT idx, list(v) OVER (ORDER BY idx ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS arr,
      |      max(idx) OVER () AS nm
      |    FROM mf)
      |  WHERE idx <= nm - 5),
      |pairs AS (
      |  SELECT a.i, b.i AS j,
      |    CAST(floor(CASE
      |    WHEN 6 * CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * a.s1 <= 0
      |      OR 6 * CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * b.s1 <= 0 THEN CAST(12 AS DOUBLE)
      |    ELSE 12 * (1 - (6 * CAST(list_sum(list_transform(generate_series(1, 6),
      |        q -> CAST(a.arr[q] AS HUGEINT) * b.arr[q])) AS DOUBLE) - CAST(a.s1 AS DOUBLE) * b.s1)
      |      / (sqrt(6 * CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * a.s1)
      |         * sqrt(6 * CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * b.s1)))
      |    END * 1e9 + 0.5) AS BIGINT) AS dq
      |  FROM starts a, starts b WHERE abs(a.i - b.i) > 3),
      |prof AS (SELECT i, min(dq) AS md FROM pairs GROUP BY 1),
      |profj AS (
      |  SELECT p.i, min(p.md) AS md, min(q.j) AS nj
      |  FROM prof p JOIN pairs q ON p.i = q.i AND q.dq = p.md GROUP BY 1),
      |mo AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_subseq,
      |    min(md) AS mmd FROM profj),
      |mi AS (
      |  SELECT min(i) AS motif_i FROM profj, mo WHERE md = mmd),
      |mj AS (
      |  SELECT min(nj) AS motif_j, min(md) AS mdd FROM profj, mi WHERE i = motif_i),
      |dx AS (
      |  SELECT max(md) AS xmd FROM profj),
      |di AS (
      |  SELECT min(i) AS discord_i, min(md) AS dmd FROM profj, dx WHERE md = xmd)
      |SELECT n_subseq, motif_i, motif_j,
      |  round(CAST(mdd AS DOUBLE) / 1e9, 6) AS motif_d2,
      |  discord_i,
      |  round(CAST(dmd AS DOUBLE) / 1e9, 6) AS discord_d2
      |FROM mo, mi, mj, di""".stripMargin

  /** C909 text_bleu — corpus BLEU-2 against the doc_id+1 successor as
    * reference: modified n-gram precisions p₁/p₂ from CORPUS-level
    * clipped-match and candidate-total integer sums (the Papineni
    * corpus formulation — no per-pair float ever crosses engines),
    * brevity penalty from corpus lengths, BLEU = BP·√(p₁p₂). The
    * generation-quality yardstick next to ROUGE's recall view (C906).
    */
  def textBleu(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
    def grams(n: Int) = {
      val g = if (n == 1) docs.select(col("doc_id"), explode(col("toks")).as("g"))
      else docs.filter(size(col("toks")) >= 2).select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
        .as("g"))
      g.groupBy("doc_id", "g").agg(count(lit(1)).cast("long").as("c"))
    }
    // pairs that exist for BOTH orders (cand has a successor)
    val pairIds = docs.select(col("doc_id")).join(
      docs.select((col("doc_id") - 1).as("doc_id")), Seq("doc_id")).distinct()
    def level(n: Int, tag: String) = {
      val cand = grams(n).join(pairIds, Seq("doc_id"))
      val ref = grams(n).select((col("doc_id") - 1).as("doc_id"), col("g"), col("c").as("rc"))
      val ov = cand.join(ref, Seq("doc_id", "g"))
        .agg(sum(least(col("c"), col("rc"))).cast("long").as(s"${tag}_clip"))
      val ct = cand.agg(sum(col("c")).cast("long").as(s"${tag}_tot"))
      ov.crossJoin(broadcast(ct))
    }
    val lens = docs.join(pairIds, Seq("doc_id"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("cl"))
      .join(docs.select((col("doc_id") - 1).as("doc_id"),
        size(col("toks")).cast("long").as("rl")), Seq("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(col("cl")).cast("long").as("clen"), sum(col("rl")).cast("long").as("rlen"))
    lens.crossJoin(broadcast(level(1, "p1"))).crossJoin(broadcast(level(2, "p2")))
      .selectExpr("n_pairs",
        "round(CAST(p1_clip AS DOUBLE) / p1_tot, 6) AS p1",
        "round(CAST(p2_clip AS DOUBLE) / p2_tot, 6) AS p2",
        """round(CASE WHEN clen >= rlen THEN CAST(1 AS DOUBLE)
          |ELSE exp(CAST(1 AS DOUBLE) - CAST(rlen AS DOUBLE) / clen) END, 6) AS brevity_penalty""".stripMargin,
        """round(CASE WHEN p1_clip = 0 OR p2_clip = 0 THEN CAST(0 AS DOUBLE)
          |ELSE (CASE WHEN clen >= rlen THEN CAST(1 AS DOUBLE)
          |      ELSE exp(CAST(1 AS DOUBLE) - CAST(rlen AS DOUBLE) / clen) END)
          |  * exp((ln(CAST(p1_clip AS DOUBLE) / p1_tot)
          |       + ln(CAST(p2_clip AS DOUBLE) / p2_tot)) / 2)
          |END, 6) AS bleu2""".stripMargin)
  }
  val textBleuSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |pairids AS (
      |  SELECT a.doc_id FROM toks a JOIN toks b ON a.doc_id = b.doc_id - 1),
      |c1 AS (
      |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(t) AS g FROM toks) GROUP BY 1, 2),
      |c2 AS (
      |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
      |    i -> t[i] || ' ' || t[i + 1])) AS g FROM toks WHERE len(t) >= 2) GROUP BY 1, 2),
      |l1 AS (
      |  SELECT
      |    (SELECT CAST(sum(least(a.c, b.c)) AS BIGINT)
      |     FROM c1 a JOIN pairids p ON a.doc_id = p.doc_id
      |     JOIN (SELECT doc_id - 1 AS doc_id, g, c FROM c1) b
      |       ON a.doc_id = b.doc_id AND a.g = b.g) AS p1_clip,
      |    (SELECT CAST(sum(a.c) AS BIGINT)
      |     FROM c1 a JOIN pairids p ON a.doc_id = p.doc_id) AS p1_tot),
      |l2 AS (
      |  SELECT
      |    (SELECT CAST(sum(least(a.c, b.c)) AS BIGINT)
      |     FROM c2 a JOIN pairids p ON a.doc_id = p.doc_id
      |     JOIN (SELECT doc_id - 1 AS doc_id, g, c FROM c2) b
      |       ON a.doc_id = b.doc_id AND a.g = b.g) AS p2_clip,
      |    (SELECT CAST(sum(a.c) AS BIGINT)
      |     FROM c2 a JOIN pairids p ON a.doc_id = p.doc_id) AS p2_tot),
      |lens AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(len(a.t)) AS BIGINT) AS clen,
      |    CAST(sum(len(b.t)) AS BIGINT) AS rlen
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id - 1)
      |SELECT n_pairs,
      |  round(CAST(p1_clip AS DOUBLE) / p1_tot, 6) AS p1,
      |  round(CAST(p2_clip AS DOUBLE) / p2_tot, 6) AS p2,
      |  round(CASE WHEN clen >= rlen THEN CAST(1 AS DOUBLE)
      |  ELSE exp(CAST(1 AS DOUBLE) - CAST(rlen AS DOUBLE) / clen) END, 6) AS brevity_penalty,
      |  round(CASE WHEN p1_clip = 0 OR p2_clip = 0 THEN CAST(0 AS DOUBLE)
      |  ELSE (CASE WHEN clen >= rlen THEN CAST(1 AS DOUBLE)
      |        ELSE exp(CAST(1 AS DOUBLE) - CAST(rlen AS DOUBLE) / clen) END)
      |    * exp((ln(CAST(p1_clip AS DOUBLE) / p1_tot)
      |         + ln(CAST(p2_clip AS DOUBLE) / p2_tot)) / 2)
      |  END, 6) AS bleu2
      |FROM lens, l1, l2""".stripMargin

  /** C910 stat_rank_biserial — the matched-pairs rank-biserial
    * correlation (the effect size for the Wilcoxon signed-rank test):
    * pairs = each repeat customer's first vs last order total (argmin/
    * argmax over the composite epoch-day·10¹⁰+orderkey BIGINT key —
    * identical semantics in both engines without struct aggregates),
    * zero differences dropped, |d| ranked by GlobalRank with exact
    * tie-averages 2r̄ = min(rn)+max(rn), r = (W⁺−W⁻)/(W⁺+W⁻) as a
    * rational of exact integers. The directional effect size a paired
    * before/after claim should quote beside its p-value.
    * Scale: one groupBy over customers, GlobalRank two-pass ranking —
    * no corpus-scale single-task window.
    */
  def statRankBiserial(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_custkey"),
      expr("""CAST(datediff(o_orderdate, DATE '1990-01-01') AS BIGINT) * 10000000000L
        | + o_orderkey""".stripMargin).as("ck"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("v"))
    val fl = o.groupBy("o_custkey")
      .agg(count(lit(1)).cast("long").as("cnt"),
        min_by(col("v"), col("ck")).as("vf"), max_by(col("v"), col("ck")).as("vl"))
      .filter(col("cnt") >= 2)
      .select(col("o_custkey"), (col("vl") - col("vf")).as("dd"))
      .filter(col("dd") =!= 0L)
    val ranked = graft.plans.GlobalRank.withGlobalRowNumberAndTotal(
      fl.select(col("o_custkey"), col("dd"), abs(col("dd")).as("ad")),
      "rn", "nn", Seq(col("ad").asc, col("o_custkey").asc))
    // exact tie-average: all rows sharing |d| get 2*rbar = min(rn)+max(rn)
    val ta = ranked.groupBy("ad")
      .agg(min(col("rn")).as("lo"), max(col("rn")).as("hi"))
    val w = ranked.join(ta, Seq("ad"))
      .agg(sum(expr("CASE WHEN dd > 0 THEN lo + hi ELSE 0L END")).cast("decimal(38,0)").as("w2p"),
        sum(expr("CASE WHEN dd < 0 THEN lo + hi ELSE 0L END")).cast("decimal(38,0)").as("w2m"),
        count(lit(1)).cast("long").as("np"))
    w.selectExpr("np AS n_pairs",
      "round(CAST(w2p AS DOUBLE) / 2, 1) AS w_plus",
      "round(CAST(w2m AS DOUBLE) / 2, 1) AS w_minus",
      """round((CAST(w2p AS DOUBLE) - CAST(w2m AS DOUBLE))
        |/ (CAST(w2p AS DOUBLE) + CAST(w2m AS DOUBLE)), 6) AS r_rank_biserial""".stripMargin,
      """CASE WHEN w2p > w2m THEN 'last_higher'
        |WHEN w2p < w2m THEN 'first_higher' ELSE 'even' END AS direction""".stripMargin)
  }
  val statRankBiserialSql: String =
    """WITH o AS (
      |  SELECT o_custkey,
      |    CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) * 10000000000 + o_orderkey AS ck,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |fl AS (
      |  SELECT o_custkey, max_by(v, ck) - min_by(v, ck) AS dd
      |  FROM o GROUP BY 1 HAVING count(*) >= 2),
      |nz AS (SELECT o_custkey, dd, abs(dd) AS ad FROM fl WHERE dd <> 0),
      |ranked AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY ad, o_custkey) AS BIGINT) AS rn FROM nz),
      |ta AS (SELECT ad, min(rn) AS lo, max(rn) AS hi FROM ranked GROUP BY 1),
      |w AS (
      |  SELECT
      |    CAST(sum(CASE WHEN dd > 0 THEN lo + hi ELSE 0 END) AS DECIMAL(38,0)) AS w2p,
      |    CAST(sum(CASE WHEN dd < 0 THEN lo + hi ELSE 0 END) AS DECIMAL(38,0)) AS w2m,
      |    CAST(count(*) AS BIGINT) AS np
      |  FROM ranked r JOIN ta USING (ad))
      |SELECT np AS n_pairs,
      |  round(CAST(w2p AS DOUBLE) / 2, 1) AS w_plus,
      |  round(CAST(w2m AS DOUBLE) / 2, 1) AS w_minus,
      |  round((CAST(w2p AS DOUBLE) - CAST(w2m AS DOUBLE))
      |  / (CAST(w2p AS DOUBLE) + CAST(w2m AS DOUBLE)), 6) AS r_rank_biserial,
      |  CASE WHEN w2p > w2m THEN 'last_higher'
      |  WHEN w2p < w2m THEN 'first_higher' ELSE 'even' END AS direction
      |FROM w""".stripMargin

  /** C911 stat_aalen_johansen — competing-risks cumulative incidence
    * at the 120-day horizon: order-to-ship time with cause 1 = returned
    * ('R') and cause 2 = kept, administratively censored at 120 days;
    * CIF_k(t) = Σ_{s≤t} Ŝ(s−)·d_k(s)/n(s) with the overall KM survival
    * as exp of a ·10¹²-quantized ln-prefix and every CIF increment
    * quantized ·10¹² before its cumulative sum — exact integer
    * cumulative algebra on the ≤120-row day grid. CIF₁+CIF₂+S = 1 up
    * to quantization, the invariant naive "1−KM per cause" breaks.
    * Scale: one corpus groupBy onto the bounded day grid; every window
    * is over ≤120 rows.
    */
  def statAalenJohansen(s: SparkSession, d: String): DataFrame = {
    val base = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("t0"),
        col("l_returnflag"))
      .filter(col("t0") >= 1)
      .select(expr("least(t0, 121L)").as("tt"),
        expr("""CASE WHEN t0 > 120 THEN 0L
          |WHEN l_returnflag = 'R' THEN 1L ELSE 2L END""".stripMargin).as("ev"))
    val days = base.groupBy("tt")
      .agg(sum(expr("CASE WHEN ev = 1 THEN 1L ELSE 0L END")).cast("long").as("d1"),
        sum(expr("CASE WHEN ev = 2 THEN 1L ELSE 0L END")).cast("long").as("d2"),
        count(lit(1)).cast("long").as("dall"))
    val wSuf = Window.orderBy(col("tt").desc).rowsBetween(Window.unboundedPreceding, 0)
    val wPre = Window.orderBy(col("tt").asc).rowsBetween(Window.unboundedPreceding, -1)
    val grid = days
      .withColumn("nrisk", sum(col("dall")).over(wSuf).cast("long"))
      // total-extinction guard: if the last grid row exhausts the risk
      // set, pin ln S to ln(1e-12) instead of ln(0) = -inf (identical
      // literal in the oracle)
      .withColumn("lnq", expr(
        """CASE WHEN nrisk - d1 - d2 <= 0 THEN CAST(-27631021115929L AS BIGINT)
          |ELSE CAST(floor(ln(CAST(nrisk - d1 - d2 AS DOUBLE) / nrisk) * 1e12 + 0.5) AS BIGINT) END""".stripMargin))
      .withColumn("lnprev", coalesce(sum(col("lnq")).over(wPre), lit(0L)))
      .select(col("tt"), col("nrisk"),
        expr("CAST(floor(exp(CAST(lnprev AS DOUBLE) / 1e12) * CAST(d1 AS DOUBLE) / nrisk * 1e12 + 0.5) AS BIGINT)").as("i1"),
        expr("CAST(floor(exp(CAST(lnprev AS DOUBLE) / 1e12) * CAST(d2 AS DOUBLE) / nrisk * 1e12 + 0.5) AS BIGINT)").as("i2"),
        col("lnq"))
    grid.agg(max(col("nrisk")).as("n_at_risk"),
        sum(expr("CASE WHEN tt <= 30 THEN i1 ELSE 0L END")).cast("long").as("c1_30"),
        sum(expr("CASE WHEN tt <= 60 THEN i1 ELSE 0L END")).cast("long").as("c1_60"),
        sum(expr("CASE WHEN tt <= 120 THEN i1 ELSE 0L END")).cast("long").as("c1_120"),
        sum(expr("CASE WHEN tt <= 120 THEN i2 ELSE 0L END")).cast("long").as("c2_120"),
        sum(expr("CASE WHEN tt <= 120 THEN lnq ELSE 0L END")).cast("long").as("ln120"))
      .selectExpr("n_at_risk",
        "round(CAST(c1_30 AS DOUBLE) / 1e12, 6) AS cif_return_30",
        "round(CAST(c1_60 AS DOUBLE) / 1e12, 6) AS cif_return_60",
        "round(CAST(c1_120 AS DOUBLE) / 1e12, 6) AS cif_return_120",
        "round(CAST(c2_120 AS DOUBLE) / 1e12, 6) AS cif_kept_120",
        "round(exp(CAST(ln120 AS DOUBLE) / 1e12), 6) AS km_surv_120")
  }
  val statAalenJohansenSql: String =
    """WITH base AS (
      |  SELECT least(CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT), 121) AS tt,
      |    CASE WHEN datediff('day', o_orderdate, l_shipdate) > 120 THEN 0
      |    WHEN l_returnflag = 'R' THEN 1 ELSE 2 END AS ev
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE datediff('day', o_orderdate, l_shipdate) >= 1),
      |days AS (
      |  SELECT tt,
      |    CAST(sum(CASE WHEN ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
      |    CAST(sum(CASE WHEN ev = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
      |    CAST(count(*) AS BIGINT) AS dall
      |  FROM base GROUP BY 1),
      |grid0 AS (
      |  SELECT tt, d1, d2,
      |    CAST(sum(dall) OVER (ORDER BY tt DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nrisk
      |  FROM days),
      |grid1 AS (
      |  SELECT *,
      |    CASE WHEN nrisk - d1 - d2 <= 0 THEN CAST(-27631021115929 AS BIGINT)
      |    ELSE CAST(floor(ln(CAST(nrisk - d1 - d2 AS DOUBLE) / nrisk) * 1e12 + 0.5) AS BIGINT) END AS lnq
      |  FROM grid0),
      |grid AS (
      |  SELECT tt, nrisk, lnq,
      |    CAST(floor(exp(CAST(coalesce(sum(lnq) OVER (ORDER BY tt ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) / 1e12)
      |      * CAST(d1 AS DOUBLE) / nrisk * 1e12 + 0.5) AS BIGINT) AS i1,
      |    CAST(floor(exp(CAST(coalesce(sum(lnq) OVER (ORDER BY tt ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) / 1e12)
      |      * CAST(d2 AS DOUBLE) / nrisk * 1e12 + 0.5) AS BIGINT) AS i2
      |  FROM grid1)
      |SELECT max(nrisk) AS n_at_risk,
      |  round(CAST(sum(CASE WHEN tt <= 30 THEN i1 ELSE 0 END) AS DOUBLE) / 1e12, 6) AS cif_return_30,
      |  round(CAST(sum(CASE WHEN tt <= 60 THEN i1 ELSE 0 END) AS DOUBLE) / 1e12, 6) AS cif_return_60,
      |  round(CAST(sum(CASE WHEN tt <= 120 THEN i1 ELSE 0 END) AS DOUBLE) / 1e12, 6) AS cif_return_120,
      |  round(CAST(sum(CASE WHEN tt <= 120 THEN i2 ELSE 0 END) AS DOUBLE) / 1e12, 6) AS cif_kept_120,
      |  round(exp(CAST(sum(CASE WHEN tt <= 120 THEN lnq ELSE 0 END) AS DOUBLE) / 1e12), 6) AS km_surv_120
      |FROM grid""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_matrix_profile" -> (timeMatrixProfile _),
    "text_bleu" -> (textBleu _),
    "stat_rank_biserial" -> (statRankBiserial _),
    "stat_aalen_johansen" -> (statAalenJohansen _),
  )

  val oracle: Map[String, String] = Map(
    "time_matrix_profile" -> timeMatrixProfileSql,
    "text_bleu" -> textBleuSql,
    "stat_rank_biserial" -> statRankBiserialSql,
    "stat_aalen_johansen" -> statAalenJohansenSql,
  )
}
