package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 135 (C944–C947): collocation lexicography + sequential testing
  * + multi-changepoint screening — logDice collocations, Wald's SPRT
  * over the lineitem stream, O'Brien–Fleming group-sequential looks,
  * and two-level binary-segmentation changepoints.
  *
  * Shared discipline: logDice is a log2 of an exact integer rational
  * with a string tiebreak on the top-k; the SPRT log-likelihood
  * increments are TWO ·10¹²-quantized integer literals so the whole
  * trajectory is an exact integer prefix sum on GlobalRank; group-
  * sequential z's are exact-count algebra against literal OBF bounds;
  * binseg argmaxes break ties as (max stat, then min t) — strict-
  * greater first-wins in the Scala driver, ORDER BY st DESC, t LIMIT 1
  * in the oracle, both over exact integer CUSUM statistics — no
  * float-tie hazard anywhere.
  */
object Extras235 {

  /** C944 text_log_dice — logDice collocations over adjacent-token
    * bigrams (count ≥ 5): 14 + log₂(2f₁₂/(f₁+f₂)) — the corpus-size-
    * independent association score lexicography replaced PMI with
    * (C477's complement: PMI rewards rarity, logDice doesn't). Top 10
    * by (score, bigram) via TakeOrderedAndProject — scale-safe top-k.
    */
  def textLogDice(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), posexplode(split(lower(col("text")), " ")).as(Seq("i", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("i")
    val big = toks.withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .localCheckpoint(true) // consumed by unigram + bigram counts
    val uni = big.select(explode(array(col("tok"), col("nxt"))).as("t"))
      .groupBy("t").agg(count(lit(1)).cast("long").as("fu"))
    val bi = big.groupBy(col("tok").as("w1"), col("nxt").as("w2"))
      .agg(count(lit(1)).cast("long").as("f12"))
      .filter(col("f12") >= 5)
    bi.join(uni.selectExpr("t AS w1", "fu AS f1"), Seq("w1"))
      .join(uni.selectExpr("t AS w2", "fu AS f2"), Seq("w2"))
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"), col("f12"),
        expr("round(14 + log2(CAST(2 AS DOUBLE) * f12 / (CAST(f1 AS DOUBLE) + f2)), 4)")
          .as("log_dice"))
      .orderBy(col("log_dice").desc, col("bigram").asc)
      .limit(10)
  }
  val textLogDiceSql: String =
    """WITH toks AS (
      |  SELECT doc_id, i0 AS i, t[i0] AS tok, t[i0 + 1] AS nxt
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |    LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i0)),
      |uni AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS fu FROM (
      |    SELECT tok AS t FROM toks UNION ALL SELECT nxt AS t FROM toks) GROUP BY 1),
      |bi AS (
      |  SELECT tok AS w1, nxt AS w2, CAST(count(*) AS BIGINT) AS f12
      |  FROM toks GROUP BY 1, 2 HAVING count(*) >= 5)
      |SELECT w1 || ' ' || w2 AS bigram, f12,
      |  round(14 + log2(CAST(2 AS DOUBLE) * f12 / (CAST(u1.fu AS DOUBLE) + u2.fu)), 4) AS log_dice
      |FROM bi JOIN uni u1 ON bi.w1 = u1.t JOIN uni u2 ON bi.w2 = u2.t
      |ORDER BY log_dice DESC, bigram LIMIT 10""".stripMargin

  /** C945 stat_sprt_sequential — Wald's sequential probability ratio
    * test of the return rate (H₀ p=0.24 vs H₁ p=0.26, α=β=0.05) over
    * the lineitem stream in (orderkey, linenumber) arrival order: the
    * LLR trajectory is an exact integer prefix sum of the two
    * ·10¹²-quantized log-ratio literals on GlobalRank; the decision is
    * the FIRST boundary crossing (±ln 19). The early-stopping
    * discipline every A/B platform runs instead of fixed-n tests —
    * with the exact sample size it saved.
    */
  def statSprtSequential(s: SparkSession, d: String): DataFrame = {
    val base = lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("""CASE WHEN l_returnflag = 'R'
          |THEN CAST(floor(ln(CAST(0.26 AS DOUBLE) / CAST(0.24 AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)
          |ELSE CAST(floor(ln(CAST(0.74 AS DOUBLE) / CAST(0.76 AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) END""".stripMargin).as("inc"))
    val ranked = graft.plans.GlobalRank.withExclusivePrefixSum(
      base, "cumx", col("inc"), Seq(col("l_orderkey").asc, col("l_linenumber").asc))
      .select(col("l_orderkey"), col("l_linenumber"), (col("cumx") + col("inc")).as("cum"))
    val rankedRn = graft.plans.GlobalRank.withGlobalRowNumberAndTotal(
      ranked, "rn", "nn", Seq(col("l_orderkey").asc, col("l_linenumber").asc))
    val bound = "CAST(floor(ln(CAST(19 AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)"
    val hits = rankedRn.agg(
      min(expr(s"CASE WHEN cum >= $bound THEN rn END")).as("hi"),
      min(expr(s"CASE WHEN cum <= -$bound THEN rn END")).as("lo"),
      max(col("nn")).as("n"),
      max(expr("CASE WHEN rn = nn THEN cum END")).as("llr_final"))
    hits.selectExpr("n AS n_stream",
        """CASE
          |WHEN hi IS NOT NULL AND (lo IS NULL OR hi < lo) THEN 'accept_h1'
          |WHEN lo IS NOT NULL AND (hi IS NULL OR lo < hi) THEN 'accept_h0'
          |ELSE 'no_decision' END AS decision""".stripMargin,
        "coalesce(least(hi, lo), coalesce(hi, lo)) AS n_at_decision",
        "round(CAST(llr_final AS DOUBLE) / 1e12, 6) AS llr_final",
        """round(CAST(coalesce(least(hi, lo), coalesce(hi, lo)) AS DOUBLE)
          |/ n, 6) AS fraction_of_stream_used""".stripMargin)
  }
  val statSprtSequentialSql: String =
    """WITH base AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN l_returnflag = 'R'
      |    THEN CAST(floor(ln(CAST(0.26 AS DOUBLE) / CAST(0.24 AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)
      |    ELSE CAST(floor(ln(CAST(0.74 AS DOUBLE) / CAST(0.76 AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) END AS inc
      |  FROM lineitem),
      |ranked AS (
      |  SELECT CAST(row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS BIGINT) AS rn,
      |    count(*) OVER () AS nn,
      |    sum(inc) OVER (ORDER BY l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM base),
      |hits AS (
      |  SELECT
      |    min(CASE WHEN cum >= CAST(floor(ln(CAST(19 AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) THEN rn END) AS hi,
      |    min(CASE WHEN cum <= -CAST(floor(ln(CAST(19 AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) THEN rn END) AS lo,
      |    CAST(max(nn) AS BIGINT) AS n,
      |    max(CASE WHEN rn = nn THEN cum END) AS llr_final
      |  FROM ranked)
      |SELECT n AS n_stream,
      |  CASE
      |  WHEN hi IS NOT NULL AND (lo IS NULL OR hi < lo) THEN 'accept_h1'
      |  WHEN lo IS NOT NULL AND (hi IS NULL OR lo < hi) THEN 'accept_h0'
      |  ELSE 'no_decision' END AS decision,
      |  coalesce(least(hi, lo), coalesce(hi, lo)) AS n_at_decision,
      |  round(CAST(llr_final AS DOUBLE) / 1e12, 6) AS llr_final,
      |  round(CAST(coalesce(least(hi, lo), coalesce(hi, lo)) AS DOUBLE) / n, 6) AS fraction_of_stream_used
      |FROM hits""".stripMargin

  /** C946 stat_group_sequential — O'Brien–Fleming interim monitoring:
    * four looks (cumulative through each order-year 1995–1998) at the
    * return rate vs p₀ = 0.25, z from exact cumulative counts, OBF
    * two-sided criticals {4.049, 2.863, 2.337, 2.024}; per-look
    * crossing flags. The spend-alpha-slowly design that lets a trial
    * stop early without torching its error budget — SPRT's (C945)
    * fixed-look sibling.
    */
  def statGroupSequential(s: SparkSession, d: String): DataFrame = {
    val byYear = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey"))
      .groupBy(expr("year(o_orderdate)").as("yr"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("k"))
    val wCum = Window.orderBy("yr").rowsBetween(Window.unboundedPreceding, 0)
    val looks = byYear.filter(expr("yr <= 1998"))
      .withColumn("ncum", sum(col("n")).over(wCum).cast("long"))
      .withColumn("kcum", sum(col("k")).over(wCum).cast("long"))
      .filter(expr("yr >= 1995"))
      .withColumn("look", row_number().over(Window.orderBy("yr")).cast("long"))
    looks.select(col("look"), col("yr"), col("ncum"),
        expr("""(CAST(kcum AS DOUBLE) / ncum - 0.25)
          |/ sqrt(0.25 * 0.75 / ncum)""".stripMargin).as("z"),
        expr("""CASE CAST(look AS INT) WHEN 1 THEN 4.049 WHEN 2 THEN 2.863
          |WHEN 3 THEN 2.337 ELSE 2.024 END""".stripMargin).as("crit"))
      .selectExpr("look", "CAST(yr AS BIGINT) AS through_year", "ncum AS n_cum",
        "round(z, 4) AS z", "CAST(crit AS DOUBLE) AS obf_critical",
        "CASE WHEN abs(z) > crit THEN 1L ELSE 0L END AS crossed")
      .orderBy("look")
  }
  val statGroupSequentialSql: String =
    """WITH byyear AS (
      |  SELECT year(o_orderdate) AS yr, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS k
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1),
      |cum AS (
      |  SELECT yr,
      |    CAST(sum(n) OVER (ORDER BY yr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ncum,
      |    CAST(sum(k) OVER (ORDER BY yr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS kcum
      |  FROM byyear WHERE yr <= 1998),
      |looks AS (
      |  SELECT CAST(row_number() OVER (ORDER BY yr) AS BIGINT) AS look, yr, ncum,
      |    (CAST(kcum AS DOUBLE) / ncum - 0.25) / sqrt(0.25 * 0.75 / ncum) AS z
      |  FROM cum WHERE yr >= 1995)
      |SELECT look, yr AS through_year, ncum AS n_cum,
      |  round(z, 4) AS z,
      |  CAST(CASE CAST(look AS INT) WHEN 1 THEN 4.049 WHEN 2 THEN 2.863
      |  WHEN 3 THEN 2.337 ELSE 2.024 END AS DOUBLE) AS obf_critical,
      |  CAST(CASE WHEN abs(z) > (CASE CAST(look AS INT) WHEN 1 THEN 4.049 WHEN 2 THEN 2.863
      |  WHEN 3 THEN 2.337 ELSE 2.024 END) THEN 1 ELSE 0 END AS BIGINT) AS crossed
      |FROM looks ORDER BY look""".stripMargin

  /** C947 time_binseg_changepoints — two-level binary segmentation on
    * monthly revenue: level-1 split = argmax over t of the exact
    * integer CUSUM statistic |n·Σ_{i≤t}vᵢ − t·Σvᵢ| (max stat, then
    * min t — deterministic), then the best split INSIDE each half with
    * its own local statistic — the top-3 changepoint skeleton a
    * single-split test (C513 Pettitt) can't give in one shot. The
    * bounded month vector is collected (the C870/C895 convention);
    * the oracle replays the same integer algebra with window SQL.
    */
  def timeBinsegChangepoints(s: SparkSession, d: String): DataFrame = {
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .orderBy("m")
      .collect().map(_.getLong(1))
    val n = ms.length
    // best split of ms[lo..hi] (0-based, inclusive): (1-based global cp,
    // stat). A segment of <2 elements has no interior split: emit the
    // sentinel cp=0 so the oracle's coalesced-empty-CTE fallback agrees.
    def best(lo: Int, hi: Int): (Long, BigInt) = {
      if (hi <= lo) return (0L, BigInt(0))
      val seg = ms.slice(lo, hi + 1).map(BigInt(_))
      val k = seg.length
      val sv = seg.sum
      var cum = BigInt(0); var bStat = BigInt(-1); var bT = -1
      for (i <- 0 until k - 1) {
        cum += seg(i)
        val stat = (cum * k - BigInt(i + 1) * sv).abs
        if (stat > bStat) { bStat = stat; bT = i }
      }
      ((lo + bT + 1).toLong, bStat)
    }
    val (c1, s1) = best(0, n - 1)
    val (cl, sl) = best(0, c1.toInt - 1)
    val (cr, sr) = best(c1.toInt, n - 1)
    def mean(lo: Int, hi: Int): Double =
      ms.slice(lo, hi + 1).map(BigInt(_)).sum.toDouble / (hi - lo + 1)
    import s.implicits._
    Seq((n.toLong, c1, (s1 / 1000000).toLong, cl, cr,
      mean(0, c1.toInt - 1), mean(c1.toInt, n - 1)))
      .toDF("n0", "c1", "s1", "cl", "cr", "m1", "m2")
      .selectExpr("n0 AS n_months", "c1 AS cp1_month",
        "s1 AS cp1_stat_m", "cl AS cp2_left_month", "cr AS cp2_right_month",
        "round(m1 / 100, 2) AS mean_before_dollars",
        "round(m2 / 100, 2) AS mean_after_dollars")
  }
  val timeBinsegChangepointsSql: String =
    """WITH seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t, v FROM (
      |    SELECT date_trunc('month', o_orderdate) AS m,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1)),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS sv FROM seq),
      |stats1 AS (
      |  SELECT t, abs(CAST(sum(CAST(v AS HUGEINT)) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) * n - t * sv) AS st
      |  FROM seq, nn QUALIFY t < n),
      |cp1 AS (
      |  SELECT t AS c1, st AS s1 FROM stats1 ORDER BY st DESC, t LIMIT 1),
      |lseg AS (SELECT s.t, s.v FROM seq s, cp1 WHERE s.t <= c1),
      |ln2 AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS sv,
      |  CAST(min(t) AS BIGINT) AS t0 FROM lseg),
      |lstats AS (
      |  SELECT t, abs(CAST(sum(CAST(v AS HUGEINT)) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) * k - (t - t0 + 1) * sv) AS st
      |  FROM lseg, ln2 QUALIFY (t - t0 + 1) < k),
      |cpl AS (SELECT CAST(coalesce(max(t1), 0) AS BIGINT) AS cl FROM
      |  (SELECT t AS t1 FROM lstats ORDER BY st DESC, t LIMIT 1)),
      |rseg AS (SELECT s.t, s.v FROM seq s, cp1 WHERE s.t > c1),
      |rn2 AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS sv,
      |  CAST(min(t) AS BIGINT) AS t0 FROM rseg),
      |rstats AS (
      |  SELECT t, abs(CAST(sum(CAST(v AS HUGEINT)) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) * k - (t - t0 + 1) * sv) AS st
      |  FROM rseg, rn2 QUALIFY (t - t0 + 1) < k),
      |cpr AS (SELECT CAST(coalesce(max(t1), 0) AS BIGINT) AS cr FROM
      |  (SELECT t AS t1 FROM rstats ORDER BY st DESC, t LIMIT 1)),
      |means AS (
      |  SELECT
      |    (SELECT CAST(CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) / count(*)
      |     FROM lseg) AS m1,
      |    (SELECT CAST(CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) / count(*)
      |     FROM rseg) AS m2)
      |SELECT n AS n_months, c1 AS cp1_month,
      |  CAST(s1 // 1000000 AS BIGINT) AS cp1_stat_m,
      |  cl AS cp2_left_month, cr AS cp2_right_month,
      |  round(m1 / 100, 2) AS mean_before_dollars,
      |  round(m2 / 100, 2) AS mean_after_dollars
      |FROM nn, cp1, cpl, cpr, means""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_log_dice" -> (textLogDice _),
    "stat_sprt_sequential" -> (statSprtSequential _),
    "stat_group_sequential" -> (statGroupSequential _),
    "time_binseg_changepoints" -> (timeBinsegChangepoints _),
  )

  val oracle: Map[String, String] = Map(
    "text_log_dice" -> textLogDiceSql,
    "stat_sprt_sequential" -> statSprtSequentialSql,
    "stat_group_sequential" -> statGroupSequentialSql,
    "time_binseg_changepoints" -> timeBinsegChangepointsSql,
  )
}
