package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 120 (C884–C887): volatility filtering + rank aggregation +
  * language-model smoothing + robust shape — GARCH(1,1) with variance
  * targeting, Borda/Copeland voting over nation brand-rankings,
  * interpolated Kneser–Ney with held-out perplexity, and the first
  * four L-moments as exact rank algebra.
  *
  * Shared discipline: recursions run over bounded calendar
  * dictionaries; voting runs on a bounded 625-row rank frame;
  * log-probs and combinatorial rank weights are quantized once so the
  * corpus reductions are exact integer sums; order statistics ride
  * GlobalRank.
  */
object Extras220 {

  /** C884 time_garch_fixed — GARCH(1,1) volatility filtering of daily
    * log-revenue returns with variance targeting (α=0.1, β=0.85,
    * ω=(1−α−β)·Var[r]): returns from exact daily cent totals, the
    * variance recursion σ²ₜ = ω + α·r²ₜ₋₁ + β·σ²ₜ₋₁ over the bounded
    * ~2400-day calendar (Scala loop vs recursive-CTE oracle, identical
    * literals). Emits the targeted ω, final/max conditional sigma and
    * the sample sd of returns — the conditional-heteroscedasticity
    * layer the Breusch–Godfrey/ARCH rows test for but don't model.
    */
  def timeGarchFixed(s: SparkSession, d: String): DataFrame = {
    val days = orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .orderBy("day")
      .collect().map(_.getLong(1))
    // returns quantized once (·10¹²) so the variance-targeting moments
    // are exact integer sums — no cross-engine float-order dependence
    val rq = (1 until days.length).map(t =>
      math.floor(math.log(days(t).toDouble / days(t - 1)) * 1e12 + 0.5).toLong)
    val rs = rq.map(_ / 1e12)
    val nr = rs.length
    val sr = rq.map(BigInt(_)).sum
    val srr = rq.map(q => BigInt(q) * q).sum
    val vr = (nr.toDouble * srr.toDouble - sr.toDouble * sr.toDouble) /
      (nr.toDouble * (nr - 1)) / 1e24
    val omega = (1 - 0.1 - 0.85) * vr
    var s2 = vr
    var mx = s2
    rs.foreach { r =>
      s2 = omega + 0.1 * r * r + 0.85 * s2
      if (s2 > mx) mx = s2
    }
    import s.implicits._
    Seq((nr.toLong, omega, math.sqrt(vr), math.sqrt(s2), math.sqrt(mx)))
      .toDF("n0", "w0", "u0", "f0", "m0")
      .selectExpr("n0 AS n_returns", "round(w0, 10) AS omega",
        "round(u0, 8) AS uncond_sd", "round(f0, 8) AS final_sigma",
        "round(m0, 8) AS max_sigma")
  }
  val timeGarchFixedSql: String =
    """WITH RECURSIVE days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t, v
      |  FROM days),
      |rets AS (
      |  SELECT s.t - 1 AS t,
      |    CAST(floor(ln(CAST(s.v AS DOUBLE) / p.v) * 1e12 + 0.5) AS BIGINT) AS rq
      |  FROM seq s JOIN seq p ON p.t = s.t - 1),
      |rr AS (SELECT t, rq / 1e12 AS r FROM rets),
      |vr AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nr,
      |    (CAST(count(*) AS DOUBLE) * CAST(CAST(sum(CAST(rq AS HUGEINT) * rq) AS HUGEINT) AS DOUBLE)
      |      - CAST(CAST(sum(rq) AS HUGEINT) AS DOUBLE) * CAST(CAST(sum(rq) AS HUGEINT) AS DOUBLE))
      |    / (CAST(count(*) AS DOUBLE) * (count(*) - 1)) / 1e24 AS v
      |  FROM rets),
      |par AS (
      |  SELECT nr, v, (1 - 0.1 - 0.85) * v AS omega FROM vr),
      |rec AS (
      |  SELECT CAST(0 AS BIGINT) AS t, p.v AS s2, p.v AS mx FROM par p
      |  UNION ALL
      |  SELECT r.t + 1,
      |    p.omega + 0.1 * q.r * q.r + 0.85 * r.s2,
      |    greatest(r.mx, p.omega + 0.1 * q.r * q.r + 0.85 * r.s2)
      |  FROM rec r JOIN rr q ON q.t = r.t + 1, par p
      |  WHERE r.t < p.nr),
      |fin AS (SELECT s2, mx FROM rec ORDER BY t DESC LIMIT 1)
      |SELECT p.nr AS n_returns, round(p.omega, 10) AS omega,
      |  round(sqrt(p.v), 8) AS uncond_sd,
      |  round(sqrt(f.s2), 8) AS final_sigma,
      |  round(sqrt(f.mx), 8) AS max_sigma
      |FROM fin f, par p""".stripMargin

  /** C885 analytics_borda_copeland — rank aggregation of the 25
    * nations' brand preferences: each nation ranks the 25 brands by
    * revenue (exact cents, brand tiebreak) on a bounded 625-row frame;
    * Borda score = Σ(n_brands − rank), Copeland score = pairwise wins
    * − losses over the 300 brand pairs × 25 voters (a bounded
    * self-join). Emits the top-10 consensus brands under both rules
    * with their agreement — the social-choice shape behind every
    * "which variant wins across segments" dashboard.
    */
  def analyticsBordaCopeland(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nat"), col("p_brand").as("brand"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("r"))
    val nb = rev.select("brand").distinct().count()
    val ranked = rev.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("nat").orderBy(col("r").desc, col("brand").asc)))
    val borda = ranked.groupBy("brand")
      .agg(sum(lit(nb) - col("rk")).cast("long").as("borda"))
    val a = ranked.select(col("nat"), col("brand").as("bi"), col("rk").as("ri"))
    val b = ranked.select(col("nat"), col("brand").as("bj"), col("rk").as("rj"))
    val cope = a.join(b, Seq("nat")).filter(col("bi") < col("bj"))
      .groupBy("bi", "bj")
      .agg(sum(when(col("ri") < col("rj"), 1L).otherwise(0L)).as("wi"),
        count(lit(1)).cast("long").as("nv"))
      .select(explode(array(
        struct(col("bi").as("brand"),
          (when(col("wi") * 2 > col("nv"), 1L)
            .when(col("wi") * 2 < col("nv"), -1L).otherwise(0L)).as("pt")),
        struct(col("bj").as("brand"),
          (when(col("wi") * 2 < col("nv"), 1L)
            .when(col("wi") * 2 > col("nv"), -1L).otherwise(0L)).as("pt")))).as("z"))
      .select(col("z.brand").as("brand"), col("z.pt").as("pt"))
      .groupBy("brand").agg(sum(col("pt")).cast("long").as("copeland"))
    borda.join(cope, Seq("brand"))
      .orderBy(col("borda").desc, col("brand").asc)
      .limit(10)
      .selectExpr("brand", "borda", "copeland")
  }
  val analyticsBordaCopelandSql: String =
    """WITH rev AS (
      |  SELECT n_name AS nat, p_brand AS brand,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS r
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |nb AS (SELECT CAST(count(DISTINCT brand) AS BIGINT) AS k FROM rev),
      |ranked AS (
      |  SELECT nat, brand,
      |    row_number() OVER (PARTITION BY nat ORDER BY r DESC, brand ASC) AS rk
      |  FROM rev),
      |borda AS (
      |  SELECT brand, CAST(sum(nb.k - rk) AS BIGINT) AS borda
      |  FROM ranked, nb GROUP BY 1),
      |pairs AS (
      |  SELECT a.brand AS bi, b.brand AS bj,
      |    CAST(sum(CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END) AS BIGINT) AS wi,
      |    CAST(count(*) AS BIGINT) AS nv
      |  FROM ranked a JOIN ranked b ON a.nat = b.nat AND a.brand < b.brand
      |  GROUP BY 1, 2),
      |pts AS (
      |  SELECT bi AS brand,
      |    CASE WHEN wi * 2 > nv THEN 1 WHEN wi * 2 < nv THEN -1 ELSE 0 END AS pt
      |  FROM pairs
      |  UNION ALL
      |  SELECT bj,
      |    CASE WHEN wi * 2 < nv THEN 1 WHEN wi * 2 > nv THEN -1 ELSE 0 END
      |  FROM pairs),
      |cope AS (SELECT brand, CAST(sum(pt) AS BIGINT) AS copeland FROM pts GROUP BY 1)
      |SELECT b.brand, b.borda, c.copeland
      |FROM borda b JOIN cope c ON b.brand = c.brand
      |ORDER BY b.borda DESC, b.brand ASC LIMIT 10""".stripMargin

  /** C886 text_kneser_ney_bigram — interpolated Kneser–Ney (D = 0.75)
    * bigram language model trained on 90% of documents and scored on
    * the held-out 10% (doc_id % 10 = 0):
    * P(w|v) = max(c(vw)−D,0)/c(v) + D·N₁₊(v·)/c(v)·P_cont(w) with
    * P_cont(w) = N₁₊(·w)/N₁₊(··), unseen mass floored at 10⁻¹⁰.
    * Count tables are hash aggregations; held-out log-probs are
    * ·10⁹-quantized so perplexity's Σln p is an exact sum. The
    * LM-quality yardstick next to the raw-frequency perplexity rows —
    * the smoothing every n-gram filter should be using.
    */
  def textKneserNeyBigram(s: SparkSession, d: String): DataFrame = {
    def bigrams(df: DataFrame): DataFrame = df
      .select(col("doc_id"), split(lower(col("text")), " ").as("a"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(a) >= 2 THEN
          |  transform(sequence(1, size(a) - 1),
          |    i -> struct(element_at(a, i) AS v, element_at(a, i + 1) AS w))
          |ELSE array() END""".stripMargin)).as("bg"))
      .select(col("bg.v").as("v"), col("bg.w").as("w"))
    val docs = documents(s, d)
    val train = bigrams(docs.filter(col("doc_id") % 10 =!= 0))
    val test = bigrams(docs.filter(col("doc_id") % 10 === 0))
    val cvw = train.groupBy("v", "w").agg(count(lit(1)).cast("long").as("cvw"))
    val cv = cvw.groupBy("v")
      .agg(sum(col("cvw")).cast("long").as("cv"),
        count(lit(1)).cast("long").as("n1v"))
    val cont = cvw.groupBy("w").agg(count(lit(1)).cast("long").as("n1w"))
    val ntypes = cvw.count()
    val scored = test
      .join(cv, Seq("v"), "left")
      .join(cvw, Seq("v", "w"), "left")
      .join(cont, Seq("w"), "left")
      .select(expr(
        s"""CAST(floor(ln(greatest(
           |  CASE WHEN cv IS NULL THEN coalesce(n1w, 0) / CAST($ntypes AS DOUBLE)
           |  ELSE greatest(coalesce(cvw, 0) - 0.75, 0) / cv
           |    + 0.75 * n1v / cv * (coalesce(n1w, 0) / CAST($ntypes AS DOUBLE))
           |  END, 1e-10)) * 1e9 + 0.5) AS BIGINT)""".stripMargin).as("lq"),
        when(col("cvw").isNull, 1L).otherwise(0L).as("unseen"))
    scored.agg(count(lit(1)).cast("long").as("n_test"),
        sum(col("lq")).cast("decimal(38,0)").as("sl"),
        sum(col("unseen")).cast("long").as("nu"))
      .withColumn("n_train", lit(ntypes))
      .selectExpr("n_train AS n_train_bigram_types", "n_test",
        "round(CAST(nu AS DOUBLE) / n_test, 6) AS unseen_rate",
        "round(exp(-CAST(sl AS DOUBLE) / 1e9 / n_test), 4) AS perplexity")
  }
  val textKneserNeyBigramSql: String =
    """WITH tr AS (
      |  SELECT unnest(a[1:len(a) - 1]) AS v, unnest(a[2:len(a)]) AS w
      |  FROM (SELECT string_split(lower(text), ' ') AS a FROM documents
      |        WHERE doc_id % 10 <> 0)
      |  WHERE len(a) >= 2),
      |te AS (
      |  SELECT unnest(a[1:len(a) - 1]) AS v, unnest(a[2:len(a)]) AS w
      |  FROM (SELECT string_split(lower(text), ' ') AS a FROM documents
      |        WHERE doc_id % 10 = 0)
      |  WHERE len(a) >= 2),
      |cvw AS (SELECT v, w, CAST(count(*) AS BIGINT) AS cvw FROM tr GROUP BY 1, 2),
      |cv AS (SELECT v, CAST(sum(cvw) AS BIGINT) AS cv,
      |  CAST(count(*) AS BIGINT) AS n1v FROM cvw GROUP BY 1),
      |cont AS (SELECT w, CAST(count(*) AS BIGINT) AS n1w FROM cvw GROUP BY 1),
      |nt AS (SELECT CAST(count(*) AS BIGINT) AS ntypes FROM cvw),
      |scored AS (
      |  SELECT CAST(floor(ln(greatest(
      |      CASE WHEN cv.cv IS NULL THEN coalesce(cont.n1w, 0) / CAST(nt.ntypes AS DOUBLE)
      |      ELSE greatest(coalesce(cvw.cvw, 0) - 0.75, 0) / cv.cv
      |        + 0.75 * cv.n1v / cv.cv * (coalesce(cont.n1w, 0) / CAST(nt.ntypes AS DOUBLE))
      |      END, 1e-10)) * 1e9 + 0.5) AS BIGINT) AS lq,
      |    CASE WHEN cvw.cvw IS NULL THEN 1 ELSE 0 END AS unseen
      |  FROM te
      |  LEFT JOIN cv ON te.v = cv.v
      |  LEFT JOIN cvw ON te.v = cvw.v AND te.w = cvw.w
      |  LEFT JOIN cont ON te.w = cont.w
      |  CROSS JOIN nt)
      |SELECT (SELECT ntypes FROM nt) AS n_train_bigram_types,
      |  CAST(count(*) AS BIGINT) AS n_test,
      |  round(CAST(sum(unseen) AS DOUBLE) / count(*), 6) AS unseen_rate,
      |  round(exp(-CAST(CAST(sum(lq) AS DECIMAL(38,0)) AS DOUBLE) / 1e9 / count(*)), 4)
      |    AS perplexity
      |FROM scored""".stripMargin

  /** C887 stat_l_moments — the first four L-moments of order totals as
    * exact rank algebra off ONE GlobalRank pass: b₁'s weight (i−1)x₍ᵢ₎
    * stays a pure DECIMAL integer sum; the cubic-weight b₂/b₃
    * combinatorial ratios are evaluated as O(1) doubles per row and
    * ·10¹²-quantized (their exact integer forms would overflow
    * DECIMAL(38,0) past sf10). λ₂ = 2b₁−b₀ is the Gini mean difference
    * halved; τ₃/τ₄ are the outlier-immune skewness/kurtosis used by
    * regional frequency analysis — finite for ANY distribution with a
    * mean, where moment skew/kurt need 3rd/4th moments.
    */
  def statLMoments(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"),
        col("o_orderkey").as("okey"))
    val ranked = graft.plans.GlobalRank
      .withGlobalRowNumberAndTotal(base, "i", "nn", Seq(col("cv").asc, col("okey").asc))
    ranked.agg(max(col("nn")).as("n"),
        sum(col("cv")).cast("decimal(38,0)").as("s0"),
        sum(expr("CAST(i - 1 AS DECIMAL(38,0)) * cv")).cast("decimal(38,0)").as("s1"),
        sum(expr(
          """CAST(floor(CAST(i - 1 AS DOUBLE) * (i - 2)
            |/ (CAST(nn - 1 AS DOUBLE) * (nn - 2)) * cv * 1e6 + 0.5) AS BIGINT)"""
            .stripMargin)).cast("decimal(38,0)").as("s2"),
        sum(expr(
          """CAST(floor(CAST(i - 1 AS DOUBLE) * (i - 2) * (i - 3)
            |/ (CAST(nn - 1 AS DOUBLE) * (nn - 2) * (nn - 3)) * cv * 1e6 + 0.5) AS BIGINT)"""
            .stripMargin)).cast("decimal(38,0)").as("s3"))
      .selectExpr("n",
        "CAST(s0 AS DOUBLE) / n AS b0",
        "CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)) AS b1",
        "CAST(s2 AS DOUBLE) / 1e6 / n AS b2",
        "CAST(s3 AS DOUBLE) / 1e6 / n AS b3")
      .selectExpr("n",
        "round(b0 / 100, 4) AS l1_dollars",
        "round((2 * b1 - b0) / 100, 4) AS l2_dollars",
        "round((6 * b2 - 6 * b1 + b0) / (2 * b1 - b0), 6) AS tau3",
        "round((20 * b3 - 30 * b2 + 12 * b1 - b0) / (2 * b1 - b0), 6) AS tau4")
  }
  val statLMomentsSql: String =
    """WITH base AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv,
      |    o_orderkey AS okey
      |  FROM orders),
      |ranked AS (
      |  SELECT cv, row_number() OVER (ORDER BY cv, okey) AS i,
      |    count(*) OVER () AS nn
      |  FROM base),
      |ag AS (
      |  SELECT CAST(max(nn) AS BIGINT) AS n,
      |    CAST(sum(cv) AS DECIMAL(38,0)) AS s0,
      |    CAST(sum(CAST(i - 1 AS HUGEINT) * cv) AS DECIMAL(38,0)) AS s1,
      |    CAST(sum(CAST(floor(CAST(i - 1 AS DOUBLE) * (i - 2)
      |      / (CAST(nn - 1 AS DOUBLE) * (nn - 2)) * cv * 1e6 + 0.5) AS HUGEINT)) AS DECIMAL(38,0)) AS s2,
      |    CAST(sum(CAST(floor(CAST(i - 1 AS DOUBLE) * (i - 2) * (i - 3)
      |      / (CAST(nn - 1 AS DOUBLE) * (nn - 2) * (nn - 3)) * cv * 1e6 + 0.5) AS HUGEINT)) AS DECIMAL(38,0)) AS s3
      |  FROM ranked),
      |bb AS (
      |  SELECT n,
      |    CAST(s0 AS DOUBLE) / n AS b0,
      |    CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)) AS b1,
      |    CAST(s2 AS DOUBLE) / 1e6 / n AS b2,
      |    CAST(s3 AS DOUBLE) / 1e6 / n AS b3
      |  FROM ag)
      |SELECT n,
      |  round(b0 / 100, 4) AS l1_dollars,
      |  round((2 * b1 - b0) / 100, 4) AS l2_dollars,
      |  round((6 * b2 - 6 * b1 + b0) / (2 * b1 - b0), 6) AS tau3,
      |  round((20 * b3 - 30 * b2 + 12 * b1 - b0) / (2 * b1 - b0), 6) AS tau4
      |FROM bb""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_garch_fixed" -> (timeGarchFixed _),
    "analytics_borda_copeland" -> (analyticsBordaCopeland _),
    "text_kneser_ney_bigram" -> (textKneserNeyBigram _),
    "stat_l_moments" -> (statLMoments _),
  )

  val oracle: Map[String, String] = Map(
    "time_garch_fixed" -> timeGarchFixedSql,
    "analytics_borda_copeland" -> analyticsBordaCopelandSql,
    "text_kneser_ney_bigram" -> textKneserNeyBigramSql,
    "stat_l_moments" -> statLMomentsSql,
  )
}
