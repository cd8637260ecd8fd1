package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Byte-value histogram partial emitted per partition by the
  * multimodal entropy row (id kept for deterministic debuggability).
  */
case class BytePartial(b: Int, c: Long)

/** Wave 153 (C1036–C1043): multivariate normality (Mardia's b1/b2 with
  * diagonal standardization, probe-bounded skewness), empirical-Bayes
  * rate shrinkage (beta-binomial MOM), simultaneous proportion
  * comparisons (Marascuilo), the Heikin-Ashi smoothed-candle state
  * machine, the health-economics concentration index, Pesaran's CD
  * panel cross-dependence test, PNG pixel-stream entropy, and Zenga's
  * 2007 inequality index.
  *
  * Shared discipline: per-vector Mahalanobis-diag terms quantize ·1e9
  * before corpus DECIMAL sums; brand-rate and pairwise-corr terms
  * quantize on bounded frames; the Heikin-Ashi open carries a 1e-3
  * grid with bullishness as the exact integer test hac4·1e3 vs
  * 4·haoq; concentration/Zenga ride GlobalRank prefix integers; the
  * image entropy quantizes c·ln c ·1e6 over the bounded 256-value
  * byte dictionary.
  */
object Extras253 {

  // ---------------------------------------------------------------- C1036
  /** embed_mardia_normality — Mardia's multivariate kurtosis and
    * (probe-bounded) skewness of the embedding corpus under diagonal
    * standardization: b2 = E[(z'z)²] from per-vector HOF sums
    * quantized ·1e9 (one linear pass), b1 estimated from the FIXED
    * ≤200-probe panel against the corpus ((z_p'z_j)³ terms ·1e6).
    * Reported against the Gaussian references p(p+2) and 0.
    */
  def embedMardiaNormality(s: SparkSession, d: String): DataFrame = {
    val mom = embeddings(s, d)
      .select(explode(expr("sequence(1, 64)")).as("dim"), col("embedding"))
      .select(col("dim"), expr(
        "CAST(floor(CAST(element_at(embedding, CAST(dim AS INT)) AS DOUBLE) * 1e6 + 0.5) AS BIGINT)").as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("q")).cast("decimal(38,0)").as("s1"),
        sum(expr("CAST(q AS DECIMAL(38,0)) * q")).cast("decimal(38,0)").as("s2"))
      .selectExpr("dim", "CAST(s1 AS DOUBLE) / n / 1e6 AS mu",
        """sqrt(CAST(s2 AS DOUBLE) / n / 1e12
          |- (CAST(s1 AS DOUBLE) / n / 1e6) * (CAST(s1 AS DOUBLE) / n / 1e6)) AS sg""".stripMargin)
    // collect_list order is NOT guaranteed through an aggregate —
    // sort (dim, value) structs, then project the value
    val arrs = mom
      .agg(expr("transform(array_sort(collect_list(struct(dim, mu))), x -> x.mu)").as("mus"),
        expr("transform(array_sort(collect_list(struct(dim, sg))), x -> x.sg)").as("sgs"))
    val zed = embeddings(s, d).crossJoin(broadcast(arrs))
      .selectExpr("vec_id AS id",
        """transform(sequence(1, 64), i ->
          |(CAST(element_at(embedding, i) AS DOUBLE) - element_at(mus, i))
          |/ element_at(sgs, i)) AS z""".stripMargin)
    val kurt = zed
      .selectExpr("id",
        "CAST(floor(aggregate(z, CAST(0 AS DOUBLE), (a, x) -> a + x * x) * 1e9 + 0.5) AS BIGINT) AS mq")
    val b2 = kurt.agg(count(lit(1)).cast("long").as("n"),
      sum(expr("CAST(mq AS DECIMAL(38,0)) * mq")).cast("decimal(38,0)").as("sm2"))
    val pan = zed.filter(col("id") < 200L).selectExpr("id AS pid", "z AS pz")
    val b1 = zed.crossJoin(broadcast(pan))
      .selectExpr(
        """CAST(floor(pow(aggregate(zip_with(z, pz, (x, y) -> x * y),
          |CAST(0 AS DOUBLE), (a, t) -> a + t), 3) * 1e6 + 0.5) AS BIGINT) AS cq""".stripMargin)
      .agg(count(lit(1)).cast("long").as("np"),
        sum(expr("CAST(cq AS DECIMAL(38,0))")).cast("decimal(38,0)").as("sc"))
    b2.crossJoin(broadcast(b1))
      .selectExpr("n AS n_vectors",
        "round(CAST(sm2 AS DOUBLE) / n / 1e18, 6) AS mardia_b2",
        "CAST(4224 AS BIGINT) AS b2_gaussian_ref",
        """round((CAST(sm2 AS DOUBLE) / n / 1e18 - 4224)
          |* sqrt(CAST(n AS DOUBLE) / (8 * 64 * 66)), 4) AS b2_zscore""".stripMargin,
        "round(CAST(sc AS DOUBLE) / np / 1e6, 6) AS mardia_b1_probe")
  }
  val embedMardiaNormalitySql: String =
    """WITH mom AS (
      |  SELECT i.i AS dim,
      |    CAST(sum(CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
      |      / count(*) / 1e6 AS mu,
      |    sqrt(CAST(sum(CAST(CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS HUGEINT)
      |        * CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
      |      / count(*) / 1e12
      |    - (CAST(sum(CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
      |      / count(*) / 1e6)
      |      * (CAST(sum(CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
      |      / count(*) / 1e6)) AS sg
      |  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i
      |  GROUP BY 1),
      |arrs AS (
      |  SELECT list(mu ORDER BY dim) AS mus, list(sg ORDER BY dim) AS sgs FROM mom),
      |zed AS (
      |  SELECT vec_id AS id,
      |    list_transform(generate_series(1, 64), i ->
      |      (CAST(embedding[i] AS DOUBLE) - mus[i]) / sgs[i]) AS z
      |  FROM embeddings, arrs),
      |kurt AS (
      |  SELECT CAST(floor(list_sum(list_transform(z, x -> x * x)) * 1e9 + 0.5) AS BIGINT) AS mq
      |  FROM zed),
      |b2 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(mq AS HUGEINT) * mq) AS DECIMAL(38,0)) AS sm2
      |  FROM kurt),
      |b1 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS np,
      |    CAST(sum(CAST(CAST(floor(pow(list_sum(list_transform(list_zip(c.z, p.pz),
      |      q -> q[1] * q[2])), 3) * 1e6 + 0.5) AS BIGINT) AS HUGEINT)) AS DECIMAL(38,0)) AS sc
      |  FROM zed c, (SELECT id AS pid, z AS pz FROM zed WHERE id < 200) p)
      |SELECT n AS n_vectors,
      |  round(CAST(sm2 AS DOUBLE) / n / 1e18, 6) AS mardia_b2,
      |  CAST(4224 AS BIGINT) AS b2_gaussian_ref,
      |  round((CAST(sm2 AS DOUBLE) / n / 1e18 - 4224)
      |  * sqrt(CAST(n AS DOUBLE) / (8 * 64 * 66)), 4) AS b2_zscore,
      |  round(CAST(sc AS DOUBLE) / np / 1e6, 6) AS mardia_b1_probe
      |FROM b2, b1""".stripMargin

  // ---------------------------------------------------------------- C1037
  /** stat_beta_binomial_eb — empirical-Bayes shrinkage of per-brand
    * return rates: method-of-moments Beta(α, β) from the 25 bounded
    * brand rates (mean/variance terms ·1e12-quantized exact), then
    * each brand's posterior rate (k+α)/(n+α+β). The top-raw vs
    * top-shrunk disagreement count shows WHY shrinkage matters for
    * small-n brands. One hash aggregate + O(25).
    */
  def statBetaBinomialEb(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .join(part(s, d), expr("l_partkey = p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END"))
          .cast("long").as("k"))
      .withColumn("rq", expr(
        "CAST(floor(CAST(k AS DOUBLE) / n * 1e12 + 0.5) AS BIGINT)"))
    val mom = g.agg(count(lit(1)).cast("long").as("m"),
      sum(col("rq")).cast("long").as("sr"),
      sum(expr("CAST(rq AS DECIMAL(38,0)) * rq")).cast("decimal(38,0)").as("sr2"))
      .selectExpr("m", "CAST(sr AS DOUBLE) / m / 1e12 AS m1",
        """(CAST(sr2 AS DOUBLE) / m / 1e24
          |- (CAST(sr AS DOUBLE) / m / 1e12) * (CAST(sr AS DOUBLE) / m / 1e12)) AS v""".stripMargin)
      .selectExpr("m", "m1", "v",
        "m1 * (m1 * (1 - m1) / v - 1) AS alpha",
        "(1 - m1) * (m1 * (1 - m1) / v - 1) AS beta")
    g.crossJoin(broadcast(mom))
      .selectExpr("p_brand", "n", "k",
        "round(CAST(k AS DOUBLE) / n, 6) AS raw_rate",
        "round((CAST(k AS DOUBLE) + alpha) / (CAST(n AS DOUBLE) + alpha + beta), 6) AS shrunk_rate",
        "round(alpha, 4) AS alpha", "round(beta, 4) AS beta")
      .orderBy("p_brand")
  }
  val statBetaBinomialEbSql: String =
    """WITH g AS (
      |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS k,
      |    CAST(floor(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
      |      / count(*) * 1e12 + 0.5) AS BIGINT) AS rq
      |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      |mom0 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(rq) AS BIGINT) AS sr,
      |    CAST(sum(CAST(rq AS HUGEINT) * rq) AS DECIMAL(38,0)) AS sr2
      |  FROM g),
      |mom1 AS (
      |  SELECT m, CAST(sr AS DOUBLE) / m / 1e12 AS m1,
      |    (CAST(sr2 AS DOUBLE) / m / 1e24
      |    - (CAST(sr AS DOUBLE) / m / 1e12) * (CAST(sr AS DOUBLE) / m / 1e12)) AS v
      |  FROM mom0),
      |mom AS (
      |  SELECT m, m1, v,
      |    m1 * (m1 * (1 - m1) / v - 1) AS alpha,
      |    (1 - m1) * (m1 * (1 - m1) / v - 1) AS beta
      |  FROM mom1)
      |SELECT p_brand, n, k,
      |  round(CAST(k AS DOUBLE) / n, 6) AS raw_rate,
      |  round((CAST(k AS DOUBLE) + alpha) / (CAST(n AS DOUBLE) + alpha + beta), 6) AS shrunk_rate,
      |  round(alpha, 4) AS alpha, round(beta, 4) AS beta
      |FROM g, mom ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- C1038
  /** stat_marascuilo — Marascuilo's simultaneous pairwise proportion
    * comparisons of return rates across the 5 order priorities:
    * all 10 pairs from the 5-row aggregate self-join (the Tukey-HSD
    * shape), critical value √χ²₄,.05·√(p̂ᵢq̂ᵢ/nᵢ + p̂ⱼq̂ⱼ/nⱼ) with the
    * 9.488 literal, significance decided on ·1e9-quantized integers.
    */
  def statMarascuilo(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .join(orders(s, d), expr("l_orderkey = o_orderkey"))
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END"))
          .cast("long").as("k"))
    val b = g.selectExpr("grp AS grp2", "n AS n2", "k AS k2")
    g.crossJoin(broadcast(b)).filter(expr("grp < grp2"))
      .selectExpr("grp", "grp2",
        "abs(CAST(k AS DOUBLE) / n - CAST(k2 AS DOUBLE) / n2) AS diff",
        """sqrt(CAST(9.488 AS DOUBLE))
          |* sqrt(CAST(k AS DOUBLE) / n * (1 - CAST(k AS DOUBLE) / n) / n
          |  + CAST(k2 AS DOUBLE) / n2 * (1 - CAST(k2 AS DOUBLE) / n2) / n2)
          |AS crit""".stripMargin)
      .selectExpr("grp", "grp2", "round(diff, 6) AS diff",
        "round(crit, 6) AS critical",
        """CAST(floor(diff * 1e9 + 0.5) AS BIGINT)
          |> CAST(floor(crit * 1e9 + 0.5) AS BIGINT) AS significant""".stripMargin)
      .orderBy("grp", "grp2")
  }
  val statMarascuiloSql: String =
    """WITH g AS (
      |  SELECT o_orderpriority AS grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS k
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1),
      |p AS (
      |  SELECT a.grp, b.grp AS grp2,
      |    abs(CAST(a.k AS DOUBLE) / a.n - CAST(b.k AS DOUBLE) / b.n) AS diff,
      |    sqrt(CAST(9.488 AS DOUBLE))
      |    * sqrt(CAST(a.k AS DOUBLE) / a.n * (1 - CAST(a.k AS DOUBLE) / a.n) / a.n
      |      + CAST(b.k AS DOUBLE) / b.n * (1 - CAST(b.k AS DOUBLE) / b.n) / b.n) AS crit
      |  FROM g a JOIN g b ON a.grp < b.grp)
      |SELECT grp, grp2, round(diff, 6) AS diff, round(crit, 6) AS critical,
      |  CAST(floor(diff * 1e9 + 0.5) AS BIGINT)
      |  > CAST(floor(crit * 1e9 + 0.5) AS BIGINT) AS significant
      |FROM p ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- C1039
  /** win_heikin_ashi — the Heikin-Ashi smoothed-candle recursion on
    * monthly bars: HA close rides the EXACT 4× grid (o+h+l+c), the
    * carried HA open the 1e-3 grid (haoq' = ⌊(haoq/1e3 + pc4/4)/2·1e3⌉
    * with the previous HA close-4 carried as an exact integer), and
    * bullishness is the exact integer test hac4·1e3 > 4·haoq. Driver
    * walk + recursive-CTE oracle; bull/bear-run structure reported.
    */
  def winHeikinAshi(s: SparkSession, d: String): DataFrame = {
    val bars = orders(s, d)
      .select(date_trunc("month", col("o_orderdate")).as("m"), col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("p"))
      .groupBy("m")
      .agg(min(struct(col("o_orderkey"), col("p"))).as("fo"),
        max(struct(col("o_orderkey"), col("p"))).as("lo"),
        max(col("p")).cast("long").as("h"), min(col("p")).cast("long").as("l"))
      .selectExpr("m", "fo.p AS o", "lo.p AS c", "h", "l",
        "fo.p + h + l + lo.p AS hac4")
      .orderBy("m").collect()
      .map(r => (r.getLong(1), r.getLong(5))) // (o, hac4)
    var haoq = bars(0)._1 * 1000L // HA open seeds at the first real open
    var pc4 = bars(0)._2
    var nBull = 0L; var maxRun = 0L; var run = 0L
    for (t <- 2 to bars.length) {
      val hac4 = bars(t - 1)._2
      haoq = math.floor((haoq / 1e3 + pc4 / 4.0) / 2 * 1e3 + 0.5).toLong
      if (hac4 * 1000L > 4L * haoq) { nBull += 1; run += 1; if (run > maxRun) maxRun = run }
      else run = 0
      pc4 = hac4
    }
    import s.implicits._
    Seq((bars.length.toLong, nBull, maxRun, haoq / 1e3 / 100))
      .toDF("n0", "nb", "mr", "ho")
      .selectExpr("n0 AS n_months", "nb AS n_bull_months",
        "mr AS longest_bull_run", "round(ho, 4) AS final_ha_open_dollars")
  }
  val winHeikinAshiSql: String = {
    val haoN = "CAST(floor((it.haoq / 1e3 + it.pc4 / 4.0) / 2 * 1e3 + 0.5) AS BIGINT)"
    val bullN = s"(s2.hac4 * 1000 > 4 * ($haoN))"
    s"""WITH RECURSIVE bars AS (
       |  SELECT m, max(CASE WHEN rn_f = 1 THEN p END) AS o,
       |    max(CASE WHEN rn_f = 1 THEN p END) + CAST(max(p) AS BIGINT)
       |      + CAST(min(p) AS BIGINT) + max(CASE WHEN rn_l = 1 THEN p END) AS hac4
       |  FROM (
       |    SELECT date_trunc('month', o_orderdate) AS m,
       |      CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p,
       |      row_number() OVER (PARTITION BY date_trunc('month', o_orderdate)
       |        ORDER BY o_orderkey) AS rn_f,
       |      row_number() OVER (PARTITION BY date_trunc('month', o_orderdate)
       |        ORDER BY o_orderkey DESC) AS rn_l
       |    FROM orders) z
       |  GROUP BY 1),
       |seq AS (
       |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t, o, hac4
       |  FROM bars),
       |it(t, haoq, pc4, nb, run, mr) AS (
       |  SELECT CAST(1 AS BIGINT), o * 1000, hac4, CAST(0 AS BIGINT),
       |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |  FROM seq WHERE t = 1
       |  UNION ALL
       |  SELECT s2.t, $haoN, s2.hac4,
       |    it.nb + CASE WHEN $bullN THEN 1 ELSE 0 END,
       |    CASE WHEN $bullN THEN it.run + 1 ELSE 0 END,
       |    greatest(it.mr, CASE WHEN $bullN THEN it.run + 1 ELSE 0 END)
       |  FROM it JOIN seq s2 ON s2.t = it.t + 1),
       |fin AS (SELECT * FROM it ORDER BY t DESC LIMIT 1),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM seq)
       |SELECT n0 AS n_months, nb AS n_bull_months, mr AS longest_bull_run,
       |  round(haoq / 1e3 / 100, 4) AS final_ha_open_dollars
       |FROM fin, nn""".stripMargin
  }

  // ---------------------------------------------------------------- C1040
  /** analytics_concentration_index — the (Kakwani/Wagstaff) relative
    * concentration index of order spend over the customer wealth
    * ranking: customers ranked by (acctbal, custkey) via GlobalRank,
    * CI = 2·Σrᵢyᵢ/(n·Σy) − (n+1)/n with Σrᵢyᵢ an EXACT rank×cents
    * DECIMAL sum. Positive = spend concentrated among the wealthy —
    * the distributional-equity number health economics runs on.
    */
  def analyticsConcentrationIndex(s: SparkSession, d: String): DataFrame = {
    val spend = customer(s, d)
      .join(orders(s, d), expr("c_custkey = o_custkey"), "left")
      .groupBy(col("c_custkey").as("ck"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)").as("w"))
      .agg(coalesce(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")), lit(0L))
        .cast("long").as("y"))
    val ranked = graft.plans.GlobalRank.withGlobalRowNumber(
      spend, "r", Seq(col("w").asc, col("ck").asc))
    ranked.agg(count(lit(1)).cast("long").as("n"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(r AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("sry"))
      .selectExpr("n AS n_customers",
        "round(CAST(sy AS DOUBLE) / 100, 2) AS total_spend_dollars",
        """round(2 * CAST(sry AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sy AS DOUBLE))
          |- (CAST(n AS DOUBLE) + 1) / n, 6) AS concentration_index""".stripMargin)
  }
  val analyticsConcentrationIndexSql: String =
    """WITH spend AS (
      |  SELECT c_custkey AS ck,
      |    CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS w,
      |    CAST(coalesce(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)), 0) AS BIGINT) AS y
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT y, CAST(row_number() OVER (ORDER BY w, ck) AS BIGINT) AS r
      |  FROM spend)
      |SELECT CAST(count(*) AS BIGINT) AS n_customers,
      |  round(CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) / 100, 2) AS total_spend_dollars,
      |  round(2 * CAST(sum(CAST(r AS HUGEINT) * y) AS DOUBLE)
      |    / (CAST(count(*) AS DOUBLE) * CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE))
      |  - (CAST(count(*) AS DOUBLE) + 1) / count(*), 6) AS concentration_index
      |FROM ranked""".stripMargin

  // ---------------------------------------------------------------- C1041
  /** stat_pesaran_cd — Pesaran's CD test of cross-sectional dependence
    * on the 25-nation × month revenue panel (zero-filled from the
    * bounded month frame × the 25-row nation dictionary): all 300
    * pairwise correlations from exact integer cent moments via a
    * month-keyed equi-join of the bounded panel with itself, each ρ̂
    * quantized ·1e9 into the exact 300-term sum, CD = √(2T/(N(N−1)))
    * ·Σρ̂ ~ N(0,1). The panel-data diagnostic fixed effects can't see.
    */
  def statPesaranCd(s: SparkSession, d: String): DataFrame = {
    val mo = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m")).agg(count(lit(1)).as("dropme"))
      .select("m")
    val spine = mo.crossJoin(broadcast(nation(s, d).select(col("n_nationkey").as("nk"))))
    val cells = orders(s, d)
      .join(customer(s, d), expr("o_custkey = c_custkey"))
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"),
        col("c_nationkey").as("nk"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("y"))
    val panel = spine.join(cells, Seq("m", "nk"), "left")
      .select(col("m"), col("nk"), coalesce(col("y"), lit(0L)).as("y"))
    val pairs = panel.join(
        panel.select(col("m").as("m2"), col("nk").as("nk2"), col("y").as("y2")),
        expr("m = m2 AND nk < nk2"))
      .groupBy("nk", "nk2")
      .agg(count(lit(1)).cast("long").as("t"),
        sum(col("y")).cast("decimal(38,0)").as("sa"),
        sum(col("y2")).cast("decimal(38,0)").as("sb"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("saa"),
        sum(expr("CAST(y2 AS DECIMAL(38,0)) * y2")).cast("decimal(38,0)").as("sbb"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y2")).cast("decimal(38,0)").as("sab"))
      .selectExpr("t",
        """CAST(floor((CAST(t AS DOUBLE) * CAST(sab AS DOUBLE)
          |  - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
          |/ sqrt(CAST(t AS DOUBLE) * CAST(saa AS DOUBLE)
          |  - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
          |/ sqrt(CAST(t AS DOUBLE) * CAST(sbb AS DOUBLE)
          |  - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS rq""".stripMargin)
    pairs.agg(count(lit(1)).cast("long").as("npairs"),
        max(col("t")).cast("long").as("t"),
        sum(col("rq")).cast("long").as("srho"))
      .selectExpr("npairs AS n_pairs", "t AS n_months",
        "round(CAST(srho AS DOUBLE) / npairs / 1e9, 6) AS mean_pairwise_rho",
        """round(sqrt(2 * CAST(t AS DOUBLE) / (25 * 24))
          |* (CAST(srho AS DOUBLE) / 1e9), 4) AS cd_stat""".stripMargin)
  }
  val statPesaranCdSql: String =
    """WITH mo AS (SELECT DISTINCT date_trunc('month', o_orderdate) AS m FROM orders),
      |spine AS (SELECT m, n_nationkey AS nk FROM mo, nation),
      |cells AS (
      |  SELECT date_trunc('month', o_orderdate) AS m, c_nationkey AS nk,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |panel AS (
      |  SELECT spine.m, spine.nk, CAST(coalesce(cells.y, 0) AS BIGINT) AS y
      |  FROM spine LEFT JOIN cells ON spine.m = cells.m AND spine.nk = cells.nk),
      |pairs AS (
      |  SELECT a.nk, b.nk AS nk2, CAST(count(*) AS BIGINT) AS t,
      |    CAST(sum(CAST(a.y AS HUGEINT)) AS DECIMAL(38,0)) AS sa,
      |    CAST(sum(CAST(b.y AS HUGEINT)) AS DECIMAL(38,0)) AS sb,
      |    CAST(sum(CAST(a.y AS HUGEINT) * a.y) AS DECIMAL(38,0)) AS saa,
      |    CAST(sum(CAST(b.y AS HUGEINT) * b.y) AS DECIMAL(38,0)) AS sbb,
      |    CAST(sum(CAST(a.y AS HUGEINT) * b.y) AS DECIMAL(38,0)) AS sab
      |  FROM panel a JOIN panel b ON a.m = b.m AND a.nk < b.nk
      |  GROUP BY 1, 2),
      |q AS (
      |  SELECT t,
      |    CAST(floor((CAST(t AS DOUBLE) * CAST(sab AS DOUBLE)
      |      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
      |    / sqrt(CAST(t AS DOUBLE) * CAST(saa AS DOUBLE)
      |      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
      |    / sqrt(CAST(t AS DOUBLE) * CAST(sbb AS DOUBLE)
      |      - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS rq
      |  FROM pairs)
      |SELECT CAST(count(*) AS BIGINT) AS n_pairs, CAST(max(t) AS BIGINT) AS n_months,
      |  round(CAST(sum(rq) AS DOUBLE) / count(*) / 1e9, 6) AS mean_pairwise_rho,
      |  round(sqrt(2 * CAST(max(t) AS DOUBLE) / (25 * 24))
      |  * (CAST(sum(rq) AS DOUBLE) / 1e9), 4) AS cd_stat
      |FROM q""".stripMargin

  // ---------------------------------------------------------------- C1042
  /** multimodal_image_entropy — Shannon entropy of the decoded PNG
    * pixel stream (the C*-family MediaCodec path: text payloads PNG-
    * encoded executor-side, CRC-checked decode, per-partition byte
    * histogram partials — no driver decode). Entropy = ln N − Σc·ln c
    * /N with each c·ln c term ·1e6-quantized on the bounded 256-value
    * byte dictionary. The compressibility proxy a media-ingest
    * pipeline screens on.
    */
  def multimodalImageEntropy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val partials = documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val hist = new Array[Long](256)
        it.foreach { case (id, payload) =>
          val blob = graft.sources.MediaCodec.encodePng(payload)
          val pixels = graft.sources.MediaCodec.decodePayload(id, blob)
          var i = 0
          while (i < pixels.length) { hist(pixels(i) & 0xff) += 1; i += 1 }
        }
        (0 until 256).iterator.filter(hist(_) > 0).map(b => BytePartial(b, hist(b)))
      }
      .toDF()
    val h = partials.groupBy("b").agg(sum(col("c")).cast("long").as("c"))
    h.agg(count(lit(1)).cast("long").as("n_distinct"),
        sum(col("c")).cast("long").as("n"),
        sum(expr(
          "CAST(floor(c * ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS DECIMAL(38,0))"))
          .cast("decimal(38,0)").as("slnq"))
      .selectExpr("n AS n_bytes", "n_distinct AS n_distinct_bytes",
        """round(ln(CAST(n AS DOUBLE))
          |- CAST(slnq AS DOUBLE) / 1e6 / n, 6) AS entropy_nats""".stripMargin,
        """round((ln(CAST(n AS DOUBLE))
          |- CAST(slnq AS DOUBLE) / 1e6 / n) / ln(CAST(2 AS DOUBLE)), 6)
          |AS entropy_bits""".stripMargin)
  }
  val multimodalImageEntropySql: String =
    """WITH b AS (
      |  SELECT ascii(text[p]) AS byte, CAST(count(*) AS BIGINT) AS c
      |  FROM documents, LATERAL (SELECT unnest(generate_series(1, strlen(text))) AS p)
      |  GROUP BY 1),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_distinct, CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(CAST(floor(c * ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS HUGEINT)) AS DECIMAL(38,0)) AS slnq
      |  FROM b)
      |SELECT n AS n_bytes, n_distinct AS n_distinct_bytes,
      |  round(ln(CAST(n AS DOUBLE)) - CAST(slnq AS DOUBLE) / 1e6 / n, 6) AS entropy_nats,
      |  round((ln(CAST(n AS DOUBLE)) - CAST(slnq AS DOUBLE) / 1e6 / n)
      |    / ln(CAST(2 AS DOUBLE)), 6) AS entropy_bits
      |FROM a""".stripMargin

  // ---------------------------------------------------------------- C1043
  /** analytics_zenga_index — Zenga's 2007 inequality index of order
    * values: Z = mean over the GlobalRank Lorenz spine of 1 −
    * (Lᵢ/pᵢ)·((1−pᵢ)/(1−Lᵢ)) (the lower-vs-upper mean ratio at every
    * split point, the modern uniform-sensitivity alternative to the
    * C*-family Gini/Palma/Atkinson), each point term ·1e12-quantized
    * from exact prefix integers into a DECIMAL sum; the final split
    * (L = 1) is excluded by construction.
    */
  def analyticsZengaIndex(s: SparkSession, d: String): DataFrame = {
    val vals = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("v"),
        col("o_orderkey").as("k"))
    // rank + prefix sum over the SAME (v, k)-order: one combined
    // two-pass machinery instead of two (r14)
    val ranked = graft.plans.GlobalRank.withRankAndPrefixSums(vals,
      Some("i"), Seq((col("v"), "sv0")), Seq(col("v").asc, col("k").asc))
    // r14: totals off the pinned spine, not a second orders scan
    val tot = ranked.agg(count(lit(1)).cast("long").as("n"),
      sum(col("v")).cast("decimal(38,0)").as("sv"))
    ranked.crossJoin(broadcast(tot))
      .filter(expr("i < n"))
      .selectExpr("n",
        """CAST(floor((1 - (CAST(sv0 + v AS DOUBLE) / CAST(sv AS DOUBLE))
          |/ (CAST(i AS DOUBLE) / n)
          |* ((1 - CAST(i AS DOUBLE) / n)
          |/ (1 - CAST(sv0 + v AS DOUBLE) / CAST(sv AS DOUBLE))))
          |* 1e12 + 0.5) AS BIGINT) AS zq""".stripMargin)
      .groupBy("n")
      .agg(sum(expr("CAST(zq AS DECIMAL(38,0))")).cast("decimal(38,0)").as("sz"))
      .selectExpr("n AS n_orders",
        "round(CAST(sz AS DOUBLE) / (n - 1) / 1e12, 6) AS zenga_index")
  }
  val analyticsZengaIndexSql: String =
    """WITH vals AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v,
      |    o_orderkey AS k
      |  FROM orders),
      |ranked AS (
      |  SELECT v,
      |    CAST(row_number() OVER (ORDER BY v, k) AS BIGINT) AS i,
      |    CAST(coalesce(sum(v) OVER (ORDER BY v, k
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS sv0
      |  FROM vals),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS sv FROM vals),
      |q AS (
      |  SELECT n,
      |    CAST(floor((1 - (CAST(sv0 + v AS DOUBLE) / CAST(sv AS DOUBLE))
      |    / (CAST(i AS DOUBLE) / n)
      |    * ((1 - CAST(i AS DOUBLE) / n)
      |    / (1 - CAST(sv0 + v AS DOUBLE) / CAST(sv AS DOUBLE))))
      |    * 1e12 + 0.5) AS BIGINT) AS zq
      |  FROM ranked, tot WHERE i < n)
      |SELECT n AS n_orders,
      |  round(CAST(sum(CAST(zq AS HUGEINT)) AS DOUBLE) / (n - 1) / 1e12, 6) AS zenga_index
      |FROM q GROUP BY n""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_mardia_normality" -> (embedMardiaNormality _),
    "stat_beta_binomial_eb" -> (statBetaBinomialEb _),
    "stat_marascuilo" -> (statMarascuilo _),
    "win_heikin_ashi" -> (winHeikinAshi _),
    "analytics_concentration_index" -> (analyticsConcentrationIndex _),
    "stat_pesaran_cd" -> (statPesaranCd _),
    "multimodal_image_entropy" -> (multimodalImageEntropy _),
    "analytics_zenga_index" -> (analyticsZengaIndex _))

  val oracle: Map[String, String] = Map(
    "embed_mardia_normality" -> embedMardiaNormalitySql,
    "stat_beta_binomial_eb" -> statBetaBinomialEbSql,
    "stat_marascuilo" -> statMarascuiloSql,
    "win_heikin_ashi" -> winHeikinAshiSql,
    "analytics_concentration_index" -> analyticsConcentrationIndexSql,
    "stat_pesaran_cd" -> statPesaranCdSql,
    "multimodal_image_entropy" -> multimodalImageEntropySql,
    "analytics_zenga_index" -> analyticsZengaIndexSql)
}
