package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 101 (C808–C811): survival extensions + specification testing +
  * temporal texture — the Gehan–Breslow weighted log-rank, restricted
  * mean survival time, Ramsey's RESET functional-form test, and the
  * Goh–Barabási burstiness/memory pair.
  *
  * Shared discipline: survival at-risk algebra stays on the bounded
  * distinct-lead-time frame with micro-quantized rational divisions
  * (the C656 idiom); RESET reduces to EXACT polynomial moments
  * (quantity ≤ 50 ⇒ Σx^k exact DECIMAL) solved by Cramer's rule in
  * identical double arithmetic; burstiness moments are exact integer
  * µs sums with per-pair products for the memory coefficient.
  */
object Extras201 {

  /** C808 stat_gehan_breslow — the Gehan–Breslow–Wilcoxon weighted
    * log-rank (w_t = n_t, early-difference sensitive) on the C656
    * lead-time frame: U = Σ n_t(d1_t − E_t), Var = Σ n_t²V_t, both
    * from exact integer at-risk suffix sums with ·10⁶-quantized
    * rational divisions. Complements C656: log-rank weights late
    * differences equally; Gehan upweights the head of the curve.
    */
  def statGehanBreslow(s: SparkSession, d: String): DataFrame = {
    val ev = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("t"),
        expr("CASE WHEN l_discount >= 0.05 THEN 1L ELSE 0L END").as("g"))
      .filter(col("t") >= 1)
    val byT = ev.groupBy("t")
      .agg(count(lit(1)).cast("long").as("dt"), sum(col("g")).cast("long").as("d1t"))
    val wSuf = org.apache.spark.sql.expressions.Window.orderBy(col("t").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val risk = byT
      .withColumn("nt", sum(col("dt")).over(wSuf).cast("long"))
      .withColumn("n1t", sum(col("d1t")).over(wSuf).cast("long"))
      // n_t·E_t = dt·n1t exactly (the n_t cancels the denominator!)
      .withColumn("we", expr("CAST(dt AS DECIMAL(38,0)) * n1t"))
      .withColumn("wo", expr("CAST(nt AS DECIMAL(38,0)) * d1t"))
      // the textbook form has nt² in both numerator (w_t² = nt²) and
      // denominator — cancel ONE nt exactly before evaluating, so the
      // integer div is unchanged (same rational) while the peak
      // magnitude drops from ~nt⁵ to ~nt⁴/16: ≈8e31 at sf1, safe in
      // DECIMAL(38,0)/HUGEINT through sf10 (≈8e35); sf100 would
      // overflow — re-quantize before going there.
      .withColumn("wv6", expr(
        """CASE WHEN nt > 1 THEN
          |  (CAST(dt AS DECIMAL(38,0)) * n1t * (nt - n1t) * (nt - dt) * 1000000)
          |    div (CAST(nt AS DECIMAL(38,0)) * (nt - 1))
          |ELSE CAST(0 AS DECIMAL(38,0)) END""".stripMargin))
    risk.agg(count(lit(1)).cast("long").as("n_times"),
        sum(col("wo")).cast("decimal(38,0)").as("swo"),
        sum(col("we")).cast("decimal(38,0)").as("swe"),
        sum(col("wv6")).cast("decimal(38,0)").as("sv6"))
      .selectExpr("n_times",
        "CAST(swo AS DOUBLE) - CAST(swe AS DOUBLE) AS u_gehan",
        "CAST(sv6 AS DOUBLE) / 1e6 AS var_gehan")
      .selectExpr("n_times", "round(u_gehan, 4) AS u_gehan",
        "round(u_gehan * u_gehan / var_gehan, 4) AS gehan_chi2")
  }
  val statGehanBreslowSql: String =
    """WITH ev AS (
      |  SELECT CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS t,
      |    CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS g
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE datediff('day', o_orderdate, l_shipdate) >= 1),
      |byt AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS dt, CAST(sum(g) AS BIGINT) AS d1t
      |  FROM ev GROUP BY 1),
      |risk AS (
      |  SELECT t, dt, d1t,
      |    sum(dt) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nt,
      |    sum(d1t) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1t
      |  FROM byt),
      |q AS (
      |  SELECT
      |    CAST(nt AS HUGEINT) * d1t AS wo,
      |    CAST(dt AS HUGEINT) * n1t AS we,
      |    CASE WHEN nt > 1 THEN
      |      CAST(CAST(dt AS HUGEINT) * n1t * (nt - n1t) * (nt - dt) * 1000000 AS HUGEINT)
      |        // (CAST(nt AS HUGEINT) * (nt - 1))
      |    ELSE CAST(0 AS HUGEINT) END AS wv6
      |  FROM risk),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_times,
      |    CAST(sum(wo) AS DECIMAL(38,0)) AS swo,
      |    CAST(sum(we) AS DECIMAL(38,0)) AS swe,
      |    CAST(sum(wv6) AS DECIMAL(38,0)) AS sv6
      |  FROM q)
      |SELECT n_times,
      |  round(CAST(swo AS DOUBLE) - CAST(swe AS DOUBLE), 4) AS u_gehan,
      |  round((CAST(swo AS DOUBLE) - CAST(swe AS DOUBLE))
      |    * (CAST(swo AS DOUBLE) - CAST(swe AS DOUBLE))
      |    / (CAST(sv6 AS DOUBLE) / 1e6), 4) AS gehan_chi2
      |FROM m""".stripMargin

  /** C809 stat_rmst — restricted mean survival time of the lead-time
    * process up to τ = 60 days: Kaplan–Meier steps on the bounded
    * distinct-time frame via ·10⁹-quantized Σln(1−d/n) prefix sums,
    * RMST = ∫₀^τ S(t)dt as the exact step integral (pre-step survival
    * × clamped integer widths, per-segment ·10⁶ quantization) plus the
    * post-last-event tail. The "how many days of the first 60 does a
    * line stay unshipped" number — reportable where a hazard ratio
    * is not.
    */
  def statRmst(s: SparkSession, d: String): DataFrame = {
    val tau = 60L
    val ev = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("t"))
      .filter(col("t") >= 1)
    val byT = ev.groupBy("t").agg(count(lit(1)).cast("long").as("dt"))
    val wSuf = org.apache.spark.sql.expressions.Window.orderBy(col("t").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAsc = org.apache.spark.sql.expressions.Window.orderBy(col("t").asc)
    val risk = byT
      .withColumn("nt", sum(col("dt")).over(wSuf).cast("long"))
      // the final block has dt = nt (complete data): S drops to 0 there,
      // so its own ln(0) term is never needed — guard it to 0 and zero
      // the tail explicitly via the exhausted flag
      .withColumn("z", expr("CASE WHEN dt = nt THEN 1L ELSE 0L END"))
      .withColumn("lq", expr(
        "CASE WHEN dt = nt THEN 0L ELSE CAST(floor(ln(1 - CAST(dt AS DOUBLE) / nt) * 1e9 + 0.5) AS BIGINT) END"))
    val steps = risk
      .withColumn("cumb", coalesce(sum(col("lq")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("t").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("prev", coalesce(lag(col("t"), 1).over(wAsc), lit(0L)))
      // pre-step survival S(t−) = exp(cumb/1e9); width clamped to τ
      .withColumn("contrib_q", expr(
        s"""CAST(floor(exp(CAST(cumb AS DOUBLE) / 1e9)
          |* (least(t, ${tau}L) - least(prev, ${tau}L)) * 1e6 + 0.5) AS BIGINT)"""
          .stripMargin))
    val tail = risk.agg(sum(col("lq")).cast("long").as("cumall"),
      max(col("t")).cast("long").as("tmax"), max(col("z")).cast("long").as("zed"))
      .selectExpr(
        s"""CASE WHEN zed = 1 THEN 0L ELSE
          |CAST(floor(exp(CAST(cumall AS DOUBLE) / 1e9)
          |* greatest($tau - least(tmax, ${tau}L), 0L) * 1e6 + 0.5) AS BIGINT) END AS tail_q""".stripMargin)
    steps.agg(sum(col("contrib_q")).cast("long").as("body_q"),
        count(lit(1)).cast("long").as("n_times"))
      .crossJoin(broadcast(tail))
      .selectExpr("n_times", s"CAST($tau AS BIGINT) AS tau_days",
        "round((CAST(body_q AS DOUBLE) + tail_q) / 1e6, 6) AS rmst_days")
  }
  val statRmstSql: String =
    """WITH ev AS (
      |  SELECT CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS t
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE datediff('day', o_orderdate, l_shipdate) >= 1),
      |byt AS (SELECT t, CAST(count(*) AS BIGINT) AS dt FROM ev GROUP BY 1),
      |risk AS (
      |  SELECT t, dt,
      |    sum(dt) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nt
      |  FROM byt),
      |lq AS (
      |  SELECT t, CASE WHEN dt = nt THEN 1 ELSE 0 END AS z,
      |    CASE WHEN dt = nt THEN CAST(0 AS BIGINT)
      |      ELSE CAST(floor(ln(1 - CAST(dt AS DOUBLE) / nt) * 1e9 + 0.5) AS BIGINT) END AS lq
      |  FROM risk),
      |steps AS (
      |  SELECT t, lq,
      |    COALESCE(sum(lq) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS cumb,
      |    COALESCE(lag(t, 1) OVER (ORDER BY t), CAST(0 AS BIGINT)) AS prev
      |  FROM lq),
      |body AS (
      |  SELECT CAST(sum(CAST(floor(exp(CAST(cumb AS DOUBLE) / 1e9)
      |    * (least(t, 60) - least(prev, 60)) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS body_q,
      |    CAST(count(*) AS BIGINT) AS n_times
      |  FROM steps),
      |tail AS (
      |  SELECT CASE WHEN max(z) = 1 THEN CAST(0 AS BIGINT) ELSE
      |    CAST(floor(exp(CAST(CAST(sum(lq) AS BIGINT) AS DOUBLE) / 1e9)
      |      * greatest(60 - least(max(t), 60), 0) * 1e6 + 0.5) AS BIGINT) END AS tail_q
      |  FROM lq)
      |SELECT n_times, CAST(60 AS BIGINT) AS tau_days,
      |  round((CAST(body_q AS DOUBLE) + tail_q) / 1e6, 6) AS rmst_days
      |FROM body, tail""".stripMargin

  /** Shared 4×4 Cramer determinant over named scalar columns —
    * emitted as IDENTICAL arithmetic text for Spark and DuckDB, so the
    * double evaluation matches bit for bit.
    */
  private def det4(m: Array[Array[String]]): String = {
    def det3(a: Array[Array[String]]): String =
      s"""(${a(0)(0)} * (${a(1)(1)} * ${a(2)(2)} - ${a(1)(2)} * ${a(2)(1)})
        | - ${a(0)(1)} * (${a(1)(0)} * ${a(2)(2)} - ${a(1)(2)} * ${a(2)(0)})
        | + ${a(0)(2)} * (${a(1)(0)} * ${a(2)(1)} - ${a(1)(1)} * ${a(2)(0)}))""".stripMargin
    def minor(r: Int, c: Int): Array[Array[String]] =
      (0 until 4).filter(_ != r).map(i =>
        (0 until 4).filter(_ != c).map(j => m(i)(j)).toArray).toArray
    s"""(${m(0)(0)} * ${det3(minor(0, 0))}
      | - ${m(0)(1)} * ${det3(minor(0, 1))}
      | + ${m(0)(2)} * ${det3(minor(0, 2))}
      | - ${m(0)(3)} * ${det3(minor(0, 3))})""".stripMargin
  }

  /** C810 stat_ramsey_reset — Ramsey's RESET functional-form test for
    * price ~ quantity: because ŷ is affine in x, the augmented
    * regression spans exactly {1, x, x², x³}, so RESET reduces to
    * cubic-vs-linear polynomial OLS. All moments Σx^k (k≤6) and Σy·x^k
    * (k≤3) are EXACT DECIMAL (quantity ≤ 50), both SSRs come from
    * Cramer-solved normal equations evaluated in identical double
    * arithmetic, F = ((SSR₁−SSR₃)/2)/(SSR₃/(n−4)). Large F = the
    * linear model's form is wrong, not just noisy.
    */
  def statRamseyReset(s: SparkSession, d: String): DataFrame = {
    val base = lineitem(s, d)
      .select(expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("y"))
    val aggCols = Seq(count(lit(1)).cast("long").as("n")) ++
      (1 to 6).map(k =>
        sum(expr("CAST(x AS DECIMAL(38,0))" + " * x" * (k - 1))).cast("decimal(38,0)").as(s"m$k")) ++
      (0 to 3).map(k =>
        sum(expr("CAST(y AS DECIMAL(38,0))" + " * x" * k)).cast("decimal(38,0)").as(s"sy$k")) ++
      Seq(sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"))
    val m = base.agg(aggCols.head, aggCols.tail: _*)
    val doubles = m.selectExpr(Seq("CAST(n AS DOUBLE) AS m0") ++
      (1 to 6).map(k => s"CAST(m$k AS DOUBLE) AS m$k") ++
      Seq("CAST(sy0 AS DOUBLE) AS sy0", "CAST(sy1 AS DOUBLE) AS sy1",
        "CAST(sy2 AS DOUBLE) AS sy2", "CAST(sy3 AS DOUBLE) AS sy3",
        "CAST(syy AS DOUBLE) AS syy", "CAST(n AS BIGINT) AS n"): _*)
    val mm = Array.tabulate(4, 4)((i, j) => s"m${i + j}")
    val d0 = det4(mm)
    def dCol(c: Int): String =
      det4(Array.tabulate(4, 4)((i, j) => if (j == c) s"sy$i" else s"m${i + j}"))
    // cubic SSR: syy − Σ_c β_c·sy_c with β_c = D_c/D
    val ssr3 = s"(syy - (${dCol(0)} * sy0 + ${dCol(1)} * sy1 + ${dCol(2)} * sy2 + ${dCol(3)} * sy3) / $d0)"
    // linear SSR from 2×2 normal equations
    val ssr1 =
      """(syy - ((m2 * sy0 - m1 * sy1) * sy0 + (m0 * sy1 - m1 * sy0) * sy1)
        | / (m0 * m2 - m1 * m1))""".stripMargin
    doubles.selectExpr("n",
      s"round(($ssr1 - $ssr3) / 2 / ($ssr3 / (n - 4)), 4) AS f_reset",
      s"round(1 - $ssr3 / $ssr1, 6) AS r2_gain")
  }
  val statRamseyResetSql: String = {
    val mm = Array.tabulate(4, 4)((i, j) => s"m${i + j}")
    val d0 = det4(mm)
    def dCol(c: Int): String =
      det4(Array.tabulate(4, 4)((i, j) => if (j == c) s"sy$i" else s"m${i + j}"))
    val ssr3 = s"(syy - (${dCol(0)} * sy0 + ${dCol(1)} * sy1 + ${dCol(2)} * sy2 + ${dCol(3)} * sy3) / $d0)"
    val ssr1 =
      """(syy - ((m2 * sy0 - m1 * sy1) * sy0 + (m0 * sy1 - m1 * sy0) * sy1)
        | / (m0 * m2 - m1 * m1))""".stripMargin
    s"""WITH base AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y
      |  FROM lineitem),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS m1,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS m2,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x * x) AS DECIMAL(38,0)) AS m3,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x * x * x) AS DECIMAL(38,0)) AS m4,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x * x * x * x) AS DECIMAL(38,0)) AS m5,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x * x * x * x * x) AS DECIMAL(38,0)) AS m6,
      |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy0,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sy1,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * x * x) AS DECIMAL(38,0)) AS sy2,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * x * x * x) AS DECIMAL(38,0)) AS sy3,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
      |  FROM base),
      |d AS (
      |  SELECT CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS m0,
      |    CAST(m1 AS DOUBLE) AS m1, CAST(m2 AS DOUBLE) AS m2, CAST(m3 AS DOUBLE) AS m3,
      |    CAST(m4 AS DOUBLE) AS m4, CAST(m5 AS DOUBLE) AS m5, CAST(m6 AS DOUBLE) AS m6,
      |    CAST(sy0 AS DOUBLE) AS sy0, CAST(sy1 AS DOUBLE) AS sy1,
      |    CAST(sy2 AS DOUBLE) AS sy2, CAST(sy3 AS DOUBLE) AS sy3,
      |    CAST(syy AS DOUBLE) AS syy
      |  FROM mom)
      |SELECT n,
      |  round(($ssr1 - $ssr3) / 2 / ($ssr3 / (n - 4)), 4) AS f_reset,
      |  round(1 - $ssr3 / $ssr1, 6) AS r2_gain
      |FROM d""".stripMargin
  }

  /** C811 time_burstiness_memory — the Goh–Barabási (B, M) pair for
    * per-user inter-event times: B = (σ−μ)/(σ+μ) from exact integer-µs
    * gap moments (−1 = periodic, 0 = Poisson, →1 = bursty), M =
    * Pearson correlation of consecutive same-user gaps from exact
    * pair moments. Together they place the event stream on the
    * burstiness–memory plane — the standard human-dynamics fingerprint.
    */
  def timeBurstinessMemory(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    val gaps = events(s, d)
      .select(col("user_id"), expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"), col("event_id"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull)
      .withColumn("nxt", lead(col("gap"), 1).over(w))
    val bm = gaps.agg(count(lit(1)).cast("long").as("n_gaps"),
      sum(col("gap")).cast("decimal(38,0)").as("sg"),
      sum(expr("CAST(gap AS DECIMAL(38,0)) * gap")).cast("decimal(38,0)").as("qg"),
      sum(expr("CASE WHEN nxt IS NULL THEN 0L ELSE 1L END")).cast("long").as("np"),
      sum(coalesce(col("nxt"), lit(0L))).cast("decimal(38,0)").as("s2"),
      sum(expr("CASE WHEN nxt IS NULL THEN CAST(0 AS DECIMAL(38,0)) ELSE CAST(gap AS DECIMAL(38,0)) END"))
        .cast("decimal(38,0)").as("s1"),
      sum(expr("CASE WHEN nxt IS NULL THEN CAST(0 AS DECIMAL(38,0)) ELSE CAST(gap AS DECIMAL(38,0)) * gap END"))
        .cast("decimal(38,0)").as("q1"),
      sum(expr("CAST(coalesce(nxt, 0L) AS DECIMAL(38,0)) * coalesce(nxt, 0L)")).cast("decimal(38,0)").as("q2"),
      sum(expr("CAST(gap AS DECIMAL(38,0)) * coalesce(nxt, 0L)")).cast("decimal(38,0)").as("sp"))
    bm.selectExpr("n_gaps",
        """round((sqrt((CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / n_gaps) / n_gaps)
          |- CAST(sg AS DOUBLE) / n_gaps)
          |/ (sqrt((CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / n_gaps) / n_gaps)
          |+ CAST(sg AS DOUBLE) / n_gaps), 6) AS burstiness_b""".stripMargin,
        """round((CAST(np AS DOUBLE) * CAST(sp AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
          |/ sqrt((CAST(np AS DOUBLE) * CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          |  * (CAST(np AS DOUBLE) * CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))), 6) AS memory_m""".stripMargin)
  }
  val timeBurstinessMemorySql: String =
    """WITH gaps0 AS (
      |  SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap,
      |    epoch_us(ts) AS us, event_id
      |  FROM events),
      |gaps AS (
      |  SELECT gap,
      |    lead(gap, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
      |  FROM gaps0 WHERE gap IS NOT NULL),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_gaps,
      |    CAST(sum(gap) AS DECIMAL(38,0)) AS sg,
      |    CAST(sum(CAST(gap AS DECIMAL(38,0)) * gap) AS DECIMAL(38,0)) AS qg,
      |    CAST(sum(CASE WHEN nxt IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS np,
      |    CAST(sum(COALESCE(nxt, 0)) AS DECIMAL(38,0)) AS s2,
      |    CAST(sum(CASE WHEN nxt IS NULL THEN 0 ELSE gap END) AS DECIMAL(38,0)) AS s1,
      |    CAST(sum(CASE WHEN nxt IS NULL THEN 0 ELSE CAST(gap AS DECIMAL(38,0)) * gap END) AS DECIMAL(38,0)) AS q1,
      |    CAST(sum(CAST(COALESCE(nxt, 0) AS DECIMAL(38,0)) * COALESCE(nxt, 0)) AS DECIMAL(38,0)) AS q2,
      |    CAST(sum(CAST(gap AS DECIMAL(38,0)) * COALESCE(nxt, 0)) AS DECIMAL(38,0)) AS sp
      |  FROM gaps)
      |SELECT n_gaps,
      |  round((sqrt((CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / n_gaps) / n_gaps)
      |    - CAST(sg AS DOUBLE) / n_gaps)
      |    / (sqrt((CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / n_gaps) / n_gaps)
      |    + CAST(sg AS DOUBLE) / n_gaps), 6) AS burstiness_b,
      |  round((CAST(np AS DOUBLE) * CAST(sp AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
      |    / sqrt((CAST(np AS DOUBLE) * CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |      * (CAST(np AS DOUBLE) * CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))), 6) AS memory_m
      |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_gehan_breslow" -> (statGehanBreslow _),
    "stat_rmst" -> (statRmst _),
    "stat_ramsey_reset" -> (statRamseyReset _),
    "time_burstiness_memory" -> (timeBurstinessMemory _),
  )

  val oracle: Map[String, String] = Map(
    "stat_gehan_breslow" -> statGehanBreslowSql,
    "stat_rmst" -> statRmstSql,
    "stat_ramsey_reset" -> statRamseyResetSql,
    "time_burstiness_memory" -> timeBurstinessMemorySql,
  )
}
