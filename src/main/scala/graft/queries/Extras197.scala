package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 97 (C792–C795): spectral texture + queueing audit + robust
  * two-sample + distribution-free interval — spectral flatness of the
  * hourly signal, a Little's-law WIP audit, Yuen's trimmed-mean t, and
  * the exact binomial confidence interval for the median.
  *
  * Shared discipline: DFT terms micro-quantized against the
  * denominator-cleared exact series (the C638 idiom); the WIP sweep
  * line is pure integer day arithmetic; trimmed/winsorized moments are
  * exact histogram-block algebra; the median CI's binomial tail uses
  * the exact ln-factorial spine with ·10¹²-quantized terms and an
  * integer threshold rule.
  */
object Extras197 {

  /** C792 time_spectral_flatness — Wiener entropy of the hourly
    * event-count periodogram over candidate periods 2..24: flatness =
    * geometric mean / arithmetic mean of the 23 energies (1 = white,
    * →0 = tonal), beside the peak-period share. The scalar
    * "how noisy is this signal" complement to C638's entropy (a
    * different functional of the same spectrum family, on the hourly
    * not daily series).
    */
  def timeSpectralFlatness(s: SparkSession, d: String): DataFrame = {
    val periods = 2 to 24
    val hourly = events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).cast("long").as("c"))
    val tot = hourly.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("sc"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("hr")
    val x = hourly
      .withColumn("t", row_number().over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("x", expr("CAST(n * c - sc AS DECIMAL(38,0))"))
    val terms = x.select(col("t"), col("x"),
      explode(array(periods.map(p => lit(p.toLong)): _*)).as("p"))
      .withColumn("cq", expr("CAST(floor(cos(2 * pi() * t / p) * 1e6 + 0.5) AS BIGINT)"))
      .withColumn("sq", expr("CAST(floor(sin(2 * pi() * t / p) * 1e6 + 0.5) AS BIGINT)"))
    val energies = terms.groupBy("p")
      .agg(sum(expr("x * cq")).as("a"), sum(expr("x * sq")).as("b"))
      .selectExpr("p",
        "CAST(a AS DOUBLE) * CAST(a AS DOUBLE) + CAST(b AS DOUBLE) * CAST(b AS DOUBLE) AS e")
    val pivCols = periods.map(p => max(expr(s"CASE WHEN p = $p THEN e END")).as(s"e$p"))
    val piv = energies.agg(pivCols.head, pivCols.tail: _*)
    val k = periods.length
    val totalExpr = periods.map(p => s"e$p").mkString(" + ")
    val lnExpr = periods.map(p => s"ln(e$p)").mkString(" + ")
    val anyZero = periods.map(p => s"e$p <= 0").mkString(" OR ")
    piv.selectExpr(periods.map(p => s"e$p") :+ s"($totalExpr) AS tot": _*)
      .selectExpr(
        s"""CASE WHEN $anyZero THEN 0.0D
          |ELSE round(exp(($lnExpr) / $k) / (tot / $k), 6) END AS spectral_flatness""".stripMargin,
        s"round(greatest(${periods.map(p => s"e$p").mkString(", ")}) / tot, 6) AS peak_share")
  }
  val timeSpectralFlatnessSql: String = {
    val periods = 2 to 24
    val structs = periods.map(p => s"{'p': CAST($p AS BIGINT)}").mkString(", ")
    val pivCols = periods.map(p =>
      s"max(CASE WHEN p = $p THEN e END) AS e$p").mkString(",\n      |    ")
    val k = periods.length
    val totalExpr = periods.map(p => s"e$p").mkString(" + ")
    val lnExpr = periods.map(p => s"ln(e$p)").mkString(" + ")
    val anyZero = periods.map(p => s"e$p <= 0").mkString(" OR ")
    s"""WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1),
      |tot AS (
      |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n, CAST(sum(c) AS DECIMAL(38,0)) AS sc
      |  FROM hourly),
      |x AS (
      |  SELECT CAST(row_number() OVER (ORDER BY hr) AS BIGINT) AS t,
      |    CAST(n * c - sc AS DECIMAL(38,0)) AS x
      |  FROM hourly, tot),
      |terms AS (
      |  SELECT x.t, x.x, u.p.p AS p,
      |    CAST(floor(cos(2 * pi() * x.t / u.p.p) * 1e6 + 0.5) AS BIGINT) AS cq,
      |    CAST(floor(sin(2 * pi() * x.t / u.p.p) * 1e6 + 0.5) AS BIGINT) AS sq
      |  FROM x, (SELECT unnest([$structs]) AS p) u),
      |energies AS (
      |  SELECT p,
      |    CAST(sum(x * cq) AS DOUBLE) * CAST(sum(x * cq) AS DOUBLE)
      |      + CAST(sum(x * sq) AS DOUBLE) * CAST(sum(x * sq) AS DOUBLE) AS e
      |  FROM terms GROUP BY 1),
      |piv AS (SELECT $pivCols FROM energies),
      |wt AS (SELECT *, ($totalExpr) AS tot FROM piv)
      |SELECT CASE WHEN $anyZero THEN 0.0
      |  ELSE round(exp(($lnExpr) / $k) / (tot / $k), 6) END AS spectral_flatness,
      |  round(greatest(${periods.map(p => s"e$p").mkString(", ")}) / tot, 6) AS peak_share
      |FROM wt""".stripMargin
  }

  /** C793 analytics_little_law_audit — Little's law L = λW measured
    * two INDEPENDENT ways on the order-fulfillment queue (arrival =
    * order day, departure = last ship day): W and λ from per-order
    * integer day spans; L from an exact ±1 sweep line time-weighted
    * over the full calendar range (gaps weighted by integer day
    * deltas). ratio = L/(λW) ≈ 1 is the data-quality audit — a broken
    * event extract shows up as ratio drift. All integer day arithmetic
    * (epoch-day numbers), three IEEE divisions at the end.
    */
  def analyticsLittleLawAudit(s: SparkSession, d: String): DataFrame = {
    val spans = lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey").as("okey"))
      .agg(expr("unix_micros(CAST(min(o_orderdate) AS TIMESTAMP)) div 86400000000").as("a"),
        expr("unix_micros(CAST(max(l_shipdate) AS TIMESTAMP)) div 86400000000").as("e"))
      .select(col("okey"), col("a"), expr("greatest(e, a)").as("e"))
    val wstats = spans.agg(count(lit(1)).cast("long").as("n_orders"),
      sum(expr("e - a + 1")).cast("decimal(38,0)").as("sw"),
      min(col("a")).as("amin"), max(col("e")).as("emax"))
    // sweep line: +1 at a, -1 at e+1; WIP between change-days is constant
    val deltas = spans.select(col("a").as("day"), lit(1L).as("dlt"))
      .unionAll(spans.select(expr("e + 1").as("day"), lit(-1L).as("dlt")))
      .groupBy("day").agg(sum(col("dlt")).cast("long").as("dlt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day").asc)
    val wip = deltas
      .withColumn("wipv", sum(col("dlt")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)).cast("long"))
      .withColumn("nxt", lead(col("day"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .agg(sum(expr("CAST(wipv AS DECIMAL(38,0)) * (nxt - day)")).cast("decimal(38,0)").as("area"))
    wip.crossJoin(broadcast(wstats))
      .selectExpr("n_orders",
        "round(CAST(sw AS DOUBLE) / n_orders, 6) AS w_days",
        "round(CAST(n_orders AS DOUBLE) / (emax - amin + 1), 6) AS lambda_per_day",
        "round(CAST(area AS DOUBLE) / (emax - amin + 1), 6) AS l_avg_wip",
        """round((CAST(area AS DOUBLE) / (emax - amin + 1))
          |/ ((CAST(n_orders AS DOUBLE) / (emax - amin + 1)) * (CAST(sw AS DOUBLE) / n_orders)), 6) AS little_ratio""".stripMargin)
  }
  val analyticsLittleLawAuditSql: String =
    """WITH spans0 AS (
      |  SELECT o.o_orderkey AS okey,
      |    epoch_us(CAST(min(o.o_orderdate) AS TIMESTAMP)) // 86400000000 AS a,
      |    epoch_us(CAST(max(l.l_shipdate) AS TIMESTAMP)) // 86400000000 AS e
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1),
      |spans AS (SELECT okey, a, greatest(e, a) AS e FROM spans0),
      |wstats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(e - a + 1) AS DECIMAL(38,0)) AS sw,
      |    min(a) AS amin, max(e) AS emax
      |  FROM spans),
      |deltas AS (
      |  SELECT day, CAST(sum(dlt) AS BIGINT) AS dlt FROM (
      |    SELECT a AS day, 1 AS dlt FROM spans
      |    UNION ALL SELECT e + 1, -1 FROM spans)
      |  GROUP BY 1),
      |wip AS (
      |  SELECT CAST(sum(CAST(wipv AS DECIMAL(38,0)) * (nxt - day)) AS DECIMAL(38,0)) AS area
      |  FROM (
      |    SELECT day,
      |      CAST(sum(dlt) OVER (ORDER BY day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS wipv,
      |      lead(day, 1) OVER (ORDER BY day) AS nxt
      |    FROM deltas)
      |  WHERE nxt IS NOT NULL)
      |SELECT n_orders,
      |  round(CAST(sw AS DOUBLE) / n_orders, 6) AS w_days,
      |  round(CAST(n_orders AS DOUBLE) / (emax - amin + 1), 6) AS lambda_per_day,
      |  round(CAST(area AS DOUBLE) / (emax - amin + 1), 6) AS l_avg_wip,
      |  round((CAST(area AS DOUBLE) / (emax - amin + 1))
      |    / ((CAST(n_orders AS DOUBLE) / (emax - amin + 1)) * (CAST(sw AS DOUBLE) / n_orders)), 6) AS little_ratio
      |FROM wip, wstats""".stripMargin

  /** C794 stat_yuen_trimmed_t — Yuen's 10%-trimmed-mean two-sample t
    * (A vs R quantities): per-group g = ⌊0.1n⌋, trimmed sums and
    * winsorized squared sums as EXACT histogram-block overlap algebra
    * (each value block contributes its rank-range intersection with
    * (g, n−g], tails clamp to the g+1-th / (n−g)-th order statistics),
    * t = (m̄₁−m̄₂)/√(d₁+d₂) with d = s²w(n−1)/(h(h−1)). The robust
    * location test that survives the heavy tails C783 just measured.
    */
  def statYuenTrimmedT(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy(expr("CAST(l_quantity AS INT)").as("qv"))
      .agg(sum(expr("CASE WHEN l_returnflag = 'A' THEN 1L ELSE 0L END")).cast("long").as("l1"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("l2"))
    val wref = org.apache.spark.sql.expressions.Window.orderBy(col("qv").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val blocks = hist
      .withColumn("c1", coalesce(sum(col("l1")).over(wref), lit(0L)).cast("long"))
      .withColumn("c2", coalesce(sum(col("l2")).over(wref), lit(0L)).cast("long"))
    val tot = hist.agg(sum(col("l1")).cast("long").as("n1"), sum(col("l2")).cast("long").as("n2"))
    // per group i: g = floor(0.1 n); keep ranks (g, n-g]; winsorize tails
    def groupExprs(li: String, ci: String, ni: String, pre: String) = Seq(
      // trimmed count of this block = overlap of [c+1, c+l] with [g+1, n-g]
      expr(s"greatest(0L, least($ci + $li, $ni - ($ni div 10)) - greatest($ci, $ni div 10))").as(s"${pre}tc"),
      // winsorized value: low tail -> x_(g+1), high tail -> x_(n-g)
      expr(s"CASE WHEN $ci < ($ni div 10) + 1 AND $ci + $li >= ($ni div 10) + 1 THEN qv END").as(s"${pre}lo"),
      expr(s"CASE WHEN $ci < $ni - ($ni div 10) AND $ci + $li >= $ni - ($ni div 10) THEN qv END").as(s"${pre}hi"),
      expr(s"greatest(0L, least($ci + $li, $ni div 10) - $ci)").as(s"${pre}nlo"),
      expr(s"greatest(0L, $ci + $li - greatest($ci, $ni - ($ni div 10)))").as(s"${pre}nhi"))
    val marked = blocks.crossJoin(broadcast(tot))
      .select((col("qv") +: col("l1") +: col("l2") +: col("n1") +: col("n2") +:
        (groupExprs("l1", "c1", "n1", "a_") ++ groupExprs("l2", "c2", "n2", "b_"))): _*)
    val agg0 = marked.groupBy("n1", "n2").agg(
      sum(expr("CAST(qv AS DECIMAL(38,0)) * a_tc")).cast("decimal(38,0)").as("ts1"),
      sum(expr("CAST(qv AS DECIMAL(38,0)) * qv * a_tc")).cast("decimal(38,0)").as("tq1"),
      sum(expr("CAST(qv AS DECIMAL(38,0)) * b_tc")).cast("decimal(38,0)").as("ts2"),
      sum(expr("CAST(qv AS DECIMAL(38,0)) * qv * b_tc")).cast("decimal(38,0)").as("tq2"),
      max(col("a_lo")).as("alo"), max(col("a_hi")).as("ahi"),
      max(col("b_lo")).as("blo"), max(col("b_hi")).as("bhi"))
    agg0.selectExpr("n1", "n2",
        "n1 div 10 AS g1", "n2 div 10 AS g2",
        // winsorized sums add the clamped tails
        "CAST(ts1 AS DOUBLE) + CAST(n1 div 10 AS DOUBLE) * (alo + ahi) AS ws1",
        "CAST(tq1 AS DOUBLE) + CAST(n1 div 10 AS DOUBLE) * (CAST(alo AS DOUBLE) * alo + CAST(ahi AS DOUBLE) * ahi) AS wq1",
        "CAST(ts2 AS DOUBLE) + CAST(n2 div 10 AS DOUBLE) * (blo + bhi) AS ws2",
        "CAST(tq2 AS DOUBLE) + CAST(n2 div 10 AS DOUBLE) * (CAST(blo AS DOUBLE) * blo + CAST(bhi AS DOUBLE) * bhi) AS wq2",
        "CAST(ts1 AS DOUBLE) AS ts1", "CAST(ts2 AS DOUBLE) AS ts2")
      .selectExpr("n1", "n2",
        "ts1 / (n1 - 2 * g1) AS m1", "ts2 / (n2 - 2 * g2) AS m2",
        "(wq1 - ws1 * ws1 / n1) / (n1 - 1) AS sw1",
        "(wq2 - ws2 * ws2 / n2) / (n2 - 1) AS sw2",
        "CAST(n1 - 2 * g1 AS DOUBLE) AS h1", "CAST(n2 - 2 * g2 AS DOUBLE) AS h2",
        "CAST(n1 AS DOUBLE) AS nd1", "CAST(n2 AS DOUBLE) AS nd2")
      .selectExpr("CAST(nd1 AS BIGINT) AS n1", "CAST(nd2 AS BIGINT) AS n2",
        "round(m1, 6) AS trimmed_mean_a", "round(m2, 6) AS trimmed_mean_r",
        """round((m1 - m2) / sqrt(sw1 * (nd1 - 1) / (h1 * (h1 - 1))
          |+ sw2 * (nd2 - 1) / (h2 * (h2 - 1))), 6) AS t_yuen""".stripMargin)
  }
  val statYuenTrimmedTSql: String = {
    def ge(li: String, ci: String, ni: String, pre: String) =
      s"""greatest(0, least($ci + $li, $ni - ($ni // 10)) - greatest($ci, $ni // 10)) AS ${pre}tc,
        |    CASE WHEN $ci < ($ni // 10) + 1 AND $ci + $li >= ($ni // 10) + 1 THEN qv END AS ${pre}lo,
        |    CASE WHEN $ci < $ni - ($ni // 10) AND $ci + $li >= $ni - ($ni // 10) THEN qv END AS ${pre}hi""".stripMargin
    s"""WITH hist AS (
      |  SELECT CAST(l_quantity AS INT) AS qv,
      |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS l1,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS l2
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
      |blocks AS (
      |  SELECT qv, l1, l2,
      |    COALESCE(sum(l1) OVER (ORDER BY qv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c1,
      |    COALESCE(sum(l2) OVER (ORDER BY qv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c2
      |  FROM hist),
      |tot AS (SELECT CAST(sum(l1) AS BIGINT) AS n1, CAST(sum(l2) AS BIGINT) AS n2 FROM hist),
      |marked AS (
      |  SELECT b.qv, t.n1, t.n2,
      |    ${ge("b.l1", "b.c1", "t.n1", "a_")},
      |    ${ge("b.l2", "b.c2", "t.n2", "b_")}
      |  FROM blocks b, tot t),
      |ag AS (
      |  SELECT n1, n2,
      |    CAST(sum(CAST(qv AS DECIMAL(38,0)) * a_tc) AS DECIMAL(38,0)) AS ts1,
      |    CAST(sum(CAST(qv AS DECIMAL(38,0)) * qv * a_tc) AS DECIMAL(38,0)) AS tq1,
      |    CAST(sum(CAST(qv AS DECIMAL(38,0)) * b_tc) AS DECIMAL(38,0)) AS ts2,
      |    CAST(sum(CAST(qv AS DECIMAL(38,0)) * qv * b_tc) AS DECIMAL(38,0)) AS tq2,
      |    max(a_lo) AS alo, max(a_hi) AS ahi, max(b_lo) AS blo, max(b_hi) AS bhi
      |  FROM marked GROUP BY 1, 2),
      |wz AS (
      |  SELECT n1, n2, n1 // 10 AS g1, n2 // 10 AS g2,
      |    CAST(ts1 AS DOUBLE) + CAST(n1 // 10 AS DOUBLE) * (alo + ahi) AS ws1,
      |    CAST(tq1 AS DOUBLE) + CAST(n1 // 10 AS DOUBLE) * (CAST(alo AS DOUBLE) * alo + CAST(ahi AS DOUBLE) * ahi) AS wq1,
      |    CAST(ts2 AS DOUBLE) + CAST(n2 // 10 AS DOUBLE) * (blo + bhi) AS ws2,
      |    CAST(tq2 AS DOUBLE) + CAST(n2 // 10 AS DOUBLE) * (CAST(blo AS DOUBLE) * blo + CAST(bhi AS DOUBLE) * bhi) AS wq2,
      |    CAST(ts1 AS DOUBLE) AS td1, CAST(ts2 AS DOUBLE) AS td2
      |  FROM ag),
      |fin AS (
      |  SELECT n1, n2,
      |    td1 / (n1 - 2 * g1) AS m1, td2 / (n2 - 2 * g2) AS m2,
      |    (wq1 - ws1 * ws1 / n1) / (n1 - 1) AS sw1,
      |    (wq2 - ws2 * ws2 / n2) / (n2 - 1) AS sw2,
      |    CAST(n1 - 2 * g1 AS DOUBLE) AS h1, CAST(n2 - 2 * g2 AS DOUBLE) AS h2
      |  FROM wz)
      |SELECT n1, n2,
      |  round(m1, 6) AS trimmed_mean_a, round(m2, 6) AS trimmed_mean_r,
      |  round((m1 - m2) / sqrt(sw1 * (n1 - 1) / (h1 * (h1 - 1))
      |    + sw2 * (n2 - 1) / (h2 * (h2 - 1))), 6) AS t_yuen
      |FROM fin""".stripMargin
  }

  /** C795 stat_median_ci_exact — the distribution-free exact 95% CI
    * for the median of order totals via binomial order statistics:
    * k* = max{k : P(Bin(n,½) < k) ≤ 0.025} from the exact
    * ln-factorial spine (·10¹²-quantized tail terms, integer
    * threshold), CI = (x₍k₎, x₍n+1−k₎) via the two-pass global rank.
    * Valid for ANY distribution — no normality, no bootstrap.
    */
  def statMedianCiExact(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"),
        col("o_orderkey").as("okey"))
    val tot = base.agg(count(lit(1)).cast("long").as("n"))
    // spine generated in ≤64k-row distributed chunks (ChunkedRange),
    // never one n-element array in a single task
    val lf0 = graft.functions.ChunkedRange
      .explodeRange(tot, lit(0L), col("n"), "i")
      .withColumn("lnq", expr(
        "CASE WHEN i < 2 THEN 0L ELSE CAST(floor(ln(CAST(i AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) END"))
    val lfc = graft.plans.GlobalRank
      .withExclusivePrefixSum(lf0, "p", col("lnq"), Seq(col("i").asc))
      .select(col("n"), col("i"), (col("p") + col("lnq")).as("lf"))
    val lfn = lfc.filter(expr("i = n")).select(col("lf").as("lfn")).limit(1)
    // melt: row i contributes lf(i) to target j = i AND to j = n - i, so
    // the per-j sum is exactly lf(j) + lf(n-j) (the i = n/2 row lands
    // twice on its own j, which is the correct doubled term)
    val melted = lfc.crossJoin(broadcast(lfn))
      .select(col("lfn"), col("n").as("nn"),
        explode(array(struct(col("i").as("j"), col("lf").as("lfi")),
          struct(expr("n - i").as("j"), col("lf").as("lfi")))).as("e"))
    val binom = melted
      .groupBy(expr("e.j").as("j"))
      .agg(max(col("lfn")).as("lfn"), max(col("nn")).as("nn"),
        sum(expr("e.lfi")).cast("long").as("lfs"))
      .select(col("j"), col("nn"),
        expr(
          """CAST(floor(exp((CAST(lfn AS DOUBLE) - lfs) / 1e6
            |- nn * ln(CAST(2 AS DOUBLE))) * 1e12 + 0.5) AS BIGINT)""".stripMargin).as("pq"))
    // the binomial-tail cum runs over the O(n)-key j frame — route it
    // onto the range-partitioned two-pass prefix sum (exactly like the
    // ln-factorial spine above), never a single-task global window
    val kstar = graft.plans.GlobalRank
      .withExclusivePrefixSum(binom, "cum", col("pq"), Seq(col("j").asc))
      .filter(expr("cum <= CAST(0.025 * 1e12 AS BIGINT)"))
      .agg(max(col("j")).cast("long").as("k"), max(col("nn")).as("n"))
    val ranked = graft.plans.GlobalRank
      .withExclusivePrefixSum(base.withColumn("one", lit(1L)), "i0", col("one"),
        Seq(col("cv").asc, col("okey").asc))
      .withColumn("r", expr("i0 + 1"))
    ranked.crossJoin(broadcast(kstar))
      .filter(expr("r = k OR r = n + 1 - k"))
      .agg(max(col("n")).as("n"), max(col("k")).as("k_order_stat"),
        min(expr("CAST(cv AS DOUBLE) / 100")).as("lo"),
        max(expr("CAST(cv AS DOUBLE) / 100")).as("hi"))
      .selectExpr("n", "k_order_stat",
        "round(lo, 2) AS ci_low", "round(hi, 2) AS ci_high")
  }
  val statMedianCiExactSql: String =
    """WITH base AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv,
      |    o_orderkey AS okey
      |  FROM orders),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
      |idx AS (
      |  SELECT CAST(unnest(generate_series(0, (SELECT n FROM tot))) AS BIGINT) AS i),
      |lf0 AS (
      |  SELECT i, CASE WHEN i < 2 THEN CAST(0 AS BIGINT)
      |    ELSE CAST(floor(ln(CAST(i AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) END AS lnq
      |  FROM idx),
      |lfc AS (
      |  SELECT i, CAST(sum(lnq) OVER (ORDER BY i
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS lf
      |  FROM lf0),
      |lfn AS (SELECT lf AS lfn FROM lfc, tot WHERE i = n LIMIT 1),
      |mel AS (
      |  SELECT i AS j, lf AS lfi FROM lfc
      |  UNION ALL SELECT (SELECT n FROM tot) - i, lf FROM lfc),
      |binom AS (
      |  SELECT j,
      |    CAST(floor(exp(((SELECT lfn FROM lfn) - CAST(sum(lfi) AS BIGINT)) / 1e6
      |      - (SELECT n FROM tot) * ln(CAST(2 AS DOUBLE))) * 1e12 + 0.5) AS BIGINT) AS pq
      |  FROM mel WHERE j >= 0 AND j <= (SELECT n FROM tot)
      |  GROUP BY j),
      |kstar AS (
      |  SELECT CAST(max(j) AS BIGINT) AS k FROM (
      |    SELECT j, COALESCE(sum(pq) OVER (ORDER BY j
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS cum
      |    FROM binom)
      |  WHERE cum <= CAST(0.025 * 1e12 AS BIGINT)),
      |ranked AS (
      |  SELECT cv, row_number() OVER (ORDER BY cv, okey) AS r FROM base)
      |SELECT t.n, k.k AS k_order_stat,
      |  round(min(CAST(r.cv AS DOUBLE) / 100), 2) AS ci_low,
      |  round(max(CAST(r.cv AS DOUBLE) / 100), 2) AS ci_high
      |FROM ranked r, kstar k, tot t
      |WHERE r.r = k.k OR r.r = t.n + 1 - k.k
      |GROUP BY t.n, k.k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_spectral_flatness" -> (timeSpectralFlatness _),
    "analytics_little_law_audit" -> (analyticsLittleLawAudit _),
    "stat_yuen_trimmed_t" -> (statYuenTrimmedT _),
    "stat_median_ci_exact" -> (statMedianCiExact _),
  )

  val oracle: Map[String, String] = Map(
    "time_spectral_flatness" -> timeSpectralFlatnessSql,
    "analytics_little_law_audit" -> analyticsLittleLawAuditSql,
    "stat_yuen_trimmed_t" -> statYuenTrimmedTSql,
    "stat_median_ci_exact" -> statMedianCiExactSql,
  )
}
