package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 98 (C796–C799): method-comparison + signal stability +
  * contingency hygiene — Passing–Bablok robust regression,
  * Bland–Altman limits of agreement, Allan variance, and Bergsma's
  * bias-corrected Cramér's V.
  *
  * Shared discipline: P–B runs entirely on the bounded 25-brand pair
  * frame with deterministic slope ranking; Bland–Altman differences
  * are exact cent integers; Allan cluster sums are exact integers with
  * one IEEE division per τ; the corrected V quantizes per-cell χ²
  * terms over the bounded contingency before summing.
  */
object Extras198 {

  /** The shared 50-size two-method price frame: x = catalog price
    * level (mean p_retailprice cents by part size), y = realized unit
    * price (Σ extendedprice / Σ quantity, cents) — two measurements of
    * the same size-level price (strongly positively related through
    * the shared parts), the classic method-comparison setup.
    */
  private def brandPrices(s: SparkSession, d: String): DataFrame = {
    val cat = part(s, d).groupBy(col("p_size").cast("string").as("brand"))
      .agg(sum(expr("CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("sx"), count(lit(1)).cast("long").as("nx"))
    val real = lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_size").cast("string").as("brand"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(l_quantity AS BIGINT)")).cast("long").as("qy"))
    cat.join(real, Seq("brand"))
      .select(col("brand"),
        expr("CAST(sx AS DOUBLE) / nx").as("x"),
        expr("CAST(sy AS DOUBLE) / qy").as("y"))
  }
  private val brandPricesSql: String =
    """cat AS (
      |  SELECT CAST(p_size AS VARCHAR) AS brand,
      |    CAST(sum(CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sx,
      |    CAST(count(*) AS BIGINT) AS nx
      |  FROM part GROUP BY 1),
      |realp AS (
      |  SELECT CAST(p.p_size AS VARCHAR) AS brand,
      |    CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qy
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1),
      |bp AS (
      |  SELECT c.brand, CAST(c.sx AS DOUBLE) / c.nx AS x, CAST(r.sy AS DOUBLE) / r.qy AS y
      |  FROM cat c JOIN realp r ON r.brand = c.brand)""".stripMargin

  /** C796 stat_passing_bablok — Passing–Bablok robust method-
    * comparison regression of realized vs catalog size-level price: all
    * pairwise slopes on the bounded 50-point frame (≤1225 pairs,
    * broadcast; S = −1 excluded per the original procedure), the
    * K-shifted median slope (K = #{S < −1}), intercept = median of
    * y − b·x. Outlier-proof where C-line stat_deming_regression
    * assumes Gaussian errors.
    */
  def statPassingBablok(s: SparkSession, d: String): DataFrame = {
    val bp = brandPrices(s, d)
    val other = graft.functions.BoundedDim.capped(
      bp.select(col("brand").as("brand2"), col("x").as("x2"), col("y").as("y2")),
      64, "Passing-Bablok brand frame (25 brands)")
    val slopes = bp.crossJoin(broadcast(other))
      .filter(expr("brand < brand2 AND x <> x2"))
      .select(expr("(y2 - y) / (x2 - x)").as("sl"), col("brand"), col("brand2"))
      .filter(expr("sl <> -1.0D"))
    val ranked = slopes.withColumn("r", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("sl").asc, col("brand").asc, col("brand2").asc)))
    val meta = slopes.agg(count(lit(1)).cast("long").as("nsl"),
      sum(expr("CASE WHEN sl < -1.0D THEN 1L ELSE 0L END")).cast("long").as("kofs"))
    // shifted median: odd N -> rank (N+1)/2 + K; even N -> mean of
    // ranks N/2 + K and N/2 + 1 + K
    val b = ranked.crossJoin(broadcast(meta))
      .filter(expr(
        """(nsl % 2 = 1 AND r = least(greatest((nsl + 1) div 2 + kofs, 1L), nsl))
          |OR (nsl % 2 = 0 AND (r = least(greatest(nsl div 2 + kofs, 1L), nsl)
          |  OR r = least(greatest(nsl div 2 + 1 + kofs, 1L), nsl)))""".stripMargin))
      .agg(avg(col("sl")).as("b"), max(col("nsl")).as("n_slopes"))
    val withB = bp.crossJoin(broadcast(b))
      .withColumn("resid", expr("y - b * x"))
      .withColumn("rr", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("resid").asc, col("brand").asc)))
    val nb = bp.agg(count(lit(1)).cast("long").as("nb"))
    withB.crossJoin(broadcast(nb))
      .filter(expr(
        """(nb % 2 = 1 AND rr = (nb + 1) div 2)
          |OR (nb % 2 = 0 AND (rr = nb div 2 OR rr = nb div 2 + 1))""".stripMargin))
      .agg(max(col("nb")).as("n_points"), max(col("n_slopes")).as("n_slopes"),
        max(col("b")).as("b"), avg(col("resid")).as("a"))
      .selectExpr("n_points", "n_slopes", "round(b, 6) AS slope", "round(a, 4) AS intercept_cents")
  }
  val statPassingBablokSql: String =
    s"""WITH $brandPricesSql,
      |slopes AS (
      |  SELECT (o.y - p.y) / (o.x - p.x) AS sl, p.brand AS brand, o.brand AS brand2
      |  FROM bp p, bp o
      |  WHERE p.brand < o.brand AND p.x <> o.x
      |    AND (o.y - p.y) / (o.x - p.x) <> -1.0),
      |ranked AS (
      |  SELECT sl, row_number() OVER (ORDER BY sl, brand, brand2) AS r FROM slopes),
      |meta AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nsl,
      |    CAST(sum(CASE WHEN sl < -1.0 THEN 1 ELSE 0 END) AS BIGINT) AS kofs
      |  FROM slopes),
      |b AS (
      |  SELECT avg(r.sl) AS b, max(m.nsl) AS n_slopes
      |  FROM ranked r, meta m
      |  WHERE (m.nsl % 2 = 1 AND r.r = least(greatest((m.nsl + 1) // 2 + m.kofs, 1), m.nsl))
      |     OR (m.nsl % 2 = 0 AND (r.r = least(greatest(m.nsl // 2 + m.kofs, 1), m.nsl)
      |       OR r.r = least(greatest(m.nsl // 2 + 1 + m.kofs, 1), m.nsl)))),
      |resid AS (
      |  SELECT p.brand, p.y - b.b * p.x AS resid, b.b, b.n_slopes FROM bp p, b),
      |rr AS (
      |  SELECT resid, b, n_slopes,
      |    row_number() OVER (ORDER BY resid, brand) AS rr FROM resid),
      |nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bp)
      |SELECT max(t.nb) AS n_points, max(r.n_slopes) AS n_slopes,
      |  round(max(r.b), 6) AS slope, round(avg(r.resid), 4) AS intercept_cents
      |FROM rr r, nb t
      |WHERE (t.nb % 2 = 1 AND r.rr = (t.nb + 1) // 2)
      |   OR (t.nb % 2 = 0 AND (r.rr = t.nb // 2 OR r.rr = t.nb // 2 + 1))""".stripMargin

  /** C797 stat_bland_altman — Bland–Altman agreement between the
    * order-header total and the undiscounted line-value sum per order:
    * d = Σ extendedprice − totalprice in EXACT cents, bias = d̄,
    * limits of agreement d̄ ± 1.96·σ_d from exact integer moments, and
    * the exact count inside the limits. THE clinical-lab agreement
    * plot, reduced to its sufficient statistics.
    */
  def statBlandAltman(s: SparkSession, d: String): DataFrame = {
    val diffs = lineitem(s, d)
      .groupBy(col("l_orderkey").as("okey"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("ysum"))
      .join(orders(s, d), col("okey") === col("o_orderkey"))
      .select(expr("ysum - CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("dd"))
    val m = diffs.agg(count(lit(1)).cast("long").as("n"),
      sum(col("dd")).cast("decimal(38,0)").as("sd"),
      sum(expr("CAST(dd AS DECIMAL(38,0)) * dd")).cast("decimal(38,0)").as("qd"))
      .selectExpr("n", "CAST(sd AS DOUBLE) / n AS mu",
        "sqrt((CAST(qd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / n) / (n - 1)) AS sig")
    diffs.crossJoin(broadcast(m))
      .agg(max(col("n")).as("n"), max(col("mu")).as("mu"), max(col("sig")).as("sig"),
        sum(expr("CASE WHEN abs(dd - mu) <= 1.96D * sig THEN 1L ELSE 0L END"))
          .cast("long").as("inside"))
      .selectExpr("n",
        "round(mu / 100, 4) AS bias_dollars",
        "round((mu - 1.96D * sig) / 100, 4) AS loa_low_dollars",
        "round((mu + 1.96D * sig) / 100, 4) AS loa_high_dollars",
        "round(CAST(inside AS DOUBLE) / n, 6) AS frac_within_loa")
  }
  val statBlandAltmanSql: String =
    """WITH diffs AS (
      |  SELECT CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT)
      |    - CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS dd
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  GROUP BY o.o_orderkey, o.o_totalprice),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(dd) AS DOUBLE) / count(*) AS mu,
      |    sqrt((CAST(sum(CAST(dd AS DECIMAL(38,0)) * dd) AS DOUBLE)
      |      - CAST(sum(dd) AS DOUBLE) * CAST(sum(dd) AS DOUBLE) / count(*)) / (count(*) - 1)) AS sig
      |  FROM diffs)
      |SELECT m.n,
      |  round(m.mu / 100, 4) AS bias_dollars,
      |  round((m.mu - 1.96 * m.sig) / 100, 4) AS loa_low_dollars,
      |  round((m.mu + 1.96 * m.sig) / 100, 4) AS loa_high_dollars,
      |  round(CAST(sum(CASE WHEN abs(d.dd - m.mu) <= 1.96 * m.sig THEN 1 ELSE 0 END) AS DOUBLE)
      |    / m.n, 6) AS frac_within_loa
      |FROM diffs d, m
      |GROUP BY m.n, m.mu, m.sig""".stripMargin

  /** C798 time_allan_variance — the Allan variance of the hourly
    * event-count signal at cluster sizes τ ∈ {1,2,4,8}:
    * AVAR(τ) = Σ(s_{k+1}−s_k)²/(2(M−1)τ²) over non-overlapping
    * cluster SUMS (exact integers; the τ² denominator clears the
    * cluster-mean division). White noise slopes −1 on the log-log
    * curve; drift flattens it — the clock-stability readout for event
    * pipelines. One row per τ, ordered.
    */
  def timeAllanVariance(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).cast("long").as("c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("hr")
    val idx = hourly.withColumn("t", row_number().over(w).cast("long"))
    val taus = Seq(1L, 2L, 4L, 8L)
    val exploded = idx.select(col("t"), col("c"),
      explode(array(taus.map(lit(_)): _*)).as("tau"))
      .withColumn("k", expr("(t - 1) div tau"))
    val clusters = exploded.groupBy("tau", "k")
      .agg(count(lit(1)).cast("long").as("m"), sum(col("c")).cast("long").as("sc"))
      .filter(col("m") === col("tau")) // complete clusters only
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy("tau").orderBy(col("k").asc)
    clusters
      .withColumn("nxt", lead(col("sc"), 1).over(wk))
      .filter(col("nxt").isNotNull)
      .groupBy("tau")
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(expr("CAST(nxt - sc AS DECIMAL(38,0)) * (nxt - sc)")).cast("decimal(38,0)").as("sq"))
      .selectExpr("CAST(tau AS BIGINT) AS tau", "n_pairs",
        "round(CAST(sq AS DOUBLE) / (2 * n_pairs) / tau / tau, 6) AS allan_var")
      .orderBy("tau")
  }
  val timeAllanVarianceSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1),
      |idx AS (
      |  SELECT CAST(row_number() OVER (ORDER BY hr) AS BIGINT) AS t, c FROM hourly),
      |expl AS (
      |  SELECT i.t, i.c, u.tau.tau AS tau, (i.t - 1) // u.tau.tau AS k
      |  FROM idx i, (SELECT unnest([{'tau': CAST(1 AS BIGINT)}, {'tau': CAST(2 AS BIGINT)},
      |    {'tau': CAST(4 AS BIGINT)}, {'tau': CAST(8 AS BIGINT)}]) AS tau) u),
      |clusters AS (
      |  SELECT tau, k, CAST(count(*) AS BIGINT) AS m, CAST(sum(c) AS BIGINT) AS sc
      |  FROM expl GROUP BY 1, 2),
      |complete AS (SELECT * FROM clusters WHERE m = tau),
      |pairs AS (
      |  SELECT tau, sc, lead(sc, 1) OVER (PARTITION BY tau ORDER BY k) AS nxt
      |  FROM complete)
      |SELECT CAST(tau AS BIGINT) AS tau, CAST(count(*) AS BIGINT) AS n_pairs,
      |  round(CAST(CAST(sum(CAST(nxt - sc AS DECIMAL(38,0)) * (nxt - sc)) AS DECIMAL(38,0)) AS DOUBLE)
      |    / (2 * count(*)) / tau / tau, 6) AS allan_var
      |FROM pairs WHERE nxt IS NOT NULL
      |GROUP BY tau ORDER BY tau""".stripMargin

  /** C799 stat_cramers_v_corrected — Bergsma's bias-corrected
    * Cramér's V on the lang×source table: φ̃² = max(0, φ² −
    * (r−1)(c−1)/(n−1)), corrected dimensions r̃ = r − (r−1)²/(n−1),
    * Ṽ = √(φ̃²/min(r̃−1, c̃−1)); per-cell χ² terms quantized ·10⁹
    * over the bounded table. Kills the spurious positive V an
    * independent-but-finite sample produces — the honest effect size
    * beside C-line stat_cramers_v.
    */
  def statCramersVCorrected(s: SparkSession, d: String): DataFrame = {
    val cells = documents(s, d).groupBy(col("lang").as("y"), col("source").as("x"))
      .agg(count(lit(1)).cast("long").as("m"))
    val margX = cells.groupBy("x").agg(sum(col("m")).cast("long").as("mx"))
    val margY = cells.groupBy("y").agg(sum(col("m")).cast("long").as("my"))
    val tot = cells.agg(sum(col("m")).cast("long").as("n"),
      countDistinct(col("x")).cast("long").as("cc"),
      countDistinct(col("y")).cast("long").as("rr"))
    val chi = cells.join(broadcast(margX), Seq("x")).join(broadcast(margY), Seq("y"))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("rr"), col("cc"),
        // (O - E)²/E with E = mx·my/n; quantized ·1e9 per cell
        expr(
          """CAST(floor((m - CAST(mx AS DOUBLE) * my / n) * (m - CAST(mx AS DOUBLE) * my / n)
            |/ (CAST(mx AS DOUBLE) * my / n) * 1e9 + 0.5) AS BIGINT)""".stripMargin).as("tq"))
      .groupBy("n", "rr", "cc").agg(sum(col("tq")).cast("long").as("chi_q"))
    chi.selectExpr("n", "rr AS n_rows", "cc AS n_cols",
        "CAST(chi_q AS DOUBLE) / 1e9 / n AS phi2",
        "greatest(0.0D, CAST(chi_q AS DOUBLE) / 1e9 / n - CAST(rr - 1 AS DOUBLE) * (cc - 1) / (n - 1)) AS phi2t",
        "rr - CAST(rr - 1 AS DOUBLE) * (rr - 1) / (n - 1) AS rt",
        "cc - CAST(cc - 1 AS DOUBLE) * (cc - 1) / (n - 1) AS ct")
      .selectExpr("n", "n_rows", "n_cols",
        "round(sqrt(phi2 / least(n_rows - 1, n_cols - 1)), 6) AS cramers_v",
        "round(sqrt(phi2t / least(rt - 1, ct - 1)), 6) AS cramers_v_corrected")
  }
  val statCramersVCorrectedSql: String =
    """WITH cells AS (
      |  SELECT lang AS y, source AS x, CAST(count(*) AS BIGINT) AS m
      |  FROM documents GROUP BY 1, 2),
      |mx AS (SELECT x, CAST(sum(m) AS BIGINT) AS mx FROM cells GROUP BY 1),
      |my AS (SELECT y, CAST(sum(m) AS BIGINT) AS my FROM cells GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(m) AS BIGINT) AS n,
      |    CAST(count(DISTINCT x) AS BIGINT) AS cc,
      |    CAST(count(DISTINCT y) AS BIGINT) AS rr
      |  FROM cells),
      |chi AS (
      |  SELECT t.n, t.rr, t.cc,
      |    CAST(sum(CAST(floor((c.m - CAST(x.mx AS DOUBLE) * y.my / t.n)
      |      * (c.m - CAST(x.mx AS DOUBLE) * y.my / t.n)
      |      / (CAST(x.mx AS DOUBLE) * y.my / t.n) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS chi_q
      |  FROM cells c
      |  JOIN mx x ON x.x = c.x
      |  JOIN my y ON y.y = c.y, tot t
      |  GROUP BY 1, 2, 3),
      |v AS (
      |  SELECT n, rr, cc,
      |    CAST(chi_q AS DOUBLE) / 1e9 / n AS phi2,
      |    greatest(0.0, CAST(chi_q AS DOUBLE) / 1e9 / n - CAST(rr - 1 AS DOUBLE) * (cc - 1) / (n - 1)) AS phi2t,
      |    rr - CAST(rr - 1 AS DOUBLE) * (rr - 1) / (n - 1) AS rt,
      |    cc - CAST(cc - 1 AS DOUBLE) * (cc - 1) / (n - 1) AS ct
      |  FROM chi)
      |SELECT n, rr AS n_rows, cc AS n_cols,
      |  round(sqrt(phi2 / least(n_rows - 1, n_cols - 1)), 6) AS cramers_v,
      |  round(sqrt(phi2t / least(rt - 1, ct - 1)), 6) AS cramers_v_corrected
      |FROM v""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_passing_bablok" -> (statPassingBablok _),
    "stat_bland_altman" -> (statBlandAltman _),
    "time_allan_variance" -> (timeAllanVariance _),
    "stat_cramers_v_corrected" -> (statCramersVCorrected _),
  )

  val oracle: Map[String, String] = Map(
    "stat_passing_bablok" -> statPassingBablokSql,
    "stat_bland_altman" -> statBlandAltmanSql,
    "time_allan_variance" -> timeAllanVarianceSql,
    "stat_cramers_v_corrected" -> statCramersVCorrectedSql,
  )
}
