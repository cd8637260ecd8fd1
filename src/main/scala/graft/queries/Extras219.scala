package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 119 (C880–C883): the regression battery — closed-form ridge on
  * standardized moments, logistic regression by two deterministic
  * Newton steps on a bounded bin dictionary, the geometric-adstock
  * decay grid, and precision-weighted WLS whose weighted moments are
  * ALL exact integers.
  *
  * Shared discipline: corpus passes emit exact integer /
  * ·10⁹-quantized moments once; every solve is bounded algebra (2×2
  * matrices, ≤50-bin dictionaries, ≤84-month series) replayed by the
  * oracle with identical literals.
  */
object Extras219 {

  /** C880 stat_ridge_regression — ridge on two standardized predictors
    * (account balance, order count) against customer revenue, solved in
    * closed form from the correlation matrix: per-row z-products are
    * ·10⁹-quantized so the 5 correlation moments are exact sums; for
    * each λ ∈ {0, 0.1, 1} solve [[1+λ, r₁₂],[r₁₂, 1+λ]]β = [r₁y, r₂y]
    * by the 2×2 inverse. The shrinkage path in ONE corpus pass — the
    * λ=0 row doubles as plain standardized OLS.
    */
  def statRidgeRegression(s: SparkSession, d: String): DataFrame = {
    val per = customer(s, d).select(col("c_custkey").as("ck"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)").as("x1"))
      .join(orders(s, d).groupBy(col("o_custkey").as("ck"))
        .agg(count(lit(1)).cast("long").as("x2"),
          sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .cast("long").as("y")), Seq("ck"), "left")
      .select(col("x1"), coalesce(col("x2"), lit(0L)).as("x2"),
        coalesce(col("y"), lit(0L)).as("y"))
    val m1 = per.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x1")).cast("decimal(38,0)").as("sx1"),
      sum(expr("CAST(x1 AS DECIMAL(38,0)) * x1")).cast("decimal(38,0)").as("qx1"),
      sum(col("x2")).cast("decimal(38,0)").as("sx2"),
      sum(expr("CAST(x2 AS DECIMAL(38,0)) * x2")).cast("decimal(38,0)").as("qx2"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("qy"))
      .selectExpr("n",
        "CAST(sx1 AS DOUBLE) / n AS m1", "CAST(sx2 AS DOUBLE) / n AS m2",
        "CAST(sy AS DOUBLE) / n AS my",
        "sqrt(CAST(qx1 AS DOUBLE) / n - (CAST(sx1 AS DOUBLE) / n) * (CAST(sx1 AS DOUBLE) / n)) AS d1",
        "sqrt(CAST(qx2 AS DOUBLE) / n - (CAST(sx2 AS DOUBLE) / n) * (CAST(sx2 AS DOUBLE) / n)) AS d2",
        "sqrt(CAST(qy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) AS dy")
    val corr = per.crossJoin(broadcast(m1))
      .select(col("n"),
        expr("CAST(floor(((x1 - m1) / d1) * ((x2 - m2) / d2) * 1e9 + 0.5) AS BIGINT)").as("p12"),
        expr("CAST(floor(((x1 - m1) / d1) * ((y - my) / dy) * 1e9 + 0.5) AS BIGINT)").as("p1y"),
        expr("CAST(floor(((x2 - m2) / d2) * ((y - my) / dy) * 1e9 + 0.5) AS BIGINT)").as("p2y"))
      .groupBy("n")
      .agg(sum(col("p12")).cast("decimal(38,0)").as("s12"),
        sum(col("p1y")).cast("decimal(38,0)").as("s1y"),
        sum(col("p2y")).cast("decimal(38,0)").as("s2y"))
      .selectExpr("n",
        "CAST(s12 AS DOUBLE) / 1e9 / n AS r12",
        "CAST(s1y AS DOUBLE) / 1e9 / n AS r1y",
        "CAST(s2y AS DOUBLE) / 1e9 / n AS r2y")
    corr.select(col("n"), col("r12"), col("r1y"), col("r2y"),
        explode(array(lit(0.0d), lit(0.1d), lit(1.0d))).as("lam"))
      .selectExpr("n", "lam", "round(r12, 6) AS r12",
        """round(((1 + lam) * r1y - r12 * r2y)
          |/ ((1 + lam) * (1 + lam) - r12 * r12), 6) AS beta1""".stripMargin,
        """round(((1 + lam) * r2y - r12 * r1y)
          |/ ((1 + lam) * (1 + lam) - r12 * r12), 6) AS beta2""".stripMargin)
      .orderBy("lam")
  }
  val statRidgeRegressionSql: String =
    """WITH per AS (
      |  SELECT CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS x1,
      |    coalesce(o.x2, 0) AS x2, coalesce(o.y, 0) AS y
      |  FROM customer LEFT JOIN (
      |    SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS x2,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS y
      |    FROM orders GROUP BY 1) o ON customer.c_custkey = o.ck),
      |m1 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(CAST(sum(x1) AS HUGEINT) AS DOUBLE) / count(*) AS m1,
      |    CAST(CAST(sum(x2) AS HUGEINT) AS DOUBLE) / count(*) AS m2,
      |    CAST(CAST(sum(y) AS HUGEINT) AS DOUBLE) / count(*) AS my,
      |    sqrt(CAST(CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS DOUBLE) / count(*)
      |      - (CAST(CAST(sum(x1) AS HUGEINT) AS DOUBLE) / count(*))
      |        * (CAST(CAST(sum(x1) AS HUGEINT) AS DOUBLE) / count(*))) AS d1,
      |    sqrt(CAST(CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS DOUBLE) / count(*)
      |      - (CAST(CAST(sum(x2) AS HUGEINT) AS DOUBLE) / count(*))
      |        * (CAST(CAST(sum(x2) AS HUGEINT) AS DOUBLE) / count(*))) AS d2,
      |    sqrt(CAST(CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS DOUBLE) / count(*)
      |      - (CAST(CAST(sum(y) AS HUGEINT) AS DOUBLE) / count(*))
      |        * (CAST(CAST(sum(y) AS HUGEINT) AS DOUBLE) / count(*))) AS dy
      |  FROM per),
      |corr AS (
      |  SELECT m.n,
      |    CAST(CAST(sum(CAST(floor(((p.x1 - m.m1) / m.d1) * ((p.x2 - m.m2) / m.d2)
      |      * 1e9 + 0.5) AS HUGEINT)) AS HUGEINT) AS DOUBLE) / 1e9 / m.n AS r12,
      |    CAST(CAST(sum(CAST(floor(((p.x1 - m.m1) / m.d1) * ((p.y - m.my) / m.dy)
      |      * 1e9 + 0.5) AS HUGEINT)) AS HUGEINT) AS DOUBLE) / 1e9 / m.n AS r1y,
      |    CAST(CAST(sum(CAST(floor(((p.x2 - m.m2) / m.d2) * ((p.y - m.my) / m.dy)
      |      * 1e9 + 0.5) AS HUGEINT)) AS HUGEINT) AS DOUBLE) / 1e9 / m.n AS r2y
      |  FROM per p, m1 m GROUP BY m.n),
      |grid AS (SELECT unnest([CAST(0 AS DOUBLE), 0.1, 1.0]) AS lam)
      |SELECT c.n, g.lam, round(c.r12, 6) AS r12,
      |  round(((1 + g.lam) * c.r1y - c.r12 * c.r2y)
      |    / ((1 + g.lam) * (1 + g.lam) - c.r12 * c.r12), 6) AS beta1,
      |  round(((1 + g.lam) * c.r2y - c.r12 * c.r1y)
      |    / ((1 + g.lam) * (1 + g.lam) - c.r12 * c.r12), 6) AS beta2
      |FROM corr c, grid g ORDER BY lam""".stripMargin

  /** C881 stat_logistic_newton — logistic regression of order urgency
    * on the standardized order total, by TWO deterministic
    * Newton–Raphson steps over a 50-bin clamp-bounded z-histogram
    * (n_b, urgent_b exact integers; x_b the bin midpoint): init
    * β = (logit(p̄), 0), each step solves the exact 2×2 weighted system
    * with per-bin terms ·10⁹-quantized before the bin sums. The
    * canonical GLM the library otherwise lacks — binned IRLS with O(1)
    * state, one corpus pass.
    */
  def statLogisticNewton(s: SparkSession, d: String): DataFrame = {
    val m1 = orders(s, d)
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("decimal(38,0)").as("s1"),
        sum(expr("CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS DECIMAL(38,0)) * CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("decimal(38,0)").as("s2"))
      .collect().head
    val n = m1.getLong(0)
    val mu = new java.math.BigDecimal(m1.getDecimal(1).toBigInteger).doubleValue / n
    val sd = math.sqrt(
      new java.math.BigDecimal(m1.getDecimal(2).toBigInteger).doubleValue / n - mu * mu)
    val bins = orders(s, d)
      .select(expr(
        s"""least(greatest(CAST(floor(((CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) - CAST($mu AS DOUBLE)) / CAST($sd AS DOUBLE) + 3) / 0.12) AS BIGINT), 0L), 49L)""")
        .as("b"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("u"))
      .groupBy("b")
      .agg(count(lit(1)).cast("long").as("nb"), sum(col("u")).cast("long").as("ub"))
      .orderBy("b")
      .collect().map(r => (-3.0 + 0.12 * r.getLong(0) + 0.06, r.getLong(1), r.getLong(2)))
    val pbar = bins.map(_._3).sum.toDouble / bins.map(_._2).sum
    var b0 = math.log(pbar / (1 - pbar)); var b1 = 0.0
    for (_ <- 1 to 2) {
      var g0 = BigInt(0); var g1 = BigInt(0)
      var h00 = BigInt(0); var h01 = BigInt(0); var h11 = BigInt(0)
      bins.foreach { case (x, nb, ub) =>
        val p = 1.0 / (1.0 + math.exp(-b0 - b1 * x))
        val w = nb * p * (1 - p)
        def q(v: Double) = BigInt(math.floor(v * 1e9 + 0.5).toLong)
        g0 += q(ub - nb * p); g1 += q((ub - nb * p) * x)
        h00 += q(w); h01 += q(w * x); h11 += q(w * x * x)
      }
      val (gd0, gd1) = (g0.toDouble / 1e9, g1.toDouble / 1e9)
      val (a, bq, c) = (h00.toDouble / 1e9, h01.toDouble / 1e9, h11.toDouble / 1e9)
      val det = a * c - bq * bq
      b0 += (c * gd0 - bq * gd1) / det
      b1 += (-bq * gd0 + a * gd1) / det
    }
    import s.implicits._
    Seq((n, pbar, b0, b1)).toDF("n0", "p0", "i0", "s0")
      .selectExpr("n0 AS n", "round(p0, 6) AS urgent_rate",
        "round(i0, 6) AS beta0", "round(s0, 6) AS beta1")
  }
  val statLogisticNewtonSql: String = {
    // one Newton step: given (b0, b1), emit the updated pair — the
    // per-bin terms are ·1e9-quantized exactly like the Scala loop
    def step(src: String): String =
      s"""SELECT
         |  $src.b0 + (hs.c * hs.g0 - hs.b * hs.g1) / (hs.a * hs.c - hs.b * hs.b) AS b0,
         |  $src.b1 + (-hs.b * hs.g0 + hs.a * hs.g1) / (hs.a * hs.c - hs.b * hs.b) AS b1
         |FROM $src, LATERAL (
         |  SELECT
         |    CAST(CAST(sum(CAST(floor((ub - nb / (1 + exp(-$src.b0 - $src.b1 * x))) * 1e9 + 0.5) AS HUGEINT)) AS HUGEINT) AS DOUBLE) / 1e9 AS g0,
         |    CAST(CAST(sum(CAST(floor((ub - nb / (1 + exp(-$src.b0 - $src.b1 * x))) * x * 1e9 + 0.5) AS HUGEINT)) AS HUGEINT) AS DOUBLE) / 1e9 AS g1,
         |    CAST(CAST(sum(CAST(floor(nb * (1 / (1 + exp(-$src.b0 - $src.b1 * x))) * (1 - 1 / (1 + exp(-$src.b0 - $src.b1 * x))) * 1e9 + 0.5) AS HUGEINT)) AS HUGEINT) AS DOUBLE) / 1e9 AS a,
         |    CAST(CAST(sum(CAST(floor(nb * (1 / (1 + exp(-$src.b0 - $src.b1 * x))) * (1 - 1 / (1 + exp(-$src.b0 - $src.b1 * x))) * x * 1e9 + 0.5) AS HUGEINT)) AS HUGEINT) AS DOUBLE) / 1e9 AS b,
         |    CAST(CAST(sum(CAST(floor(nb * (1 / (1 + exp(-$src.b0 - $src.b1 * x))) * (1 - 1 / (1 + exp(-$src.b0 - $src.b1 * x))) * x * x * 1e9 + 0.5) AS HUGEINT)) AS HUGEINT) AS DOUBLE) / 1e9 AS c
         |  FROM bins) hs""".stripMargin
    s"""WITH mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS HUGEINT) AS DOUBLE) / count(*) AS mu,
      |    sqrt(CAST(CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS HUGEINT)
      |        * CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS HUGEINT) AS DOUBLE) / count(*)
      |      - (CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS HUGEINT) AS DOUBLE) / count(*))
      |        * (CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS HUGEINT) AS DOUBLE) / count(*))) AS sd
      |  FROM orders),
      |bins AS (
      |  SELECT -3.0 + 0.12 * b + 0.06 AS x, CAST(count(*) AS BIGINT) AS nb,
      |    CAST(sum(u) AS BIGINT) AS ub
      |  FROM (
      |    SELECT least(greatest(CAST(floor(((CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) - m.mu) / m.sd + 3) / 0.12) AS BIGINT), 0), 49) AS b,
      |      CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS u
      |    FROM orders, mom m)
      |  GROUP BY 1),
      |init AS (
      |  SELECT ln((CAST(sum(ub) AS DOUBLE) / sum(nb))
      |    / (1 - CAST(sum(ub) AS DOUBLE) / sum(nb))) AS b0,
      |    CAST(0 AS DOUBLE) AS b1,
      |    CAST(sum(ub) AS DOUBLE) / sum(nb) AS pbar
      |  FROM bins),
      |st1 AS (${step("init")}),
      |st2 AS (${step("st1")})
      |SELECT m.n, round(i.pbar, 6) AS urgent_rate,
      |  round(s.b0, 6) AS beta0, round(s.b1, 6) AS beta1
      |FROM st2 s, mom m, init i""".stripMargin
  }

  /** C882 analytics_adstock_grid — the geometric-adstock decay grid:
    * hourly VIEW counts (the exposure proxy) carried through
    * A_t = x_t + λ·A_{t−1} for λ ∈ {0.2, 0.5, 0.8} in ONE recursion
    * over the bounded ≤720-hour event calendar (the three states ride
    * as a list), correlated against hourly PURCHASE value. Adstock
    * values are ·10⁶-quantized once so every correlation moment is an
    * exact integer sum. The marketing-mix response shape: which
    * carryover half-life best explains spend.
    */
  def analyticsAdstockGrid(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .groupBy(expr("date_trunc('hour', ts)").as("m"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
        .cast("long").as("x"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")).otherwise(0L))
          .cast("long").as("y"))
    val joined = ev.orderBy("m")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val lams = Seq(0.2, 0.5, 0.8)
    val rows = lams.map { lam =>
      var a = 0.0
      // quantize each adstock value ONCE (·10⁶); all correlation
      // moments are then exact integer sums — no order dependence
      val aq = joined.map { case (x, _) =>
        a = x + lam * a
        BigInt(math.floor(a * 1e6 + 0.5).toLong)
      }
      val ys = joined.map(x => BigInt(x._2))
      val nn = BigInt(aq.length)
      val (sa, sy) = (aq.sum, ys.sum)
      val saa = aq.map(v => v * v).sum
      val syy = ys.map(v => v * v).sum
      val say = aq.zip(ys).map { case (av, yv) => av * yv }.sum
      val corr = (nn * say - sa * sy).toDouble /
        math.sqrt((nn * saa - sa * sa).toDouble * (nn * syy - sy * sy).toDouble)
      (lam, aq.length.toLong, corr)
    }
    import s.implicits._
    rows.toDF("l0", "n0", "c0")
      .selectExpr("l0 AS lambda", "n0 AS n_months", "round(c0, 6) AS adstock_corr")
      .orderBy("lambda")
  }
  val analyticsAdstockGridSql: String =
    """WITH RECURSIVE ev AS (
      |  SELECT date_trunc('hour', ts) AS m,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t,
      |    CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y
      |  FROM ev),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seq),
      |rec AS (
      |  SELECT CAST(0 AS BIGINT) AS t,
      |    [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)] AS a
      |  FROM nn
      |  UNION ALL
      |  SELECT r.t + 1,
      |    [q.x + 0.2 * r.a[1], q.x + 0.5 * r.a[2], q.x + 0.8 * r.a[3]]
      |  FROM rec r JOIN seq q ON q.t = r.t + 1),
      |ads AS (
      |  SELECT r.t,
      |    CAST(floor(r.a[1] * 1e6 + 0.5) AS HUGEINT) AS a1,
      |    CAST(floor(r.a[2] * 1e6 + 0.5) AS HUGEINT) AS a2,
      |    CAST(floor(r.a[3] * 1e6 + 0.5) AS HUGEINT) AS a3,
      |    CAST(q.y AS HUGEINT) AS yv
      |  FROM rec r JOIN seq q ON q.t = r.t),
      |grid AS (SELECT unnest([1, 2, 3]) AS gi,
      |  unnest([CAST(0.2 AS DOUBLE), 0.5, 0.8]) AS lam),
      |mom AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    sum(a1) AS s1, sum(a1 * a1) AS q1, sum(a1 * yv) AS p1,
      |    sum(a2) AS s2, sum(a2 * a2) AS q2, sum(a2 * yv) AS p2,
      |    sum(a3) AS s3, sum(a3 * a3) AS q3, sum(a3 * yv) AS p3,
      |    sum(yv) AS sy, sum(yv * yv) AS qy
      |  FROM ads),
      |cr AS (
      |  SELECT g.lam, CAST(m.n AS BIGINT) AS n,
      |    CASE g.gi
      |      WHEN 1 THEN CAST(m.n * m.p1 - m.s1 * m.sy AS DOUBLE)
      |        / sqrt(CAST(m.n * m.q1 - m.s1 * m.s1 AS DOUBLE)
      |               * CAST(m.n * m.qy - m.sy * m.sy AS DOUBLE))
      |      WHEN 2 THEN CAST(m.n * m.p2 - m.s2 * m.sy AS DOUBLE)
      |        / sqrt(CAST(m.n * m.q2 - m.s2 * m.s2 AS DOUBLE)
      |               * CAST(m.n * m.qy - m.sy * m.sy AS DOUBLE))
      |      ELSE CAST(m.n * m.p3 - m.s3 * m.sy AS DOUBLE)
      |        / sqrt(CAST(m.n * m.q3 - m.s3 * m.s3 AS DOUBLE)
      |               * CAST(m.n * m.qy - m.sy * m.sy AS DOUBLE)) END AS c
      |  FROM mom m, grid g)
      |SELECT lam AS lambda, n AS n_months, round(c, 6) AS adstock_corr
      |FROM cr ORDER BY lambda""".stripMargin

  /** C883 stat_wls_inverse_variance — precision-weighted least squares
    * of per-customer MEAN order value on account balance, weights
    * w = n_orders (the variance of a mean of n orders is σ²/n): every
    * weighted moment is an EXACT integer because w·ȳ = total and
    * w·ȳ·x = total·x clear the division. Emitted next to the
    * unweighted per-customer OLS slope — the gap is what
    * heteroscedasticity costs a naive fit.
    */
  def statWlsInverseVariance(s: SparkSession, d: String): DataFrame = {
    val per = customer(s, d).select(col("c_custkey").as("ck"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)").as("x"))
      .join(orders(s, d).groupBy(col("o_custkey").as("ck"))
        .agg(count(lit(1)).cast("long").as("w"),
          sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .cast("long").as("tot")), Seq("ck"), "inner")
    val wls = per.agg(count(lit(1)).cast("long").as("n"),
      sum(col("w")).cast("decimal(38,0)").as("sw"),
      sum(expr("CAST(w AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("swx"),
      sum(col("tot")).cast("decimal(38,0)").as("swy"),
      sum(expr("CAST(tot AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("swxy"),
      sum(expr("CAST(w AS DECIMAL(38,0)) * x * x")).cast("decimal(38,0)").as("swxx"),
      // unweighted per-customer mean-value moments, ·10³-quantized
      sum(expr("CAST(floor(CAST(tot AS DOUBLE) / w * 1e3 + 0.5) AS BIGINT)"))
        .cast("decimal(38,0)").as("uy"),
      sum(expr("CAST(floor(CAST(tot AS DOUBLE) / w * x / 1e3 + 0.5) AS BIGINT)"))
        .cast("decimal(38,0)").as("uxy"),
      sum(col("x")).cast("decimal(38,0)").as("ux"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("uxx"))
    wls.selectExpr("n",
        """round((CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE)
          | - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE))
          |/ (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)
          |   - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)), 9) AS beta_wls""".stripMargin,
        """round((CAST(n AS DOUBLE) * (CAST(uxy AS DOUBLE) * 1e3)
          | - CAST(ux AS DOUBLE) * (CAST(uy AS DOUBLE) / 1e3))
          |/ (CAST(n AS DOUBLE) * CAST(uxx AS DOUBLE)
          |   - CAST(ux AS DOUBLE) * CAST(ux AS DOUBLE)), 9) AS beta_ols""".stripMargin)
  }
  val statWlsInverseVarianceSql: String =
    """WITH per AS (
      |  SELECT CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS x,
      |    o.w, o.tot
      |  FROM customer JOIN (
      |    SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS w,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS tot
      |    FROM orders GROUP BY 1) o ON customer.c_custkey = o.ck),
      |ag AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(w) AS DECIMAL(38,0)) AS sw,
      |    CAST(sum(CAST(w AS HUGEINT) * x) AS DECIMAL(38,0)) AS swx,
      |    CAST(sum(tot) AS DECIMAL(38,0)) AS swy,
      |    CAST(sum(CAST(tot AS HUGEINT) * x) AS DECIMAL(38,0)) AS swxy,
      |    CAST(sum(CAST(w AS HUGEINT) * x * x) AS DECIMAL(38,0)) AS swxx,
      |    CAST(sum(CAST(floor(CAST(tot AS DOUBLE) / w * 1e3 + 0.5) AS HUGEINT)) AS DECIMAL(38,0)) AS uy,
      |    CAST(sum(CAST(floor(CAST(tot AS DOUBLE) / w * x / 1e3 + 0.5) AS HUGEINT)) AS DECIMAL(38,0)) AS uxy,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS ux,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS uxx
      |  FROM per)
      |SELECT n,
      |  round((CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE)
      |    - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE))
      |  / (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)
      |     - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)), 9) AS beta_wls,
      |  round((CAST(n AS DOUBLE) * (CAST(uxy AS DOUBLE) * 1e3)
      |    - CAST(ux AS DOUBLE) * (CAST(uy AS DOUBLE) / 1e3))
      |  / (CAST(n AS DOUBLE) * CAST(uxx AS DOUBLE)
      |     - CAST(ux AS DOUBLE) * CAST(ux AS DOUBLE)), 9) AS beta_ols
      |FROM ag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_ridge_regression" -> (statRidgeRegression _),
    "stat_logistic_newton" -> (statLogisticNewton _),
    "analytics_adstock_grid" -> (analyticsAdstockGrid _),
    "stat_wls_inverse_variance" -> (statWlsInverseVariance _),
  )

  val oracle: Map[String, String] = Map(
    "stat_ridge_regression" -> statRidgeRegressionSql,
    "stat_logistic_newton" -> statLogisticNewtonSql,
    "analytics_adstock_grid" -> analyticsAdstockGridSql,
    "stat_wls_inverse_variance" -> statWlsInverseVarianceSql,
  )
}
