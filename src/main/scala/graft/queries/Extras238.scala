package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 138 (C956–C959): time-series structure tests — the Dickey–
  * Fuller unit-root τ (the stationarity gate C661 KPSS only checks
  * from the other side), the BDS independence test on the ε-embedded
  * month series, the subword-complexity profile of the daily up/down
  * sequence, and AIC selection across three closed-form trend models.
  *
  * Shared discipline: every regression moment is an exact integer/
  * DECIMAL sum (cent values; ln/√t regressors quantized ·10⁹ before
  * summing — double Σ would be partition-order-dependent), BDS
  * proximity is an integer |vᵢ−vⱼ| ≤ ε compare with ε itself floored
  * to integer cents, and the complexity profile counts exact distinct
  * k-grams over the calendar-bounded bit string.
  */
object Extras238 {

  private def monthSeq(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .select(expr("CAST(row_number() OVER (ORDER BY m) AS BIGINT)").as("t"), col("v"))

  private val monthSeqSql: String =
    """seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t, v FROM (
      |    SELECT date_trunc('month', o_orderdate) AS m,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1))""".stripMargin

  /** C956 time_dickey_fuller — the Dickey–Fuller unit-root test on
    * monthly revenue: Δv_t = α + γ·v_{t−1} + ε over the m = n−1
    * differenced points, γ̂ and its SE from exact integer moments
    * (Σx, Σy BIGINT; Σx², Σxy DECIMAL(38,0) — x ~ 3e12 cents at sf100
    * squares to 1e25, decimal headroom to sf1e4), τ = γ̂/SE against
    * the 5% constant-case critical −2.89. KPSS (C661) tests
    * stationarity as H₀; this tests the unit root as H₀ — quoting
    * both is the standard pre-model check.
    */
  def timeDickeyFuller(s: SparkSession, d: String): DataFrame = {
    val seq0 = monthSeq(s, d)
    val pairs = seq0.selectExpr("t", "v AS x")
      .join(seq0.selectExpr("t - 1 AS t", "v AS vn"), "t")
      .selectExpr("x", "vn - x AS y")
    pairs.agg(
      count(lit(1)).cast("long").as("m"),
      sum(col("x")).cast("long").as("sx"),
      sum(col("y")).cast("long").as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("sxx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("sxy"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"))
      .selectExpr("m",
        """(CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
          |/ (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) AS g""".stripMargin,
        "CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / m AS sxxc",
        "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / m AS syyc",
        "CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / m AS sxyc")
      .selectExpr("m AS n_obs", "round(g, 6) AS gamma",
        "round(g / sqrt((syyc - g * sxyc) / (m - 2) / sxxc), 4) AS tau",
        "g / sqrt((syyc - g * sxyc) / (m - 2) / sxxc) > -2.89 AS unit_root")
  }
  val timeDickeyFullerSql: String =
    s"""WITH $monthSeqSql,
       |pairs AS (
       |  SELECT a.v AS x, b.v - a.v AS y
       |  FROM seq a JOIN seq b ON b.t = a.t + 1),
       |mom AS (
       |  SELECT CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxx,
       |    CAST(sum(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS sxy,
       |    CAST(sum(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS syy
       |  FROM pairs),
       |fin AS (
       |  SELECT m,
       |    (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
       |    / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) AS g,
       |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / m AS sxxc,
       |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / m AS syyc,
       |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / m AS sxyc
       |  FROM mom)
       |SELECT m AS n_obs, round(g, 6) AS gamma,
       |  round(g / sqrt((syyc - g * sxyc) / (m - 2) / sxxc), 4) AS tau,
       |  g / sqrt((syyc - g * sxyc) / (m - 2) / sxxc) > -2.89 AS unit_root
       |FROM fin""".stripMargin

  /** C957 time_bds_test — the BDS independence test (m=2 embedding) on
    * monthly revenue: proximity |vᵢ−vⱼ| ≤ ε with ε = ⌊σ/2⌋ integer
    * cents (σ from exact moments), correlation integrals C₁/C₂ from
    * exact pair counts over the N = n−1 embedded points, K from the
    * exact Σcⱼ(cⱼ−1) triple count, and the Brock et al. m=2 variance
    * 4[K² + 2KC² + C⁴ − 4KC²]. Rejects iid structure that
    * autocorrelation tests (C480 Ljung–Box) can miss — BDS sees
    * nonlinear dependence.
    */
  def timeBdsTest(s: SparkSession, d: String): DataFrame = {
    val seq0 = monthSeq(s, d)
    val emb = seq0.selectExpr("t", "v")
      .join(seq0.selectExpr("t - 1 AS t", "v AS v1"), "t")
      .localCheckpoint(true) // N = n-1 embedded calendar points, consumed 3x
    val nn = emb.agg(count(lit(1)).cast("long").as("nb"),
      sum(col("v")).cast("long").as("sv"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("svv"))
      .selectExpr("nb",
        """CAST(floor(sqrt((CAST(nb AS DOUBLE) * CAST(svv AS DOUBLE)
          |  - CAST(sv AS DOUBLE) * sv) / (CAST(nb AS DOUBLE) * (nb - 1))) / 2) AS BIGINT) AS eps""".stripMargin)
    val a = emb.selectExpr("t AS ti", "v AS vi", "v1 AS vi1")
    val b = emb.selectExpr("t AS tj", "v AS vj", "v1 AS vj1")
    val pairs = a.join(b, expr("ti < tj")).crossJoin(broadcast(nn))
      .selectExpr("ti", "tj",
        "CASE WHEN abs(vi - vj) <= eps THEN 1L ELSE 0L END AS d0",
        """CASE WHEN abs(vi - vj) <= eps AND abs(vi1 - vj1) <= eps
          |THEN 1L ELSE 0L END AS d2""".stripMargin)
      .localCheckpoint(true)
    val cc = pairs.agg(sum(col("d0")).cast("long").as("p1"),
      sum(col("d2")).cast("long").as("p2"))
    // c_j = #neighbors of j on the first coordinate (ordered triples via c_j(c_j-1))
    val deg = pairs.selectExpr("ti AS j", "d0")
      .union(pairs.selectExpr("tj AS j", "d0"))
      .groupBy("j").agg(sum(col("d0")).cast("long").as("cj"))
      .agg(sum(expr("cj * (cj - 1)")).cast("long").as("trip"))
    cc.crossJoin(broadcast(deg)).crossJoin(broadcast(nn))
      .selectExpr("nb",
        "CAST(p1 AS DOUBLE) * 2 / (CAST(nb AS DOUBLE) * (nb - 1)) AS c1",
        "CAST(p2 AS DOUBLE) * 2 / (CAST(nb AS DOUBLE) * (nb - 1)) AS c2",
        "CAST(trip AS DOUBLE) / (CAST(nb AS DOUBLE) * (nb - 1) * (nb - 2)) AS kk")
      .selectExpr("nb AS n_embedded", "round(c1, 6) AS c1", "round(c2, 6) AS c2",
        """round(sqrt(CAST(nb AS DOUBLE)) * (c2 - c1 * c1)
          |/ sqrt(4 * (kk * kk + 2 * kk * c1 * c1 + c1 * c1 * c1 * c1
          |  - 4 * kk * c1 * c1)), 4) AS bds_z""".stripMargin)
      .selectExpr("n_embedded", "c1", "c2", "bds_z", "abs(bds_z) > 1.96 AS reject_iid")
  }
  val timeBdsTestSql: String =
    s"""WITH $monthSeqSql,
       |emb AS (
       |  SELECT a.t, a.v, b.v AS v1
       |  FROM seq a JOIN seq b ON b.t = a.t + 1),
       |nn AS (
       |  SELECT CAST(count(*) AS BIGINT) AS nb,
       |    CAST(floor(sqrt((CAST(count(*) AS DOUBLE) * CAST(CAST(sum(CAST(v AS HUGEINT) * v) AS DECIMAL(38,0)) AS DOUBLE)
       |      - CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) * CAST(sum(v) AS BIGINT))
       |      / (CAST(count(*) AS DOUBLE) * (count(*) - 1))) / 2) AS BIGINT) AS eps
       |  FROM emb),
       |pairs AS (
       |  SELECT a.t AS ti, b.t AS tj,
       |    CASE WHEN abs(a.v - b.v) <= eps THEN 1 ELSE 0 END AS d0,
       |    CASE WHEN abs(a.v - b.v) <= eps AND abs(a.v1 - b.v1) <= eps
       |    THEN 1 ELSE 0 END AS d2
       |  FROM emb a, emb b, nn WHERE a.t < b.t),
       |cc AS (
       |  SELECT CAST(sum(d0) AS BIGINT) AS p1, CAST(sum(d2) AS BIGINT) AS p2 FROM pairs),
       |deg AS (
       |  SELECT CAST(sum(cj * (cj - 1)) AS BIGINT) AS trip FROM (
       |    SELECT j, CAST(sum(d0) AS BIGINT) AS cj FROM (
       |      SELECT ti AS j, d0 FROM pairs UNION ALL SELECT tj AS j, d0 FROM pairs)
       |    GROUP BY j)),
       |fin AS (
       |  SELECT nb,
       |    CAST(p1 AS DOUBLE) * 2 / (CAST(nb AS DOUBLE) * (nb - 1)) AS c1,
       |    CAST(p2 AS DOUBLE) * 2 / (CAST(nb AS DOUBLE) * (nb - 1)) AS c2,
       |    CAST(trip AS DOUBLE) / (CAST(nb AS DOUBLE) * (nb - 1) * (nb - 2)) AS kk
       |  FROM cc, deg, nn),
       |fin2 AS (
       |  SELECT nb AS n_embedded, round(c1, 6) AS c1, round(c2, 6) AS c2,
       |    round(sqrt(CAST(nb AS DOUBLE)) * (c2 - c1 * c1)
       |    / sqrt(4 * (kk * kk + 2 * kk * c1 * c1 + c1 * c1 * c1 * c1
       |      - 4 * kk * c1 * c1)), 4) AS bds_z
       |  FROM fin)
       |SELECT n_embedded, c1, c2, bds_z, abs(bds_z) > 1.96 AS reject_iid FROM fin2""".stripMargin

  /** C958 time_subword_complexity — the subword-complexity profile of
    * the daily revenue up/down bit sequence: distinct k-grams over
    * k = 1..8 against the attainable max min(2ᵏ, L−k+1). A maximally
    * random sequence saturates every k (ratio→1); periodic structure
    * caps it — the SQL-native cousin of Lempel–Ziv complexity (whose
    * sequential parse neither engine can express as a plan). The bit
    * string lives on the bounded day calendar; k-grams come off eight
    * lead() columns, exact distinct counts per k.
    */
  def timeSubwordComplexity(s: SparkSession, d: String): DataFrame = {
    val days = orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
    val w = Window.orderBy("day")
    val bits = days
      .withColumn("vprev", lag(col("v"), 1).over(w))
      .filter(col("vprev").isNotNull)
      .select(col("day"), expr("CASE WHEN v > vprev THEN '1' ELSE '0' END").as("b"))
    val withLeads = (1 to 7).foldLeft(bits) { (df, i) =>
      df.withColumn(s"b$i", lead(col("b"), i).over(w))
    }
    val grams = withLeads.selectExpr(
      """stack(8,
        |  CAST(1 AS BIGINT), b,
        |  CAST(2 AS BIGINT), concat(b, b1),
        |  CAST(3 AS BIGINT), concat(b, b1, b2),
        |  CAST(4 AS BIGINT), concat(b, b1, b2, b3),
        |  CAST(5 AS BIGINT), concat(b, b1, b2, b3, b4),
        |  CAST(6 AS BIGINT), concat(b, b1, b2, b3, b4, b5),
        |  CAST(7 AS BIGINT), concat(b, b1, b2, b3, b4, b5, b6),
        |  CAST(8 AS BIGINT), concat(b, b1, b2, b3, b4, b5, b6, b7)) AS (k, gram)""".stripMargin)
      .filter(expr("length(gram) = k")) // concat(NULL,..) is NULL: tail windows drop
    val tot = bits.agg(count(lit(1)).cast("long").as("len"))
    grams.groupBy("k")
      .agg(countDistinct(col("gram")).cast("long").as("distinct_grams"))
      .crossJoin(broadcast(tot))
      .selectExpr("k", "len - k + 1 AS n_grams", "distinct_grams",
        """round(CAST(distinct_grams AS DOUBLE)
          |/ least(CAST(power(2, k) AS DOUBLE), CAST(len - k + 1 AS DOUBLE)), 6) AS saturation""".stripMargin)
      .orderBy("k")
  }
  val timeSubwordComplexitySql: String =
    """WITH days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |bits AS (
      |  SELECT day, CASE WHEN v > lag(v, 1) OVER (ORDER BY day) THEN '1' ELSE '0' END AS b
      |  FROM days QUALIFY lag(v, 1) OVER (ORDER BY day) IS NOT NULL),
      |sstr AS (
      |  SELECT string_agg(b, '' ORDER BY day) AS s2, CAST(count(*) AS BIGINT) AS len FROM bits),
      |grams AS (
      |  SELECT k, substr(s2, i, CAST(k AS INT)) AS gram FROM sstr,
      |    (SELECT CAST(unnest(generate_series(1, 8)) AS BIGINT) AS k),
      |    LATERAL (SELECT unnest(generate_series(1, CAST(len - k + 1 AS BIGINT))) AS i)),
      |agg AS (
      |  SELECT k, CAST(count(DISTINCT gram) AS BIGINT) AS distinct_grams FROM grams GROUP BY k)
      |SELECT k, len - k + 1 AS n_grams, distinct_grams,
      |  round(CAST(distinct_grams AS DOUBLE)
      |  / least(CAST(power(2, k) AS DOUBLE), CAST(len - k + 1 AS DOUBLE)), 6) AS saturation
      |FROM agg, sstr ORDER BY k""".stripMargin

  /** C959 analytics_trend_model_aic — AIC selection across three
    * closed-form trend models of monthly revenue (v ~ t, v ~ ln t,
    * v ~ √t): regressors quantized ·10⁹ to exact integers before the
    * moment sums (double Σ would be partition-order-dependent), RSS
    * from the exact moments, AIC = m·ln(RSS/m) + 2k with k = 3. The
    * disciplined answer to "is growth linear or saturating?" — one
    * number per hypothesis, not a plotted vibe.
    */
  def analyticsTrendModelAic(s: SparkSession, d: String): DataFrame = {
    val seq0 = monthSeq(s, d)
    val long0 = seq0.selectExpr("v", "t",
      "CAST(floor(CAST(t AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS x_linear",
      "CAST(floor(ln(CAST(t AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS x_log",
      "CAST(floor(sqrt(CAST(t AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS x_sqrt")
      .selectExpr("v", "stack(3, 'linear', x_linear, 'log', x_log, 'sqrt', x_sqrt) AS (model, xq)")
    val mom = long0.groupBy("model").agg(
      count(lit(1)).cast("long").as("m"),
      sum(col("xq")).cast("decimal(38,0)").as("sx"),
      sum(col("v")).cast("decimal(38,0)").as("sy"),
      sum(expr("CAST(xq AS DECIMAL(38,0)) * xq")).cast("decimal(38,0)").as("sxx"),
      sum(expr("CAST(xq AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("sxy"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("syy"))
    val fit = mom.selectExpr("model", "m",
      """(CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |/ (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS bq""".stripMargin,
      "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / m AS syyc",
      """CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / m AS sxyc""".stripMargin)
      .selectExpr("model", "m", "syyc - bq * sxyc AS rss")
      .selectExpr("model", "m",
        "round(ln(rss / m), 6) AS ln_mse",
        "round(CAST(m AS DOUBLE) * ln(rss / m) + 6, 4) AS aic")
    fit.withColumn("best_aic", min(col("aic")).over(Window.partitionBy()))
      .selectExpr("model", "m AS n_months", "ln_mse", "aic",
        "aic = best_aic AS chosen")
      .orderBy("model")
  }
  val analyticsTrendModelAicSql: String =
    s"""WITH $monthSeqSql,
       |long0 AS (
       |  SELECT v, 'linear' AS model,
       |    CAST(floor(CAST(t AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS xq FROM seq
       |  UNION ALL
       |  SELECT v, 'log' AS model,
       |    CAST(floor(ln(CAST(t AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS xq FROM seq
       |  UNION ALL
       |  SELECT v, 'sqrt' AS model,
       |    CAST(floor(sqrt(CAST(t AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS xq FROM seq),
       |mom AS (
       |  SELECT model, CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(CAST(xq AS HUGEINT)) AS DECIMAL(38,0)) AS sx,
       |    CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
       |    CAST(sum(CAST(xq AS HUGEINT) * xq) AS DECIMAL(38,0)) AS sxx,
       |    CAST(sum(CAST(xq AS HUGEINT) * v) AS DECIMAL(38,0)) AS sxy,
       |    CAST(sum(CAST(v AS HUGEINT) * v) AS DECIMAL(38,0)) AS syy
       |  FROM long0 GROUP BY 1),
       |fit AS (
       |  SELECT model, m,
       |    (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |    / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS bq,
       |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / m AS syyc,
       |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / m AS sxyc
       |  FROM mom),
       |fit2 AS (
       |  SELECT model, m, syyc - bq * sxyc AS rss FROM fit),
       |fit3 AS (
       |  SELECT model, m,
       |    round(ln(rss / m), 6) AS ln_mse,
       |    round(CAST(m AS DOUBLE) * ln(rss / m) + 6, 4) AS aic
       |  FROM fit2)
       |SELECT model, m AS n_months, ln_mse, aic,
       |  aic = min(aic) OVER () AS chosen
       |FROM fit3 ORDER BY model""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_dickey_fuller" -> (timeDickeyFuller _),
    "time_bds_test" -> (timeBdsTest _),
    "time_subword_complexity" -> (timeSubwordComplexity _),
    "analytics_trend_model_aic" -> (analyticsTrendModelAic _),
  )

  val oracle: Map[String, String] = Map(
    "time_dickey_fuller" -> timeDickeyFullerSql,
    "time_bds_test" -> timeBdsTestSql,
    "time_subword_complexity" -> timeSubwordComplexitySql,
    "analytics_trend_model_aic" -> analyticsTrendModelAicSql,
  )
}
