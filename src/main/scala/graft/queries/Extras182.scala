package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 82 (C732–C735): embedding-space QA + a normality omnibus —
  * the axis-variance spectral-decay fit, the diagonal-Mahalanobis
  * outlier census, the norm↔length correlation, and D'Agostino's K².
  *
  * Shared discipline: per-dim stats come from ONE posexplode pass
  * with nano-quantized exact moments; per-vector scores are per-row
  * deterministic doubles quantized before the distributed sum; the
  * 64-row spectrum fits run closed-form OLS over an aggregate-bounded
  * frame; K² uses the day frame with per-row dollar deviations
  * (deterministic doubles) and quantized central moments.
  */
object Extras182 {

  /** C732 embed_spectral_decay — power-law fit to the sorted axis
    * variance spectrum: per-dim variances (exact nano-quantized
    * n·Σf²−(Σf)² moments), ranked descending, then the closed-form
    * OLS slope of ln(var) on ln(rank) over the 64-dim frame. A slope
    * near 0 = isotropic axes; steep negative = a few dominant
    * directions — the collapse smell test for learned embeddings.
    */
  def embedSpectralDecay(s: SparkSession, d: String): DataFrame = {
    val perDim = embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("pos"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1e9 + 0.5) AS BIGINT)").as("f"))
      .groupBy("pos")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("f")).cast("decimal(38,0)").as("sf"),
        sum(expr("CAST(f AS DECIMAL(38,0)) * f")).cast("decimal(38,0)").as("qf"))
      .selectExpr("pos",
        """CAST(CAST(n AS DECIMAL(38,0)) * qf - sf * sf AS DOUBLE)
          |/ (CAST(n AS DOUBLE) * n) / 1e18 AS variance""".stripMargin)
    val ranked = perDim
      .withColumn("rk", row_number().over(Window.orderBy(col("variance").desc, col("pos").asc)))
      .selectExpr("ln(CAST(rk AS DOUBLE)) AS x", "ln(variance) AS y")
    ranked.agg(count(lit(1)).cast("long").as("k"),
        sum(expr("CAST(floor(x * 1e9 + 0.5) AS BIGINT)")).cast("long").as("sx"),
        sum(expr("CAST(floor(y * 1e9 + 0.5) AS BIGINT)")).cast("long").as("sy"),
        sum(expr("CAST(floor(x * x * 1e9 + 0.5) AS BIGINT)")).cast("long").as("sxx"),
        sum(expr("CAST(floor(x * y * 1e9 + 0.5) AS BIGINT)")).cast("long").as("sxy"))
      .selectExpr("k",
        "CAST(sy AS DOUBLE) / 1e9 / k AS dummy_my",
        """(CAST(k AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
          |  - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
          |/ (CAST(k AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
          |  - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9)) AS slope""".stripMargin)
      .selectExpr("k AS n_dims", "round(slope, 6) AS decay_slope",
        "round(dummy_my, 6) AS mean_ln_var")
  }
  val embedSpectralDecaySql: String =
    """WITH comp AS (
      |  SELECT i.i AS pos,
      |    CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS f
      |  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i),
      |perdim AS (
      |  SELECT pos, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(f) AS DECIMAL(38,0)) AS sf,
      |    CAST(sum(CAST(f AS DECIMAL(38,0)) * f) AS DECIMAL(38,0)) AS qf
      |  FROM comp GROUP BY 1),
      |pv AS (
      |  SELECT pos,
      |    CAST(CAST(n AS DECIMAL(38,0)) * qf - sf * sf AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * n) / 1e18 AS variance
      |  FROM perdim),
      |ranked AS (
      |  SELECT ln(CAST(row_number() OVER (ORDER BY variance DESC, pos) AS DOUBLE)) AS x,
      |    ln(variance) AS y
      |  FROM pv),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(CAST(floor(x * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
      |    CAST(sum(CAST(floor(y * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
      |    CAST(sum(CAST(floor(x * x * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sxx,
      |    CAST(sum(CAST(floor(x * y * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sxy
      |  FROM ranked),
      |m AS (
      |  SELECT k,
      |    CAST(sy AS DOUBLE) / 1e9 / k AS dummy_my,
      |    (CAST(k AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
      |      - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
      |    / (CAST(k AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
      |      - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9)) AS slope
      |  FROM agg)
      |SELECT k AS n_dims, round(slope, 6) AS decay_slope,
      |  round(dummy_my, 6) AS mean_ln_var
      |FROM m""".stripMargin

  /** C733 embed_mahalanobis_diag — the diagonal-covariance
    * Mahalanobis outlier census: per-dim mean/variance from one exact
    * pass (broadcast 64-row stats), per-vector
    * D² = Σ_j (v_j−μ_j)²/σ²_j as a deterministic per-row double
    * quantized before summing; census = mean D² (≈ d for Gaussian-ish
    * data), share above the χ²₆₄ 99th percentile (93.2168), and max.
    * The training-data "weird vector" screen that respects per-axis
    * scale, unlike raw-norm audits.
    */
  def embedMahalanobisDiag(s: SparkSession, d: String): DataFrame = {
    val perDim = embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("pos"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1e9 + 0.5) AS BIGINT)").as("f"))
      .groupBy("pos")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("f")).cast("decimal(38,0)").as("sf"),
        sum(expr("CAST(f AS DECIMAL(38,0)) * f")).cast("decimal(38,0)").as("qf"))
      .selectExpr("pos",
        "CAST(sf AS DOUBLE) / n / 1e9 AS mu",
        """CAST(CAST(n AS DECIMAL(38,0)) * qf - sf * sf AS DOUBLE)
          |/ (CAST(n AS DOUBLE) * n) / 1e18 AS s2""".stripMargin)
    val d2 = embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .join(broadcast(perDim), Seq("pos"))
      .select(col("vec_id"),
        expr("(CAST(v AS DOUBLE) - mu) * (CAST(v AS DOUBLE) - mu) / s2").as("t"))
      .groupBy("vec_id")
      .agg(sum(expr("CAST(floor(t * 1e6 + 0.5) AS BIGINT)")).cast("long").as("d2q"))
      .selectExpr("vec_id", "CAST(d2q AS DOUBLE) / 1e6 AS d2")
    d2.agg(count(lit(1)).cast("long").as("n_vectors"),
        sum(expr("CAST(floor(d2 * 1e6 + 0.5) AS BIGINT)")).cast("decimal(38,0)").as("sd2"),
        sum(expr("CASE WHEN d2 > 93.2168 THEN 1L ELSE 0L END")).cast("long").as("n_outliers"),
        max(expr("round(d2, 4)")).as("max_d2"))
      .selectExpr("n_vectors",
        "round(CAST(sd2 AS DOUBLE) / n_vectors / 1e6, 4) AS mean_d2",
        "n_outliers", "max_d2")
  }
  val embedMahalanobisDiagSql: String =
    """WITH comp AS (
      |  SELECT e.vec_id, i.i AS pos, CAST(e.embedding[i.i] AS DOUBLE) AS v,
      |    CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS f
      |  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i),
      |perdim AS (
      |  SELECT pos, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(f) AS DECIMAL(38,0)) AS sf,
      |    CAST(sum(CAST(f AS DECIMAL(38,0)) * f) AS DECIMAL(38,0)) AS qf
      |  FROM comp GROUP BY 1),
      |stats AS (
      |  SELECT pos, CAST(sf AS DOUBLE) / n / 1e9 AS mu,
      |    CAST(CAST(n AS DECIMAL(38,0)) * qf - sf * sf AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * n) / 1e18 AS s2
      |  FROM perdim),
      |d2 AS (
      |  SELECT c.vec_id,
      |    CAST(CAST(sum(CAST(floor((c.v - st.mu) * (c.v - st.mu) / st.s2 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e6 AS d2
      |  FROM comp c JOIN stats st ON st.pos = c.pos
      |  GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_vectors,
      |  round(CAST(CAST(sum(CAST(floor(d2 * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS DOUBLE) / count(*) / 1e6, 4) AS mean_d2,
      |  CAST(sum(CASE WHEN d2 > 93.2168 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  max(round(d2, 4)) AS max_d2
      |FROM d2""".stripMargin

  /** C734 embed_norm_quality_corr — does vector norm track document
    * length? Pearson r between the exact quantized norm² and n_chars
    * over the doc_id = vec_id join, with all five sums exact
    * (norm² is a BIGINT by the unit-norm bound; n_chars integer).
    * Norms correlating with a nuisance variable is the classic
    * "embedding leaks length" bug in retrieval corpora.
    */
  def embedNormQualityCorr(s: SparkSession, d: String): DataFrame = {
    val norms = embeddings(s, d)
      .select(col("vec_id"),
        expr("""aggregate(transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1e9 + 0.5) AS BIGINT)),
          |  0L, (acc, x) -> acc + x * x)""".stripMargin).as("n2"))
    val joined = norms
      .join(documents(s, d).select(col("doc_id").as("vec_id"), col("n_chars")), Seq("vec_id"))
      // Pearson is shift-invariant; centring x at the unit-norm 10⁹
      // before any moment kills the catastrophic double cancellation a
      // raw 1e9-magnitude x suffers in n·Σx² − (Σx)², and the centred
      // cross-moments stay exact in DECIMAL
      .selectExpr("n2 div 1000000000 - 1000000000 AS x", "n_chars AS y")
    joined.agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("sxy"))
      .selectExpr("n",
        """round(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
          |/ sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
          |  * CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)), 6)
          |AS pearson_r""".stripMargin)
  }
  val embedNormQualityCorrSql: String =
    """WITH norms AS (
      |  SELECT e.vec_id,
      |    CAST(sum(CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT)
      |      * CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS n2
      |  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i
      |  GROUP BY 1),
      |j AS (
      |  SELECT CAST(n2 // 1000000000 - 1000000000 AS BIGINT) AS x, d.n_chars AS y
      |  FROM norms n JOIN documents d ON d.doc_id = n.vec_id),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx, CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
      |  FROM j)
      |SELECT n,
      |  round(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
      |  / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
      |    * CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)), 6)
      |  AS pearson_r
      |FROM agg""".stripMargin

  /** C735 stat_dagostino_k2 — D'Agostino–Pearson K² normality omnibus
    * on daily revenue: skewness and kurtosis from quantized central
    * moments (per-row dollar deviations off the exact mean), each
    * transformed to its normal-approximation Z (D'Agostino skew
    * transform; Anscombe–Glynn kurtosis transform), K² = Z₁² + Z₂² ~
    * χ²(2). Complements Jarque–Bera: same inputs, finite-n-calibrated
    * transforms instead of the asymptotic form.
    */
  def statDagostinoK2(s: SparkSession, d: String): DataFrame = {
    val f = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("c"))
    // scale-proof standardization: q2 = Σ(c·n−S)² is EXACT in DECIMAL,
    // then z = (c·n−S)/√(q2/n) is O(1) per row at ANY corpus scale, so
    // quantizing z³/z⁴ at 1e6 never approaches the floor→LONG clamp
    // that sank the raw-dollar dev⁴ first attempt
    val tot = f.agg(count(lit(1)).cast("long").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("sc"))
    val q2f = f.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"), max(col("sc")).as("sc"),
        sum(expr("(c * n - sc) * (c * n - sc)")).cast("decimal(38,0)").as("q2"))
    val m = f.crossJoin(broadcast(q2f))
      .withColumn("z", expr(
        "CAST(c * n - sc AS DOUBLE) / sqrt(CAST(q2 AS DOUBLE) / n)"))
      .agg(max(col("n")).as("n"),
        sum(expr("CAST(floor(z * z * z * 1e6 + 0.5) AS BIGINT)")).cast("long").as("m3q"),
        sum(expr("CAST(floor(z * z * z * z * 1e6 + 0.5) AS BIGINT)")).cast("long").as("m4q"))
      .selectExpr("n",
        "CAST(m3q AS DOUBLE) / 1e6 / n AS g1",
        "CAST(m4q AS DOUBLE) / 1e6 / n AS b2")
    m.selectExpr("n", "g1", "b2",
        """g1 * sqrt((CAST(n AS DOUBLE) + 1) * (n + 3) / (6.0 * (n - 2))) AS y""",
        """3.0 * (CAST(n AS DOUBLE) * n + 27 * n - 70) * (n + 1) * (n + 3)
          |/ ((CAST(n AS DOUBLE) - 2) * (n + 5) * (n + 7) * (n + 9)) AS beta2""".stripMargin,
        "3.0 * (CAST(n AS DOUBLE) - 1) / (n + 1) AS ek",
        """24.0 * n * (CAST(n AS DOUBLE) - 2) * (n - 3)
          |/ ((CAST(n AS DOUBLE) + 1) * (n + 1) * (n + 3) * (n + 5)) AS vk""".stripMargin,
        """6.0 * (CAST(n AS DOUBLE) * n - 5 * n + 2) / ((n + 7) * (n + 9))
          |* sqrt(6.0 * (n + 3) * (n + 5) / (CAST(n AS DOUBLE) * (n - 2) * (n - 3))) AS beta1k""".stripMargin)
      .selectExpr("n", "g1", "b2", "y", "ek", "vk", "beta1k",
        "sqrt(2 * (beta2 - 1)) - 1 AS w2")
      .selectExpr("n", "g1", "b2", "y", "ek", "vk", "beta1k",
        "1 / sqrt(ln(sqrt(w2))) AS delta", "sqrt(2 / (w2 - 1)) AS alpha")
      .selectExpr("n", "g1", "b2", "ek", "vk", "beta1k",
        "delta * ln(y / alpha + sqrt(y * y / (alpha * alpha) + 1)) AS z1",
        "(b2 - ek) / sqrt(vk) AS xk")
      .selectExpr("n", "g1", "b2", "z1",
        "6 + 8 / beta1k * (2 / beta1k + sqrt(1 + 4 / (beta1k * beta1k))) AS aa", "xk")
      .selectExpr("n", "g1", "b2", "z1",
        """((1 - 2.0 / (9 * aa))
          |  - pow((1 - 2 / aa) / (1 + xk * sqrt(2 / (aa - 4))), CAST(1 AS DOUBLE) / 3))
          |* sqrt(9 * aa / 2) AS z2""".stripMargin)
      .selectExpr("n", "round(g1, 6) AS skewness", "round(b2, 6) AS kurtosis_b2",
        "round(z1, 6) AS z_skew", "round(z2, 6) AS z_kurt",
        "round(z1 * z1 + z2 * z2, 6) AS k2")
  }
  val statDagostinoK2Sql: String =
    """WITH bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS c
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS DECIMAL(38,0)) AS sc FROM bars),
      |q2f AS (
      |  SELECT max(n) AS n, max(sc) AS sc,
      |    CAST(sum((c * n - sc) * (c * n - sc)) AS DECIMAL(38,0)) AS q2
      |  FROM bars, tot),
      |zs AS (
      |  SELECT q.n, CAST(c * q.n - q.sc AS DOUBLE) / sqrt(CAST(q.q2 AS DOUBLE) / q.n) AS z
      |  FROM bars, q2f q),
      |gb AS (
      |  SELECT max(n) AS n,
      |    CAST(sum(CAST(floor(z * z * z * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 / max(n) AS g1,
      |    CAST(sum(CAST(floor(z * z * z * z * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 / max(n) AS b2
      |  FROM zs),
      |t1 AS (
      |  SELECT n, g1, b2,
      |    g1 * sqrt((CAST(n AS DOUBLE) + 1) * (n + 3) / (6.0 * (n - 2))) AS y,
      |    3.0 * (CAST(n AS DOUBLE) * n + 27 * n - 70) * (n + 1) * (n + 3)
      |      / ((CAST(n AS DOUBLE) - 2) * (n + 5) * (n + 7) * (n + 9)) AS beta2,
      |    3.0 * (CAST(n AS DOUBLE) - 1) / (n + 1) AS ek,
      |    24.0 * n * (CAST(n AS DOUBLE) - 2) * (n - 3)
      |      / ((CAST(n AS DOUBLE) + 1) * (n + 1) * (n + 3) * (n + 5)) AS vk,
      |    6.0 * (CAST(n AS DOUBLE) * n - 5 * n + 2) / ((n + 7) * (n + 9))
      |      * sqrt(6.0 * (n + 3) * (n + 5) / (CAST(n AS DOUBLE) * (n - 2) * (n - 3))) AS beta1k
      |  FROM gb),
      |t2 AS (SELECT *, sqrt(2 * (beta2 - 1)) - 1 AS w2 FROM t1),
      |t3 AS (SELECT *, 1 / sqrt(ln(sqrt(w2))) AS delta, sqrt(2 / (w2 - 1)) AS alpha FROM t2),
      |t4 AS (
      |  SELECT n, g1, b2, beta1k,
      |    delta * ln(y / alpha + sqrt(y * y / (alpha * alpha) + 1)) AS z1,
      |    (b2 - ek) / sqrt(vk) AS xk
      |  FROM t3),
      |t5 AS (
      |  SELECT n, g1, b2, z1, xk,
      |    6 + 8 / beta1k * (2 / beta1k + sqrt(1 + 4 / (beta1k * beta1k))) AS aa
      |  FROM t4),
      |t6 AS (
      |  SELECT n, g1, b2, z1,
      |    ((1 - 2.0 / (9 * aa))
      |      - pow((1 - 2 / aa) / (1 + xk * sqrt(2 / (aa - 4))), CAST(1 AS DOUBLE) / 3))
      |    * sqrt(9 * aa / 2) AS z2
      |  FROM t5)
      |SELECT n, round(g1, 6) AS skewness, round(b2, 6) AS kurtosis_b2,
      |  round(z1, 6) AS z_skew, round(z2, 6) AS z_kurt,
      |  round(z1 * z1 + z2 * z2, 6) AS k2
      |FROM t6""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_spectral_decay" -> (embedSpectralDecay _),
    "embed_mahalanobis_diag" -> (embedMahalanobisDiag _),
    "embed_norm_quality_corr" -> (embedNormQualityCorr _),
    "stat_dagostino_k2" -> (statDagostinoK2 _),
  )

  val oracle: Map[String, String] = Map(
    "embed_spectral_decay" -> embedSpectralDecaySql,
    "embed_mahalanobis_diag" -> embedMahalanobisDiagSql,
    "embed_norm_quality_corr" -> embedNormQualityCorrSql,
    "stat_dagostino_k2" -> statDagostinoK2Sql,
  )
}
