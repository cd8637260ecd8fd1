package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 116 (C868–C871): interpolation join + mixture modeling +
  * adaptive filtering + clustering agreement — the linear-interpolation
  * temporal join, 2-component Gaussian EM on a provably bounded
  * histogram, the local-level Kalman filter, and the adjusted Rand
  * index as exact pair-counting algebra.
  *
  * Shared discipline: per-user windows partition on the high-cardinality
  * key (never empty); EM/Kalman loops run over bounded dictionaries
  * (≤300 clamp-bounded bins / ≤84 calendar months) with recursive-CTE
  * oracles replaying identical literal arithmetic; responsibilities are
  * ·10¹²-quantized so every M-step sum is an exact integer.
  */
object Extras216 {

  /** C868 join_interpolation_asof — the linear-interpolation temporal
    * join: each `view` event gets the per-user `purchase` value
    * linearly interpolated between its bracketing purchases (LOCF at
    * the right edge, next-value at the left edge). Both brackets come
    * from ONE pass of per-user ordered windows (`last(..., ignoreNulls)`
    * over the preceding frame, `first(..., ignoreNulls)` over the
    * following frame) — partitioned on user_id, so the plan scales with
    * users, never a global sort. The sensor-fusion shape as-of joins
    * (B4–B11) can't express: as-of snaps to the LAST value; this
    * reconstructs the value BETWEEN samples.
    */
  def joinInterpolationAsof(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tsl"),
        col("event_type").as("et"),
        when(col("event_type") === "purchase",
          expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")).as("pv"),
        when(col("event_type") === "purchase",
          expr("unix_micros(CAST(ts AS TIMESTAMP))")).as("pt"))
    val wPrev = Window.partitionBy("user_id").orderBy(col("tsl"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy("user_id").orderBy(col("tsl"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    ev
      .withColumn("pv_prev", last(col("pv"), ignoreNulls = true).over(wPrev))
      .withColumn("pt_prev", last(col("pt"), ignoreNulls = true).over(wPrev))
      .withColumn("pv_next", first(col("pv"), ignoreNulls = true).over(wNext))
      .withColumn("pt_next", first(col("pt"), ignoreNulls = true).over(wNext))
      .filter(col("et") === "view")
      .filter(col("pv_prev").isNotNull || col("pv_next").isNotNull)
      .selectExpr("event_id", "user_id",
        """CASE WHEN pv_prev IS NULL THEN 'lead'
          |     WHEN pv_next IS NULL THEN 'locf'
          |     ELSE 'interp' END AS bracket""".stripMargin,
        """round(CASE
          |  WHEN pv_prev IS NULL THEN CAST(pv_next AS DOUBLE)
          |  WHEN pv_next IS NULL THEN CAST(pv_prev AS DOUBLE)
          |  ELSE pv_prev + (CAST(pv_next AS DOUBLE) - pv_prev)
          |    * (CAST(tsl - pt_prev AS DOUBLE) / (pt_next - pt_prev))
          |  END / 100, 6) AS interp_value""".stripMargin)
      .orderBy("event_id")
  }
  val joinInterpolationAsofSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id,
      |    epoch_us(ts) AS tsl, event_type AS et,
      |    CASE WHEN event_type = 'purchase'
      |      THEN CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) END AS pv,
      |    CASE WHEN event_type = 'purchase'
      |      THEN epoch_us(ts) END AS pt
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |br AS (
      |  SELECT event_id, user_id, tsl, et,
      |    last_value(pv IGNORE NULLS) OVER wp AS pv_prev,
      |    last_value(pt IGNORE NULLS) OVER wp AS pt_prev,
      |    first_value(pv IGNORE NULLS) OVER wn AS pv_next,
      |    first_value(pt IGNORE NULLS) OVER wn AS pt_next
      |  FROM ev
      |  WINDOW wp AS (PARTITION BY user_id ORDER BY tsl, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |  wn AS (PARTITION BY user_id ORDER BY tsl, event_id
      |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
      |SELECT event_id, user_id,
      |  CASE WHEN pv_prev IS NULL THEN 'lead'
      |       WHEN pv_next IS NULL THEN 'locf'
      |       ELSE 'interp' END AS bracket,
      |  round(CASE
      |    WHEN pv_prev IS NULL THEN CAST(pv_next AS DOUBLE)
      |    WHEN pv_next IS NULL THEN CAST(pv_prev AS DOUBLE)
      |    ELSE pv_prev + (CAST(pv_next AS DOUBLE) - pv_prev)
      |      * (CAST(tsl - pt_prev AS DOUBLE) / (pt_next - pt_prev))
      |    END / 100, 6) AS interp_value
      |FROM br
      |WHERE et = 'view' AND (pv_prev IS NOT NULL OR pv_next IS NOT NULL)
      |ORDER BY event_id""".stripMargin

  /** The E-step responsibility of component 1 for a bin midpoint m
    * (the 1/√2π factor cancels in the ratio), ·10¹²-quantized so every
    * M-step sum is exact integer algebra. Shared verbatim between the
    * Scala loop and the recursive-CTE oracle.
    */
  private def rqDuck(m: String, mu1: String, v1: String, mu2: String,
      v2: String, pi: String): String =
    s"""CAST(floor(
       |  ($pi * exp(-(($m - $mu1) * ($m - $mu1)) / (2 * $v1)) / sqrt($v1))
       |  / ($pi * exp(-(($m - $mu1) * ($m - $mu1)) / (2 * $v1)) / sqrt($v1)
       |     + (1 - $pi) * exp(-(($m - $mu2) * ($m - $mu2)) / (2 * $v2)) / sqrt($v2))
       |  * 1e12 + 0.5) AS HUGEINT)""".stripMargin

  /** C869 stat_gaussian_mixture_em — a 2-component Gaussian mixture
    * fitted by 8 fixed EM iterations to the order-total distribution,
    * binned into ≤300 clamp-bounded $2000 buckets (the provable-bound
    * idiom: the EM state is O(1), the only corpus pass is the
    * histogram). Responsibilities are ·10¹²-quantized so the M-step
    * sums Σc·r, Σc·r·m, Σc·r·m² are EXACT integers (component 2 by
    * exact complement against the constant bin moments); variances use
    * the one-pass E[x²]−μ² form with a ≥1 floor; init μ = mean ∓ sd
    * from exact moments. Scala loop vs recursive-CTE oracle carrying
    * the zipped bin lists — identical literal arithmetic.
    */
  def statGaussianMixtureEm(s: SparkSession, d: String): DataFrame = {
    val bins = orders(s, d)
      .groupBy(expr(
        """least(greatest(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
          |  div 200000, 0L), 299L)""".stripMargin).as("b"))
      .agg(count(lit(1)).cast("long").as("c"))
      .orderBy("b")
      .collect().map(r => (2000L * r.getLong(0) + 1000L, r.getLong(1)))
    val n = bins.map(_._2).sum
    val sm = bins.map { case (m, c) => BigInt(m) * c }.sum
    val smm = bins.map { case (m, c) => BigInt(m) * m * c }.sum
    val mean = sm.toDouble / n
    val vr = smm.toDouble / n - mean * mean
    var mu1 = mean - math.sqrt(vr); var v1 = vr
    var mu2 = mean + math.sqrt(vr); var v2 = vr
    var pi = 0.5
    for (_ <- 1 to 8) {
      var s0 = BigInt(0); var s1 = BigInt(0); var s2 = BigInt(0)
      bins.foreach { case (m, c) =>
        val p1 = pi * math.exp(-((m - mu1) * (m - mu1)) / (2 * v1)) / math.sqrt(v1)
        val p2 = (1 - pi) * math.exp(-((m - mu2) * (m - mu2)) / (2 * v2)) / math.sqrt(v2)
        val rq = BigInt(math.floor(p1 / (p1 + p2) * 1e12 + 0.5).toLong)
        s0 += rq * c; s1 += rq * c * m; s2 += rq * c * m * m
      }
      val t0 = BigInt(n) * BigInt("1000000000000") - s0
      val t1 = sm * BigInt("1000000000000") - s1
      val t2 = smm * BigInt("1000000000000") - s2
      pi = s0.toDouble / 1e12 / n
      mu1 = s1.toDouble / s0.toDouble
      v1 = math.max(s2.toDouble / s0.toDouble - mu1 * mu1, 1.0)
      mu2 = t1.toDouble / t0.toDouble
      v2 = math.max(t2.toDouble / t0.toDouble - mu2 * mu2, 1.0)
    }
    import s.implicits._
    Seq((n, pi, mu1, math.sqrt(v1), mu2, math.sqrt(v2)))
      .toDF("n0", "p0", "m1", "s1", "m2", "s2")
      .selectExpr("n0 AS n_orders", "round(p0, 6) AS pi1",
        "round(m1, 4) AS mu1_dollars", "round(s1, 4) AS sd1_dollars",
        "round(m2, 4) AS mu2_dollars", "round(s2, 4) AS sd2_dollars")
  }
  val statGaussianMixtureEmSql: String = {
    val rq = rqDuck("z[1]", "r.mu1", "r.v1", "r.mu2", "r.v2", "r.pi")
    s"""WITH RECURSIVE bins AS (
      |  SELECT least(greatest(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
      |      // 200000, 0), 299) AS b,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1),
      |bl AS (
      |  SELECT list(2000 * b + 1000 ORDER BY b) AS ms,
      |    list(c ORDER BY b) AS cs
      |  FROM bins),
      |mom AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(CAST(2000 * b + 1000 AS HUGEINT) * c) AS HUGEINT) AS sm,
      |    CAST(sum(CAST(2000 * b + 1000 AS HUGEINT) * (2000 * b + 1000) * c) AS HUGEINT) AS smm
      |  FROM bins),
      |init AS (
      |  SELECT n, sm, smm,
      |    CAST(sm AS DOUBLE) / n AS mean_,
      |    CAST(smm AS DOUBLE) / n - (CAST(sm AS DOUBLE) / n) * (CAST(sm AS DOUBLE) / n) AS vr
      |  FROM mom),
      |rec AS (
      |  SELECT 0 AS it, mean_ - sqrt(vr) AS mu1, vr AS v1,
      |    mean_ + sqrt(vr) AS mu2, vr AS v2, CAST(0.5 AS DOUBLE) AS pi
      |  FROM init
      |  UNION ALL
      |  SELECT r.it + 1,
      |    CAST(s.s1 AS DOUBLE) / CAST(s.s0 AS DOUBLE),
      |    greatest(CAST(s.s2 AS DOUBLE) / CAST(s.s0 AS DOUBLE)
      |      - (CAST(s.s1 AS DOUBLE) / CAST(s.s0 AS DOUBLE))
      |        * (CAST(s.s1 AS DOUBLE) / CAST(s.s0 AS DOUBLE)), 1.0),
      |    CAST(i.sm * CAST(1000000000000 AS HUGEINT) - s.s1 AS DOUBLE)
      |      / CAST(CAST(i.n AS HUGEINT) * 1000000000000 - s.s0 AS DOUBLE),
      |    greatest(CAST(i.smm * CAST(1000000000000 AS HUGEINT) - s.s2 AS DOUBLE)
      |      / CAST(CAST(i.n AS HUGEINT) * 1000000000000 - s.s0 AS DOUBLE)
      |      - (CAST(i.sm * CAST(1000000000000 AS HUGEINT) - s.s1 AS DOUBLE)
      |         / CAST(CAST(i.n AS HUGEINT) * 1000000000000 - s.s0 AS DOUBLE))
      |        * (CAST(i.sm * CAST(1000000000000 AS HUGEINT) - s.s1 AS DOUBLE)
      |           / CAST(CAST(i.n AS HUGEINT) * 1000000000000 - s.s0 AS DOUBLE)), 1.0),
      |    CAST(s.s0 AS DOUBLE) / 1e12 / i.n
      |  FROM rec r, bl, init i,
      |    LATERAL (SELECT
      |      list_sum(list_transform(list_zip(bl.ms, bl.cs),
      |        z -> CAST(z[2] AS HUGEINT) * ($rq))) AS s0,
      |      list_sum(list_transform(list_zip(bl.ms, bl.cs),
      |        z -> CAST(z[2] AS HUGEINT) * z[1] * ($rq))) AS s1,
      |      list_sum(list_transform(list_zip(bl.ms, bl.cs),
      |        z -> CAST(z[2] AS HUGEINT) * z[1] * z[1] * ($rq))) AS s2) s
      |  WHERE r.it < 8),
      |fin AS (SELECT * FROM rec WHERE it = 8)
      |SELECT i.n AS n_orders, round(f.pi, 6) AS pi1,
      |  round(f.mu1, 4) AS mu1_dollars, round(sqrt(f.v1), 4) AS sd1_dollars,
      |  round(f.mu2, 4) AS mu2_dollars, round(sqrt(f.v2), 4) AS sd2_dollars
      |FROM fin f, init i""".stripMargin
  }

  /** C870 time_kalman_level — the local-level (random-walk + noise)
    * Kalman filter over monthly revenue: noise scales set
    * deterministically from the exact first-difference variance
    * (q = V_d/10, r = V_d/2), diffuse start level₀ = x₀, P₀ = V_d;
    * 83 predict/update steps with adaptive gain K = P'/(P'+r) — the
    * adaptive-weighting upgrade over fixed-α SES (C865/C850). Scala
    * loop over the bounded month dictionary vs recursive-CTE oracle;
    * every input is an exact cent integer, the recursion doubles are
    * literal-identical.
    */
  def timeKalmanLevel(s: SparkSession, d: String): DataFrame = {
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .orderBy("m")
      .collect().map(_.getLong(1))
    val n = ms.length
    val ds = (1 until n).map(t => ms(t) - ms(t - 1))
    val nd = ds.length
    val sd1 = ds.map(BigInt(_)).sum
    val sd2 = ds.map(x => BigInt(x) * x).sum
    val vd = (nd.toDouble * sd2.toDouble - sd1.toDouble * sd1.toDouble) /
      (nd.toDouble * (nd - 1))
    val q = vd / 10; val r = vd / 2
    var lvl = ms(0).toDouble; var p = vd
    var kLast = 0.0
    for (t <- 1 until n) {
      val pp = p + q
      val k = pp / (pp + r)
      lvl = lvl + k * (ms(t) - lvl)
      p = (1 - k) * pp
      kLast = k
    }
    import s.implicits._
    Seq((n.toLong, lvl, kLast, p)).toDF("n0", "l0", "k0", "p0")
      .selectExpr("n0 AS n_months",
        "round(l0 / 100, 2) AS level_dollars",
        "round(k0, 6) AS gain_final",
        "round(sqrt(p0) / 100, 2) AS p_sd_dollars")
  }
  val timeKalmanLevelSql: String =
    """WITH RECURSIVE monthly AS (
      |  SELECT date_trunc('month', o_orderdate) AS m,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) - 1 AS BIGINT) AS t, v
      |  FROM monthly),
      |df AS (
      |  SELECT s.v - p.v AS d
      |  FROM seq s JOIN seq p ON p.t = s.t - 1),
      |vd AS (
      |  SELECT (CAST(count(*) AS DOUBLE) * CAST(sum(CAST(d AS HUGEINT) * d) AS DOUBLE)
      |      - CAST(CAST(sum(d) AS HUGEINT) AS DOUBLE) * CAST(CAST(sum(d) AS HUGEINT) AS DOUBLE))
      |    / (CAST(count(*) AS DOUBLE) * (count(*) - 1)) AS v
      |  FROM df),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seq),
      |rec AS (
      |  SELECT CAST(0 AS BIGINT) AS t, CAST(q.v AS DOUBLE) AS lvl,
      |    vd.v AS p, CAST(0 AS DOUBLE) AS k
      |  FROM seq q, vd WHERE q.t = 0
      |  UNION ALL
      |  SELECT r.t + 1,
      |    r.lvl + ((r.p + vd.v / 10) / ((r.p + vd.v / 10) + vd.v / 2))
      |      * (q.v - r.lvl),
      |    (1 - (r.p + vd.v / 10) / ((r.p + vd.v / 10) + vd.v / 2))
      |      * (r.p + vd.v / 10),
      |    (r.p + vd.v / 10) / ((r.p + vd.v / 10) + vd.v / 2)
      |  FROM rec r JOIN seq q ON q.t = r.t + 1, vd),
      |fin AS (SELECT * FROM rec ORDER BY t DESC LIMIT 1)
      |SELECT nn.n AS n_months,
      |  round(fin.lvl / 100, 2) AS level_dollars,
      |  round(fin.k, 6) AS gain_final,
      |  round(sqrt(fin.p) / 100, 2) AS p_sd_dollars
      |FROM fin, nn""".stripMargin

  /** C871 embed_adjusted_rand_index — chance-corrected agreement
    * between a deterministic 16-cell sign-code clustering (sign bits of
    * dims 1/17/33/49) and the ground-truth labels: the full ARI from
    * the bounded 16×L contingency table as EXACT pair-counting algebra
    * — every C(·,2) an exact integer, the chance correction cleared of
    * divisions (num = 2·Σᵢⱼ(ⁿᵢⱼ₂)·(ⁿ₂) − 2·ΣᵢΣⱼ, den = (ⁿ₂)·(Σᵢ+Σⱼ) −
    * 2·ΣᵢΣⱼ), ONE final division. The chance-corrected complement of
    * `embed_cluster_purity`, which rewards degenerate many-cluster
    * solutions ARI punishes.
    */
  def embedAdjustedRandIndex(s: SparkSession, d: String): DataFrame = {
    val ct = embeddings(s, d)
      .select(expr(
        """(CASE WHEN element_at(embedding, 1) >= 0 THEN 8 ELSE 0 END)
          |+ (CASE WHEN element_at(embedding, 17) >= 0 THEN 4 ELSE 0 END)
          |+ (CASE WHEN element_at(embedding, 33) >= 0 THEN 2 ELSE 0 END)
          |+ (CASE WHEN element_at(embedding, 49) >= 0 THEN 1 ELSE 0 END)""".stripMargin)
        .as("cell"), col("label"))
      .groupBy("cell", "label")
      .agg(count(lit(1)).cast("long").as("nij"))
    def c2(e: String): String = s"CAST($e AS DECIMAL(38,0)) * ($e - 1) div 2"
    val index = ct.agg(
      sum(expr(c2("nij"))).cast("decimal(38,0)").as("sij"),
      sum(col("nij")).cast("long").as("n"),
      countDistinct(col("cell")).cast("long").as("n_cells"),
      countDistinct(col("label")).cast("long").as("n_labels"))
    val ai = ct.groupBy("cell").agg(sum(col("nij")).as("a"))
      .agg(sum(expr(c2("a"))).cast("decimal(38,0)").as("sa"))
    val bj = ct.groupBy("label").agg(sum(col("nij")).as("b"))
      .agg(sum(expr(c2("b"))).cast("decimal(38,0)").as("sb"))
    index.crossJoin(broadcast(ai)).crossJoin(broadcast(bj))
      .selectExpr("n", "n_cells", "n_labels",
        s"CAST(${c2("n")} AS DECIMAL(38,0)) AS cn", "sij", "sa", "sb")
      .selectExpr("n", "n_cells", "n_labels",
        """round(CAST(2 * sij * cn - 2 * sa * sb AS DOUBLE)
          |/ CAST(cn * (sa + sb) - 2 * sa * sb AS DOUBLE), 6) AS ari""".stripMargin)
  }
  val embedAdjustedRandIndexSql: String =
    """WITH ct AS (
      |  SELECT (CASE WHEN embedding[1] >= 0 THEN 8 ELSE 0 END)
      |    + (CASE WHEN embedding[17] >= 0 THEN 4 ELSE 0 END)
      |    + (CASE WHEN embedding[33] >= 0 THEN 2 ELSE 0 END)
      |    + (CASE WHEN embedding[49] >= 0 THEN 1 ELSE 0 END) AS cell,
      |    label, CAST(count(*) AS BIGINT) AS nij
      |  FROM embeddings GROUP BY 1, 2),
      |ix AS (
      |  SELECT CAST(sum(CAST(nij AS HUGEINT) * (nij - 1) // 2) AS DECIMAL(38,0)) AS sij,
      |    CAST(sum(nij) AS BIGINT) AS n,
      |    CAST(count(DISTINCT cell) AS BIGINT) AS n_cells,
      |    CAST(count(DISTINCT label) AS BIGINT) AS n_labels
      |  FROM ct),
      |ac AS (
      |  SELECT CAST(sum(CAST(a AS HUGEINT) * (a - 1) // 2) AS DECIMAL(38,0)) AS sa
      |  FROM (SELECT cell, CAST(sum(nij) AS BIGINT) AS a FROM ct GROUP BY 1)),
      |bc AS (
      |  SELECT CAST(sum(CAST(b AS HUGEINT) * (b - 1) // 2) AS DECIMAL(38,0)) AS sb
      |  FROM (SELECT label, CAST(sum(nij) AS BIGINT) AS b FROM ct GROUP BY 1)),
      |fin AS (
      |  SELECT i.n, i.n_cells, i.n_labels,
      |    CAST(CAST(i.n AS HUGEINT) * (i.n - 1) // 2 AS DECIMAL(38,0)) AS cn,
      |    i.sij, a.sa, b.sb
      |  FROM ix i, ac a, bc b)
      |SELECT n, n_cells, n_labels,
      |  round(CAST(2 * sij * cn - 2 * sa * sb AS DOUBLE)
      |    / CAST(cn * (sa + sb) - 2 * sa * sb AS DOUBLE), 6) AS ari
      |FROM fin""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_interpolation_asof" -> (joinInterpolationAsof _),
    "stat_gaussian_mixture_em" -> (statGaussianMixtureEm _),
    "time_kalman_level" -> (timeKalmanLevel _),
    "embed_adjusted_rand_index" -> (embedAdjustedRandIndex _),
  )

  val oracle: Map[String, String] = Map(
    "join_interpolation_asof" -> joinInterpolationAsofSql,
    "stat_gaussian_mixture_em" -> statGaussianMixtureEmSql,
    "time_kalman_level" -> timeKalmanLevelSql,
    "embed_adjusted_rand_index" -> embedAdjustedRandIndexSql,
  )
}
