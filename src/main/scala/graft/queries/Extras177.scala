package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 77 (C712–C715): reliability + survey-design + transform
  * selection — Cronbach's α, one-way ICC, the cluster-sampling design
  * effect, and the Box–Cox profile-likelihood grid.
  *
  * Shared discipline: subject/group moment sums stay exact (cents in
  * DECIMAL(38,0); n·Σx²−(Σx)² forms), per-group rationals are
  * quantized BEFORE the distributed sum (floor(x·scale+0.5) — the
  * order-independence idiom), and every statistic is closed-form over
  * one aggregated row. Transform values (powers/logs) are per-row
  * deterministic doubles quantized at 1e6 before summing, the same
  * contract every entropy/log row in the suite relies on.
  */
object Extras177 {

  /** C712 stat_cronbach_alpha — internal-consistency reliability of
    * the 4 quarter-of-year spend "items" across customers:
    * α = k/(k−1)·(1 − Σᵢs²ᵢ/s²_tot). One orders scan → per-customer
    * conditional quarter sums (missing quarter = 0 spend, a real
    * zero), item and total variances from exact cent moments.
    */
  def statCronbachAlpha(s: SparkSession, d: String): DataFrame = {
    val per = orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(
        sum(expr("CASE WHEN quarter(o_orderdate) = 1 THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0L END")).cast("decimal(38,0)").as("q1"),
        sum(expr("CASE WHEN quarter(o_orderdate) = 2 THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0L END")).cast("decimal(38,0)").as("q2"),
        sum(expr("CASE WHEN quarter(o_orderdate) = 3 THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0L END")).cast("decimal(38,0)").as("q3"),
        sum(expr("CASE WHEN quarter(o_orderdate) = 4 THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0L END")).cast("decimal(38,0)").as("q4"))
      .withColumn("t", expr("q1 + q2 + q3 + q4"))
    per.agg(count(lit(1)).cast("long").as("n"),
        sum(col("q1")).cast("decimal(38,0)").as("s1"),
        sum(expr("q1 * q1")).cast("decimal(38,0)").as("w1"),
        sum(col("q2")).cast("decimal(38,0)").as("s2"),
        sum(expr("q2 * q2")).cast("decimal(38,0)").as("w2"),
        sum(col("q3")).cast("decimal(38,0)").as("s3"),
        sum(expr("q3 * q3")).cast("decimal(38,0)").as("w3"),
        sum(col("q4")).cast("decimal(38,0)").as("s4"),
        sum(expr("q4 * q4")).cast("decimal(38,0)").as("w4"),
        sum(col("t")).cast("decimal(38,0)").as("st"),
        sum(expr("t * t")).cast("decimal(38,0)").as("wt"))
      .selectExpr("n",
        """(CAST(CAST(n AS DECIMAL(38,0)) * w1 - s1 * s1 AS DOUBLE)
          | + CAST(CAST(n AS DECIMAL(38,0)) * w2 - s2 * s2 AS DOUBLE)
          | + CAST(CAST(n AS DECIMAL(38,0)) * w3 - s3 * s3 AS DOUBLE)
          | + CAST(CAST(n AS DECIMAL(38,0)) * w4 - s4 * s4 AS DOUBLE)) AS item_var_num""".stripMargin,
        "CAST(CAST(n AS DECIMAL(38,0)) * wt - st * st AS DOUBLE) AS tot_var_num")
      .selectExpr("n", "4 AS k",
        "round(item_var_num / tot_var_num, 6) AS item_share",
        "round(4.0 / 3 * (1 - item_var_num / tot_var_num), 6) AS alpha")
  }
  val statCronbachAlphaSql: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |    CAST(sum(CASE WHEN quarter(o_orderdate) = 1 THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0 END) AS DECIMAL(38,0)) AS q1,
      |    CAST(sum(CASE WHEN quarter(o_orderdate) = 2 THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0 END) AS DECIMAL(38,0)) AS q2,
      |    CAST(sum(CASE WHEN quarter(o_orderdate) = 3 THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0 END) AS DECIMAL(38,0)) AS q3,
      |    CAST(sum(CASE WHEN quarter(o_orderdate) = 4 THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0 END) AS DECIMAL(38,0)) AS q4
      |  FROM orders GROUP BY 1),
      |pt AS (SELECT *, q1 + q2 + q3 + q4 AS t FROM per),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(q1) AS DECIMAL(38,0)) AS s1, CAST(sum(q1 * q1) AS DECIMAL(38,0)) AS w1,
      |    CAST(sum(q2) AS DECIMAL(38,0)) AS s2, CAST(sum(q2 * q2) AS DECIMAL(38,0)) AS w2,
      |    CAST(sum(q3) AS DECIMAL(38,0)) AS s3, CAST(sum(q3 * q3) AS DECIMAL(38,0)) AS w3,
      |    CAST(sum(q4) AS DECIMAL(38,0)) AS s4, CAST(sum(q4 * q4) AS DECIMAL(38,0)) AS w4,
      |    CAST(sum(t) AS DECIMAL(38,0)) AS st, CAST(sum(t * t) AS DECIMAL(38,0)) AS wt
      |  FROM pt),
      |m AS (
      |  SELECT n,
      |    (CAST(CAST(n AS DECIMAL(38,0)) * w1 - s1 * s1 AS DOUBLE)
      |     + CAST(CAST(n AS DECIMAL(38,0)) * w2 - s2 * s2 AS DOUBLE)
      |     + CAST(CAST(n AS DECIMAL(38,0)) * w3 - s3 * s3 AS DOUBLE)
      |     + CAST(CAST(n AS DECIMAL(38,0)) * w4 - s4 * s4 AS DOUBLE)) AS item_var_num,
      |    CAST(CAST(n AS DECIMAL(38,0)) * wt - st * st AS DOUBLE) AS tot_var_num
      |  FROM agg)
      |SELECT n, 4 AS k,
      |  round(item_var_num / tot_var_num, 6) AS item_share,
      |  round(4.0 / 3 * (1 - item_var_num / tot_var_num), 6) AS alpha
      |FROM m""".stripMargin

  /** C713 stat_icc_oneway — ICC(1,1) of line-item price within
    * suppliers: one-way ANOVA with the unequal-group-size k₀
    * correction (k₀ = (N − Σn²_g/N)/(g−1)); per-group S²_g/n_g
    * rationals quantized to integer cents² before the distributed sum.
    * The "how much does the supplier explain" number — also the ROH
    * that C714's design effect consumes.
    */
  def statIccOneway(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .select(col("l_suppkey"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(col("c")).cast("decimal(38,0)").as("sg"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("qg"))
    g.agg(count(lit(1)).cast("long").as("g"),
        sum(col("ng")).cast("long").as("n"),
        sum(col("sg")).cast("decimal(38,0)").as("st"),
        sum(col("qg")).cast("decimal(38,0)").as("qt"),
        sum(expr("CAST(ng AS DECIMAL(38,0)) * ng")).cast("decimal(38,0)").as("n2"),
        sum(expr("CAST(floor(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng + 0.5) AS DECIMAL(38,0))"))
          .cast("decimal(38,0)").as("sbq"))
      .selectExpr("g", "n",
        "CAST(sbq AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / n AS ssb",
        "CAST(qt AS DOUBLE) - CAST(sbq AS DOUBLE) AS ssw",
        "(n - CAST(n2 AS DOUBLE) / n) / (g - 1) AS k0")
      .selectExpr("g", "n", "round(k0, 4) AS k0",
        "ssb / (g - 1) AS msb", "ssw / (n - g) AS msw")
      .selectExpr("g", "n", "k0",
        "round((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc1")
  }
  val statIccOnewaySql: String =
    """WITH gr AS (
      |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sg,
      |    CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS DECIMAL(38,0))
      |      * CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS qg
      |  FROM lineitem GROUP BY 1),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS g, CAST(sum(ng) AS BIGINT) AS n,
      |    CAST(sum(sg) AS DECIMAL(38,0)) AS st, CAST(sum(qg) AS DECIMAL(38,0)) AS qt,
      |    CAST(sum(CAST(ng AS DECIMAL(38,0)) * ng) AS DECIMAL(38,0)) AS n2,
      |    CAST(sum(CAST(floor(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sbq
      |  FROM gr),
      |m AS (
      |  SELECT g, n,
      |    CAST(sbq AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / n AS ssb,
      |    CAST(qt AS DOUBLE) - CAST(sbq AS DOUBLE) AS ssw,
      |    (n - CAST(n2 AS DOUBLE) / n) / (g - 1) AS k0
      |  FROM agg),
      |m2 AS (SELECT g, n, round(k0, 4) AS k0, ssb / (g - 1) AS msb, ssw / (n - g) AS msw FROM m)
      |SELECT g, n, k0,
      |  round((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc1
      |FROM m2""".stripMargin

  /** C714 sample_cluster_deff — the cluster-sampling design effect on
    * account balance with customers clustered by nation:
    * DEFF = 1 + (k₀−1)·ROH (ROH = the one-way ICC), effective sample
    * size n_eff = n/DEFF — how many i.i.d. customers a nation-
    * clustered sample is actually worth. Negative balances make the
    * cents exactness non-trivial (signed DECIMAL sums).
    */
  def sampleClusterDeff(s: SparkSession, d: String): DataFrame = {
    val g = customer(s, d)
      .select(col("c_nationkey"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(col("c")).cast("decimal(38,0)").as("sg"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("qg"))
    g.agg(count(lit(1)).cast("long").as("g"),
        sum(col("ng")).cast("long").as("n"),
        sum(col("sg")).cast("decimal(38,0)").as("st"),
        sum(col("qg")).cast("decimal(38,0)").as("qt"),
        sum(expr("CAST(ng AS DECIMAL(38,0)) * ng")).cast("decimal(38,0)").as("n2"),
        sum(expr("CAST(floor(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng + 0.5) AS DECIMAL(38,0))"))
          .cast("decimal(38,0)").as("sbq"))
      .selectExpr("g", "n",
        "CAST(sbq AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / n AS ssb",
        "CAST(qt AS DOUBLE) - CAST(sbq AS DOUBLE) AS ssw",
        "(n - CAST(n2 AS DOUBLE) / n) / (g - 1) AS k0")
      .selectExpr("g", "n", "k0",
        "(ssb / (g - 1)) AS msb", "(ssw / (n - g)) AS msw")
      .selectExpr("g", "n", "round(k0, 4) AS k0",
        "round((msb - msw) / (msb + (k0 - 1) * msw), 6) AS roh")
      .selectExpr("g", "n", "k0", "roh",
        "round(1 + (k0 - 1) * roh, 6) AS deff",
        "round(n / (1 + (k0 - 1) * roh), 2) AS n_eff")
  }
  val sampleClusterDeffSql: String =
    """WITH gr AS (
      |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sg,
      |    CAST(sum(CAST(CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS DECIMAL(38,0))
      |      * CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS qg
      |  FROM customer GROUP BY 1),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS g, CAST(sum(ng) AS BIGINT) AS n,
      |    CAST(sum(sg) AS DECIMAL(38,0)) AS st, CAST(sum(qg) AS DECIMAL(38,0)) AS qt,
      |    CAST(sum(CAST(ng AS DECIMAL(38,0)) * ng) AS DECIMAL(38,0)) AS n2,
      |    CAST(sum(CAST(floor(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sbq
      |  FROM gr),
      |m AS (
      |  SELECT g, n,
      |    CAST(sbq AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / n AS ssb,
      |    CAST(qt AS DOUBLE) - CAST(sbq AS DOUBLE) AS ssw,
      |    (n - CAST(n2 AS DOUBLE) / n) / (g - 1) AS k0
      |  FROM agg),
      |m2 AS (SELECT g, n, k0, ssb / (g - 1) AS msb, ssw / (n - g) AS msw FROM m),
      |m3 AS (SELECT g, n, round(k0, 4) AS k0,
      |  round((msb - msw) / (msb + (k0 - 1) * msw), 6) AS roh FROM m2)
      |SELECT g, n, k0, roh,
      |  round(1 + (k0 - 1) * roh, 6) AS deff,
      |  round(n / (1 + (k0 - 1) * roh), 2) AS n_eff
      |FROM m3""".stripMargin

  /** C715 stat_box_cox_grid — the Box–Cox transform chooser: profile
    * log-likelihood LL(λ) = −n/2·ln(σ̂²_λ) + (λ−1)Σln y at the
    * canonical grid λ ∈ {−1, −½, 0, ½, 1} on order totals, in ONE
    * corpus scan (per-row explode of the 5 λ literals — no join, no
    * whitelist), transforms quantized at 1e6 before summing. Emits the
    * grid with the argmax flagged — the "should I log this metric"
    * answer.
    */
  def statBoxCoxGrid(s: SparkSession, d: String): DataFrame = {
    // one quantization of t per λ (scale matched to the transform's
    // value range: λ=−1 lives in (0,1), λ=1 in (0, 5e5)), then EXACT
    // integer moments of the quantized variable — n·Σq² − (Σq)² ≥ 0 by
    // construction, unlike quantizing t and t² separately (which made
    // the λ=−1 variance land negative from rounding)
    orders(s, d)
      .select(expr("CAST(o_totalprice AS DOUBLE)").as("y"))
      .select(col("y"), explode(expr("array(-1.0D, -0.5D, 0.0D, 0.5D, 1.0D)")).as("lam"))
      .select(col("lam"),
        expr("CASE WHEN lam = 0.0D THEN ln(y) ELSE (pow(y, lam) - 1) / lam END").as("t"),
        expr("ln(y)").as("ly"),
        expr("CASE WHEN lam < 0.0D THEN 1e12 WHEN lam < 1.0D THEN 1e9 ELSE 1e6 END").as("scale"))
      .select(col("lam"), col("scale"), col("ly"),
        expr("CAST(floor(t * scale + 0.5) AS DECIMAL(38,0))").as("q"))
      .groupBy("lam")
      .agg(count(lit(1)).cast("long").as("n"), max(col("scale")).as("scale"),
        sum(col("q")).cast("decimal(38,0)").as("st"),
        sum(expr("q * q")).cast("decimal(38,0)").as("qt"),
        sum(expr("CAST(floor(ly * 1e9 + 0.5) AS BIGINT)")).cast("decimal(38,0)").as("sly"))
      .selectExpr("lam", "n",
        """-CAST(n AS DOUBLE) / 2
          |  * ln(CAST(CAST(n AS DECIMAL(38,0)) * qt - st * st AS DOUBLE)
          |       / (CAST(n AS DOUBLE) * n) / (scale * scale))
          |+ (lam - 1) * CAST(sly AS DOUBLE) / 1e9 AS ll""".stripMargin)
      .selectExpr("lam", "n", "round(ll, 4) AS loglik",
        "CAST(rank() OVER (ORDER BY ll DESC) = 1 AS BOOLEAN) AS is_best")
      .orderBy("lam")
  }
  val statBoxCoxGridSql: String =
    """WITH lams AS (SELECT CAST(unnest([-1.0, -0.5, 0.0, 0.5, 1.0]) AS DOUBLE) AS lam),
      |t AS (
      |  SELECT lam,
      |    CASE WHEN lam = 0.0 THEN ln(CAST(o_totalprice AS DOUBLE))
      |      ELSE (pow(CAST(o_totalprice AS DOUBLE), lam) - 1) / lam END AS t,
      |    ln(CAST(o_totalprice AS DOUBLE)) AS ly,
      |    CASE WHEN lam < 0.0 THEN 1e12 WHEN lam < 1.0 THEN 1e9 ELSE 1e6 END AS scale
      |  FROM orders, lams),
      |q AS (
      |  SELECT lam, scale, ly, CAST(floor(t * scale + 0.5) AS DECIMAL(38,0)) AS q FROM t),
      |agg AS (
      |  SELECT lam, CAST(count(*) AS BIGINT) AS n, max(scale) AS scale,
      |    CAST(sum(q) AS DECIMAL(38,0)) AS st,
      |    CAST(sum(q * q) AS DECIMAL(38,0)) AS qt,
      |    CAST(sum(CAST(floor(ly * 1e9 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS sly
      |  FROM q GROUP BY 1),
      |m AS (
      |  SELECT lam, n,
      |    -CAST(n AS DOUBLE) / 2
      |      * ln(CAST(CAST(n AS DECIMAL(38,0)) * qt - st * st AS DOUBLE)
      |           / (CAST(n AS DOUBLE) * n) / (scale * scale))
      |    + (lam - 1) * CAST(sly AS DOUBLE) / 1e9 AS ll
      |  FROM agg)
      |SELECT lam, n, round(ll, 4) AS loglik,
      |  CAST(rank() OVER (ORDER BY ll DESC) = 1 AS BOOLEAN) AS is_best
      |FROM m ORDER BY lam""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_cronbach_alpha" -> (statCronbachAlpha _),
    "stat_icc_oneway" -> (statIccOneway _),
    "sample_cluster_deff" -> (sampleClusterDeff _),
    "stat_box_cox_grid" -> (statBoxCoxGrid _),
  )

  val oracle: Map[String, String] = Map(
    "stat_cronbach_alpha" -> statCronbachAlphaSql,
    "stat_icc_oneway" -> statIccOnewaySql,
    "sample_cluster_deff" -> sampleClusterDeffSql,
    "stat_box_cox_grid" -> statBoxCoxGridSql,
  )
}
