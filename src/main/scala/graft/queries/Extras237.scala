package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 137 (C952–C955): distribution distance + robust fits +
  * calibration audit — the two-sample Cramér–von Mises EDF distance
  * (completing the C760s AD/Kuiper/BWS family), Siegel's repeated-
  * median slopes (the 50%-breakdown upgrade of C313 Theil–Sen), exact
  * LAD/median regression by basic-solution enumeration, and the
  * Hosmer–Lemeshow calibration χ² of a declared risk model.
  *
  * Shared discipline: CvM rides two exact GlobalRank prefix sums over
  * the pooled value histogram with the per-value ECDF gap quantized
  * ·10¹² before the weighted sum (exact BIGINT/DECIMAL core at any
  * corpus size); Siegel/LAD work on the FIXED 80-month calendar frame
  * (collected driver vector / bounded candidate enumeration — the
  * C870/C895 convention); HL quantizes the logistic score to the
  * 1e-12 grid so a 1-ulp exp() divergence can't propagate.
  */
object Extras237 {

  /** C952 stat_cvm_two_sample — two-sample Cramér–von Mises distance
    * between click and view event values: T = nm/(n+m)² · Σ_k w_k·
    * (F̂(v_k)−Ĝ(v_k))² over the pooled value histogram (the natural
    * tie-aware discrete form), ECDF gaps from exact integer cumulative
    * counts (m·cum1 − n·cum2), per-value gap² quantized ·10¹². Rejects
    * at the asymptotic α=0.05 critical 0.461. More sensitive than KS
    * to distribution-body differences; completes the EDF family.
    */
  def statCvmTwoSample(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).filter(col("event_type").isin("click", "view"))
      .select(col("event_type").as("grp"), col("value").as("v"))
    val pv = ev.groupBy("v").agg(
      sum(expr("CASE WHEN grp = 'click' THEN 1L ELSE 0L END")).cast("long").as("c1"),
      sum(expr("CASE WHEN grp = 'view' THEN 1L ELSE 0L END")).cast("long").as("c2"))
    // two prefix sums over the SAME v-order: one combined two-pass
    // machinery instead of two (r14, GlobalRank.withRankAndPrefixSums)
    val sp2 = graft.plans.GlobalRank.withRankAndPrefixSums(pv, None,
      Seq((col("c1"), "cb1"), (col("c2"), "cb2")), Seq(col("v").asc))
    // r14: totals off the pinned spine (exact longs), not a second
    // events scan + aggregation
    val tot = sp2.agg(sum(col("c1")).cast("long").as("n1"),
      sum(col("c2")).cast("long").as("n2"))
    sp2.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"), (col("c1") + col("c2")).as("w"),
        expr("""CAST(floor(
          |  (CAST(CAST(n2 AS DECIMAL(38,0)) * (cb1 + c1) - CAST(n1 AS DECIMAL(38,0)) * (cb2 + c2) AS DOUBLE)
          |   / (CAST(n1 AS DOUBLE) * n2))
          |  * (CAST(CAST(n2 AS DECIMAL(38,0)) * (cb1 + c1) - CAST(n1 AS DECIMAL(38,0)) * (cb2 + c2) AS DOUBLE)
          |   / (CAST(n1 AS DOUBLE) * n2)) * 1e12 + 0.5) AS BIGINT)""".stripMargin).as("q"))
      .groupBy()
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * q")).cast("decimal(38,0)").as("sq"))
      .selectExpr("n1", "n2",
        """round(CAST(n1 AS DOUBLE) * n2 / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2))
          | * (CAST(sq AS DOUBLE) / 1e12), 6) AS t_stat""".stripMargin)
      .selectExpr("n1", "n2", "t_stat", "t_stat > 0.461 AS reject_same_dist")
  }
  val statCvmTwoSampleSql: String =
    """WITH ev AS (
      |  SELECT event_type AS grp, value AS v FROM events
      |  WHERE event_type IN ('click', 'view')),
      |pv AS (
      |  SELECT v,
      |    CAST(sum(CASE WHEN grp = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN grp = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM ev GROUP BY 1),
      |spine AS (
      |  SELECT v, c1, c2,
      |    CAST(coalesce(sum(c1) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb1,
      |    CAST(coalesce(sum(c2) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb2
      |  FROM pv),
      |tot AS (
      |  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM pv),
      |qv AS (
      |  SELECT n1, n2, c1 + c2 AS w,
      |    CAST(floor(
      |      (CAST(CAST(n2 AS DECIMAL(38,0)) * (cb1 + c1) - CAST(n1 AS DECIMAL(38,0)) * (cb2 + c2) AS DOUBLE)
      |       / (CAST(n1 AS DOUBLE) * n2))
      |      * (CAST(CAST(n2 AS DECIMAL(38,0)) * (cb1 + c1) - CAST(n1 AS DECIMAL(38,0)) * (cb2 + c2) AS DOUBLE)
      |       / (CAST(n1 AS DOUBLE) * n2)) * 1e12 + 0.5) AS BIGINT) AS q
      |  FROM spine, tot),
      |agg AS (
      |  SELECT max(n1) AS n1, max(n2) AS n2,
      |    CAST(sum(CAST(w AS DECIMAL(38,0)) * q) AS DECIMAL(38,0)) AS sq
      |  FROM qv),
      |fin AS (
      |  SELECT n1, n2,
      |    round(CAST(n1 AS DOUBLE) * n2 / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2))
      |     * (CAST(sq AS DOUBLE) / 1e12), 6) AS t_stat
      |  FROM agg)
      |SELECT n1, n2, t_stat, t_stat > 0.461 AS reject_same_dist FROM fin""".stripMargin

  /** C953 stat_siegel_slopes — Siegel's repeated-median trend on
    * monthly revenue: for each month i the median of pairwise slopes
    * to every other month, then the median of those per-month medians
    * (50% breakdown vs Theil–Sen's 29%). Median convention in BOTH
    * engines: sort, odd→middle, even→mean of the two middles. The
    * 80-month calendar frame is collected (the C870 convention); the
    * oracle replays with row_number position selection.
    */
  def statSiegelSlopes(s: SparkSession, d: String): DataFrame = {
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .orderBy("m").collect().map(_.getLong(1))
    val n = ms.length
    def med(xs: Array[Double]): Double = {
      val so = xs.sorted
      val k = so.length
      if (k % 2 == 1) so(k / 2) else (so(k / 2 - 1) + so(k / 2)) / 2
    }
    val perI = (0 until n).map { i =>
      med((0 until n).filter(_ != i)
        .map(j => (ms(j) - ms(i)).toDouble / (j - i)).toArray)
    }.toArray
    val b = med(perI)
    val a = med(ms.indices.map(i => ms(i) - b * (i + 1)).toArray)
    import s.implicits._
    Seq((n.toLong, b, a)).toDF("n0", "b", "a")
      .selectExpr("n0 AS n_months",
        "round(b / 100, 6) AS slope_dollars_per_month",
        "round(a / 100, 2) AS intercept_dollars")
  }
  val statSiegelSlopesSql: String =
    """WITH seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t, v FROM (
      |    SELECT date_trunc('month', o_orderdate) AS m,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1)),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seq),
      |slopes AS (
      |  SELECT a.t AS i, b.t AS j,
      |    CAST(b.v - a.v AS DOUBLE) / (b.t - a.t) AS sl
      |  FROM seq a JOIN seq b ON a.t <> b.t),
      |ranked AS (
      |  SELECT i, sl,
      |    row_number() OVER (PARTITION BY i ORDER BY sl, j) AS rn,
      |    count(*) OVER (PARTITION BY i) AS k
      |  FROM slopes),
      |peri AS (
      |  SELECT i, avg(sl) AS msl FROM ranked
      |  WHERE rn IN ((k + 1) // 2, (k + 2) // 2) GROUP BY i),
      |rb AS (
      |  SELECT msl, row_number() OVER (ORDER BY msl, i) AS rn,
      |    count(*) OVER () AS k
      |  FROM peri),
      |bfin AS (
      |  SELECT avg(msl) AS b FROM rb WHERE rn IN ((k + 1) // 2, (k + 2) // 2)),
      |resid AS (
      |  SELECT v - b * t AS e, row_number() OVER (ORDER BY v - b * t, t) AS rn,
      |    count(*) OVER () AS k
      |  FROM seq, bfin),
      |afin AS (
      |  SELECT avg(e) AS a FROM resid WHERE rn IN ((k + 1) // 2, (k + 2) // 2))
      |SELECT n AS n_months,
      |  round(b / 100, 6) AS slope_dollars_per_month,
      |  round(a / 100, 2) AS intercept_dollars
      |FROM nn, bfin, afin""".stripMargin

  /** C954 stat_lad_regression — exact least-absolute-deviations
    * (median) regression of monthly revenue on time: an LAD optimum
    * passes through two data points, so enumerate all C(80,2) basic
    * lines, score Σ|residual| with per-term rounding to integer cents
    * (exact BIGINT loss — double sums would be partition-order-
    * dependent), argmin with the (loss, i, j) total order. The robust
    * companion OLS quotes when outlier months drag the L2 fit.
    */
  def statLadRegression(s: SparkSession, d: String): DataFrame = {
    val seq0 = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .select(expr("CAST(row_number() OVER (ORDER BY m) AS BIGINT)").as("t"), col("v"))
      .localCheckpoint(true) // bounded 80-row calendar frame, consumed 3x
    val cand = seq0.selectExpr("t AS ti", "v AS vi")
      .join(seq0.selectExpr("t AS tj", "v AS vj"), expr("ti < tj"))
      .selectExpr("ti", "tj",
        "CAST(vj - vi AS DOUBLE) / (tj - ti) AS b",
        "vi - CAST(vj - vi AS DOUBLE) / (tj - ti) * ti AS a")
    val scored = cand.crossJoin(broadcast(seq0))
      .select(col("ti"), col("tj"), col("a"), col("b"),
        expr("CAST(floor(abs(v - a - b * t) + 0.5) AS BIGINT)").as("q"))
      .groupBy("ti", "tj", "a", "b")
      .agg(sum(col("q")).cast("long").as("loss"), count(lit(1)).cast("long").as("nm"))
    scored.orderBy(col("loss"), col("ti"), col("tj")).limit(1)
      .selectExpr("nm AS n_months",
        "round(b / 100, 6) AS slope_dollars_per_month",
        "round(a / 100, 2) AS intercept_dollars",
        "round(CAST(loss AS DOUBLE) / 100, 2) AS total_abs_dev_dollars")
  }
  val statLadRegressionSql: String =
    """WITH seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t, v FROM (
      |    SELECT date_trunc('month', o_orderdate) AS m,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1)),
      |cand AS (
      |  SELECT a.t AS ti, b.t AS tj,
      |    CAST(b.v - a.v AS DOUBLE) / (b.t - a.t) AS b,
      |    a.v - CAST(b.v - a.v AS DOUBLE) / (b.t - a.t) * a.t AS a
      |  FROM seq a JOIN seq b ON a.t < b.t),
      |scored AS (
      |  SELECT ti, tj, a, b,
      |    CAST(sum(CAST(floor(abs(v - a - b * t) + 0.5) AS BIGINT)) AS BIGINT) AS loss,
      |    CAST(count(*) AS BIGINT) AS nm
      |  FROM cand, seq GROUP BY 1, 2, 3, 4)
      |SELECT nm AS n_months,
      |  round(b / 100, 6) AS slope_dollars_per_month,
      |  round(a / 100, 2) AS intercept_dollars,
      |  round(CAST(loss AS DOUBLE) / 100, 2) AS total_abs_dev_dollars
      |FROM scored ORDER BY loss, ti, tj LIMIT 1""".stripMargin

  /** C955 stat_hosmer_lemeshow — the Hosmer–Lemeshow calibration χ² of
    * a DECLARED logistic risk model (p̂ = σ(−0.7 + 3·l_discount), the
    * kind of fixed scoring rule a production filter ships) against the
    * observed return-flag rate, grouped by the model's 11 natural risk
    * strata: Σ (O−np̂)²/(np̂(1−p̂)) with p̂ quantized to the 1e-12 grid
    * (a 1-ulp exp divergence can't flip the floor) and per-stratum
    * terms quantized ·10⁶ into an exact integer sum. dof = g−2, α=0.05
    * critical 16.919. The calibration audit any deployed score owes.
    */
  def statHosmerLemeshow(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .groupBy(col("l_discount").as("x"))
      .agg(count(lit(1)).cast("long").as("n_g"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END"))
          .cast("long").as("o_g"))
      .withColumn("pq", expr(
        "CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * x))) + 0.5) AS BIGINT)"))
      .withColumn("p", expr("CAST(pq AS DOUBLE) / 1e12"))
      .withColumn("q", expr(
        """CAST(floor((o_g - n_g * p) * (o_g - n_g * p)
          |  / (n_g * p * (1 - p)) * 1e6 + 0.5) AS BIGINT)""".stripMargin))
    g.groupBy()
      .agg(count(lit(1)).cast("long").as("n_groups"),
        sum(col("q")).cast("long").as("sq"))
      .selectExpr("n_groups", "n_groups - 2 AS dof",
        "round(CAST(sq AS DOUBLE) / 1e6, 4) AS hl_chi2",
        "CAST(sq AS DOUBLE) / 1e6 > 16.919 AS reject_calibration")
  }
  val statHosmerLemeshowSql: String =
    """WITH g AS (
      |  SELECT l_discount AS x, CAST(count(*) AS BIGINT) AS n_g,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS o_g
      |  FROM lineitem GROUP BY 1),
      |scored AS (
      |  SELECT n_g, o_g,
      |    CAST(CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * x))) + 0.5) AS BIGINT) AS DOUBLE) / 1e12 AS p
      |  FROM g),
      |qs AS (
      |  SELECT CAST(floor((o_g - n_g * p) * (o_g - n_g * p)
      |    / (n_g * p * (1 - p)) * 1e6 + 0.5) AS BIGINT) AS q
      |  FROM scored),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_groups, CAST(sum(q) AS BIGINT) AS sq FROM qs)
      |SELECT n_groups, n_groups - 2 AS dof,
      |  round(CAST(sq AS DOUBLE) / 1e6, 4) AS hl_chi2,
      |  CAST(sq AS DOUBLE) / 1e6 > 16.919 AS reject_calibration
      |FROM agg""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_cvm_two_sample" -> (statCvmTwoSample _),
    "stat_siegel_slopes" -> (statSiegelSlopes _),
    "stat_lad_regression" -> (statLadRegression _),
    "stat_hosmer_lemeshow" -> (statHosmerLemeshow _),
  )

  val oracle: Map[String, String] = Map(
    "stat_cvm_two_sample" -> statCvmTwoSampleSql,
    "stat_siegel_slopes" -> statSiegelSlopesSql,
    "stat_lad_regression" -> statLadRegressionSql,
    "stat_hosmer_lemeshow" -> statHosmerLemeshowSql,
  )
}
