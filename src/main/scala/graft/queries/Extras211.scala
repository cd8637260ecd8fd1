package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 111 (C848–C851): frequency-domain coupling + actuarial
  * development + exponential smoothing + residual autocorrelation —
  * Welch-averaged cross-spectral coherence, chain-ladder link ratios,
  * additive Holt–Winters, and the Breusch–Godfrey LM test.
  *
  * Shared discipline: every per-day trig/residual product is floored
  * to an integer BEFORE any cross-day sum (identical doubles → one
  * floor → exact integer reductions in both engines); segment/cohort/
  * month frames are calendar-bounded (the hardened gate proves them
  * corpus-independent); the one genuinely sequential recursion
  * (Holt–Winters) runs over the bounded ~84-month dictionary — Scala
  * loop here, recursive CTE in the oracle, identical literal
  * arithmetic text.
  */
object Extras211 {

  /** C848 time_cross_coherence — Welch-averaged magnitude-squared
    * coherence between daily revenue and daily order count at the
    * first 8 harmonics of a 256-observation segment: per-segment
    * Fourier sums from ·10³-floored per-day trig products (exact
    * integer reductions), cross/auto spectra as exact DECIMAL products
    * summed over segments, coh²_k = |ΣS_xy|²/(ΣS_xx·ΣS_yy) in one
    * final double expression. Unsmoothed single-segment coherence is
    * identically 1 — the segment averaging is what makes the number
    * informative.
    */
  def timeCrossCoherence(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("x"),
        count(lit(1)).cast("long").as("y"))
      .withColumn("t", expr("CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT)"))
      .withColumn("seg", expr("t div 256"))
      .withColumn("u", expr("t % 256"))
    val binned = daily
      .select(col("seg"), col("u"), col("x"), col("y"),
        explode(expr("sequence(1, 8)")).as("k"))
      .select(col("seg"), col("k"),
        expr("CAST(floor(x * cos(2 * pi() * k * u / 256) * 1e3) AS BIGINT)").as("xc"),
        expr("CAST(floor(x * sin(2 * pi() * k * u / 256) * 1e3) AS BIGINT)").as("xs"),
        expr("CAST(floor(y * cos(2 * pi() * k * u / 256) * 1e3) AS BIGINT)").as("yc"),
        expr("CAST(floor(y * sin(2 * pi() * k * u / 256) * 1e3) AS BIGINT)").as("ys"))
    // full segments only: count of days per seg — join the seg sizes
    val segSize = daily.groupBy("seg").agg(count(lit(1)).cast("long").as("m"))
    val perSeg = binned.join(segSize, Seq("seg")).filter(col("m") === 256)
      .groupBy("seg", "k")
      .agg(sum(col("xc")).cast("decimal(38,0)").as("ax"),
        sum(col("xs")).cast("decimal(38,0)").as("bx"),
        sum(col("yc")).cast("decimal(38,0)").as("ay"),
        sum(col("ys")).cast("decimal(38,0)").as("by"))
    perSeg.groupBy("k")
      .agg(count(lit(1)).cast("long").as("n_segs"),
        sum(expr("ax * ay + bx * by")).cast("decimal(38,0)").as("re"),
        sum(expr("bx * ay - ax * by")).cast("decimal(38,0)").as("im"),
        sum(expr("ax * ax + bx * bx")).cast("decimal(38,0)").as("pxx"),
        sum(expr("ay * ay + by * by")).cast("decimal(38,0)").as("pyy"))
      .selectExpr("CAST(k AS INT) AS k", "n_segs",
        """CASE WHEN CAST(pxx AS DOUBLE) * CAST(pyy AS DOUBLE) = 0 THEN 0.0D
          |ELSE round((CAST(re AS DOUBLE) * CAST(re AS DOUBLE)
          |            + CAST(im AS DOUBLE) * CAST(im AS DOUBLE))
          |  / (CAST(pxx AS DOUBLE) * CAST(pyy AS DOUBLE)), 6) END AS coherence2""".stripMargin)
      .orderBy("k")
  }
  val timeCrossCoherenceSql: String =
    """WITH daily0 AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS x,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |daily AS (
      |  SELECT x, y,
      |    CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) // 256 AS seg,
      |    CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) % 256 AS u
      |  FROM daily0),
      |segsize AS (SELECT seg, CAST(count(*) AS BIGINT) AS m FROM daily GROUP BY 1),
      |binned AS (
      |  SELECT d.seg, ks.k,
      |    CAST(floor(d.x * cos(2 * pi() * ks.k * d.u / 256) * 1e3) AS BIGINT) AS xc,
      |    CAST(floor(d.x * sin(2 * pi() * ks.k * d.u / 256) * 1e3) AS BIGINT) AS xs,
      |    CAST(floor(d.y * cos(2 * pi() * ks.k * d.u / 256) * 1e3) AS BIGINT) AS yc,
      |    CAST(floor(d.y * sin(2 * pi() * ks.k * d.u / 256) * 1e3) AS BIGINT) AS ys
      |  FROM daily d
      |  JOIN segsize z ON z.seg = d.seg AND z.m = 256
      |  CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS k) ks),
      |perseg AS (
      |  SELECT seg, k,
      |    CAST(sum(xc) AS DECIMAL(38,0)) AS ax, CAST(sum(xs) AS DECIMAL(38,0)) AS bx,
      |    CAST(sum(yc) AS DECIMAL(38,0)) AS ay, CAST(sum(ys) AS DECIMAL(38,0)) AS by
      |  FROM binned GROUP BY 1, 2),
      |ag AS (
      |  SELECT k, CAST(count(*) AS BIGINT) AS n_segs,
      |    CAST(sum(ax * ay + bx * by) AS DECIMAL(38,0)) AS re,
      |    CAST(sum(bx * ay - ax * by) AS DECIMAL(38,0)) AS im,
      |    CAST(sum(ax * ax + bx * bx) AS DECIMAL(38,0)) AS pxx,
      |    CAST(sum(ay * ay + by * by) AS DECIMAL(38,0)) AS pyy
      |  FROM perseg GROUP BY 1)
      |SELECT CAST(k AS INT) AS k, n_segs,
      |  CASE WHEN CAST(pxx AS DOUBLE) * CAST(pyy AS DOUBLE) = 0 THEN 0.0
      |  ELSE round((CAST(re AS DOUBLE) * CAST(re AS DOUBLE)
      |              + CAST(im AS DOUBLE) * CAST(im AS DOUBLE))
      |    / (CAST(pxx AS DOUBLE) * CAST(pyy AS DOUBLE)), 6) END AS coherence2
      |FROM ag ORDER BY k""".stripMargin

  /** C849 analytics_chain_ladder — the chain-ladder development
    * triangle on order cohorts: cohort i = order month, development
    * lag k = whole months from order to ship, cumulative shipped
    * revenue C_{i,k} (exact cents, bounded per-cohort cum window),
    * volume-weighted link ratios f_k = ΣᵢC_{i,k+1}/ΣᵢC_{i,k} over
    * cohorts observed at both lags. The synthetic generator draws ship
    * dates independently of order dates, so the triangle is restricted
    * to the development half (lag 0..24) and reported through lag 6 —
    * the actuarial projection-factor battery shape regardless. */
  def analyticsChainLadder(s: SparkSession, d: String): DataFrame = {
    val cells = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey"))
      .select(expr("date_trunc('month', o_orderdate)").as("cohort"),
        expr("CAST(months_between(date_trunc('month', l_shipdate), date_trunc('month', o_orderdate)) AS INT)").as("lag"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("amt"))
      .filter(col("lag") >= 0 && col("lag") <= 24)
      .groupBy("cohort", "lag")
      .agg(sum(col("amt")).cast("decimal(38,0)").as("inc"))
    val wcum = Window.partitionBy("cohort").orderBy(col("lag").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = cells.withColumn("c", sum(col("inc")).over(wcum).cast("decimal(38,0)"))
    val nxt = cum.select(col("cohort"), (col("lag") - 1).as("lag"), col("c").as("c_next"))
    cum.join(nxt, Seq("cohort", "lag"))
      .groupBy("lag")
      .agg(count(lit(1)).cast("long").as("n_cohorts"),
        sum(col("c")).cast("decimal(38,0)").as("sc"),
        sum(col("c_next")).cast("decimal(38,0)").as("sn"))
      .filter(col("lag") <= 6)
      .selectExpr("CAST(lag AS INT) AS dev_lag", "n_cohorts",
        "round(CAST(sn AS DOUBLE) / CAST(sc AS DOUBLE), 6) AS link_ratio")
      .orderBy("dev_lag")
  }
  val analyticsChainLadderSql: String =
    """WITH cells AS (
      |  SELECT date_trunc('month', o.o_orderdate) AS cohort,
      |    CAST(datediff('month', date_trunc('month', o.o_orderdate),
      |                  date_trunc('month', l.l_shipdate)) AS INT) AS lag,
      |    CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS DECIMAL(38,0)) AS inc
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  WHERE datediff('month', date_trunc('month', o.o_orderdate),
      |                 date_trunc('month', l.l_shipdate)) BETWEEN 0 AND 24
      |  GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort, lag,
      |    CAST(sum(inc) OVER (PARTITION BY cohort ORDER BY lag
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) AS c
      |  FROM cells),
      |j AS (
      |  SELECT a.lag, a.c, b.c AS c_next
      |  FROM cum a JOIN cum b ON b.cohort = a.cohort AND b.lag = a.lag + 1)
      |SELECT CAST(lag AS INT) AS dev_lag, CAST(count(*) AS BIGINT) AS n_cohorts,
      |  round(CAST(sum(c_next) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS link_ratio
      |FROM j WHERE lag <= 6
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** C850 time_holt_winters — additive Holt–Winters (α=0.3, β=0.1,
    * γ=0.2, season 12) over monthly revenue: init level/trend from the
    * first two seasons, seasonals from first-season deviations, then
    * the standard recursions month 13..T with one-step-ahead absolute
    * errors accumulated. The monthly frame is a BOUNDED dictionary
    * (~84 rows — the fleet's sanctioned driver-side scalar pattern);
    * the oracle replays the identical recursion as a recursive CTE
    * carrying the 12-slot seasonal list. Literal arithmetic text is
    * identical, so the doubles match bit-for-bit.
    */
  def timeHoltWinters(s: SparkSession, d: String): DataFrame = {
    val monthly = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .orderBy("m")
      .collect().map(_.getLong(1))
    val n = monthly.length
    val s1 = monthly.slice(0, 12).map(_.toDouble)
    val s2 = monthly.slice(12, 24).map(_.toDouble)
    val m1 = s1.sum / 12; val m2 = s2.sum / 12
    var level = m1
    var trend = (m2 - m1) / 12
    val seas = s1.map(_ - m1)
    var sae = 0.0; var steps = 0L
    for (t <- 12 until n) {
      val x = monthly(t).toDouble
      val f = level + trend + seas(t % 12)
      sae += math.abs(x - f)
      steps += 1
      val newLevel = 0.3 * (x - seas(t % 12)) + (1 - 0.3) * (level + trend)
      val newTrend = 0.1 * (newLevel - level) + (1 - 0.1) * trend
      seas(t % 12) = 0.2 * (x - newLevel) + (1 - 0.2) * seas(t % 12)
      level = newLevel; trend = newTrend
    }
    import s.implicits._
    Seq((n.toLong, steps, level, trend, sae))
      .toDF("n_months", "n_steps", "level_c", "trend_c", "sae_c")
      .selectExpr("n_months", "n_steps",
        "round(level_c / 100, 2) AS level_dollars",
        "round(trend_c / 100, 2) AS trend_dollars",
        "round(sae_c / n_steps / 100, 2) AS mae_dollars")
  }
  val timeHoltWintersSql: String =
    """WITH RECURSIVE monthly AS (
      |  SELECT date_trunc('month', o_orderdate) AS m,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) - 1 AS INT) AS t,
      |    CAST(v AS DOUBLE) AS x
      |  FROM monthly),
      |nn AS (SELECT CAST(count(*) AS INT) AS n FROM seq),
      |m1 AS (SELECT sum(x) / 12 AS m1 FROM seq WHERE t < 12),
      |m2 AS (SELECT sum(x) / 12 AS m2 FROM seq WHERE t >= 12 AND t < 24),
      |init AS (
      |  SELECT m1.m1 AS level, (m2.m2 - m1.m1) / 12 AS trend,
      |    (SELECT list(x - m1.m1 ORDER BY t) FROM seq WHERE t < 12) AS seas
      |  FROM m1, m2),
      |rec AS (
      |  SELECT 12 AS t, i.level, i.trend, i.seas,
      |    CAST(0 AS DOUBLE) AS sae, CAST(0 AS BIGINT) AS steps
      |  FROM init i
      |  UNION ALL
      |  SELECT r.t + 1,
      |    0.3 * (q.x - r.seas[(r.t % 12) + 1]) + (1 - 0.3) * (r.level + r.trend),
      |    0.1 * ((0.3 * (q.x - r.seas[(r.t % 12) + 1]) + (1 - 0.3) * (r.level + r.trend)) - r.level)
      |      + (1 - 0.1) * r.trend,
      |    list_transform(generate_series(1, 12), j ->
      |      CASE WHEN j = (r.t % 12) + 1 THEN
      |        0.2 * (q.x - (0.3 * (q.x - r.seas[(r.t % 12) + 1]) + (1 - 0.3) * (r.level + r.trend)))
      |        + (1 - 0.2) * r.seas[j]
      |      ELSE r.seas[j] END),
      |    r.sae + abs(q.x - (r.level + r.trend + r.seas[(r.t % 12) + 1])),
      |    r.steps + 1
      |  FROM rec r JOIN seq q ON q.t = r.t
      |  WHERE r.t < (SELECT n FROM nn)),
      |fin AS (
      |  SELECT * FROM rec ORDER BY t DESC LIMIT 1)
      |SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_months, steps AS n_steps,
      |  round(level / 100, 2) AS level_dollars,
      |  round(trend / 100, 2) AS trend_dollars,
      |  round(sae / steps / 100, 2) AS mae_dollars
      |FROM fin""".stripMargin

  /** C851 stat_breusch_godfrey — the Breusch–Godfrey LM(1) test for
    * serial correlation in the residuals of the daily-revenue linear
    * trend: closed-form OLS (a, b) from exact integer moments,
    * residuals floored ·10³ ONCE per day, lag via the calendar-bounded
    * window, then the auxiliary regression of e_t on (1, t, e_{t−1})
    * solved in closed form (2×2 normal equations on centered exact
    * moments), LM = (T−1)·R² against χ²₁ = 3.841458820694124. The
    * autocorrelation alarm for any trend-fit row.
    */
  def statBreuschGodfrey(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("x"))
      .withColumn("t", expr("CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT)"))
    val mom = daily.agg(count(lit(1)).cast("long").as("n"),
      sum(col("t")).cast("decimal(38,0)").as("st"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(expr("CAST(t AS DECIMAL(38,0)) * t")).cast("decimal(38,0)").as("stt"),
      sum(expr("CAST(t AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("stx"))
    val withE = daily.crossJoin(broadcast(mom))
      .withColumn("b", expr(
        """(CAST(n AS DOUBLE) * CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sx AS DOUBLE))
          |/ (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))""".stripMargin))
      .withColumn("a", expr("(CAST(sx AS DOUBLE) - b * CAST(st AS DOUBLE)) / n"))
      .withColumn("eq", expr("CAST(floor((x - a - b * t) * 1e3) AS BIGINT)"))
      .withColumn("el", lag(col("eq"), 1).over(Window.orderBy(col("day").asc)))
      .filter(col("el").isNotNull)
    val m2 = withE.agg(count(lit(1)).cast("long").as("m"),
      sum(col("t")).cast("decimal(38,0)").as("zt"),
      sum(col("el")).cast("decimal(38,0)").as("zl"),
      sum(col("eq")).cast("decimal(38,0)").as("zy"),
      sum(expr("CAST(t AS DECIMAL(38,0)) * t")).cast("decimal(38,0)").as("ztt"),
      sum(expr("CAST(t AS DECIMAL(38,0)) * el")).cast("decimal(38,0)").as("ztl"),
      sum(expr("CAST(t AS DECIMAL(38,0)) * eq")).cast("decimal(38,0)").as("zty"),
      sum(expr("CAST(el AS DECIMAL(38,0)) * el")).cast("decimal(38,0)").as("zll"),
      sum(expr("CAST(el AS DECIMAL(38,0)) * eq")).cast("decimal(38,0)").as("zly"),
      sum(expr("CAST(eq AS DECIMAL(38,0)) * eq")).cast("decimal(38,0)").as("zyy"))
    m2.selectExpr("m",
        """round((m - 0.0) * (
          |  CASE WHEN
          |    ((CAST(m AS DOUBLE) * CAST(ztt AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zt AS DOUBLE))
          |     * (CAST(m AS DOUBLE) * CAST(zll AS DOUBLE) - CAST(zl AS DOUBLE) * CAST(zl AS DOUBLE))
          |     - (CAST(m AS DOUBLE) * CAST(ztl AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zl AS DOUBLE))
          |       * (CAST(m AS DOUBLE) * CAST(ztl AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zl AS DOUBLE))) = 0
          |    OR (CAST(m AS DOUBLE) * CAST(zyy AS DOUBLE) - CAST(zy AS DOUBLE) * CAST(zy AS DOUBLE)) = 0
          |  THEN 0.0D
          |  ELSE
          |  ((CAST(m AS DOUBLE) * CAST(zty AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zy AS DOUBLE))
          |   * ((CAST(m AS DOUBLE) * CAST(zll AS DOUBLE) - CAST(zl AS DOUBLE) * CAST(zl AS DOUBLE))
          |      * (CAST(m AS DOUBLE) * CAST(zty AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zy AS DOUBLE))
          |      - (CAST(m AS DOUBLE) * CAST(ztl AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zl AS DOUBLE))
      |        * (CAST(m AS DOUBLE) * CAST(zly AS DOUBLE) - CAST(zl AS DOUBLE) * CAST(zy AS DOUBLE)))
          |   + (CAST(m AS DOUBLE) * CAST(zly AS DOUBLE) - CAST(zl AS DOUBLE) * CAST(zy AS DOUBLE))
          |   * ((CAST(m AS DOUBLE) * CAST(ztt AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zt AS DOUBLE))
          |      * (CAST(m AS DOUBLE) * CAST(zly AS DOUBLE) - CAST(zl AS DOUBLE) * CAST(zy AS DOUBLE))
          |      - (CAST(m AS DOUBLE) * CAST(ztl AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zl AS DOUBLE))
          |        * (CAST(m AS DOUBLE) * CAST(zty AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zy AS DOUBLE))))
          |  / (((CAST(m AS DOUBLE) * CAST(ztt AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zt AS DOUBLE))
          |      * (CAST(m AS DOUBLE) * CAST(zll AS DOUBLE) - CAST(zl AS DOUBLE) * CAST(zl AS DOUBLE))
          |      - (CAST(m AS DOUBLE) * CAST(ztl AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zl AS DOUBLE))
          |        * (CAST(m AS DOUBLE) * CAST(ztl AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zl AS DOUBLE)))
          |     * (CAST(m AS DOUBLE) * CAST(zyy AS DOUBLE) - CAST(zy AS DOUBLE) * CAST(zy AS DOUBLE)))
          |  END), 4) AS lm_stat""".stripMargin)
      .selectExpr("m AS n_days", "lm_stat",
        "lm_stat > 3.841458820694124 AS reject_95")
  }
  val statBreuschGodfreySql: String = {
    val r2 =
      """CASE WHEN
        |  ((CAST(m AS DOUBLE) * CAST(ztt AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zt AS DOUBLE))
        |   * (CAST(m AS DOUBLE) * CAST(zll AS DOUBLE) - CAST(zl AS DOUBLE) * CAST(zl AS DOUBLE))
        |   - (CAST(m AS DOUBLE) * CAST(ztl AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zl AS DOUBLE))
        |     * (CAST(m AS DOUBLE) * CAST(ztl AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zl AS DOUBLE))) = 0
        |  OR (CAST(m AS DOUBLE) * CAST(zyy AS DOUBLE) - CAST(zy AS DOUBLE) * CAST(zy AS DOUBLE)) = 0
        |THEN 0.0
        |ELSE
        |((CAST(m AS DOUBLE) * CAST(zty AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zy AS DOUBLE))
        | * ((CAST(m AS DOUBLE) * CAST(zll AS DOUBLE) - CAST(zl AS DOUBLE) * CAST(zl AS DOUBLE))
        |    * (CAST(m AS DOUBLE) * CAST(zty AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zy AS DOUBLE))
        |    - (CAST(m AS DOUBLE) * CAST(ztl AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zl AS DOUBLE))
        |      * (CAST(m AS DOUBLE) * CAST(zly AS DOUBLE) - CAST(zl AS DOUBLE) * CAST(zy AS DOUBLE)))
        | + (CAST(m AS DOUBLE) * CAST(zly AS DOUBLE) - CAST(zl AS DOUBLE) * CAST(zy AS DOUBLE))
        | * ((CAST(m AS DOUBLE) * CAST(ztt AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zt AS DOUBLE))
        |    * (CAST(m AS DOUBLE) * CAST(zly AS DOUBLE) - CAST(zl AS DOUBLE) * CAST(zy AS DOUBLE))
        |    - (CAST(m AS DOUBLE) * CAST(ztl AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zl AS DOUBLE))
        |      * (CAST(m AS DOUBLE) * CAST(zty AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zy AS DOUBLE))))
        |/ (((CAST(m AS DOUBLE) * CAST(ztt AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zt AS DOUBLE))
        |    * (CAST(m AS DOUBLE) * CAST(zll AS DOUBLE) - CAST(zl AS DOUBLE) * CAST(zl AS DOUBLE))
        |    - (CAST(m AS DOUBLE) * CAST(ztl AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zl AS DOUBLE))
        |      * (CAST(m AS DOUBLE) * CAST(ztl AS DOUBLE) - CAST(zt AS DOUBLE) * CAST(zl AS DOUBLE)))
        |   * (CAST(m AS DOUBLE) * CAST(zyy AS DOUBLE) - CAST(zy AS DOUBLE) * CAST(zy AS DOUBLE)))
        |END""".stripMargin
    s"""WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |seq AS (
      |  SELECT day, x, CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS t
      |  FROM daily),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(t) AS DECIMAL(38,0)) AS st, CAST(sum(x) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(t AS HUGEINT) * t) AS DECIMAL(38,0)) AS stt,
      |    CAST(sum(CAST(t AS HUGEINT) * x) AS DECIMAL(38,0)) AS stx
      |  FROM seq),
      |withe AS (
      |  SELECT q.day, q.t,
      |    CAST(floor((q.x
      |      - (CAST(m.sx AS DOUBLE) - ((CAST(m.n AS DOUBLE) * CAST(m.stx AS DOUBLE) - CAST(m.st AS DOUBLE) * CAST(m.sx AS DOUBLE))
      |         / (CAST(m.n AS DOUBLE) * CAST(m.stt AS DOUBLE) - CAST(m.st AS DOUBLE) * CAST(m.st AS DOUBLE))) * CAST(m.st AS DOUBLE)) / m.n
      |      - ((CAST(m.n AS DOUBLE) * CAST(m.stx AS DOUBLE) - CAST(m.st AS DOUBLE) * CAST(m.sx AS DOUBLE))
      |         / (CAST(m.n AS DOUBLE) * CAST(m.stt AS DOUBLE) - CAST(m.st AS DOUBLE) * CAST(m.st AS DOUBLE))) * q.t) * 1e3) AS BIGINT) AS eq
      |  FROM seq q, mom m),
      |lagd AS (
      |  SELECT t, eq, lag(eq, 1) OVER (ORDER BY day) AS el FROM withe),
      |m2 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(t) AS DECIMAL(38,0)) AS zt, CAST(sum(el) AS DECIMAL(38,0)) AS zl,
      |    CAST(sum(eq) AS DECIMAL(38,0)) AS zy,
      |    CAST(sum(CAST(t AS HUGEINT) * t) AS DECIMAL(38,0)) AS ztt,
      |    CAST(sum(CAST(t AS HUGEINT) * el) AS DECIMAL(38,0)) AS ztl,
      |    CAST(sum(CAST(t AS HUGEINT) * eq) AS DECIMAL(38,0)) AS zty,
      |    CAST(sum(CAST(el AS HUGEINT) * el) AS DECIMAL(38,0)) AS zll,
      |    CAST(sum(CAST(el AS HUGEINT) * eq) AS DECIMAL(38,0)) AS zly,
      |    CAST(sum(CAST(eq AS HUGEINT) * eq) AS DECIMAL(38,0)) AS zyy
      |  FROM lagd WHERE el IS NOT NULL)
      |SELECT m AS n_days, round((m - 0.0) * ($r2), 4) AS lm_stat,
      |  round((m - 0.0) * ($r2), 4) > 3.841458820694124 AS reject_95
      |FROM m2""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_cross_coherence" -> (timeCrossCoherence _),
    "analytics_chain_ladder" -> (analyticsChainLadder _),
    "time_holt_winters" -> (timeHoltWinters _),
    "stat_breusch_godfrey" -> (statBreuschGodfrey _),
  )

  val oracle: Map[String, String] = Map(
    "time_cross_coherence" -> timeCrossCoherenceSql,
    "analytics_chain_ladder" -> analyticsChainLadderSql,
    "time_holt_winters" -> timeHoltWintersSql,
    "stat_breusch_godfrey" -> statBreuschGodfreySql,
  )
}
