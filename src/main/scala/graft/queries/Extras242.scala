package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 142 (C972–C975): correlogram + regression influence + revenue
  * decomposition + robust two-way EDA — the ACF profile with Bartlett
  * bands (the correlogram C612's PACF reads against), the DFFITS/
  * DFBETAS/leverage influence battery for the daily trend fit (C-line
  * Cook's distance names the day; this says WHICH coefficient it
  * drags), SaaS-style growth accounting (new/resurrected/expansion/
  * contraction/churned revenue per month), and Tukey's median polish
  * of the year×priority table.
  *
  * Shared discipline: autocovariances ride exact centered integers
  * w = n·v − Σv (DECIMAL products, no float crosses a partition);
  * influence terms derive from quantized-cent residuals and exact-
  * rational leverages; growth accounting is pure integer cell algebra
  * on a month-shifted full outer join; median polish replays the
  * identical fixed odd/even median convention in both engines.
  */
object Extras242 {

  /** C972 time_acf_bartlett — the autocorrelation function of monthly
    * revenue at lags 1..12 with Bartlett's cumulative standard errors
    * SE(k) = √((1 + 2Σ_{j<k}ρⱼ²)/n): ρ from exact Σwₜwₜ₋ₖ/Σwₜ² with
    * w = n·v − Σv centered integers, ρ² quantized ·10¹² into the
    * running Bartlett sum. The correlogram half of the C612 PACF pair
    * — which MA order the series suggests, with honest wide-band
    * significance once low lags soak up correlation.
    */
  def timeAcfBartlett(s: SparkSession, d: String): DataFrame = {
    val seq0 = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .select(expr("CAST(row_number() OVER (ORDER BY m) AS BIGINT)").as("t"), col("v"))
    val mom = seq0.agg(count(lit(1)).cast("long").as("n"),
      sum(col("v")).cast("decimal(38,0)").as("sv"))
    val cent = seq0.crossJoin(broadcast(mom))
      .selectExpr("t", "n", "CAST(n AS DECIMAL(38,0)) * v - sv AS w")
      .localCheckpoint(true) // bounded month frame, self-joined below
    val den = cent.agg(max(col("n")).as("n"),
      sum(expr("CAST(w AS DECIMAL(38,0)) * w")).cast("decimal(38,0)").as("sww"))
    val pairs = cent.selectExpr("t AS ta", "w AS wa")
      .join(cent.selectExpr("t AS tb", "w AS wb"),
        expr("ta - tb BETWEEN 1 AND 12"))
      .selectExpr("ta - tb AS k", "CAST(wa AS DECIMAL(38,0)) * wb AS p")
      .groupBy("k").agg(sum(col("p")).cast("decimal(38,0)").as("num"))
    val rho = pairs.crossJoin(broadcast(den))
      .selectExpr("k", "n", "CAST(num AS DOUBLE) / CAST(sww AS DOUBLE) AS rho")
      .withColumn("rq", expr("CAST(floor(rho * rho * 1e12 + 0.5) AS BIGINT)"))
      .withColumn("cum2", coalesce(sum(col("rq")).over(
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    rho.selectExpr("k AS lag", "round(rho, 6) AS acf",
      "round(sqrt((1 + 2 * CAST(cum2 AS DOUBLE) / 1e12) / n), 6) AS bartlett_se",
      "abs(rho) > 1.96 * sqrt((1 + 2 * CAST(cum2 AS DOUBLE) / 1e12) / n) AS significant")
      .orderBy("lag")
  }
  val timeAcfBartlettSql: String =
    """WITH seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t, v FROM (
      |    SELECT date_trunc('month', o_orderdate) AS m,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1)),
      |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS sv FROM seq),
      |cent AS (SELECT t, n, CAST(n AS DECIMAL(38,0)) * v - sv AS w FROM seq, mom),
      |den AS (SELECT max(n) AS n,
      |  CAST(sum(CAST(w AS DECIMAL(38,0)) * w) AS DECIMAL(38,0)) AS sww FROM cent),
      |pairs AS (
      |  SELECT a.t - b.t AS k,
      |    CAST(sum(CAST(a.w AS DECIMAL(38,0)) * b.w) AS DECIMAL(38,0)) AS num
      |  FROM cent a JOIN cent b ON a.t - b.t BETWEEN 1 AND 12
      |  GROUP BY 1),
      |rho AS (
      |  SELECT k, n, CAST(num AS DOUBLE) / CAST(sww AS DOUBLE) AS rho,
      |    CAST(floor((CAST(num AS DOUBLE) / CAST(sww AS DOUBLE))
      |      * (CAST(num AS DOUBLE) / CAST(sww AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) AS rq
      |  FROM pairs, den),
      |cum AS (
      |  SELECT k, n, rho,
      |    CAST(coalesce(sum(rq) OVER (ORDER BY k
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum2
      |  FROM rho)
      |SELECT k AS lag, round(rho, 6) AS acf,
      |  round(sqrt((1 + 2 * CAST(cum2 AS DOUBLE) / 1e12) / n), 6) AS bartlett_se,
      |  abs(rho) > 1.96 * sqrt((1 + 2 * CAST(cum2 AS DOUBLE) / 1e12) / n) AS significant
      |FROM cum ORDER BY lag""".stripMargin

  /** C973 stat_influence_battery — per-observation influence on the
    * daily revenue trend fit: leverage hᵢ = 1/n + (n·tᵢ−Σt)²/(n·Sxx),
    * cent-quantized residuals, leave-one-out s₍ᵢ₎, DFFITS and the
    * slope DFBETAS — the top-5 |DFFITS| days. Cook's D (C-line) ranks
    * overall influence; this battery says whether the day drags the
    * LEVEL or the TREND.
    */
  def statInfluenceBattery(s: SparkSession, d: String): DataFrame = {
    val days = orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .withColumn("t", row_number().over(Window.orderBy("day")).cast("long"))
    val mom = days.agg(count(lit(1)).cast("long").as("n"),
      sum(col("t")).cast("long").as("st"),
      sum(expr("t * t")).cast("long").as("stt"),
      sum(col("v")).cast("decimal(38,0)").as("sv"),
      sum(expr("CAST(t AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("stv"))
    val base = days.crossJoin(broadcast(mom))
      .withColumn("b", expr(
        """(CAST(n AS DOUBLE) * CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
          |/ (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)""".stripMargin))
      .withColumn("a", expr("(CAST(sv AS DOUBLE) - b * st) / n"))
      .withColumn("eq", expr("CAST(floor((v - a - b * t) / 100 + 0.5) AS BIGINT)"))
      .withColumn("sxxn", expr("CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st"))
      .withColumn("h", expr(
        """CAST(1 AS DOUBLE) / n
          |+ (CAST(n AS DOUBLE) * t - st) * (CAST(n AS DOUBLE) * t - st) / (CAST(n AS DOUBLE) * sxxn)""".stripMargin))
    val see = base.agg(sum(expr("CAST(eq AS DECIMAL(38,0)) * eq")).cast("decimal(38,0)").as("see"))
    base.crossJoin(broadcast(see))
      .withColumn("s2", expr("CAST(see AS DOUBLE) / (n - 2)"))
      .withColumn("s2i", expr(
        "((CAST(n AS DOUBLE) - 2) * s2 - CAST(eq AS DOUBLE) * eq / (1 - h)) / (n - 3)"))
      .withColumn("dffits", expr(
        "CAST(eq AS DOUBLE) / (1 - h) * sqrt(h) / sqrt(s2i)"))
      .withColumn("dfb", expr(
        """(CAST(n AS DOUBLE) * t - st) * CAST(eq AS DOUBLE)
          |/ (1 - h) / sqrt(s2i) / sqrt(CAST(n AS DOUBLE) * sxxn)""".stripMargin))
      .selectExpr("day", "round(CAST(eq AS DOUBLE), 2) AS resid_dollars",
        "round(h, 6) AS leverage", "round(dffits, 4) AS dffits",
        "round(dfb, 4) AS dfbetas_slope", "abs(dffits) AS adf")
      .orderBy(col("adf").desc, col("day").asc).limit(5)
      .selectExpr("CAST(CAST(day AS DATE) AS STRING) AS day", "resid_dollars",
        "leverage", "dffits", "dfbetas_slope")
  }
  val statInfluenceBatterySql: String =
    """WITH days AS (
      |  SELECT day, v, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t FROM (
      |    SELECT CAST(o_orderdate AS DATE) AS day,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1)),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS st,
      |    CAST(sum(t * t) AS BIGINT) AS stt,
      |    CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS sv,
      |    CAST(sum(CAST(t AS HUGEINT) * v) AS DECIMAL(38,0)) AS stv
      |  FROM days),
      |base AS (
      |  SELECT day, t, n, st, stt, sxxn,
      |    CAST(floor((v - (CAST(sv AS DOUBLE) - b * st) / n - b * t) / 100 + 0.5) AS BIGINT) AS eq,
      |    CAST(1 AS DOUBLE) / n
      |      + (CAST(n AS DOUBLE) * t - st) * (CAST(n AS DOUBLE) * t - st) / (CAST(n AS DOUBLE) * sxxn) AS h
      |  FROM (
      |    SELECT day, v, t, n, st, stt, sv,
      |      (CAST(n AS DOUBLE) * CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) AS b,
      |      CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st AS sxxn
      |    FROM days, mom)),
      |see AS (SELECT CAST(sum(CAST(eq AS HUGEINT) * eq) AS DECIMAL(38,0)) AS see FROM base),
      |scored AS (
      |  SELECT day, t, eq, h, n, st, sxxn,
      |    ((CAST(n AS DOUBLE) - 2) * (CAST(see AS DOUBLE) / (n - 2))
      |      - CAST(eq AS DOUBLE) * eq / (1 - h)) / (n - 3) AS s2i
      |  FROM base, see),
      |fin AS (
      |  SELECT day, eq, h, s2i,
      |    CAST(eq AS DOUBLE) / (1 - h) * sqrt(h) / sqrt(s2i) AS dffits,
      |    (CAST(n AS DOUBLE) * t - st) * CAST(eq AS DOUBLE)
      |      / (1 - h) / sqrt(s2i) / sqrt(CAST(n AS DOUBLE) * sxxn) AS dfb
      |  FROM scored)
      |SELECT CAST(CAST(day AS DATE) AS VARCHAR) AS day,
      |  round(CAST(eq AS DOUBLE), 2) AS resid_dollars,
      |  round(h, 6) AS leverage, round(dffits, 4) AS dffits,
      |  round(dfb, 4) AS dfbetas_slope
      |FROM fin ORDER BY abs(dffits) DESC, day LIMIT 5""".stripMargin

  /** C974 analytics_growth_accounting — the month-over-month revenue
    * decomposition every subscription dashboard leads with: per
    * customer-month spend full-outer-joined to its previous month,
    * each cell classified as new (first month), resurrected, expansion,
    * contraction (negative), or churned (negative), exact integer cent
    * sums per class and the net that reconciles to the MoM delta. The
    * month-shifted equi-join shape distributes at any customer count.
    */
  def analyticsGrowthAccounting(s: SparkSession, d: String): DataFrame = {
    val cm = orders(s, d)
      .groupBy(col("o_custkey").as("ck"), expr("date_trunc('month', o_orderdate)").as("mon"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .localCheckpoint(true) // consumed by both join sides + first-month
    val first = cm.groupBy("ck").agg(min(col("mon")).as("fm"))
    val maxm = cm.agg(max(col("mon")).as("mx"))
    val a = cm.selectExpr("ck", "mon", "v")
    val b = cm.selectExpr("ck", "mon + INTERVAL 1 MONTH AS mon", "v AS pv")
    val cells = a.join(b, Seq("ck", "mon"), "full_outer")
      .join(first, Seq("ck"))
      .crossJoin(broadcast(maxm))
      .filter(col("mon") <= col("mx"))
      .selectExpr("mon",
        """CASE
          |  WHEN pv IS NULL AND mon = fm THEN 'new'
          |  WHEN pv IS NULL THEN 'resurrected'
          |  WHEN v IS NULL THEN 'churned'
          |  WHEN v > pv THEN 'expansion'
          |  WHEN v < pv THEN 'contraction'
          |  ELSE 'retained' END AS cls""".stripMargin,
        """CASE
          |  WHEN pv IS NULL THEN v
          |  WHEN v IS NULL THEN -pv
          |  ELSE v - pv END AS delta""".stripMargin)
    cells.groupBy("mon").agg(
      sum(expr("CASE WHEN cls = 'new' THEN delta ELSE 0L END")).cast("long").as("newr"),
      sum(expr("CASE WHEN cls = 'resurrected' THEN delta ELSE 0L END")).cast("long").as("res"),
      sum(expr("CASE WHEN cls = 'expansion' THEN delta ELSE 0L END")).cast("long").as("exp"),
      sum(expr("CASE WHEN cls = 'contraction' THEN delta ELSE 0L END")).cast("long").as("con"),
      sum(expr("CASE WHEN cls = 'churned' THEN delta ELSE 0L END")).cast("long").as("chu"))
      .selectExpr("CAST(CAST(mon AS DATE) AS STRING) AS month",
        "round(CAST(newr AS DOUBLE) / 100, 2) AS new_rev",
        "round(CAST(res AS DOUBLE) / 100, 2) AS resurrected_rev",
        "round(CAST(exp AS DOUBLE) / 100, 2) AS expansion_rev",
        "round(CAST(con AS DOUBLE) / 100, 2) AS contraction_rev",
        "round(CAST(chu AS DOUBLE) / 100, 2) AS churned_rev",
        "round(CAST(newr + res + exp + con + chu AS DOUBLE) / 100, 2) AS net_change")
      .orderBy("month")
  }
  val analyticsGrowthAccountingSql: String =
    """WITH cm AS (
      |  SELECT o_custkey AS ck, date_trunc('month', o_orderdate) AS mon,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1, 2),
      |first AS (SELECT ck, min(mon) AS fm FROM cm GROUP BY 1),
      |maxm AS (SELECT max(mon) AS mx FROM cm),
      |cells AS (
      |  SELECT coalesce(a.mon, b.mon) AS mon,
      |    CASE
      |      WHEN b.pv IS NULL AND coalesce(a.mon, b.mon) = f.fm THEN 'new'
      |      WHEN b.pv IS NULL THEN 'resurrected'
      |      WHEN a.v IS NULL THEN 'churned'
      |      WHEN a.v > b.pv THEN 'expansion'
      |      WHEN a.v < b.pv THEN 'contraction'
      |      ELSE 'retained' END AS cls,
      |    CASE
      |      WHEN b.pv IS NULL THEN a.v
      |      WHEN a.v IS NULL THEN -b.pv
      |      ELSE a.v - b.pv END AS delta
      |  FROM (SELECT ck, mon, v FROM cm) a
      |  FULL OUTER JOIN (SELECT ck, mon + INTERVAL 1 MONTH AS mon, v AS pv FROM cm) b
      |    ON a.ck = b.ck AND a.mon = b.mon
      |  JOIN first f ON coalesce(a.ck, b.ck) = f.ck, maxm
      |  WHERE coalesce(a.mon, b.mon) <= mx)
      |SELECT CAST(CAST(mon AS DATE) AS VARCHAR) AS month,
      |  round(CAST(CAST(sum(CASE WHEN cls = 'new' THEN delta ELSE 0 END) AS BIGINT) AS DOUBLE) / 100, 2) AS new_rev,
      |  round(CAST(CAST(sum(CASE WHEN cls = 'resurrected' THEN delta ELSE 0 END) AS BIGINT) AS DOUBLE) / 100, 2) AS resurrected_rev,
      |  round(CAST(CAST(sum(CASE WHEN cls = 'expansion' THEN delta ELSE 0 END) AS BIGINT) AS DOUBLE) / 100, 2) AS expansion_rev,
      |  round(CAST(CAST(sum(CASE WHEN cls = 'contraction' THEN delta ELSE 0 END) AS BIGINT) AS DOUBLE) / 100, 2) AS contraction_rev,
      |  round(CAST(CAST(sum(CASE WHEN cls = 'churned' THEN delta ELSE 0 END) AS BIGINT) AS DOUBLE) / 100, 2) AS churned_rev,
      |  round(CAST(CAST(sum(delta) AS BIGINT) AS DOUBLE) / 100, 2) AS net_change
      |FROM cells GROUP BY mon ORDER BY month""".stripMargin

  /** C975 stat_median_polish_full — Tukey's median polish of the year ×
    * priority revenue-share table (two full row/column sweeps): the
    * robust additive decomposition grand + row + column + residual
    * that two-way ANOVA does with means — outlier cells land in the
    * residuals instead of dragging the effects. Fixed odd/even median
    * convention in both engines; the bounded 7×5 grid is collected
    * (C870 convention) and the oracle replays the sweeps with
    * row_number position medians.
    */
  def statMedianPolish(s: SparkSession, d: String): DataFrame = {
    val grid = orders(s, d)
      .groupBy(expr("year(o_orderdate)").as("yr"), col("o_orderpriority").as("grp"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(2))).toMap
    val yrs = grid.keys.map(_._1).toArray.distinct.sorted
    val prios = grid.keys.map(_._2).toArray.distinct.sorted
    def med(a: Array[Double]): Double = {
      val so = a.sorted; val k = so.length
      if (k % 2 == 1) so(k / 2) else (so(k / 2 - 1) + so(k / 2)) / 2
    }
    val resid = scala.collection.mutable.Map[(Int, String), Double]()
    yrs.foreach(y => prios.foreach(p =>
      resid((y, p)) = grid.getOrElse((y, p), 0L).toDouble))
    var grand = 0.0
    val rowEff = scala.collection.mutable.Map[Int, Double]().withDefaultValue(0.0)
    val colEff = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
    for (_ <- 1 to 2) {
      // row sweep
      yrs.foreach { y =>
        val m = med(prios.map(p => resid((y, p))))
        prios.foreach(p => resid((y, p)) -= m)
        rowEff(y) += m
      }
      val mc = med(yrs.map(y => rowEff(y)))
      yrs.foreach(y => rowEff(y) -= mc); grand += mc
      // column sweep
      prios.foreach { p =>
        val m = med(yrs.map(y => resid((y, p))))
        yrs.foreach(y => resid((y, p)) -= m)
        colEff(p) += m
      }
      val mr = med(prios.map(p => colEff(p)))
      prios.foreach(p => colEff(p) -= mr); grand += mr
    }
    import s.implicits._
    val rows = prios.map(p => ("col:" + p, colEff(p))).toSeq ++
      yrs.map(y => ("row:" + y, rowEff(y))).toSeq :+ (("grand", grand)) :+
      (("max_abs_resid", resid.values.map(math.abs).max))
    rows.toDF("component", "eff")
      .selectExpr("component", "round(eff / 100, 2) AS effect_dollars")
      .orderBy("component")
  }
  val statMedianPolishSql: String = {
    // one sweep pair: row-median subtract (residN -> residN'), then
    // column-median subtract, accumulating effects
    def rowSweep(i: Int): String =
      s"""rmed$i AS (
         |  SELECT yr, avg(v) AS m FROM (
         |    SELECT yr, v, row_number() OVER (PARTITION BY yr ORDER BY v) AS rn,
         |      count(*) OVER (PARTITION BY yr) AS k
         |    FROM resid${i - 1})
         |  WHERE rn IN ((k + 1) // 2, (k + 2) // 2) GROUP BY yr),
         |rstep$i AS (
         |  SELECT r.yr, r.grp, r.v - m.m AS v FROM resid${i - 1} r JOIN rmed$i m ON r.yr = m.yr),
         |reff$i AS (
         |  SELECT m.yr AS yr, coalesce(p.e, 0) + m.m AS e
         |  FROM rmed$i m LEFT JOIN reffc${i - 1} p ON m.yr = p.yr),
         |rgm$i AS (
         |  SELECT avg(e) AS m FROM (
         |    SELECT e, row_number() OVER (ORDER BY e) AS rn, count(*) OVER () AS k
         |    FROM reff$i) WHERE rn IN ((k + 1) // 2, (k + 2) // 2)),
         |reffc$i AS (SELECT yr, e - m AS e FROM reff$i, rgm$i),
         |cmed$i AS (
         |  SELECT grp, avg(v) AS m FROM (
         |    SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
         |      count(*) OVER (PARTITION BY grp) AS k
         |    FROM rstep$i)
         |  WHERE rn IN ((k + 1) // 2, (k + 2) // 2) GROUP BY grp),
         |resid$i AS (
         |  SELECT r.yr, r.grp, r.v - m.m AS v FROM rstep$i r JOIN cmed$i m ON r.grp = m.grp),
         |ceff$i AS (
         |  SELECT m.grp AS grp, coalesce(p.e, 0) + m.m AS e
         |  FROM cmed$i m LEFT JOIN ceffc${i - 1} p ON m.grp = p.grp),
         |cgm$i AS (
         |  SELECT avg(e) AS m FROM (
         |    SELECT e, row_number() OVER (ORDER BY e) AS rn, count(*) OVER () AS k
         |    FROM ceff$i) WHERE rn IN ((k + 1) // 2, (k + 2) // 2)),
         |ceffc$i AS (SELECT grp, e - m AS e FROM ceff$i, cgm$i),
         |grand$i AS (SELECT grand${i - 1}.g + rgm$i.m + cgm$i.m AS g FROM grand${i - 1}, rgm$i, cgm$i)""".stripMargin
    s"""WITH grid AS (
       |  SELECT year(o_orderdate) AS yr, o_orderpriority AS grp,
       |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
       |  FROM orders GROUP BY 1, 2),
       |resid0 AS (
       |  SELECT yp.yr, yp.grp, CAST(coalesce(g.v, 0) AS DOUBLE) AS v
       |  FROM (SELECT y.yr, p.grp FROM (SELECT DISTINCT yr FROM grid) y,
       |        (SELECT DISTINCT grp FROM grid) p) yp
       |  LEFT JOIN grid g ON g.yr = yp.yr AND g.grp = yp.grp),
       |reffc0 AS (SELECT yr, CAST(0 AS DOUBLE) AS e FROM (SELECT DISTINCT yr FROM grid) WHERE 1 = 0),
       |ceffc0 AS (SELECT grp, CAST(0 AS DOUBLE) AS e FROM (SELECT DISTINCT grp FROM grid) WHERE 1 = 0),
       |grand0 AS (SELECT CAST(0 AS DOUBLE) AS g),
       |${rowSweep(1)},
       |${rowSweep(2)}
       |SELECT component, round(eff / 100, 2) AS effect_dollars FROM (
       |  SELECT 'col:' || grp AS component, e AS eff FROM ceffc2
       |  UNION ALL SELECT 'row:' || CAST(yr AS VARCHAR), e FROM reffc2
       |  UNION ALL SELECT 'grand', g FROM grand2
       |  UNION ALL SELECT 'max_abs_resid', max(abs(v)) FROM resid2)
       |ORDER BY component""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_acf_bartlett" -> (timeAcfBartlett _),
    "stat_influence_battery" -> (statInfluenceBattery _),
    "analytics_growth_accounting" -> (analyticsGrowthAccounting _),
    "stat_median_polish_full" -> (statMedianPolish _),
  )

  val oracle: Map[String, String] = Map(
    "time_acf_bartlett" -> timeAcfBartlettSql,
    "stat_influence_battery" -> statInfluenceBatterySql,
    "analytics_growth_accounting" -> analyticsGrowthAccountingSql,
    "stat_median_polish_full" -> statMedianPolishSql,
  )
}
