package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 134 (C940–C943): inventory DP + state-space smoothing +
  * probabilistic-forecast scoring — Wagner–Whitin optimal lot sizing,
  * the RTS Kalman smoother (C870's backward pass), the ensemble CRPS,
  * and PIT calibration of the climatological ensemble.
  *
  * Shared discipline: the DP and both Kalman passes run on the
  * collected bounded month vector with IEEE order mirrored by the
  * oracle's recursive-CTE list algebra (the C870/C895 convention);
  * CRPS is kept on the exact integer lattice via 2m²·CRPS (no halves),
  * per-month ·10² integer division before the corpus mean; PIT ranks
  * are pure integer comparisons.
  */
object Extras234 {

  private def monthlyCents(s: SparkSession, d: String): Array[Long] =
    orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .orderBy("m")
      .collect().map(_.getLong(1))

  /** C940 analytics_wagner_whitin — optimal dynamic lot sizing for the
    * monthly total demand (thousands of units): setup cost K = 5000,
    * holding h = 1 per unit-month, F(t) = min_{j≤t} F(j−1) + K +
    * h·Σ_{i=j..t}(i−j)·d_i by the exact O(T²) integer DP; reports the
    * optimal cost, the number of orders, and the naive order-every-
    * month / single-order costs it beats. THE inventory-planning DP —
    * and exactly solvable, unlike its heuristics (C743's EOQ).
    */
  def analyticsWagnerWhitin(s: SparkSession, d: String): DataFrame = {
    val dem = lineitem(s, d)
      .groupBy(expr("date_trunc('month', l_shipdate)").as("m"))
      .agg(expr("CAST(sum(CAST(l_quantity AS BIGINT)) div 1000 AS BIGINT)").as("dq"))
      .orderBy("m")
      .collect().map(_.getLong(1))
    val t = dem.length
    val kCost = 5000L; val h = 1L
    val f = new Array[Long](t + 1)
    val ord = new Array[Int](t + 1)
    f(0) = 0
    for (i <- 1 to t) {
      var best = Long.MaxValue; var bj = 1
      for (j <- 1 to i) {
        var hold = 0L
        for (x <- j to i) hold += h * (x - j) * dem(x - 1)
        val c = f(j - 1) + kCost + hold
        if (c < best) { best = c; bj = j }
      }
      f(i) = best; ord(i) = bj
    }
    // count orders by walking the policy back
    var cnt = 0L; var cur = t
    while (cur > 0) { cnt += 1; cur = ord(cur) - 1 }
    val everyMonth = t * kCost
    var single = kCost
    for (x <- 1 to t) single += h * (x - 1) * dem(x - 1)
    import s.implicits._
    Seq((t.toLong, f(t), cnt, everyMonth, single))
      .toDF("t0", "opt", "cnt", "em", "sg")
      .selectExpr("t0 AS n_months", "opt AS optimal_cost", "cnt AS n_orders",
        "em AS cost_every_month", "sg AS cost_single_order",
        "round(CAST(opt AS DOUBLE) / em, 4) AS opt_vs_every_month")
  }
  val analyticsWagnerWhitinSql: String =
    """WITH RECURSIVE dem AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t,
      |    CAST(dq AS BIGINT) AS d
      |  FROM (
      |    SELECT date_trunc('month', l_shipdate) AS m,
      |      CAST(sum(CAST(l_quantity AS BIGINT)) // 1000 AS BIGINT) AS dq
      |    FROM lineitem GROUP BY 1)),
      |nn AS (SELECT CAST(max(t) AS BIGINT) AS n, list(d ORDER BY t) AS dl FROM dem),
      |rec AS (
      |  SELECT CAST(0 AS BIGINT) AS i, [CAST(0 AS BIGINT)] AS fl, [CAST(0 AS BIGINT)] AS jl,
      |    dl, n FROM nn
      |  UNION ALL
      |  SELECT i + 1,
      |    list_append(fl, (
      |      SELECT min(fl[j] + 5000 + list_sum(list_transform(generate_series(j, CAST(i + 1 AS BIGINT)),
      |        x -> (x - j) * dl[x])))
      |      FROM (SELECT unnest(generate_series(1, CAST(i + 1 AS BIGINT))) AS j))),
      |    list_append(jl, (
      |      SELECT min_by(j, (fl[j] + 5000 + list_sum(list_transform(generate_series(j, CAST(i + 1 AS BIGINT)),
      |        x -> (x - j) * dl[x]))) * 128 + j)
      |      FROM (SELECT unnest(generate_series(1, CAST(i + 1 AS BIGINT))) AS j))),
      |    dl, n
      |  FROM rec WHERE i < n),
      |fin AS (SELECT * FROM rec, nn nx WHERE rec.i = nx.n),
      |-- walk the policy back to count orders
      |walk AS (
      |  SELECT CAST(n AS BIGINT) AS cur, CAST(0 AS BIGINT) AS cnt, jl FROM fin
      |  UNION ALL
      |  SELECT jl[CAST(cur AS INT) + 1] - 1, cnt + 1, jl FROM walk WHERE cur > 0),
      |orders_n AS (SELECT max(cnt) AS cnt FROM walk),
      |costs AS (
      |  SELECT n, fl[CAST(n AS INT) + 1] AS opt,
      |    n * 5000 AS em,
      |    5000 + list_sum(list_transform(generate_series(1, CAST(n AS BIGINT)), x -> (x - 1) * dl[x])) AS sg
      |  FROM fin)
      |SELECT n AS n_months, CAST(opt AS BIGINT) AS optimal_cost,
      |  CAST(cnt AS BIGINT) AS n_orders,
      |  CAST(em AS BIGINT) AS cost_every_month,
      |  CAST(sg AS BIGINT) AS cost_single_order,
      |  round(CAST(opt AS DOUBLE) / em, 4) AS opt_vs_every_month
      |FROM costs, orders_n""".stripMargin

  /** C941 time_kalman_smoother — the RTS backward pass over C870's
    * local-level filter (same data-derived q = Var(Δ)/10, r = Var(Δ)/2):
    * forward filtered means/variances, then x̂ₜ|ₙ = mₜ + Gₜ(x̂ₜ₊₁|ₙ −
    * mₜ) with Gₜ = Pₜ/(Pₜ+q); reports the smoothed start/end levels and
    * the mean absolute revision |smoothed − filtered| — how much
    * hindsight moved the story. The full-information state estimate
    * batch pipelines should publish instead of the filter.
    */
  def timeKalmanSmoother(s: SparkSession, d: String): DataFrame = {
    val ms = monthlyCents(s, d)
    val n = ms.length
    val ds = (1 until n).map(t => ms(t) - ms(t - 1))
    val nd = ds.length
    val sd1 = ds.map(BigInt(_)).sum; val sd2 = ds.map(x => BigInt(x) * x).sum
    val vd = (nd.toDouble * sd2.toDouble - sd1.toDouble * sd1.toDouble) /
      (nd.toDouble * (nd - 1))
    val q = vd / 10; val r = vd / 2
    val m = new Array[Double](n); val p = new Array[Double](n)
    m(0) = ms(0).toDouble; p(0) = vd
    for (t <- 1 until n) {
      val pp = p(t - 1) + q
      val k = pp / (pp + r)
      m(t) = m(t - 1) + k * (ms(t) - m(t - 1))
      p(t) = (1 - k) * pp
    }
    val xs = new Array[Double](n)
    xs(n - 1) = m(n - 1)
    for (t <- n - 2 to 0 by -1) {
      val g = p(t) / (p(t) + q)
      xs(t) = m(t) + g * (xs(t + 1) - m(t))
    }
    var revq = 0L
    for (t <- 0 until n) revq += math.floor(math.abs(xs(t) - m(t)) / 100 * 100 + 0.5).toLong
    import s.implicits._
    Seq((n.toLong, xs(0), xs(n - 1), revq)).toDF("n0", "x0", "xn", "rq")
      .selectExpr("n0 AS n_months",
        "round(x0 / 100, 2) AS smoothed_first_dollars",
        "round(xn / 100, 2) AS smoothed_last_dollars",
        "round(CAST(rq AS DOUBLE) / n0 / 100, 2) AS mean_abs_revision_dollars")
  }
  val timeKalmanSmootherSql: String =
    """WITH RECURSIVE monthly AS (
      |  SELECT date_trunc('month', o_orderdate) AS m,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) - 1 AS BIGINT) AS t, CAST(v AS DOUBLE) AS x
      |  FROM monthly),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n, list(x ORDER BY t) AS xl FROM seq),
      |vd AS (
      |  SELECT (CAST(nd AS DOUBLE) * sd2 - sd1 * sd1) / (CAST(nd AS DOUBLE) * (nd - 1)) AS vd FROM (
      |    SELECT CAST(count(*) AS BIGINT) AS nd,
      |      CAST(CAST(sum(CAST(dd AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) AS sd1,
      |      CAST(CAST(sum(CAST(dd AS HUGEINT) * dd) AS DECIMAL(38,0)) AS DOUBLE) AS sd2
      |    FROM (
      |      SELECT CAST(s.v - p.v AS BIGINT) AS dd
      |      FROM (SELECT CAST(row_number() OVER (ORDER BY m) - 1 AS BIGINT) AS t, v FROM monthly) s
      |      JOIN (SELECT CAST(row_number() OVER (ORDER BY m) - 1 AS BIGINT) AS t, v FROM monthly) p
      |        ON s.t = p.t + 1))),
      |fwd AS (
      |  SELECT CAST(0 AS BIGINT) AS t, [xl[1]] AS ml, [vd] AS pl, xl, n, vd.vd AS vd
      |  FROM nn, vd
      |  UNION ALL
      |  SELECT t + 1,
      |    list_append(ml, ml[CAST(t AS INT) + 1]
      |      + ((pl[CAST(t AS INT) + 1] + vd / 10) / ((pl[CAST(t AS INT) + 1] + vd / 10) + vd / 2))
      |        * (xl[CAST(t AS INT) + 2] - ml[CAST(t AS INT) + 1])),
      |    list_append(pl, (1 - ((pl[CAST(t AS INT) + 1] + vd / 10) / ((pl[CAST(t AS INT) + 1] + vd / 10) + vd / 2)))
      |      * (pl[CAST(t AS INT) + 1] + vd / 10)),
      |    xl, n, vd
      |  FROM fwd WHERE t < n - 1),
      |ff AS (SELECT * FROM fwd WHERE t = n - 1),
      |bwd AS (
      |  SELECT n - 1 AS t, [ml[CAST(n AS INT)]] AS sl, ml, pl, n, vd FROM ff
      |  UNION ALL
      |  SELECT t - 1,
      |    list_prepend(ml[CAST(t AS INT)]
      |      + (pl[CAST(t AS INT)] / (pl[CAST(t AS INT)] + vd / 10)) * (sl[1] - ml[CAST(t AS INT)]),
      |      sl),
      |    ml, pl, n, vd
      |  FROM bwd WHERE t > 0),
      |bb AS (SELECT * FROM bwd WHERE t = 0),
      |rev AS (
      |  SELECT CAST(list_sum(list_transform(generate_series(1, CAST(n AS BIGINT)),
      |    i -> CAST(floor(abs(sl[i] - ml[i]) / 100 * 100 + 0.5) AS BIGINT))) AS BIGINT) AS rq,
      |    sl[1] AS x0, sl[CAST(n AS INT)] AS xn, n
      |  FROM bb)
      |SELECT n AS n_months,
      |  round(x0 / 100, 2) AS smoothed_first_dollars,
      |  round(xn / 100, 2) AS smoothed_last_dollars,
      |  round(CAST(rq AS DOUBLE) / n / 100, 2) AS mean_abs_revision_dollars
      |FROM rev""".stripMargin

  /** C942 stat_crps_ensemble — the continuous ranked probability score
    * of the climatological ensemble (same-calendar-month values from
    * prior years) against realized monthly revenue: per month the
    * EXACT integer 2m²·CRPS = 2m·Σ|xᵢ−y| − ΣΣ|xᵢ−xⱼ|, averaged after
    * a ·10² integer division. The proper scoring rule that grades
    * sharpness AND calibration at once — MAE is its one-member
    * special case, pinned by the spec.
    */
  def statCrpsEnsemble(s: SparkSession, d: String): DataFrame = {
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .withColumn("t", row_number().over(Window.orderBy("m")).cast("long"))
      .localCheckpoint(true) // bounded months, 3 consumers
    val ens = ms.select(col("t").as("tt"), col("v").as("y"), expr("(t - 1) % 12").as("moy"))
      .join(ms.select(col("t").as("te"), col("v").as("x"), expr("(t - 1) % 12").as("moy")),
        Seq("moy"))
      .filter(expr("tt > te"))
    val term1 = ens.groupBy("tt", "y")
      .agg(count(lit(1)).cast("long").as("mm"),
        sum(expr("abs(x - y)")).cast("long").as("say"))
    val pairs = ens.select(col("tt"), col("x"))
    val term2 = pairs.join(pairs.select(col("tt"), col("x").as("x2")), Seq("tt"))
      .groupBy("tt")
      .agg(sum(expr("abs(x - x2)")).cast("long").as("sxx"))
    term1.join(term2, Seq("tt"))
      .select(expr("((2 * mm * say - sxx) * 100) div (2 * mm * mm)").as("cq"),
        col("mm"))
      .agg(count(lit(1)).cast("long").as("n_scored"),
        sum(col("cq")).cast("long").as("sc"),
        min(col("mm")).as("min_m"), max(col("mm")).as("max_m"))
      .selectExpr("n_scored", "min_m AS min_ensemble", "max_m AS max_ensemble",
        "round(CAST(sc AS DOUBLE) / n_scored / 100 / 100, 2) AS mean_crps_dollars")
  }
  val statCrpsEnsembleSql: String =
    """WITH ms AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t, v FROM (
      |    SELECT date_trunc('month', o_orderdate) AS m,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1)),
      |ens AS (
      |  SELECT a.t AS tt, a.v AS y, b.v AS x
      |  FROM ms a JOIN ms b ON ((a.t - 1) % 12) = ((b.t - 1) % 12) AND a.t > b.t),
      |term1 AS (
      |  SELECT tt, y, CAST(count(*) AS BIGINT) AS mm,
      |    CAST(sum(abs(x - y)) AS BIGINT) AS say
      |  FROM ens GROUP BY 1, 2),
      |term2 AS (
      |  SELECT a.tt, CAST(sum(abs(a.x - b.x)) AS BIGINT) AS sxx
      |  FROM ens a JOIN ens b ON a.tt = b.tt GROUP BY 1),
      |perm AS (
      |  SELECT ((2 * mm * say - sxx) * 100) // (2 * mm * mm) AS cq, mm
      |  FROM term1 JOIN term2 USING (tt))
      |SELECT CAST(count(*) AS BIGINT) AS n_scored,
      |  CAST(min(mm) AS BIGINT) AS min_ensemble,
      |  CAST(max(mm) AS BIGINT) AS max_ensemble,
      |  round(CAST(CAST(sum(cq) AS BIGINT) AS DOUBLE) / count(*) / 100 / 100, 2) AS mean_crps_dollars
      |FROM perm""".stripMargin

  /** C943 stat_pit_calibration — the probability-integral-transform
    * check of the same climatological ensemble: the realized value's
    * rank within its ensemble maps to (r+1)/(m+1) ∈ (0,1); a calibrated
    * forecast puts it uniformly in the 4 PIT quartile bins — χ²(3)
    * against the uniform, with the too-narrow/too-wide diagnosis from
    * the edge-bin share. CRPS' (C942) calibration-only companion.
    */
  def statPitCalibration(s: SparkSession, d: String): DataFrame = {
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .withColumn("t", row_number().over(Window.orderBy("m")).cast("long"))
      .localCheckpoint(true)
    val ens = ms.select(col("t").as("tt"), col("v").as("y"), expr("(t - 1) % 12").as("moy"))
      .join(ms.select(col("t").as("te"), col("v").as("x"), expr("(t - 1) % 12").as("moy")),
        Seq("moy"))
      .filter(expr("tt > te"))
    val pit = ens.groupBy("tt")
      .agg(count(lit(1)).cast("long").as("mm"),
        sum(expr("CASE WHEN x < y THEN 1L ELSE 0L END")).cast("long").as("rnk"))
      // bin = floor(4*(r+1)/(m+1)) clamped to 3: pure integer algebra
      .select(expr("least((4 * (rnk + 1)) div (mm + 1), 3L)").as("bin"))
    // densify to all 4 quartile bins: an observed-bins-only χ² silently
    // drops the (0 − n/4)²/(n/4) term of any empty bin
    val bins = s.range(4).select(col("id").as("bin"))
      .join(pit.groupBy("bin").agg(count(lit(1)).cast("long").as("c")), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("c"), lit(0L)).as("c"))
    val tot = bins.agg(sum(col("c")).cast("long").as("n"))
    bins.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"),
        sum(expr(
          """CAST(floor((CAST(c AS DOUBLE) - CAST(n AS DOUBLE) / 4)
            |* (CAST(c AS DOUBLE) - CAST(n AS DOUBLE) / 4)
            |/ (CAST(n AS DOUBLE) / 4) * 1e9 + 0.5) AS BIGINT)""".stripMargin))
          .cast("long").as("chiq"),
        sum(expr("CASE WHEN bin = 0 OR bin = 3 THEN c ELSE 0L END")).cast("long").as("edge"))
      .selectExpr("n AS n_scored",
        "round(CAST(chiq AS DOUBLE) / 1e9, 4) AS chi2_uniform",
        "round(CAST(edge AS DOUBLE) / n, 4) AS edge_bin_share",
        """CASE WHEN CAST(edge AS DOUBLE) / n > 0.6 THEN 'too_narrow'
          |WHEN CAST(edge AS DOUBLE) / n < 0.4 THEN 'too_wide'
          |ELSE 'calibrated' END AS verdict""".stripMargin)
  }
  val statPitCalibrationSql: String =
    """WITH ms AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t, v FROM (
      |    SELECT date_trunc('month', o_orderdate) AS m,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1)),
      |ens AS (
      |  SELECT a.t AS tt, a.v AS y, b.v AS x
      |  FROM ms a JOIN ms b ON ((a.t - 1) % 12) = ((b.t - 1) % 12) AND a.t > b.t),
      |pit AS (
      |  SELECT least((4 * (rnk + 1)) // (mm + 1), 3) AS bin FROM (
      |    SELECT tt, CAST(count(*) AS BIGINT) AS mm,
      |      CAST(sum(CASE WHEN x < y THEN 1 ELSE 0 END) AS BIGINT) AS rnk
      |    FROM ens GROUP BY 1)),
      |obs AS (SELECT bin, CAST(count(*) AS BIGINT) AS c FROM pit GROUP BY 1),
      |bins AS (
      |  SELECT a.bin, CAST(coalesce(o.c, 0) AS BIGINT) AS c
      |  FROM (SELECT CAST(unnest(generate_series(0, 3)) AS BIGINT) AS bin) a
      |  LEFT JOIN obs o ON a.bin = o.bin),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM bins)
      |SELECT max(n) AS n_scored,
      |  round(CAST(CAST(sum(CAST(floor((CAST(c AS DOUBLE) - CAST(n AS DOUBLE) / 4)
      |    * (CAST(c AS DOUBLE) - CAST(n AS DOUBLE) / 4)
      |    / (CAST(n AS DOUBLE) / 4) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e9, 4) AS chi2_uniform,
      |  round(CAST(sum(CASE WHEN bin = 0 OR bin = 3 THEN c ELSE 0 END) AS DOUBLE) / max(n), 4) AS edge_bin_share,
      |  CASE WHEN CAST(sum(CASE WHEN bin = 0 OR bin = 3 THEN c ELSE 0 END) AS DOUBLE) / max(n) > 0.6 THEN 'too_narrow'
      |  WHEN CAST(sum(CASE WHEN bin = 0 OR bin = 3 THEN c ELSE 0 END) AS DOUBLE) / max(n) < 0.4 THEN 'too_wide'
      |  ELSE 'calibrated' END AS verdict
      |FROM bins, tot""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_wagner_whitin" -> (analyticsWagnerWhitin _),
    "time_kalman_smoother" -> (timeKalmanSmoother _),
    "stat_crps_ensemble" -> (statCrpsEnsemble _),
    "stat_pit_calibration" -> (statPitCalibration _),
  )

  val oracle: Map[String, String] = Map(
    "analytics_wagner_whitin" -> analyticsWagnerWhitinSql,
    "time_kalman_smoother" -> timeKalmanSmootherSql,
    "stat_crps_ensemble" -> statCrpsEnsembleSql,
    "stat_pit_calibration" -> statPitCalibrationSql,
  )
}
