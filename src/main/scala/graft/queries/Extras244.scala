package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 144 (C980–C983): local spatial structure + robust scale/shape
  * — local Moran's I (the LISA drill-down C921's global Moran points
  * at), the four-estimator robust scale battery (MAD/IQR/Qn/Sn), the
  * winsorized Pearson correlation, and the medcouple robust skewness
  * that calibrates adjusted-boxplot fences.
  *
  * Shared discipline: LISA works on exact centered integers n·v−Σv
  * over the ≤1024-cell torus with the top-5 ranked by the EXACT
  * integer numerator; the scale battery and medcouple are exact
  * order statistics on the bounded month frame with the fixed
  * odd/even median convention; winsorizing thresholds come off the
  * exact value-histogram spine before integer clamped moments.
  */
object Extras244 {

  /** C980 stat_local_moran — local Moran's Iᵢ (LISA) on the 32×32
    * customer hash torus: Iᵢ = zᵢ·Σ_nbr zⱼ/m₂ over the rook graph,
    * centered values as exact integers (n·v − Σv), the top-5 cells by
    * the EXACT integer numerator (no float enters the ranking), each
    * labeled with its Moran quadrant (HH/LL = clusters, HL/LH =
    * spatial outliers). C921's global I says "clustered"; this says
    * WHERE — the drill-down every hot-spot map is.
    */
  def statLocalMoran(s: SparkSession, d: String): DataFrame = {
    val g = orders(s, d)
      .groupBy(
        expr("pmod(conv(substring(md5(concat('x', CAST(o_custkey AS STRING))), 1, 4), 16, 10), 32)")
          .cast("long").as("cx"),
        expr("pmod(conv(substring(md5(concat('y', CAST(o_custkey AS STRING))), 1, 4), 16, 10), 32)")
          .cast("long").as("cy"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("v"))
      .localCheckpoint(true)
    val tot = g.agg(count(lit(1)).cast("long").as("n"),
      sum(col("v")).cast("decimal(38,0)").as("sv"))
    val cent = g.crossJoin(broadcast(tot))
      .selectExpr("cx", "cy", "n", "CAST(n AS DECIMAL(38,0)) * v - sv AS w")
      .localCheckpoint(true)
    val m2 = cent.agg(
      sum(expr("CAST(w AS DECIMAL(38,0)) * w")).cast("decimal(38,0)").as("sww"))
    val nbr = cent
      .select(explode(expr(
        "array(named_struct('dx', 1L, 'dy', 0L), named_struct('dx', -1L, 'dy', 0L), named_struct('dx', 0L, 'dy', 1L), named_struct('dx', 0L, 'dy', -1L))"))
        .as("o"), col("cx"), col("cy"), col("w"))
      .select(expr("pmod(cx + o.dx, 32)").as("cx"), expr("pmod(cy + o.dy, 32)").as("cy"),
        col("w").as("wn"))
      .groupBy("cx", "cy")
      .agg(sum(col("wn")).cast("decimal(38,0)").as("wlag"))
    cent.join(nbr, Seq("cx", "cy"))
      .crossJoin(broadcast(m2))
      .selectExpr("cx", "cy",
        "CAST(w AS DECIMAL(38,0)) * wlag AS num",
        """CAST(CAST(w AS DECIMAL(38,0)) * wlag AS DOUBLE) * n
          |/ CAST(sww AS DOUBLE) AS li""".stripMargin,
        """CASE WHEN w > 0 AND wlag > 0 THEN 'HH'
          |  WHEN w < 0 AND wlag < 0 THEN 'LL'
          |  WHEN w > 0 THEN 'HL' ELSE 'LH' END AS quadrant""".stripMargin)
      .orderBy(abs(col("num")).desc, col("cx"), col("cy")).limit(5)
      .selectExpr("cx", "cy", "round(li, 6) AS local_i", "quadrant")
  }
  val statLocalMoranSql: String =
    """WITH g AS (
      |  SELECT CAST(CAST('0x' || substr(md5('x' || CAST(o_custkey AS VARCHAR)), 1, 4) AS BIGINT) % 32 AS BIGINT) AS cx,
      |    CAST(CAST('0x' || substr(md5('y' || CAST(o_custkey AS VARCHAR)), 1, 4) AS BIGINT) % 32 AS BIGINT) AS cy,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS v
      |  FROM orders GROUP BY 1, 2),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(v) AS DECIMAL(38,0)) AS sv FROM g),
      |cent AS (
      |  SELECT cx, cy, n, CAST(n AS DECIMAL(38,0)) * v - sv AS w FROM g, tot),
      |m2 AS (SELECT max(n) AS n,
      |  CAST(sum(CAST(w AS DECIMAL(38,0)) * w) AS DECIMAL(38,0)) AS sww FROM cent),
      |nbr AS (
      |  SELECT (cx + dx + 32) % 32 AS cx, (cy + dy + 32) % 32 AS cy,
      |    CAST(sum(w) AS DECIMAL(38,0)) AS wlag
      |  FROM cent, (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dx, dy)
      |  GROUP BY 1, 2),
      |fin AS (
      |  SELECT c.cx, c.cy,
      |    CAST(c.w AS DECIMAL(38,0)) * wlag AS num,
      |    CAST(CAST(c.w AS DECIMAL(38,0)) * wlag AS DOUBLE) * m2.n
      |      / CAST(sww AS DOUBLE) AS li,
      |    CASE WHEN c.w > 0 AND wlag > 0 THEN 'HH'
      |      WHEN c.w < 0 AND wlag < 0 THEN 'LL'
      |      WHEN c.w > 0 THEN 'HL' ELSE 'LH' END AS quadrant
      |  FROM cent c JOIN nbr ON c.cx = nbr.cx AND c.cy = nbr.cy, m2)
      |SELECT cx, cy, round(li, 6) AS local_i, quadrant
      |FROM fin ORDER BY abs(num) DESC, cx, cy LIMIT 5""".stripMargin

  /** C981 stat_robust_scale_battery — MAD, IQR (Tukey hinges), Qn and
    * Sn (Rousseeuw–Croux) of monthly revenue, each with its Gaussian-
    * consistency constant, as four σ estimates side by side: MAD and
    * IQR lose efficiency (37%/38%), Qn keeps 82% with the same 50%
    * breakdown — the table that justifies WHICH robust scale a
    * monitoring limit uses. All exact integer order statistics on the
    * bounded calendar frame, fixed odd/even median convention.
    */
  def statRobustScaleBattery(s: SparkSession, d: String): DataFrame = {
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .orderBy("m").collect().map(_.getLong(1))
    val n = ms.length
    def med(a: Array[Long]): Double = {
      val so = a.sorted; val k = so.length
      if (k % 2 == 1) so(k / 2).toDouble else (so(k / 2 - 1) + so(k / 2)) / 2.0
    }
    val m0 = med(ms)
    val mad = med(ms.map(x => math.abs(x - math.floor(m0 + 0.5).toLong)))
    val sorted = ms.sorted
    val half = n / 2
    val q1 = med(sorted.take(half)); val q3 = med(sorted.takeRight(half))
    // Qn: k-th order statistic of the C(n,2) pairwise |xi-xj|, k = h(h-1)/2, h = n/2+1
    val diffs = (for (i <- 0 until n; j <- (i + 1) until n)
      yield math.abs(ms(i) - ms(j))).sorted
    val h = n / 2 + 1
    val qn = diffs(h * (h - 1) / 2 - 1).toDouble
    // Sn: lomed_i himed_{j!=i} |xi-xj| with the same fixed median rule
    val sn = med((0 until n).map { i =>
      val ds = (0 until n).filter(_ != i).map(j => math.abs(ms(i) - ms(j))).sorted
      // position (m+1)//2 (1-based) of the m = n-1 diffs: for even m this
      // is the LOWER median, not Sn's textbook high median ((m+2)//2) —
      // both engines share this convention (and m is odd for the even
      // month count here), so results agree; do not "fix" one side alone
      ds((ds.length + 1) / 2 - 1)
    }.toArray.map(_.toLong))
    import s.implicits._
    Seq(
      ("iqr_1349", (q3 - q1) / 1.349),
      ("mad_14826", mad * 1.4826),
      ("qn_22219", qn * 2.2219),
      ("sn_11926", sn * 1.1926),
    ).toDF("estimator", "scale")
      .selectExpr("estimator", "round(scale / 100, 2) AS sigma_hat_dollars")
      .orderBy("estimator")
  }
  val statRobustScaleBatterySql: String =
    """WITH seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t, v FROM (
      |    SELECT date_trunc('month', o_orderdate) AS m,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1)),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seq),
      |m0 AS (
      |  SELECT avg(v) AS m FROM (
      |    SELECT v, row_number() OVER (ORDER BY v, t) AS rn, count(*) OVER () AS k
      |    FROM seq) WHERE rn IN ((k + 1) // 2, (k + 2) // 2)),
      |mad AS (
      |  SELECT avg(d) AS mad FROM (
      |    SELECT abs(v - CAST(floor(m + 0.5) AS BIGINT)) AS d,
      |      row_number() OVER (ORDER BY abs(v - CAST(floor(m + 0.5) AS BIGINT)), t) AS rn,
      |      count(*) OVER () AS k
      |    FROM seq, m0) WHERE rn IN ((k + 1) // 2, (k + 2) // 2)),
      |ranked AS (
      |  SELECT v, row_number() OVER (ORDER BY v, t) AS rn FROM seq),
      |q1 AS (
      |  SELECT avg(v) AS q FROM (
      |    SELECT v, row_number() OVER (ORDER BY rn) AS r2, count(*) OVER () AS k
      |    FROM ranked, nn WHERE rn <= n // 2)
      |  WHERE r2 IN ((k + 1) // 2, (k + 2) // 2)),
      |q3 AS (
      |  SELECT avg(v) AS q FROM (
      |    SELECT v, row_number() OVER (ORDER BY rn) AS r2, count(*) OVER () AS k
      |    FROM ranked, nn WHERE rn > n - n // 2)
      |  WHERE r2 IN ((k + 1) // 2, (k + 2) // 2)),
      |diffs AS (
      |  SELECT abs(a.v - b.v) AS d, a.t AS i, b.t AS j
      |  FROM seq a JOIN seq b ON a.t < b.t),
      |qn AS (
      |  SELECT CAST(d AS DOUBLE) AS qn FROM (
      |    SELECT d, row_number() OVER (ORDER BY d, i, j) AS rn FROM diffs),
      |    nn
      |  WHERE rn = ((n // 2 + 1) * (n // 2)) // 2),
      |sn AS (
      |  SELECT avg(hm) AS sn FROM (
      |    SELECT hm, row_number() OVER (ORDER BY hm, i) AS rn, count(*) OVER () AS k
      |    FROM (
      |      SELECT i, CAST(d AS DOUBLE) AS hm FROM (
      |        SELECT a.t AS i, abs(a.v - b.v) AS d,
      |          row_number() OVER (PARTITION BY a.t ORDER BY abs(a.v - b.v), b.t) AS rnd,
      |          count(*) OVER (PARTITION BY a.t) AS m
      |        FROM seq a JOIN seq b ON a.t <> b.t)
      |      WHERE rnd = (m + 1) // 2))
      |  WHERE rn IN ((k + 1) // 2, (k + 2) // 2))
      |SELECT estimator, round(scale / 100, 2) AS sigma_hat_dollars FROM (
      |  SELECT 'iqr_1349' AS estimator, (q3.q - q1.q) / 1.349 AS scale FROM q1, q3
      |  UNION ALL SELECT 'mad_14826', mad * 1.4826 FROM mad
      |  UNION ALL SELECT 'qn_22219', qn * 2.2219 FROM qn
      |  UNION ALL SELECT 'sn_11926', sn * 1.1926 FROM sn)
      |ORDER BY estimator""".stripMargin

  /** C982 stat_winsorized_corr — the 5%/95%-winsorized Pearson
    * correlation between line quantity and extended price, next to the
    * raw r: clamp thresholds are exact order statistics off each
    * variable's value-histogram spine, clamped values stay integers,
    * and both correlations come from exact DECIMAL moments. What a
    * robust "are these related" answer looks like when the tails are
    * wild — and the exhibit of how much tail the raw r was buying.
    */
  def statWinsorizedCorr(s: SparkSession, d: String): DataFrame = {
    // r14: no eager checkpoint — the three consumers re-read the
    // column-pruned parquet scan (cheaper than materializing 600k rows,
    // and it lets the plan gate prove the x histogram's bounded domain)
    val li = lineitem(s, d).select(
      expr("CAST(l_quantity AS BIGINT)").as("x"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("y"))
    def thresholds(cn: String): DataFrame = {
      val pv = li.groupBy(cn).agg(count(lit(1)).cast("long").as("c"))
      // x = l_quantity (1..50, bounded): single-task window; y = price
      // cents (corpus-scale histogram): two-pass GlobalRank
      val spine =
        if (cn == "x") graft.plans.BoundedPrefix.prefixSum(
          pv, "cb", col("c"), Seq(col(cn).asc))
        else graft.plans.GlobalRank.withExclusivePrefixSum(
          pv, "cb", col("c"), Seq(col(cn).asc))
      val n = pv.agg(sum(col("c")).cast("long").as("n"))
      spine.crossJoin(broadcast(n))
        .selectExpr(s"$cn AS v", "cb", "c", "n")
        .agg(
          min(expr("CASE WHEN cb + c >= CAST(ceil(CAST(n AS DOUBLE) * 0.05) AS BIGINT) THEN v END")).as(s"lo_$cn"),
          min(expr("CASE WHEN cb + c >= CAST(ceil(CAST(n AS DOUBLE) * 0.95) AS BIGINT) THEN v END")).as(s"hi_$cn"))
    }
    val clamped = li.crossJoin(broadcast(thresholds("x"))).crossJoin(broadcast(thresholds("y")))
      .selectExpr("x", "y",
        "least(greatest(x, lo_x), hi_x) AS xw",
        "least(greatest(y, lo_y), hi_y) AS yw")
    def corrOf(xc: String, yc: String, out: String): String =
      s"""round((CAST(m AS DOUBLE) * CAST(s_${xc}${yc} AS DOUBLE) - CAST(s_$xc AS DOUBLE) * CAST(s_$yc AS DOUBLE))
         |/ sqrt((CAST(m AS DOUBLE) * CAST(s_$xc$xc AS DOUBLE) - CAST(s_$xc AS DOUBLE) * CAST(s_$xc AS DOUBLE))
         |  * (CAST(m AS DOUBLE) * CAST(s_$yc$yc AS DOUBLE) - CAST(s_$yc AS DOUBLE) * CAST(s_$yc AS DOUBLE))), 6) AS $out""".stripMargin
    clamped.agg(
      count(lit(1)).cast("long").as("m"),
      sum(col("x")).cast("decimal(38,0)").as("s_x"),
      sum(col("y")).cast("decimal(38,0)").as("s_y"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("s_xx"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("s_yy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("s_xy"),
      sum(col("xw")).cast("decimal(38,0)").as("s_w"),
      sum(col("yw")).cast("decimal(38,0)").as("s_z"),
      sum(expr("CAST(xw AS DECIMAL(38,0)) * xw")).cast("decimal(38,0)").as("s_ww"),
      sum(expr("CAST(yw AS DECIMAL(38,0)) * yw")).cast("decimal(38,0)").as("s_zz"),
      sum(expr("CAST(xw AS DECIMAL(38,0)) * yw")).cast("decimal(38,0)").as("s_wz"))
      .selectExpr("m AS n_items",
        corrOf("x", "y", "pearson_raw"),
        corrOf("w", "z", "pearson_winsorized"))
  }
  val statWinsorizedCorrSql: String =
    """WITH li AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y
      |  FROM lineitem),
      |nx AS (SELECT CAST(count(*) AS BIGINT) AS n FROM li),
      |thx AS (
      |  SELECT min(CASE WHEN cum >= CAST(ceil(CAST(n AS DOUBLE) * 0.05) AS BIGINT) THEN v END) AS lo_x,
      |    min(CASE WHEN cum >= CAST(ceil(CAST(n AS DOUBLE) * 0.95) AS BIGINT) THEN v END) AS hi_x
      |  FROM (
      |    SELECT x AS v, CAST(sum(count(*)) OVER (ORDER BY x) AS BIGINT) AS cum
      |    FROM li GROUP BY x), nx),
      |thy AS (
      |  SELECT min(CASE WHEN cum >= CAST(ceil(CAST(n AS DOUBLE) * 0.05) AS BIGINT) THEN v END) AS lo_y,
      |    min(CASE WHEN cum >= CAST(ceil(CAST(n AS DOUBLE) * 0.95) AS BIGINT) THEN v END) AS hi_y
      |  FROM (
      |    SELECT y AS v, CAST(sum(count(*)) OVER (ORDER BY y) AS BIGINT) AS cum
      |    FROM li GROUP BY y), nx),
      |clamped AS (
      |  SELECT x, y,
      |    least(greatest(x, lo_x), hi_x) AS xw,
      |    least(greatest(y, lo_y), hi_y) AS yw
      |  FROM li, thx, thy),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(CAST(x AS HUGEINT)) AS DECIMAL(38,0)) AS s_x,
      |    CAST(sum(CAST(y AS HUGEINT)) AS DECIMAL(38,0)) AS s_y,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS s_xx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS s_yy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS s_xy,
      |    CAST(sum(CAST(xw AS HUGEINT)) AS DECIMAL(38,0)) AS s_w,
      |    CAST(sum(CAST(yw AS HUGEINT)) AS DECIMAL(38,0)) AS s_z,
      |    CAST(sum(CAST(xw AS HUGEINT) * xw) AS DECIMAL(38,0)) AS s_ww,
      |    CAST(sum(CAST(yw AS HUGEINT) * yw) AS DECIMAL(38,0)) AS s_zz,
      |    CAST(sum(CAST(xw AS HUGEINT) * yw) AS DECIMAL(38,0)) AS s_wz
      |  FROM clamped)
      |SELECT m AS n_items,
      |  round((CAST(m AS DOUBLE) * CAST(s_xy AS DOUBLE) - CAST(s_x AS DOUBLE) * CAST(s_y AS DOUBLE))
      |  / sqrt((CAST(m AS DOUBLE) * CAST(s_xx AS DOUBLE) - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE))
      |    * (CAST(m AS DOUBLE) * CAST(s_yy AS DOUBLE) - CAST(s_y AS DOUBLE) * CAST(s_y AS DOUBLE))), 6) AS pearson_raw,
      |  round((CAST(m AS DOUBLE) * CAST(s_wz AS DOUBLE) - CAST(s_w AS DOUBLE) * CAST(s_z AS DOUBLE))
      |  / sqrt((CAST(m AS DOUBLE) * CAST(s_ww AS DOUBLE) - CAST(s_w AS DOUBLE) * CAST(s_w AS DOUBLE))
      |    * (CAST(m AS DOUBLE) * CAST(s_zz AS DOUBLE) - CAST(s_z AS DOUBLE) * CAST(s_z AS DOUBLE))), 6) AS pearson_winsorized
      |FROM mom""".stripMargin

  /** C983 stat_medcouple — the medcouple robust skewness of monthly
    * revenue: MC = med over (xᵢ ≤ m ≤ xⱼ, xᵢ≠xⱼ) of
    * ((xⱼ−m)−(m−xᵢ))/(xⱼ−xᵢ), the bounded-influence skewness that
    * calibrates adjusted-boxplot fences (1.5·e^{∓3.5MC}·IQR) — the
    * right whisker rule for skewed distributions where the plain 1.5
    * IQR flags a third of the data. Exact kernel on the bounded month
    * frame; fences reported in dollars.
    */
  def statMedcouple(s: SparkSession, d: String): DataFrame = {
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .orderBy("m").collect().map(_.getLong(1))
    val n = ms.length
    def medD(a: Array[Double]): Double = {
      val so = a.sorted; val k = so.length
      if (k % 2 == 1) so(k / 2) else (so(k / 2 - 1) + so(k / 2)) / 2
    }
    val m0 = medD(ms.map(_.toDouble))
    val lo = ms.filter(_ <= m0); val hi = ms.filter(_ >= m0)
    val kern = for (xi <- lo; xj <- hi; if xj != xi)
      yield ((xj - m0) - (m0 - xi)) / (xj - xi).toDouble
    val mc = medD(kern)
    val sorted = ms.sorted
    val half = n / 2
    def medL(a: Array[Long]): Double = {
      val so = a.sorted; val k = so.length
      if (k % 2 == 1) so(k / 2).toDouble else (so(k / 2 - 1) + so(k / 2)) / 2.0
    }
    val q1 = medL(sorted.take(half)); val q3 = medL(sorted.takeRight(half))
    val iqr = q3 - q1
    val loF = q1 - 1.5 * math.exp(-3.5 * mc) * iqr
    val hiF = q3 + 1.5 * math.exp(3.5 * mc) * iqr
    import s.implicits._
    Seq((n.toLong, mc, loF, hiF)).toDF("n0", "mc", "lf", "hf")
      .selectExpr("n0 AS n_months", "round(mc, 6) AS medcouple",
        "round(lf / 100, 2) AS adjusted_lo_fence_dollars",
        "round(hf / 100, 2) AS adjusted_hi_fence_dollars")
  }
  val statMedcoupleSql: String =
    """WITH seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t, v FROM (
      |    SELECT date_trunc('month', o_orderdate) AS m,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1)),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seq),
      |m0 AS (
      |  SELECT avg(CAST(v AS DOUBLE)) AS m FROM (
      |    SELECT v, row_number() OVER (ORDER BY v, t) AS rn, count(*) OVER () AS k
      |    FROM seq) WHERE rn IN ((k + 1) // 2, (k + 2) // 2)),
      |kern AS (
      |  SELECT ((b.v - m) - (m - a.v)) / CAST(b.v - a.v AS DOUBLE) AS h,
      |    a.t AS i, b.t AS j
      |  FROM seq a, seq b, m0
      |  WHERE a.v <= m AND b.v >= m AND a.v <> b.v),
      |mc AS (
      |  SELECT avg(h) AS mc FROM (
      |    SELECT h, row_number() OVER (ORDER BY h, i, j) AS rn, count(*) OVER () AS k
      |    FROM kern) WHERE rn IN ((k + 1) // 2, (k + 2) // 2)),
      |ranked AS (SELECT v, row_number() OVER (ORDER BY v, t) AS rn FROM seq),
      |q1 AS (
      |  SELECT avg(CAST(v AS DOUBLE)) AS q FROM (
      |    SELECT v, row_number() OVER (ORDER BY rn) AS r2, count(*) OVER () AS k
      |    FROM ranked, nn WHERE rn <= n // 2)
      |  WHERE r2 IN ((k + 1) // 2, (k + 2) // 2)),
      |q3 AS (
      |  SELECT avg(CAST(v AS DOUBLE)) AS q FROM (
      |    SELECT v, row_number() OVER (ORDER BY rn) AS r2, count(*) OVER () AS k
      |    FROM ranked, nn WHERE rn > n - n // 2)
      |  WHERE r2 IN ((k + 1) // 2, (k + 2) // 2))
      |SELECT n AS n_months, round(mc, 6) AS medcouple,
      |  round((q1.q - 1.5 * exp(-3.5 * mc) * (q3.q - q1.q)) / 100, 2) AS adjusted_lo_fence_dollars,
      |  round((q3.q + 1.5 * exp(3.5 * mc) * (q3.q - q1.q)) / 100, 2) AS adjusted_hi_fence_dollars
      |FROM nn, mc, q1, q3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_local_moran" -> (statLocalMoran _),
    "stat_robust_scale_battery" -> (statRobustScaleBattery _),
    "stat_winsorized_corr" -> (statWinsorizedCorr _),
    "stat_medcouple" -> (statMedcouple _),
  )

  val oracle: Map[String, String] = Map(
    "stat_local_moran" -> statLocalMoranSql,
    "stat_robust_scale_battery" -> statRobustScaleBatterySql,
    "stat_winsorized_corr" -> statWinsorizedCorrSql,
    "stat_medcouple" -> statMedcoupleSql,
  )
}
