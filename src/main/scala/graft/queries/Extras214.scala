package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 114 (C860–C863): distribution distance + elastic similarity +
  * variance homogeneity + intermittent demand — the 1-Wasserstein
  * distance as exact integer area between empirical CDFs, DTW over the
  * bounded monthly dictionary, the Brown–Forsythe Levene test on
  * GlobalRank group medians, and Croston's method for sparse demand.
  *
  * Shared discipline: every corpus-scale cumulative rides
  * `plans/GlobalRank` (never an empty-partition window); integer/
  * DECIMAL arithmetic is exact until ONE final IEEE division per
  * emitted figure; bounded calendar dictionaries (24 months, ≤366
  * weeks) may be collected and looped driver-side with the identical
  * literal arithmetic replayed by a recursive-CTE oracle.
  */
object Extras214 {

  /** C860 stat_wasserstein_1d — the 1-Wasserstein (earth mover)
    * distance between the order-total distributions of the BUILDING
    * and MACHINERY customer segments: W₁ = ∫|F_A−F_B|dx over the
    * pooled support. Per-value counts from one hash aggregation;
    * cumulatives from TWO GlobalRank prefix-sum passes over the
    * distinct-value frame (corpus-scale, never a single-task window);
    * the next-support-point gap from a rank self-join. Every term
    * |cumA·N_B − cumB·N_A|·gap is an exact integer (DECIMAL(38,0)
    * both engines); ONE final division by N_A·N_B. The
    * metric-space complement of the KS/AD sup-norm family: weighs HOW
    * FAR mass must move, not just where the CDFs differ.
    */
  def statWasserstein1d(s: SparkSession, d: String): DataFrame = {
    val base = customer(s, d)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("a"))
    val pv = base.groupBy("cv")
      .agg(sum(col("a")).as("na"), sum(lit(1L) - col("a")).as("nb"))
    // rank + two prefix sums over the SAME cv-order: one combined
    // two-pass machinery instead of three (r14); the neighbor frame
    // reads the same combined output, not a second rank pass, and the
    // totals roll up exactly from the pinned spine (longs) instead of
    // re-running the customer⋈orders aggregation
    val cum = graft.plans.GlobalRank.withRankAndPrefixSums(pv, Some("rn"),
      Seq((col("na"), "pa"), (col("nb"), "pb")), Seq(col("cv").asc))
    val tot = cum.agg(sum(col("na")).cast("long").as("tna"),
      sum(col("nb")).cast("long").as("tnb"))
    val nxt = cum.select((col("rn") - 1).as("rn"), col("cv").as("cv_next"))
    // inner join drops the max-rank row: its |F_A−F_B| is 0 anyway
    cum.join(nxt, "rn")
      .crossJoin(broadcast(tot))
      .select(col("tna"), col("tnb"),
        expr("""abs(CAST(pa + na AS DECIMAL(38,0)) * tnb
                |  - CAST(pb + nb AS DECIMAL(38,0)) * tna)
                |* (cv_next - cv)""".stripMargin).as("w"))
      .groupBy("tna", "tnb")
      .agg(sum(col("w")).cast("decimal(38,0)").as("sw"),
        count(lit(1)).cast("long").as("k"))
      .selectExpr("tna AS n_building", "tnb AS n_machinery",
        "k + 1 AS n_support",
        """round(CAST(sw AS DOUBLE)
          |/ (CAST(tna AS DOUBLE) * tnb) / 100, 6) AS w1_dollars""".stripMargin)
  }
  val statWasserstein1dSql: String =
    """WITH base AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv,
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS a
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |pv AS (
      |  SELECT cv, CAST(sum(a) AS BIGINT) AS na,
      |    CAST(sum(1 - a) AS BIGINT) AS nb
      |  FROM base GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(na) AS BIGINT) AS tna, CAST(sum(nb) AS BIGINT) AS tnb
      |  FROM pv),
      |cum AS (
      |  SELECT cv,
      |    sum(na) OVER w AS ca, sum(nb) OVER w AS cb,
      |    lead(cv) OVER (ORDER BY cv) AS nxt
      |  FROM pv
      |  WINDOW w AS (ORDER BY cv ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |terms AS (
      |  SELECT t.tna, t.tnb,
      |    abs(CAST(c.ca AS HUGEINT) * t.tnb - CAST(c.cb AS HUGEINT) * t.tna)
      |      * (c.nxt - c.cv) AS w
      |  FROM cum c, tot t WHERE c.nxt IS NOT NULL)
      |SELECT tna AS n_building, tnb AS n_machinery,
      |  CAST(count(*) + 1 AS BIGINT) AS n_support,
      |  round(CAST(sum(w) AS DOUBLE) / (CAST(tna AS DOUBLE) * tnb) / 100, 6)
      |    AS w1_dollars
      |FROM terms GROUP BY tna, tnb""".stripMargin

  /** C861 time_dtw_months — dynamic time warping between the 1995 and
    * 1996 monthly revenue curves: exact BIGINT cell costs |aᵢ−bⱼ| over
    * the bounded 24-month calendar dictionary (collected driver-side,
    * the Holt–Winters idiom), the 12×12 DP evaluated as a Scala loop
    * vs a 144-step recursive-CTE oracle carrying a sliding 13-slot DP
    * window — bit-identical integers end to end. The elastic distance
    * that matches shifted seasonal shapes where lockstep Euclidean
    * punishes one-month phase lag.
    */
  def timeDtwMonths(s: SparkSession, d: String): DataFrame = {
    val monthly = orders(s, d)
      .filter(expr("year(o_orderdate) IN (1995, 1996)"))
      .groupBy(expr("year(o_orderdate)").as("y"), expr("month(o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val a = (1 to 12).map(m => monthly.getOrElse((1995, m), 0L))
    val b = (1 to 12).map(m => monthly.getOrElse((1996, m), 0L))
    val dp = Array.ofDim[Long](12, 12)
    for (i <- 0 until 12; j <- 0 until 12) {
      val c = math.abs(a(i) - b(j))
      dp(i)(j) = c + ((i, j) match {
        case (0, 0) => 0L
        case (0, _) => dp(0)(j - 1)
        case (_, 0) => dp(i - 1)(0)
        case _      => math.min(dp(i - 1)(j - 1), math.min(dp(i - 1)(j), dp(i)(j - 1)))
      })
    }
    import s.implicits._
    Seq((dp(11)(11), a.sum, b.sum)).toDF("d0", "ya0", "yb0")
      .selectExpr("CAST(12 AS BIGINT) AS n_months",
        "round(CAST(d0 AS DOUBLE) / 100, 2) AS dtw_dollars",
        "round(CAST(ya0 AS DOUBLE) / 100, 2) AS rev_1995",
        "round(CAST(yb0 AS DOUBLE) / 100, 2) AS rev_1996")
  }
  val timeDtwMonthsSql: String = {
    // the DP cell value, repeated verbatim where the carried list
    // needs it (the Holt–Winters repeated-expression idiom)
    val dNew =
      """CAST(abs(av.a[(r.t + 1) // 12 + 1] - bv.b[(r.t + 1) % 12 + 1]) AS HUGEINT)
        |+ CASE WHEN r.t + 1 = 0 THEN CAST(0 AS HUGEINT)
        |       WHEN (r.t + 1) // 12 = 0 THEN r.l[13]
        |       WHEN (r.t + 1) % 12 = 0 THEN r.l[2]
        |       ELSE least(r.l[13], r.l[2], r.l[1]) END""".stripMargin
    s"""WITH RECURSIVE ma AS (
      |  SELECT CAST(month(o_orderdate) AS INT) AS m,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
      |mb AS (
      |  SELECT CAST(month(o_orderdate) AS INT) AS m,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
      |grid AS (SELECT unnest(generate_series(1, 12)) AS m),
      |av AS (SELECT list(coalesce(ma.v, 0) ORDER BY g.m) AS a
      |  FROM grid g LEFT JOIN ma ON ma.m = g.m),
      |bv AS (SELECT list(coalesce(mb.v, 0) ORDER BY g.m) AS b
      |  FROM grid g LEFT JOIN mb ON mb.m = g.m),
      |rec AS (
      |  SELECT -1 AS t, CAST(0 AS HUGEINT) AS d,
      |    list_transform(generate_series(1, 13), x -> CAST(NULL AS HUGEINT)) AS l
      |  FROM av
      |  UNION ALL
      |  SELECT r.t + 1,
      |    $dNew,
      |    r.l[2:13] || [$dNew]
      |  FROM rec r, av, bv WHERE r.t < 143),
      |fin AS (SELECT d FROM rec WHERE t = 143)
      |SELECT CAST(12 AS BIGINT) AS n_months,
      |  round(CAST(fin.d AS DOUBLE) / 100, 2) AS dtw_dollars,
      |  round(CAST((SELECT sum(v) FROM ma) AS DOUBLE) / 100, 2) AS rev_1995,
      |  round(CAST((SELECT sum(v) FROM mb) AS DOUBLE) / 100, 2) AS rev_1996
      |FROM fin""".stripMargin
  }

  /** C862 stat_levene_bf — the Brown–Forsythe (median-centered Levene)
    * test for variance homogeneity of customer account balances across
    * the 5 market segments. Per-group medians are exact order
    * statistics off ONE GlobalRank pass (global rank − broadcast group
    * offset = within-group rank; both middle ranks summed so even/odd
    * group sizes share one expression, med2 = x₍m₁₎+x₍m₂₎ = twice the
    * median in cents, exact). z = |2x − med2| is an exact integer —
    * the scale unit cancels in F, so the one-way ANOVA on z runs
    * entirely in half-cent units: per-group quantized terms
    * (·10⁻³-scaled floors of identical doubles), exact BIGINT sums,
    * F = (N−k)·SSB / ((k−1)·SSW). The robust sibling of
    * `stat_bartlett` — valid under non-normality where Bartlett's χ²
    * is badly anti-conservative.
    */
  def statLeveneBf(s: SparkSession, d: String): DataFrame = {
    val base = customer(s, d)
      .select(col("c_mktsegment").as("seg"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"),
        col("c_custkey").as("key"))
    val rnk = graft.plans.GlobalRank
      .withGlobalRowNumber(base, "rn", Seq(col("seg").asc, col("cv").asc, col("key").asc))
    val gb = rnk.groupBy("seg")
      .agg(min(col("rn")).as("rn0"), count(lit(1)).cast("long").as("ng"))
      .withColumn("m1", expr("(ng + 1) div 2"))
      .withColumn("m2", expr("ng div 2 + 1"))
    val meds = rnk.join(broadcast(gb), "seg")
      .withColumn("lr", col("rn") - col("rn0") + 1)
      .groupBy("seg")
      .agg(sum(expr(
        """cv * (CASE WHEN lr = m1 THEN 1 ELSE 0 END
          |      + CASE WHEN lr = m2 THEN 1 ELSE 0 END)""".stripMargin))
        .cast("long").as("med2"),
        max(col("ng")).as("ng"))
    val per = base.join(broadcast(meds), "seg")
      .select(col("seg"), col("ng"), expr("abs(2 * cv - med2)").as("z"))
      .groupBy("seg")
      .agg(max(col("ng")).as("ng"),
        sum(col("z")).cast("decimal(38,0)").as("sz"),
        sum(expr("CAST(z AS DECIMAL(38,0)) * z")).cast("decimal(38,0)").as("qz"))
    val tot = per.agg(count(lit(1)).cast("long").as("k"),
      sum(col("ng")).cast("long").as("n"),
      sum(col("sz")).cast("decimal(38,0)").as("st"))
    per.crossJoin(broadcast(tot))
      .select(col("k"), col("n"),
        expr("""CAST(floor(CAST(ng AS DOUBLE)
                |  * (CAST(sz AS DOUBLE) / ng - CAST(st AS DOUBLE) / n)
                |  * (CAST(sz AS DOUBLE) / ng - CAST(st AS DOUBLE) / n)
                |  / 1e3 + 0.5) AS BIGINT)""".stripMargin).as("aq"),
        expr("""CAST(floor((CAST(qz AS DOUBLE)
                |  - CAST(sz AS DOUBLE) / ng * CAST(sz AS DOUBLE))
                |  / 1e3 + 0.5) AS BIGINT)""".stripMargin).as("bq"))
      .groupBy("k", "n")
      .agg(sum(col("aq")).cast("long").as("sa"), sum(col("bq")).cast("long").as("sb"))
      .selectExpr("k", "n", "k - 1 AS df1", "n - k AS df2",
        """round((CAST(n AS DOUBLE) - k) * sa
          |/ ((CAST(k AS DOUBLE) - 1) * sb), 6) AS f_bf""".stripMargin)
  }
  val statLeveneBfSql: String =
    """WITH base AS (
      |  SELECT c_mktsegment AS seg,
      |    CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv,
      |    c_custkey AS key
      |  FROM customer),
      |rnk AS (
      |  SELECT seg, cv,
      |    row_number() OVER (PARTITION BY seg ORDER BY cv, key) AS lr
      |  FROM base),
      |gb AS (
      |  SELECT seg, CAST(count(*) AS BIGINT) AS ng,
      |    (count(*) + 1) // 2 AS m1, count(*) // 2 + 1 AS m2
      |  FROM base GROUP BY 1),
      |meds AS (
      |  SELECT r.seg,
      |    CAST(sum(r.cv * (CASE WHEN r.lr = g.m1 THEN 1 ELSE 0 END
      |      + CASE WHEN r.lr = g.m2 THEN 1 ELSE 0 END)) AS BIGINT) AS med2,
      |    max(g.ng) AS ng
      |  FROM rnk r JOIN gb g ON r.seg = g.seg GROUP BY 1),
      |per AS (
      |  SELECT b.seg, max(m.ng) AS ng,
      |    CAST(sum(abs(2 * b.cv - m.med2)) AS DECIMAL(38,0)) AS sz,
      |    CAST(sum(CAST(abs(2 * b.cv - m.med2) AS HUGEINT)
      |      * abs(2 * b.cv - m.med2)) AS DECIMAL(38,0)) AS qz
      |  FROM base b JOIN meds m ON b.seg = m.seg GROUP BY 1),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
      |    CAST(sum(sz) AS DECIMAL(38,0)) AS st
      |  FROM per),
      |pt AS (
      |  SELECT t.k, t.n,
      |    CAST(floor(CAST(p.ng AS DOUBLE)
      |      * (CAST(p.sz AS DOUBLE) / p.ng - CAST(t.st AS DOUBLE) / t.n)
      |      * (CAST(p.sz AS DOUBLE) / p.ng - CAST(t.st AS DOUBLE) / t.n)
      |      / 1e3 + 0.5) AS BIGINT) AS aq,
      |    CAST(floor((CAST(p.qz AS DOUBLE)
      |      - CAST(p.sz AS DOUBLE) / p.ng * CAST(p.sz AS DOUBLE))
      |      / 1e3 + 0.5) AS BIGINT) AS bq
      |  FROM per p, tot t),
      |ag AS (
      |  SELECT k, n, CAST(sum(aq) AS BIGINT) AS sa, CAST(sum(bq) AS BIGINT) AS sb
      |  FROM pt GROUP BY k, n)
      |SELECT k, n, k - 1 AS df1, n - k AS df2,
      |  round((CAST(n AS DOUBLE) - k) * sa / ((CAST(k AS DOUBLE) - 1) * sb), 6) AS f_bf
      |FROM ag""".stripMargin

  /** C863 time_croston_demand — Croston's method for intermittent
    * demand on the weekly Brand#11 quantity series: weeks on the
    * bounded 1992–1998 grid (≤366 demand weeks, a calendar-bounded
    * dictionary), demand sizes and inter-demand intervals smoothed
    * separately (α = 0.1, z₁ = q₁, x₁ = 1), forecast rate z/x plus the
    * Syntetos–Boylan approximation (1−α/2)·z/x that removes Croston's
    * inversion bias. Scala loop vs recursive-CTE oracle replaying the
    * identical literal arithmetic — the forecasting shape for the long
    * tail of parts that sell a few units some weeks and zero most.
    */
  def timeCrostonDemand(s: SparkSession, d: String): DataFrame = {
    val wk = lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === "Brand#11")
      .groupBy(expr(
        "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1992-01-01') div 7 AS BIGINT)").as("w"))
      .agg(sum(expr("CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"))
        .cast("long").as("q"))
      .orderBy("w")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var z = wk.head._2 / 100.0
    var x = 1.0
    for (k <- 1 until wk.length) {
      val iv = (wk(k)._1 - wk(k - 1)._1).toDouble
      val q = wk(k)._2 / 100.0
      z = 0.1 * q + 0.9 * z
      x = 0.1 * iv + 0.9 * x
    }
    import s.implicits._
    Seq((wk.length.toLong, wk.head._1, wk.last._1, z, x)).toDF("k", "w0", "wl", "z0", "x0")
      .selectExpr("k AS n_demand_weeks", "wl - w0 + 1 AS span_weeks",
        "round(z0, 6) AS z_size", "round(x0, 6) AS x_interval",
        "round(z0 / x0, 6) AS croston_rate",
        "round(0.95 * (z0 / x0), 6) AS sba_rate")
  }
  val timeCrostonDemandSql: String =
    """WITH RECURSIVE wk AS (
      |  SELECT CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) // 7 AS BIGINT) AS w,
      |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#11'
      |  GROUP BY 1),
      |seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY w) AS BIGINT) AS r, w,
      |    CAST(q AS DOUBLE) / 100 AS q,
      |    CAST(w - lag(w) OVER (ORDER BY w) AS DOUBLE) AS iv
      |  FROM wk),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS k,
      |  CAST(min(w) AS BIGINT) AS w0, CAST(max(w) AS BIGINT) AS wl FROM seq),
      |rec AS (
      |  SELECT CAST(1 AS BIGINT) AS r, q AS z, CAST(1 AS DOUBLE) AS x
      |  FROM seq WHERE r = 1
      |  UNION ALL
      |  SELECT s.r, 0.1 * s.q + 0.9 * rec.z, 0.1 * s.iv + 0.9 * rec.x
      |  FROM rec JOIN seq s ON s.r = rec.r + 1),
      |fin AS (SELECT z, x FROM rec ORDER BY r DESC LIMIT 1)
      |SELECT nn.k AS n_demand_weeks, nn.wl - nn.w0 + 1 AS span_weeks,
      |  round(fin.z, 6) AS z_size, round(fin.x, 6) AS x_interval,
      |  round(fin.z / fin.x, 6) AS croston_rate,
      |  round(0.95 * (fin.z / fin.x), 6) AS sba_rate
      |FROM fin, nn""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_wasserstein_1d" -> (statWasserstein1d _),
    "time_dtw_months" -> (timeDtwMonths _),
    "stat_levene_bf" -> (statLeveneBf _),
    "time_croston_demand" -> (timeCrostonDemand _),
  )

  val oracle: Map[String, String] = Map(
    "stat_wasserstein_1d" -> statWasserstein1dSql,
    "time_dtw_months" -> timeDtwMonthsSql,
    "stat_levene_bf" -> statLeveneBfSql,
    "time_croston_demand" -> timeCrostonDemandSql,
  )
}
