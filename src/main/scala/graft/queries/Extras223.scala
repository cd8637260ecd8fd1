package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 123 (C896–C899): many-to-one contrasts + serial-correlation
  * ratio + inventory segmentation + survival concordance — Dunnett-
  * style treatment-vs-control comparisons, the von Neumann successive-
  * difference ratio, the ABC×XYZ demand-classification matrix, and
  * Harrell's C-index on a bounded (time × risk-bucket) grid.
  *
  * Shared discipline: group moments are exact cent/quantity integer
  * sums; every classification test that could straddle an FP boundary
  * is an EXACT integer inequality (4M(Ms₂−s₁²) < (M−1)s₁² for CV²
  * thresholds, 5·cum ≤ 4·total for the 80% ABC cut); the only global
  * prefix-sum (ABC cumulative revenue) rides GlobalRank; the C-index
  * pair census never enumerates pairs — it counts them from suffix/
  * prefix sums over a ≤(datediff-span × 128-bucket) cell grid.
  */
object Extras223 {

  /** C896 stat_dunnett_control — many-to-one mean contrasts: each
    * order-priority class vs the '1-URGENT' control, Welch standard
    * errors from exact cent moments, Bonferroni-adjusted two-sided
    * normal critical value (α=0.05 over k=4 contrasts — dfs are ~10³n
    * so the t→z approximation is exact to the quantization; the Acklam
    * qnorm is the same arithmetic text in both engines). The
    * "did any treatment arm move vs control" screen run after every
    * A/B/n experiment, without the all-pairs multiplicity loss.
    * Scale: one groupBy over 5 bounded priority classes; the control
    * row is a broadcast; zero windows, zero shuffles beyond the agg.
    */
  def statDunnettControl(s: SparkSession, d: String): DataFrame = {
    val g = orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("v"))
      .groupBy("grp")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("v")).cast("decimal(38,0)").as("s1"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("s2"))
      .selectExpr("grp", "n", "CAST(s1 AS DOUBLE) / n AS m",
        """(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
          | - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          |/ (CAST(n AS DOUBLE) * (n - 1)) AS vv""".stripMargin)
    val ctl = g.filter(col("grp") === "1-URGENT")
      .selectExpr("n AS nc", "m AS mc", "vv AS vc")
    g.filter(col("grp") =!= "1-URGENT").crossJoin(broadcast(ctl))
      .selectExpr("grp", "n", "m - mc AS diff", "sqrt(vv / n + vc / nc) AS se")
      .selectExpr("grp AS treatment", "n",
        "round(diff / 100, 2) AS diff_dollars",
        "round(se / 100, 2) AS se_dollars",
        "round(diff / se, 4) AS t_stat",
        s"round(${QNorm.sql("0.99375")}, 4) AS z_crit",
        s"CASE WHEN abs(diff / se) > ${QNorm.sql("0.99375")} THEN 1L ELSE 0L END AS significant")
      .orderBy("treatment")
  }
  val statDunnettControlSql: String =
    s"""WITH g AS (
      |  SELECT o_orderpriority AS grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS HUGEINT) AS DOUBLE) / count(*) AS m,
      |    (CAST(count(*) AS DOUBLE) * CAST(CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS HUGEINT)
      |        * CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS HUGEINT) AS DOUBLE)
      |     - CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS HUGEINT) AS DOUBLE)
      |       * CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS HUGEINT) AS DOUBLE))
      |    / (CAST(count(*) AS DOUBLE) * (count(*) - 1)) AS vv
      |  FROM orders GROUP BY 1),
      |ctl AS (SELECT n AS nc, m AS mc, vv AS vc FROM g WHERE grp = '1-URGENT'),
      |cmp AS (
      |  SELECT grp, n, m - mc AS diff, sqrt(vv / n + vc / nc) AS se
      |  FROM g, ctl WHERE grp <> '1-URGENT')
      |SELECT grp AS treatment, n,
      |  round(diff / 100, 2) AS diff_dollars,
      |  round(se / 100, 2) AS se_dollars,
      |  round(diff / se, 4) AS t_stat,
      |  round(${QNorm.sql("0.99375")}, 4) AS z_crit,
      |  CAST(CASE WHEN abs(diff / se) > ${QNorm.sql("0.99375")} THEN 1 ELSE 0 END AS BIGINT) AS significant
      |FROM cmp ORDER BY treatment""".stripMargin

  /** C897 time_von_neumann — the von Neumann ratio of mean-square
    * successive differences to the variance on daily revenue:
    * VN = nΣ(xₜ−xₜ₋₁)² / (nΣx²−(Σx)²)·(n−1)... evaluated as the exact
    * rational n·(n−1)·Σd² / (n·s₂−s₁²) over cent integers, with the
    * asymptotic z = (VN−2)/√(4(n−2)/((n+1)(n−1))). VN<2 ⇒ positive
    * serial correlation (trending), VN>2 ⇒ alternation — the classic
    * pre-test before trusting an i.i.d.-based control chart or CI.
    * Scale: the lag window sits over the calendar-bounded daily
    * aggregate (date-typed grouping key ⇒ plan-gate bounded).
    */
  def timeVonNeumann(s: SparkSession, d: String): DataFrame = {
    val days = orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
    val dd = days
      .withColumn("dp", lag(col("v"), 1).over(Window.orderBy("day")))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("v")).cast("decimal(38,0)").as("s1"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("s2"),
        sum(expr("CAST(v - dp AS DECIMAL(38,0)) * (v - dp)"))
          .cast("decimal(38,0)").as("sd2"))
    dd.selectExpr("n",
        """CAST(n AS DOUBLE) * (n - 1) * CAST(sd2 AS DOUBLE)
          |/ (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
          |   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / n AS vn""".stripMargin)
      .selectExpr("n AS n_days", "round(vn, 6) AS vn_ratio",
        "round((vn - 2) / sqrt(4.0 * (n - 2) / ((CAST(n AS DOUBLE) + 1) * (n - 1))), 4) AS z",
        """CASE WHEN (vn - 2) / sqrt(4.0 * (n - 2) / ((CAST(n AS DOUBLE) + 1) * (n - 1))) < -1.959964
          |THEN 'trending'
          |WHEN (vn - 2) / sqrt(4.0 * (n - 2) / ((CAST(n AS DOUBLE) + 1) * (n - 1))) > 1.959964
          |THEN 'alternating' ELSE 'random' END AS verdict""".stripMargin)
  }
  val timeVonNeumannSql: String =
    """WITH days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |dd AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS s1,
      |    CAST(sum(CAST(v AS HUGEINT) * v) AS DECIMAL(38,0)) AS s2,
      |    CAST(sum(CAST(v - dp AS HUGEINT) * (v - dp)) AS DECIMAL(38,0)) AS sd2
      |  FROM (SELECT v, lag(v) OVER (ORDER BY day) AS dp FROM days)),
      |vn AS (
      |  SELECT n,
      |    CAST(n AS DOUBLE) * (n - 1) * CAST(sd2 AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
      |       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / n AS vn
      |  FROM dd)
      |SELECT n AS n_days, round(vn, 6) AS vn_ratio,
      |  round((vn - 2) / sqrt(4.0 * (n - 2) / ((CAST(n AS DOUBLE) + 1) * (n - 1))), 4) AS z,
      |  CASE WHEN (vn - 2) / sqrt(4.0 * (n - 2) / ((CAST(n AS DOUBLE) + 1) * (n - 1))) < -1.959964
      |  THEN 'trending'
      |  WHEN (vn - 2) / sqrt(4.0 * (n - 2) / ((CAST(n AS DOUBLE) + 1) * (n - 1))) > 1.959964
      |  THEN 'alternating' ELSE 'random' END AS verdict
      |FROM vn""".stripMargin

  /** C898 analytics_abc_xyz — the ABC×XYZ inventory matrix over parts:
    * ABC from cumulative revenue share (A ≤80%, B ≤95%, C rest —
    * EXACT integer cuts 5·cum ≤ 4·total and 20·cum ≤ 19·total on
    * 10⁻⁴-dollar integers, ordered rev desc then partkey), XYZ from
    * the coefficient of variation of monthly demand INCLUDING zero
    * months (X: cv<0.5, Y: cv<1, Z else — exact integer inequalities
    * 4M(Ms₂−s₁²) < (M−1)s₁² and M(Ms₂−s₁²) < (M−1)s₁², zero FP in any
    * class decision). The 9-cell planning matrix every supply-chain
    * deployment pins its service levels to.
    * Scale: one groupBy(part, month) → one groupBy(part); the only
    * global cumulative is GlobalRank's two-pass range-partitioned
    * prefix sum — no single-task window over the part dimension.
    */
  def analyticsAbcXyz(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_partkey"),
      expr("date_trunc('month', l_shipdate)").as("m"),
      expr("CAST(l_quantity AS BIGINT)").as("q"),
      expr("""CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        | * CAST(100 - CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)""".stripMargin)
        .as("r"))
    // r14: pin the (part, month) frame — the month count, the per-part
    // rollup and the revenue total all derive from it exactly, so
    // lineitem is scanned ONCE (was 3×: pm inside the rank pass, a
    // countDistinct scan, and a second pm+per chain under the total)
    val pm = li.groupBy("l_partkey", "m")
      .agg(sum(col("q")).cast("long").as("mq"), sum(col("r")).cast("decimal(38,0)").as("mr"))
      .localCheckpoint(false)
    val months = pm.agg(countDistinct(col("m")).cast("long").as("mm"))
    val per = pm.groupBy("l_partkey")
      .agg(sum(col("mq")).cast("decimal(38,0)").as("s1"),
        sum(expr("CAST(mq AS DECIMAL(38,0)) * mq")).cast("decimal(38,0)").as("s2"),
        sum(col("mr")).cast("decimal(38,0)").as("rev"))
    val ranked = graft.plans.GlobalRank.withExclusivePrefixSum(
      per, "cumx", col("rev"), Seq(col("rev").desc, col("l_partkey").asc))
    // exact decimal rollup off the pinned rank spine, not a second pass
    val tot = ranked.agg(sum(col("rev")).cast("decimal(38,0)").as("trev"))
    val classed = ranked.crossJoin(broadcast(months)).crossJoin(broadcast(tot))
      .selectExpr("rev",
        """CASE WHEN (cumx + rev) * 5 <= trev * 4 THEN 'A'
          |WHEN (cumx + rev) * 20 <= trev * 19 THEN 'B'
          |ELSE 'C' END AS abc""".stripMargin,
        """CASE WHEN 4 * mm * (mm * s2 - s1 * s1) < (mm - 1) * s1 * s1 THEN 'X'
          |WHEN mm * (mm * s2 - s1 * s1) < (mm - 1) * s1 * s1 THEN 'Y'
          |ELSE 'Z' END AS xyz""".stripMargin)
    classed.groupBy("abc", "xyz")
      .agg(count(lit(1)).cast("long").as("n_parts"),
        sum(col("rev")).cast("decimal(38,0)").as("grev"))
      .crossJoin(broadcast(tot))
      .selectExpr("abc", "xyz", "n_parts",
        "round(100 * CAST(grev AS DOUBLE) / CAST(trev AS DOUBLE), 4) AS revenue_pct")
      .orderBy("abc", "xyz")
  }
  val analyticsAbcXyzSql: String =
    """WITH li AS (
      |  SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
      |    CAST(l_quantity AS BIGINT) AS q,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
      |      * CAST(100 - CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS r
      |  FROM lineitem),
      |months AS (SELECT CAST(count(DISTINCT m) AS BIGINT) AS mm FROM li),
      |pm AS (
      |  SELECT l_partkey, m, CAST(sum(q) AS BIGINT) AS mq,
      |    CAST(sum(CAST(r AS HUGEINT)) AS DECIMAL(38,0)) AS mr
      |  FROM li GROUP BY 1, 2),
      |per AS (
      |  SELECT l_partkey, CAST(sum(CAST(mq AS HUGEINT)) AS DECIMAL(38,0)) AS s1,
      |    CAST(sum(CAST(mq AS HUGEINT) * mq) AS DECIMAL(38,0)) AS s2,
      |    CAST(sum(CAST(mr AS HUGEINT)) AS DECIMAL(38,0)) AS rev
      |  FROM pm GROUP BY 1),
      |tot AS (SELECT CAST(sum(CAST(rev AS HUGEINT)) AS DECIMAL(38,0)) AS trev FROM per),
      |ranked AS (
      |  SELECT *, coalesce(sum(rev) OVER (ORDER BY rev DESC, l_partkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumx
      |  FROM per),
      |classed AS (
      |  SELECT rev,
      |    CASE WHEN CAST(cumx + rev AS HUGEINT) * 5 <= CAST(trev AS HUGEINT) * 4 THEN 'A'
      |    WHEN CAST(cumx + rev AS HUGEINT) * 20 <= CAST(trev AS HUGEINT) * 19 THEN 'B'
      |    ELSE 'C' END AS abc,
      |    CASE WHEN 4 * mm * (mm * CAST(s2 AS HUGEINT) - CAST(s1 AS HUGEINT) * s1) < (mm - 1) * CAST(s1 AS HUGEINT) * s1 THEN 'X'
      |    WHEN mm * (mm * CAST(s2 AS HUGEINT) - CAST(s1 AS HUGEINT) * s1) < (mm - 1) * CAST(s1 AS HUGEINT) * s1 THEN 'Y'
      |    ELSE 'Z' END AS xyz
      |  FROM ranked, months, tot)
      |SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
      |  round(100 * CAST(CAST(sum(CAST(rev AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE)
      |    / CAST(trev AS DOUBLE), 4) AS revenue_pct
      |FROM classed, tot GROUP BY 1, 2, trev ORDER BY 1, 2""".stripMargin

  /** C899 stat_harrell_cindex — Harrell's concordance index for the
    * price-bucket risk score against order-to-ship time with returns
    * as events: a pair (i,j) is comparable when tᵢ<tⱼ and i is an
    * event (returnflag 'R'); concordant when the earlier event carries
    * the HIGHER risk bucket; risk ties count ½. Evaluated WITHOUT pair
    * enumeration: group to the (t, rb) cell grid — t = datediff
    * (calendar-span-bounded), rb = clamp(⌊price/1000⌋, 0, 127) — then
    * later-count S via a per-bucket suffix window, comparable totals
    * via a t-level suffix, lower-risk counts via a per-t prefix over
    * rb; C = Σd·(2·lower+tie) / 2·Σd·later — exact integers end to
    * end. The discrimination metric every survival / churn / failure
    * model reports.
    * Scale: the only windows run over the ≤(span×128) cell frame; the
    * corpus pass is one groupBy. O(n) total, never O(n²).
    */
  def statHarrellCindex(s: SparkSession, d: String): DataFrame = {
    val base = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("t"),
        expr("least(greatest(CAST(floor(CAST(l_extendedprice AS DOUBLE) / 1000) AS BIGINT), 0L), 127L)").as("rb"),
        expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END").as("e"))
      .filter(col("t") >= 1)
    val sparse = base.groupBy("t", "rb")
      .agg(count(lit(1)).cast("long").as("cnt"), sum(col("e")).cast("long").as("evt"))
    // densify to ALL 128 buckets per observed t (literal sequence, no
    // join fan-out): the suffix/prefix windows below must see every
    // bucket at every time or absent (t, rb) cells silently drop their
    // later-rows contribution from the prefix
    val cells = sparse.select("t").distinct()
      .select(col("t"), explode(expr("sequence(0L, 127L)")).as("rb"))
      .join(sparse, Seq("t", "rb"), "left")
      .select(col("t"), col("rb"),
        coalesce(col("cnt"), lit(0L)).as("cnt"), coalesce(col("evt"), lit(0L)).as("evt"))
    val wSufRb = Window.partitionBy("rb").orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withS = cells.withColumn("s_later",
      coalesce(sum(col("cnt")).over(wSufRb), lit(0L)))
    val tTot = cells.groupBy("t").agg(sum(col("cnt")).cast("long").as("ct"))
      .withColumn("later_tot",
        coalesce(sum(col("ct")).over(
          Window.orderBy(col("t").desc).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("t", "later_tot")
    val wLtRb = Window.partitionBy("t").orderBy(col("rb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val full = withS
      .withColumn("lower_later", coalesce(sum(col("s_later")).over(wLtRb), lit(0L)))
      .join(tTot, Seq("t"))
    full.agg(
        sum(expr("CAST(evt AS DECIMAL(38,0)) * (2 * lower_later + s_later)"))
          .cast("decimal(38,0)").as("num2"),
        sum(expr("CAST(evt AS DECIMAL(38,0)) * later_tot"))
          .cast("decimal(38,0)").as("den"))
      .selectExpr("CAST(den AS BIGINT) AS comparable_pairs",
        "round(CAST(num2 AS DOUBLE) / 2 / CAST(den AS DOUBLE), 6) AS c_index",
        "round(CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) - 1, 6) AS somers_d")
  }
  val statHarrellCindexSql: String =
    """WITH base AS (
      |  SELECT CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS t,
      |    least(greatest(CAST(floor(CAST(l_extendedprice AS DOUBLE) / 1000) AS BIGINT), 0), 127) AS rb,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS e
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE datediff('day', o_orderdate, l_shipdate) >= 1),
      |sparse AS (
      |  SELECT t, rb, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(e) AS BIGINT) AS evt
      |  FROM base GROUP BY 1, 2),
      |grid AS (
      |  SELECT t, unnest(range(0, 128)) AS rb FROM (SELECT DISTINCT t FROM sparse)),
      |cells AS (
      |  SELECT g.t, g.rb, coalesce(s.cnt, 0) AS cnt, coalesce(s.evt, 0) AS evt
      |  FROM grid g LEFT JOIN sparse s ON g.t = s.t AND g.rb = s.rb),
      |withs AS (
      |  SELECT *, coalesce(sum(cnt) OVER (PARTITION BY rb ORDER BY t DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_later
      |  FROM cells),
      |ttot AS (
      |  SELECT t, coalesce(sum(ct) OVER (ORDER BY t DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS later_tot
      |  FROM (SELECT t, CAST(sum(cnt) AS BIGINT) AS ct FROM cells GROUP BY 1)),
      |full_f AS (
      |  SELECT w.*, coalesce(sum(s_later) OVER (PARTITION BY w.t ORDER BY rb
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lower_later,
      |    tt.later_tot
      |  FROM withs w JOIN ttot tt ON w.t = tt.t)
      |SELECT CAST(sum(CAST(evt AS HUGEINT) * later_tot) AS BIGINT) AS comparable_pairs,
      |  round(CAST(CAST(sum(CAST(evt AS HUGEINT) * (2 * lower_later + s_later)) AS DECIMAL(38,0)) AS DOUBLE)
      |    / 2 / CAST(CAST(sum(CAST(evt AS HUGEINT) * later_tot) AS DECIMAL(38,0)) AS DOUBLE), 6) AS c_index,
      |  round(CAST(CAST(sum(CAST(evt AS HUGEINT) * (2 * lower_later + s_later)) AS DECIMAL(38,0)) AS DOUBLE)
      |    / CAST(CAST(sum(CAST(evt AS HUGEINT) * later_tot) AS DECIMAL(38,0)) AS DOUBLE) - 1, 6) AS somers_d
      |FROM full_f""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_dunnett_control" -> (statDunnettControl _),
    "time_von_neumann" -> (timeVonNeumann _),
    "analytics_abc_xyz_full" -> (analyticsAbcXyz _),
    "stat_harrell_cindex" -> (statHarrellCindex _),
  )

  val oracle: Map[String, String] = Map(
    "stat_dunnett_control" -> statDunnettControlSql,
    "time_von_neumann" -> timeVonNeumannSql,
    "analytics_abc_xyz_full" -> analyticsAbcXyzSql,
    "stat_harrell_cindex" -> statHarrellCindexSql,
  )
}
