package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 90 (C764–C767): exact small-table inference + unequal-variance
  * ANOVA + two classical nonparametrics the battery still lacked —
  * Fisher's exact test, Welch's heteroscedastic one-way ANOVA, Mood's
  * scale test, and the Wald–Wolfowitz two-sample runs test.
  *
  * Shared discipline: every hypergeometric log-probability is an exact
  * BIGINT sum of per-integer quantized ln i terms (so the inclusion
  * decision of the two-sided tail is pure integer comparison); Welch's
  * per-group weights are quantized before the k-sum; Mood scores and
  * their exact permutation moments are integer algebra over the
  * ≤50-bucket quantity histogram; runs are counted over the
  * agg-bounded daily frame.
  */
object Extras190 {

  /** C764 stat_fisher_exact — Fisher's exact test on the 2×2
    * (urgent priority) × (finished status) orders table. The
    * log-factorial table ln i! is built as an exact prefix sum of
    * per-i quantized ln i (·10⁶, BIGINT), so every table probability's
    * log is an exact integer and the two-sided inclusion rule
    * (p_k ≤ p_obs) is an integer comparison — no FP tie ambiguity.
    * The p-value itself sums per-k probabilities quantized ·10⁹.
    * Scale: the support and the ln-factorial spine are O(n) rows
    * through the range-partitioned prefix sum, GENERATED in ≤64k-row
    * chunks distributed across tasks (ChunkedRange — never one
    * n-element array in a single task); everything else is broadcast
    * 1-row frames.
    */
  def statFisherExact(s: SparkSession, d: String): DataFrame = {
    val cells = orders(s, d).agg(
      sum(expr("CASE WHEN o_orderpriority = '1-URGENT' AND o_orderstatus = 'F' THEN 1L ELSE 0L END")).cast("long").as("a"),
      sum(expr("CASE WHEN o_orderpriority = '1-URGENT' THEN 1L ELSE 0L END")).cast("long").as("r1"),
      sum(expr("CASE WHEN o_orderstatus = 'F' THEN 1L ELSE 0L END")).cast("long").as("c1"),
      count(lit(1)).cast("long").as("n"))
    val lf0 = graft.functions.ChunkedRange
      .explodeRange(cells.select(col("n")), lit(0L), col("n"), "i")
      .select(col("i"))
      .withColumn("lnq", expr(
        "CASE WHEN i < 2 THEN 0L ELSE CAST(floor(ln(CAST(i AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) END"))
    val lfc = graft.plans.GlobalRank
      .withExclusivePrefixSum(lf0, "p", col("lnq"), Seq(col("i").asc))
      .select(col("i"), (col("p") + col("lnq")).as("lf"))
    val withCells = lfc.crossJoin(broadcast(cells))
    // lnC·1e6 = lf(r1)+lf(n-r1)+lf(c1)+lf(n-c1)-lf(n), each picked by a
    // distinct conditional sum (i is unique, so each picks exactly 1 row)
    val consts = withCells.agg(
      (sum(when(col("i") === col("r1"), col("lf"))).cast("long")
        + sum(when(col("i") === expr("n - r1"), col("lf"))).cast("long")
        + sum(when(col("i") === col("c1"), col("lf"))).cast("long")
        + sum(when(col("i") === expr("n - c1"), col("lf"))).cast("long")
        - sum(when(col("i") === col("n"), col("lf"))).cast("long")).as("lnc"))
    // melt: row i serves as lf(k), lf(r1-k), lf(c1-k), lf(n-r1-c1+k)
    val supp = withCells
      .select(col("r1"), col("c1"), col("n"), explode(array(
        struct(col("i").as("k"), col("lf")),
        struct(expr("r1 - i").as("k"), col("lf")),
        struct(expr("c1 - i").as("k"), col("lf")),
        struct(expr("i - (n - r1 - c1)").as("k"), col("lf")))).as("e"))
      .filter(expr("e.k >= greatest(0L, r1 + c1 - n) AND e.k <= least(r1, c1)"))
      .groupBy(expr("e.k").as("k")).agg(sum(expr("e.lf")).cast("long").as("s4"))
    val terms = supp.crossJoin(broadcast(consts))
      .select(col("k"), expr("lnc - s4").as("lnpq"))
    val obs = terms.crossJoin(broadcast(cells)).filter(col("k") === col("a"))
      .select(col("lnpq").as("lnpq_obs")).limit(1)
    terms.crossJoin(broadcast(obs))
      .agg(sum(expr(
        """CASE WHEN lnpq <= lnpq_obs
          |THEN CAST(floor(exp(CAST(lnpq AS DOUBLE) / 1e6) * 1e9 + 0.5) AS BIGINT)
          |ELSE 0L END""".stripMargin)).cast("long").as("pq"))
      .crossJoin(broadcast(cells))
      .selectExpr("a", "r1", "c1", "n",
        """CASE WHEN (r1 - a) * (c1 - a) = 0 THEN CAST(NULL AS DOUBLE)
          |ELSE round(CAST(a AS DOUBLE) * (n - r1 - c1 + a)
          |  / ((r1 - a) * (c1 - a)), 6) END AS odds_ratio""".stripMargin,
        "round(CAST(pq AS DOUBLE) / 1e9, 6) AS p_two_sided")
  }
  val statFisherExactSql: String =
    """WITH cells AS (
      |  SELECT
      |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS r1,
      |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM orders),
      |idx AS (
      |  SELECT CAST(unnest(generate_series(0, (SELECT n FROM cells))) AS BIGINT) AS i),
      |lf0 AS (
      |  SELECT i,
      |    CASE WHEN i < 2 THEN CAST(0 AS BIGINT)
      |      ELSE CAST(floor(ln(CAST(i AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) END AS lnq
      |  FROM idx),
      |lfc AS (
      |  SELECT i, CAST(sum(lnq) OVER (ORDER BY i
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS lf
      |  FROM lf0),
      |consts AS (
      |  SELECT CAST(sum(CASE WHEN i = c.r1 THEN lf END)
      |    + sum(CASE WHEN i = c.n - c.r1 THEN lf END)
      |    + sum(CASE WHEN i = c.c1 THEN lf END)
      |    + sum(CASE WHEN i = c.n - c.c1 THEN lf END)
      |    - sum(CASE WHEN i = c.n THEN lf END) AS BIGINT) AS lnc
      |  FROM lfc, cells c),
      |mel AS (
      |  SELECT i AS k, lf FROM lfc
      |  UNION ALL SELECT (SELECT r1 FROM cells) - i, lf FROM lfc
      |  UNION ALL SELECT (SELECT c1 FROM cells) - i, lf FROM lfc
      |  UNION ALL SELECT i - (SELECT n - r1 - c1 FROM cells), lf FROM lfc),
      |supp AS (
      |  SELECT k, CAST(sum(lf) AS BIGINT) AS s4
      |  FROM mel, cells c
      |  WHERE k >= greatest(0, c.r1 + c.c1 - c.n) AND k <= least(c.r1, c.c1)
      |  GROUP BY k),
      |terms AS (SELECT k, (SELECT lnc FROM consts) - s4 AS lnpq FROM supp),
      |obs AS (
      |  SELECT lnpq AS lnpq_obs FROM terms, cells c WHERE k = c.a LIMIT 1),
      |pv AS (
      |  SELECT CAST(sum(CASE WHEN lnpq <= (SELECT lnpq_obs FROM obs)
      |    THEN CAST(floor(exp(CAST(lnpq AS DOUBLE) / 1e6) * 1e9 + 0.5) AS BIGINT)
      |    ELSE 0 END) AS BIGINT) AS pq
      |  FROM terms)
      |SELECT a, r1, c1, n,
      |  CASE WHEN (r1 - a) * (c1 - a) = 0 THEN CAST(NULL AS DOUBLE)
      |    ELSE round(CAST(a AS DOUBLE) * (n - r1 - c1 + a)
      |      / ((r1 - a) * (c1 - a)), 6) END AS odds_ratio,
      |  round(CAST(pq AS DOUBLE) / 1e9, 6) AS p_two_sided
      |FROM cells, pv""".stripMargin

  /** C765 stat_welch_anova — Welch's heteroscedastic one-way ANOVA of
    * o_totalprice across the 5 priority groups: per-group (n, Σx, Σx²)
    * are exact cent-integer sums; weights w = n/s², weighted means,
    * and the A/B terms are quantized per group (·10¹²/·10⁶) before the
    * 5-way sums, so no cross-partition FP order dependence. The F that
    * stays valid when group variances differ — what C-line
    * stat_anova_oneway assumes away.
    */
  def statWelchAnova(s: SparkSession, d: String): DataFrame = {
    val gm = orders(s, d)
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS INT)").as("grp"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"))
      .groupBy("grp")
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(col("cv")).cast("decimal(38,0)").as("sg"),
        sum(expr("CAST(cv AS DECIMAL(38,0)) * cv")).cast("decimal(38,0)").as("qg"))
      // mean (dollars), unbiased variance (dollars²) — exact rationals
      // evaluated once in IEEE double, identical in both engines
      .withColumn("mu", expr("CAST(sg AS DOUBLE) / ng / 100"))
      .withColumn("v", expr(
        "(CAST(ng AS DOUBLE) * CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) / (CAST(ng AS DOUBLE) * (ng - 1)) / 1e4"))
      .withColumn("wq", expr("CAST(floor(CAST(ng AS DOUBLE) / v * 1e12 + 0.5) AS BIGINT)"))
      .withColumn("wmq", expr("CAST(floor(CAST(ng AS DOUBLE) / v * mu * 1e9 + 0.5) AS BIGINT)"))
    val tot = gm.agg(count(lit(1)).cast("long").as("k"), sum(col("ng")).cast("long").as("n"),
      sum(col("wq")).cast("long").as("wtot"), sum(col("wmq")).cast("long").as("wmtot"))
      .withColumn("grand", expr("CAST(wmtot AS DOUBLE) / wtot * 1e3")) // scales: 1e9/1e12
    gm.crossJoin(broadcast(tot))
      .select(col("k"), col("n"),
        expr("CAST(floor(CAST(wq AS DOUBLE) / 1e12 * (mu - grand) * (mu - grand) * 1e6 + 0.5) AS BIGINT)").as("aq"),
        expr("CAST(floor((1 - CAST(wq AS DOUBLE) / wtot) * (1 - CAST(wq AS DOUBLE) / wtot) / (ng - 1) * 1e12 + 0.5) AS BIGINT)").as("bq"))
      .groupBy("k", "n")
      .agg(sum(col("aq")).cast("long").as("sa"), sum(col("bq")).cast("long").as("sb"))
      .selectExpr("k", "n",
        """round((CAST(sa AS DOUBLE) / 1e6 / (k - 1))
          |/ (1 + 2.0D * (k - 2) / (CAST(k AS DOUBLE) * k - 1) * (CAST(sb AS DOUBLE) / 1e12)), 6) AS f_welch""".stripMargin,
        "round((CAST(k AS DOUBLE) * k - 1) / (3 * CAST(sb AS DOUBLE) / 1e12), 6) AS df2")
  }
  val statWelchAnovaSql: String =
    """WITH base AS (
      |  SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS grp,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv
      |  FROM orders),
      |gm AS (
      |  SELECT grp, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(cv) AS DECIMAL(38,0)) AS sg,
      |    CAST(sum(CAST(cv AS DECIMAL(38,0)) * cv) AS DECIMAL(38,0)) AS qg
      |  FROM base GROUP BY 1),
      |gw AS (
      |  SELECT grp, ng,
      |    CAST(sg AS DOUBLE) / ng / 100 AS mu,
      |    (CAST(ng AS DOUBLE) * CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
      |      / (CAST(ng AS DOUBLE) * (ng - 1)) / 1e4 AS v
      |  FROM gm),
      |gq AS (
      |  SELECT grp, ng, mu,
      |    CAST(floor(CAST(ng AS DOUBLE) / v * 1e12 + 0.5) AS BIGINT) AS wq,
      |    CAST(floor(CAST(ng AS DOUBLE) / v * mu * 1e9 + 0.5) AS BIGINT) AS wmq
      |  FROM gw),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
      |    CAST(sum(wq) AS BIGINT) AS wtot, CAST(sum(wmq) AS BIGINT) AS wmtot
      |  FROM gq),
      |tg AS (SELECT k, n, wtot, CAST(wmtot AS DOUBLE) / wtot * 1e3 AS grand FROM tot),
      |pt AS (
      |  SELECT t.k, t.n,
      |    CAST(floor(CAST(g.wq AS DOUBLE) / 1e12 * (g.mu - t.grand) * (g.mu - t.grand) * 1e6 + 0.5) AS BIGINT) AS aq,
      |    CAST(floor((1 - CAST(g.wq AS DOUBLE) / t.wtot) * (1 - CAST(g.wq AS DOUBLE) / t.wtot) / (g.ng - 1) * 1e12 + 0.5) AS BIGINT) AS bq
      |  FROM gq g, tg t),
      |ag AS (
      |  SELECT k, n, CAST(sum(aq) AS BIGINT) AS sa, CAST(sum(bq) AS BIGINT) AS sb
      |  FROM pt GROUP BY 1, 2)
      |SELECT k, n,
      |  round((CAST(sa AS DOUBLE) / 1e6 / (k - 1))
      |    / (1 + 2.0 * (k - 2) / (CAST(k AS DOUBLE) * k - 1) * (CAST(sb AS DOUBLE) / 1e12)), 6) AS f_welch,
      |  round((CAST(k AS DOUBLE) * k - 1) / (3 * CAST(sb AS DOUBLE) / 1e12), 6) AS df2
      |FROM ag""".stripMargin

  /** C766 stat_mood_scale — Mood's rank test for scale between the
    * returned ('R') and acknowledged ('A') lineitem populations over
    * l_quantity: pooled midranks from the ≤50-bucket quantity
    * histogram (2r = 2·cum + cnt + 1, exact integers), scores
    * a = (r − (N+1)/2)² kept ×4 in DECIMAL, and the exact
    * finite-population permutation moments E[T] = n1·Σa/N,
    * Var[T] = n1·n2/(N(N−1))·(N·Σa² − (Σa)²)/N — tie-exact, no
    * continuous-distribution variance approximation.
    */
  def statMoodScale(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy(expr("CAST(l_quantity AS INT)").as("qv"))
      .agg(sum(expr("CASE WHEN l_returnflag = 'A' THEN 1L ELSE 0L END")).cast("long").as("m1"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("m2"))
      .withColumn("g", expr("m1 + m2"))
    // ≤50-bucket agg-bounded frame: exclusive-prefix window beats the
    // two-pass GlobalRank shuffle and stays plan-gate-legal
    val withC = hist.withColumn("c", coalesce(sum(col("g")).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("qv").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)).cast("long"))
    val tot = withC.agg(sum(col("g")).cast("long").as("nn"))
    // 4a = (2c + g + 1 - (N+1))² = (2c + g - N)²  (midrank minus mean rank, ×2, squared)
    withC.crossJoin(broadcast(tot))
      .select(col("m1"), col("m2"), col("g"), col("nn"),
        expr("CAST(2*c + g - nn AS DECIMAL(38,0)) * (2*c + g - nn)").as("a4"))
      .groupBy("nn")
      .agg(sum(col("m1")).cast("long").as("n1"), sum(col("m2")).cast("long").as("n2"),
        sum(expr("CAST(m1 AS DECIMAL(38,0)) * a4")).cast("decimal(38,0)").as("t4"),
        sum(expr("CAST(g AS DECIMAL(38,0)) * a4")).cast("decimal(38,0)").as("sa4"),
        sum(expr("CAST(g AS DECIMAL(38,0)) * a4 * a4")).cast("decimal(38,0)").as("sa16"))
      .selectExpr("nn AS n", "n1", "n2",
        // T itself is N³-scale; the double round-trip is ulp-unsafe
        // there, so emit the EXACT ×4 integer (T has .25 granularity)
        "CAST(t4 AS BIGINT) AS t_mood_x4",
        // z = (T - n1·SA/N) / sqrt(n1·n2·(N·SA2 - SA²) / (N²·(N-1)))
        """round((CAST(t4 AS DOUBLE) / 4 - CAST(n1 AS DOUBLE) * (CAST(sa4 AS DOUBLE) / 4) / nn)
          |/ sqrt(CAST(n1 AS DOUBLE) * n2
          |  * (CAST(nn AS DOUBLE) * (CAST(sa16 AS DOUBLE) / 16) - (CAST(sa4 AS DOUBLE) / 4) * (CAST(sa4 AS DOUBLE) / 4))
          |  / (CAST(nn AS DOUBLE) * nn * (nn - 1))), 6) AS z_mood""".stripMargin)
  }
  val statMoodScaleSql: String =
    """WITH hist AS (
      |  SELECT CAST(l_quantity AS INT) AS qv,
      |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS m1,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS m2
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
      |blocks AS (
      |  SELECT m1, m2, m1 + m2 AS g,
      |    COALESCE(sum(m1 + m2) OVER (ORDER BY qv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c
      |  FROM hist),
      |tot AS (SELECT CAST(sum(g) AS BIGINT) AS nn FROM blocks),
      |sc AS (
      |  SELECT b.m1, b.m2, b.g, t.nn,
      |    CAST(2*b.c + b.g - t.nn AS DECIMAL(38,0)) * (2*b.c + b.g - t.nn) AS a4
      |  FROM blocks b, tot t),
      |ag AS (
      |  SELECT nn, CAST(sum(m1) AS BIGINT) AS n1, CAST(sum(m2) AS BIGINT) AS n2,
      |    CAST(sum(CAST(m1 AS DECIMAL(38,0)) * a4) AS DECIMAL(38,0)) AS t4,
      |    CAST(sum(CAST(g AS DECIMAL(38,0)) * a4) AS DECIMAL(38,0)) AS sa4,
      |    CAST(sum(CAST(g AS DECIMAL(38,0)) * a4 * a4) AS DECIMAL(38,0)) AS sa16
      |  FROM sc GROUP BY 1)
      |SELECT nn AS n, n1, n2,
      |  CAST(t4 AS BIGINT) AS t_mood_x4,
      |  round((CAST(t4 AS DOUBLE) / 4 - CAST(n1 AS DOUBLE) * (CAST(sa4 AS DOUBLE) / 4) / nn)
      |    / sqrt(CAST(n1 AS DOUBLE) * n2
      |      * (CAST(nn AS DOUBLE) * (CAST(sa16 AS DOUBLE) / 16) - (CAST(sa4 AS DOUBLE) / 4) * (CAST(sa4 AS DOUBLE) / 4))
      |      / (CAST(nn AS DOUBLE) * nn * (nn - 1))), 6) AS z_mood
      |FROM ag""".stripMargin

  /** C767 stat_wald_wolfowitz — the two-sample runs test on the merged
    * value-ordered sequence of daily mean order prices, finished ('F')
    * vs open ('O') days: after the day×status aggregate the frame is
    * ≤2·|days| rows, so the global order-by-value window is
    * agg-bounded; ties across the two samples are broken
    * deterministically (value, status, day). R = 1 + #alternations;
    * z from the exact E[R] = 1 + 2n1n2/N and
    * Var[R] = 2n1n2(2n1n2−N)/(N²(N−1)).
    */
  def statWaldWolfowitz(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .filter(col("o_orderstatus").isin("F", "O"))
      .groupBy(expr("date_trunc('day', o_orderdate)").as("day"), col("o_orderstatus").as("st"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(14,2))")).cast("decimal(38,2)").as("sp"),
        count(lit(1)).cast("long").as("cnt"))
      .withColumn("m", expr("CAST(sp AS DOUBLE) / cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("m").asc, col("st").asc, col("day").asc)
    daily
      .withColumn("prev", lag(col("st"), 1).over(w))
      .agg(
        sum(expr("CASE WHEN st = 'F' THEN 1L ELSE 0L END")).cast("long").as("n1"),
        sum(expr("CASE WHEN st = 'O' THEN 1L ELSE 0L END")).cast("long").as("n2"),
        (sum(expr("CASE WHEN prev IS NOT NULL AND prev <> st THEN 1L ELSE 0L END")) + 1L)
          .cast("long").as("runs"))
      .selectExpr("n1", "n2", "runs",
        """round((runs - (1 + 2.0D * n1 * n2 / (n1 + n2)))
          |/ sqrt(2.0D * n1 * n2 * (2.0D * n1 * n2 - (n1 + n2))
          |  / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1))), 6) AS z_runs""".stripMargin)
  }
  val statWaldWolfowitzSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', o_orderdate) AS day, o_orderstatus AS st,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DECIMAL(38,2)) AS sp,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1, 2),
      |seq AS (
      |  SELECT st, lag(st, 1) OVER (ORDER BY CAST(sp AS DOUBLE) / cnt, st, day) AS prev
      |  FROM daily),
      |ag AS (
      |  SELECT
      |    CAST(sum(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> st THEN 1 ELSE 0 END) + 1 AS BIGINT) AS runs
      |  FROM seq)
      |SELECT n1, n2, runs,
      |  round((runs - (1 + 2.0 * n1 * n2 / (n1 + n2)))
      |    / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
      |      / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1))), 6) AS z_runs
      |FROM ag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_fisher_exact" -> (statFisherExact _),
    "stat_welch_anova" -> (statWelchAnova _),
    "stat_mood_scale" -> (statMoodScale _),
    "stat_wald_wolfowitz" -> (statWaldWolfowitz _),
  )

  val oracle: Map[String, String] = Map(
    "stat_fisher_exact" -> statFisherExactSql,
    "stat_welch_anova" -> statWelchAnovaSql,
    "stat_mood_scale" -> statMoodScaleSql,
    "stat_wald_wolfowitz" -> statWaldWolfowitzSql,
  )
}
