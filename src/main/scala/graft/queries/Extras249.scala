package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 149 (C1004–C1011): attribute control charts (p-chart, u-chart),
  * measurement-system analysis (balanced crossed Gage R&R ANOVA),
  * restricted-range discrimination (partial AUC with McClish
  * standardization), and the multiple-testing toolbox (Fisher/Pearson/
  * Tippett/ACAT p-value combiners with the EXACT even-dof chi-square
  * tail, Storey's π₀ grid, Donoho–Jin higher criticism), plus the
  * large-sample Bayesian A/B posterior.
  *
  * Shared discipline: corpus-scale counts/sums are exact BIGINT/DECIMAL
  * aggregates of once-quantized cents; every p-value lives on the 1e-12
  * grid computed from the Zelen–Severo Φ rational (the C971/C976
  * fragment) evaluated identically in both engines; bounded-frame sums
  * of IEEE terms (ln p, tan, ROC trapezoids) quantize per-term onto
  * integer grids before the order-free exact sum. Final O(1) arithmetic
  * is written in identical left-assoc order in both engines.
  */
object Extras249 {

  // Zelen–Severo rational Φ (Abramowitz–Stegun 26.2.17), the C971
  // fragment: identical text evaluated by both engines.
  private val phiSqlE: String => String = z =>
    s"exp(-(($z) * ($z)) / 2) / sqrt(2 * pi())"
  private val polySqlE: String => String = t =>
    s"""(($t) * (CAST(0.319381530 AS DOUBLE) + ($t) * (CAST(-0.356563782 AS DOUBLE)
       |  + ($t) * (CAST(1.781477937 AS DOUBLE) + ($t) * (CAST(-1.821255978 AS DOUBLE)
       |  + ($t) * CAST(1.330274429 AS DOUBLE))))))""".stripMargin
  private val bigPhiSqlE: String => String = z =>
    s"""CASE WHEN ($z) >= 0
       |  THEN 1 - ${phiSqlE(z)} * ${polySqlE(s"1 / (1 + CAST(0.2316419 AS DOUBLE) * ($z))")}
       |  ELSE ${phiSqlE(z)} * ${polySqlE(s"1 / (1 - CAST(0.2316419 AS DOUBLE) * ($z))")} END""".stripMargin

  // Exact chi-square(2k) upper tail for k = 5 (Erlang-5 survival):
  // S(x) = e^{-x/2} Σ_{j<5} (x/2)^j / j! — closed form, no quadrature.
  private val erlang5SurvSqlE: String => String = x =>
    s"""(exp(-($x) / 2) * (1 + ($x) / 2 + (($x) / 2) * (($x) / 2) / 2
       |  + (($x) / 2) * (($x) / 2) * (($x) / 2) / 6
       |  + (($x) / 2) * (($x) / 2) * (($x) / 2) * (($x) / 2) / 24))""".stripMargin

  // One-sample z of a group mean against the corpus mean with the
  // corpus population sd: identical-text fragment over exact integer
  // moment columns (cn,cs,cq group; tn,ts,tq totals).
  private val zSqlE: String =
    """((CAST(cs AS DOUBLE) / cn - CAST(ts AS DOUBLE) / tn)
      |  / sqrt(CAST(tq AS DOUBLE) / tn
      |    - (CAST(ts AS DOUBLE) / tn) * (CAST(ts AS DOUBLE) / tn))
      |  * sqrt(CAST(cn AS DOUBLE)))""".stripMargin
  // Two-sided p on the 1e-12 grid, clamped to (0, 1) open.
  private val pqSqlE: String =
    s"""least(greatest(CAST(floor((2 * (1 - ${bigPhiSqlE(s"abs($zSqlE)")}))
       |  * 1e12 + 0.5) AS BIGINT), CAST(1 AS BIGINT)),
       |  CAST(999999999999 AS BIGINT))""".stripMargin

  // ---------------------------------------------------------------- C1004
  /** stat_p_chart — the attribute p-chart of the monthly returned-line
    * fraction with variable-n 3σ limits: p̄ = ΣD/ΣN from exact corpus
    * counts, per-month limits p̄ ± 3√(p̄(1−p̄)/n_i), months flagged
    * above the UCL / below a positive LCL. Scale: one hash aggregate
    * of the lineitem scan onto the ~83-month calendar frame; the
    * limit comparison is O(months) IEEE from identical integers.
    */
  def statPChart(s: SparkSession, d: String): DataFrame = {
    val m = lineitem(s, d)
      .groupBy(date_trunc("month", col("l_shipdate")).as("mo"))
      .agg(count(lit(1)).cast("long").as("ni"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END"))
          .cast("long").as("di"))
    val tot = m.agg(count(lit(1)).cast("long").as("mths"),
      sum(col("ni")).cast("long").as("nn"), sum(col("di")).cast("long").as("dd"))
    m.crossJoin(broadcast(tot))
      .selectExpr("mths", "nn", "dd",
        """CASE WHEN CAST(di AS DOUBLE) / ni > CAST(dd AS DOUBLE) / nn
          |  + 3 * sqrt(CAST(dd AS DOUBLE) / nn * (1 - CAST(dd AS DOUBLE) / nn) / ni)
          |THEN 1 ELSE 0 END AS hi""".stripMargin,
        """CASE WHEN CAST(dd AS DOUBLE) / nn
          |  - 3 * sqrt(CAST(dd AS DOUBLE) / nn * (1 - CAST(dd AS DOUBLE) / nn) / ni) > 0
          |  AND CAST(di AS DOUBLE) / ni < CAST(dd AS DOUBLE) / nn
          |  - 3 * sqrt(CAST(dd AS DOUBLE) / nn * (1 - CAST(dd AS DOUBLE) / nn) / ni)
          |THEN 1 ELSE 0 END AS lo""".stripMargin)
      .groupBy("mths")
      .agg(max(col("nn")).as("nn"), max(col("dd")).as("dd"),
        sum(col("hi")).cast("long").as("n_ooc_high"),
        sum(col("lo")).cast("long").as("n_ooc_low"))
      .selectExpr("mths AS n_months",
        "round(CAST(dd AS DOUBLE) / nn, 6) AS pbar",
        "n_ooc_high", "n_ooc_low")
  }
  val statPChartSql: String =
    """WITH m AS (
      |  SELECT date_trunc('month', l_shipdate) AS mo,
      |    CAST(count(*) AS BIGINT) AS ni,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS di
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS mths,
      |  CAST(sum(ni) AS BIGINT) AS nn, CAST(sum(di) AS BIGINT) AS dd FROM m),
      |f AS (
      |  SELECT mths, nn, dd,
      |    CASE WHEN CAST(di AS DOUBLE) / ni > CAST(dd AS DOUBLE) / nn
      |      + 3 * sqrt(CAST(dd AS DOUBLE) / nn * (1 - CAST(dd AS DOUBLE) / nn) / ni)
      |    THEN 1 ELSE 0 END AS hi,
      |    CASE WHEN CAST(dd AS DOUBLE) / nn
      |      - 3 * sqrt(CAST(dd AS DOUBLE) / nn * (1 - CAST(dd AS DOUBLE) / nn) / ni) > 0
      |      AND CAST(di AS DOUBLE) / ni < CAST(dd AS DOUBLE) / nn
      |      - 3 * sqrt(CAST(dd AS DOUBLE) / nn * (1 - CAST(dd AS DOUBLE) / nn) / ni)
      |    THEN 1 ELSE 0 END AS lo
      |  FROM m, tot)
      |SELECT mths AS n_months, round(CAST(dd AS DOUBLE) / nn, 6) AS pbar,
      |  CAST(sum(hi) AS BIGINT) AS n_ooc_high, CAST(sum(lo) AS BIGINT) AS n_ooc_low
      |FROM f GROUP BY mths, nn, dd""".stripMargin

  // ---------------------------------------------------------------- C1005
  /** stat_u_chart — the u-chart of returned lines per distinct order
    * shipped each day: ū = ΣC/ΣU from exact corpus counts, per-day
    * limits ū ± 3√(ū/u_i) on the ~2.5k-day calendar frame. The
    * distinct-order unit count is an exact per-day count-distinct
    * (day-partitioned hash aggregate — fully distributed).
    */
  def statUChart(s: SparkSession, d: String): DataFrame = {
    val day = lineitem(s, d)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(countDistinct(col("l_orderkey")).cast("long").as("ui"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END"))
          .cast("long").as("ci"))
    val tot = day.agg(count(lit(1)).cast("long").as("nd"),
      sum(col("ui")).cast("long").as("uu"), sum(col("ci")).cast("long").as("cc"))
    day.crossJoin(broadcast(tot))
      .selectExpr("nd", "uu", "cc",
        """CASE WHEN CAST(ci AS DOUBLE) / ui > CAST(cc AS DOUBLE) / uu
          |  + 3 * sqrt(CAST(cc AS DOUBLE) / uu / ui) THEN 1 ELSE 0 END AS hi""".stripMargin,
        """CASE WHEN CAST(cc AS DOUBLE) / uu
          |  - 3 * sqrt(CAST(cc AS DOUBLE) / uu / ui) > 0
          |  AND CAST(ci AS DOUBLE) / ui < CAST(cc AS DOUBLE) / uu
          |  - 3 * sqrt(CAST(cc AS DOUBLE) / uu / ui) THEN 1 ELSE 0 END AS lo""".stripMargin)
      .groupBy("nd")
      .agg(max(col("uu")).as("uu"), max(col("cc")).as("cc"),
        sum(col("hi")).cast("long").as("n_ooc_high"),
        sum(col("lo")).cast("long").as("n_ooc_low"))
      .selectExpr("nd AS n_days", "round(CAST(cc AS DOUBLE) / uu, 6) AS ubar",
        "n_ooc_high", "n_ooc_low")
  }
  val statUChartSql: String =
    """WITH day AS (
      |  SELECT CAST(l_shipdate AS DATE) AS day,
      |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS ui,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ci
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
      |  CAST(sum(ui) AS BIGINT) AS uu, CAST(sum(ci) AS BIGINT) AS cc FROM day),
      |f AS (
      |  SELECT nd, uu, cc,
      |    CASE WHEN CAST(ci AS DOUBLE) / ui > CAST(cc AS DOUBLE) / uu
      |      + 3 * sqrt(CAST(cc AS DOUBLE) / uu / ui) THEN 1 ELSE 0 END AS hi,
      |    CASE WHEN CAST(cc AS DOUBLE) / uu
      |      - 3 * sqrt(CAST(cc AS DOUBLE) / uu / ui) > 0
      |      AND CAST(ci AS DOUBLE) / ui < CAST(cc AS DOUBLE) / uu
      |      - 3 * sqrt(CAST(cc AS DOUBLE) / uu / ui) THEN 1 ELSE 0 END AS lo
      |  FROM day, tot)
      |SELECT nd AS n_days, round(CAST(cc AS DOUBLE) / uu, 6) AS ubar,
      |  CAST(sum(hi) AS BIGINT) AS n_ooc_high, CAST(sum(lo) AS BIGINT) AS n_ooc_low
      |FROM f GROUP BY nd, uu, cc""".stripMargin

  // ---------------------------------------------------------------- C1006
  /** stat_gage_rr — balanced crossed Gage R&R: parts = the fixed
    * 25-brand dictionary, operators = the 3 return flags, r = 4
    * replicate line prices per cell chosen as the globally smallest
    * (orderkey, linenumber) — a deterministic total order. Replicate
    * selection is a TWO-STAGE top-4 (64-way salted per-cell partial
    * top-4, then final top-4 over ≤ 75·64·4 survivors) so no single
    * task ever sorts a corpus-scale cell at 100 TB; the oracle's
    * single window is row-identical because the order key is total.
    * The two-way ANOVA (SS_P, SS_O, SS_PO, SS_E) comes from exact
    * BIGINT/DECIMAL sums over the fixed 300-row design; variance
    * components, %GRR and ndc are O(1) IEEE from identical integers.
    */
  def statGageRr(s: SparkSession, d: String): DataFrame = {
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b"), col("f"), pmod(hash(col("ok")), lit(64)))
      .orderBy(col("ok"), col("ln"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b"), col("f")).orderBy(col("ok"), col("ln"))
    val base = lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("b"), col("l_returnflag").as("f"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("y"))
    val top = base
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= 4)
      .withColumn("rn", row_number().over(w2)).filter(col("rn") <= 4)
    val cell = top.groupBy("b", "f")
      .agg(count(lit(1)).cast("long").as("nc"),
        sum(col("y")).cast("long").as("tc"),
        sum(col("y") * col("y")).cast("long").as("qc"))
      .filter(col("nc") === 4)
    val bySq = cell.groupBy("b")
      .agg(sum(col("tc")).cast("long").as("tp"))
      .agg(sum(expr("CAST(tp AS DECIMAL(38,0)) * tp")).cast("decimal(38,0)").as("sp2"))
    val byFq = cell.groupBy("f")
      .agg(sum(col("tc")).cast("long").as("tf"))
      .agg(sum(expr("CAST(tf AS DECIMAL(38,0)) * tf")).cast("decimal(38,0)").as("so2"))
    val grand = cell.agg(sum(col("tc")).cast("long").as("tt"),
      sum(col("qc")).cast("long").as("qq"),
      sum(expr("CAST(tc AS DECIMAL(38,0)) * tc")).cast("decimal(38,0)").as("sc2"))
    grand.crossJoin(broadcast(bySq)).crossJoin(broadcast(byFq))
      .selectExpr(
        "CAST(tt AS DOUBLE) * tt / 300 AS ct",
        "CAST(sp2 AS DOUBLE) / 12 AS sp", "CAST(so2 AS DOUBLE) / 100 AS so",
        "CAST(sc2 AS DOUBLE) / 4 AS sc", "CAST(qq AS DOUBLE) AS q")
      .selectExpr(
        "(sp - ct) / 24 AS msp", "(so - ct) / 2 AS mso",
        "(sc - ct - (sp - ct) - (so - ct)) / 48 AS mspo",
        "(q - sc) / 225 AS mse")
      .selectExpr("msp", "mso", "mspo", "mse",
        "mse + greatest((mspo - mse) / 4, 0) + greatest((mso - mspo) / 100, 0) AS grr",
        "greatest((msp - mspo) / 12, 0) AS s2p")
      .selectExpr(
        "CAST(300 AS BIGINT) AS n_meas",
        "round(sqrt(mse) / 100, 4) AS repeatability_dollars",
        "round(100 * sqrt(grr / (grr + s2p)), 4) AS pct_grr",
        "round(100 * sqrt(s2p / (grr + s2p)), 4) AS pct_part",
        "CAST(floor(CAST(1.41 AS DOUBLE) * sqrt(s2p / grr)) AS BIGINT) AS ndc")
  }
  val statGageRrSql: String =
    """WITH base AS (
      |  SELECT p_brand AS b, l_returnflag AS f, l_orderkey AS ok,
      |    l_linenumber AS ln,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y,
      |    row_number() OVER (PARTITION BY p_brand, l_returnflag
      |      ORDER BY l_orderkey, l_linenumber) AS rn
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |cell AS (
      |  SELECT b, f, CAST(count(*) AS BIGINT) AS nc,
      |    CAST(sum(y) AS BIGINT) AS tc, CAST(sum(y * y) AS BIGINT) AS qc
      |  FROM base WHERE rn <= 4 GROUP BY 1, 2 HAVING count(*) = 4),
      |bp AS (SELECT CAST(sum(CAST(tp AS HUGEINT) * tp) AS DECIMAL(38,0)) AS sp2
      |  FROM (SELECT b, CAST(sum(tc) AS BIGINT) AS tp FROM cell GROUP BY 1)),
      |bf AS (SELECT CAST(sum(CAST(tf AS HUGEINT) * tf) AS DECIMAL(38,0)) AS so2
      |  FROM (SELECT f, CAST(sum(tc) AS BIGINT) AS tf FROM cell GROUP BY 1)),
      |g AS (SELECT CAST(sum(tc) AS BIGINT) AS tt, CAST(sum(qc) AS BIGINT) AS qq,
      |  CAST(sum(CAST(tc AS HUGEINT) * tc) AS DECIMAL(38,0)) AS sc2 FROM cell),
      |s1 AS (SELECT CAST(tt AS DOUBLE) * tt / 300 AS ct,
      |  CAST(sp2 AS DOUBLE) / 12 AS sp, CAST(so2 AS DOUBLE) / 100 AS so,
      |  CAST(sc2 AS DOUBLE) / 4 AS sc, CAST(qq AS DOUBLE) AS q
      |  FROM g, bp, bf),
      |s2 AS (SELECT (sp - ct) / 24 AS msp, (so - ct) / 2 AS mso,
      |  (sc - ct - (sp - ct) - (so - ct)) / 48 AS mspo,
      |  (q - sc) / 225 AS mse FROM s1),
      |s3 AS (SELECT msp, mso, mspo, mse,
      |  mse + greatest((mspo - mse) / 4, 0) + greatest((mso - mspo) / 100, 0) AS grr,
      |  greatest((msp - mspo) / 12, 0) AS s2p FROM s2)
      |SELECT CAST(300 AS BIGINT) AS n_meas,
      |  round(sqrt(mse) / 100, 4) AS repeatability_dollars,
      |  round(100 * sqrt(grr / (grr + s2p)), 4) AS pct_grr,
      |  round(100 * sqrt(s2p / (grr + s2p)), 4) AS pct_part,
      |  CAST(floor(CAST(1.41 AS DOUBLE) * sqrt(s2p / grr)) AS BIGINT) AS ndc
      |FROM s3""".stripMargin

  // ---------------------------------------------------------------- C1007
  /** stat_partial_auc — partial AUC of the C955 scorecard on the
    * operationally-relevant FPR band [0, 0.25], with McClish
    * standardization onto [0.5, 1]. ROC segments come from the 11
    * exact score strata (descending-threshold inclusion); each
    * trapezoid — including the linear interpolation at the FPR = 1/4
    * boundary, which integer arithmetic locates exactly via 4·count
    * vs Z comparisons — is IEEE from exact integers, quantized ·1e15
    * and summed exactly. Scale: one lineitem aggregate, then O(11).
    */
  def statPartialAuc(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .groupBy(col("l_discount").as("x"))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END"))
          .cast("long").as("og"))
      .withColumn("pq", expr(
        "CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * x))) + 0.5) AS BIGINT)"))
      .selectExpr("pq", "og", "ng - og AS zg")
    // bounded 11-row strata: shared single-task window, no GlobalRank
    // machinery (r14; plan-gate legal via the l_discount grouping)
    val spine = graft.plans.BoundedPrefix.prefixSums(
      g, Seq((col("zg"), "cumz"), (col("og"), "cumo")), Seq(col("pq").asc))
    val tot = g.agg(sum(col("og")).cast("long").as("o"),
      sum(col("zg")).cast("long").as("z"))
    spine.crossJoin(broadcast(tot))
      .selectExpr("o", "z",
        "z - cumz - zg AS a1", "z - cumz AS a2",
        "o - cumo - og AS b1", "o - cumo AS b2")
      .selectExpr("o", "z",
        """CAST(floor((CASE
          |  WHEN 4 * a1 >= z OR a2 = a1 THEN 0
          |  WHEN 4 * a2 <= z THEN
          |    (CAST(a2 AS DOUBLE) - a1) * (CAST(b1 AS DOUBLE) + b2) / 2
          |  ELSE (CAST(z AS DOUBLE) / 4 - a1)
          |    * (CAST(b1 AS DOUBLE) + (CAST(b1 AS DOUBLE)
          |      + (CAST(b2 AS DOUBLE) - b1) * (CAST(z AS DOUBLE) / 4 - a1)
          |        / (CAST(a2 AS DOUBLE) - a1))) / 2
          |  END) / (CAST(z AS DOUBLE) * o) * 1e15 + 0.5) AS BIGINT) AS aq""".stripMargin)
      .groupBy("o", "z")
      .agg(sum(col("aq")).cast("long").as("paq"))
      .selectExpr("o + z AS n_items",
        "CAST(0.25 AS DOUBLE) AS fpr_cap",
        "round(CAST(paq AS DOUBLE) / 1e15, 6) AS pauc",
        """round(CAST(0.5 AS DOUBLE) * (1 + (CAST(paq AS DOUBLE) / 1e15
          |  - CAST(0.03125 AS DOUBLE)) / (CAST(0.25 AS DOUBLE)
          |  - CAST(0.03125 AS DOUBLE))), 6) AS pauc_mcclish""".stripMargin)
  }
  val statPartialAucSql: String =
    """WITH g AS (
      |  SELECT CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * l_discount))) + 0.5) AS BIGINT) AS pq,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS og,
      |    CAST(count(*) - sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS zg
      |  FROM lineitem GROUP BY l_discount),
      |spine AS (
      |  SELECT pq, og, zg,
      |    CAST(coalesce(sum(zg) OVER (ORDER BY pq
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumz,
      |    CAST(coalesce(sum(og) OVER (ORDER BY pq
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumo
      |  FROM g),
      |tot AS (SELECT CAST(sum(og) AS BIGINT) AS o, CAST(sum(zg) AS BIGINT) AS z FROM g),
      |seg AS (
      |  SELECT o, z, z - cumz - zg AS a1, z - cumz AS a2,
      |    o - cumo - og AS b1, o - cumo AS b2
      |  FROM spine, tot),
      |q AS (
      |  SELECT o, z,
      |    CAST(floor((CASE
      |      WHEN 4 * a1 >= z OR a2 = a1 THEN 0
      |      WHEN 4 * a2 <= z THEN
      |        (CAST(a2 AS DOUBLE) - a1) * (CAST(b1 AS DOUBLE) + b2) / 2
      |      ELSE (CAST(z AS DOUBLE) / 4 - a1)
      |        * (CAST(b1 AS DOUBLE) + (CAST(b1 AS DOUBLE)
      |          + (CAST(b2 AS DOUBLE) - b1) * (CAST(z AS DOUBLE) / 4 - a1)
      |            / (CAST(a2 AS DOUBLE) - a1))) / 2
      |      END) / (CAST(z AS DOUBLE) * o) * 1e15 + 0.5) AS BIGINT) AS aq
      |  FROM seg)
      |SELECT o + z AS n_items, CAST(0.25 AS DOUBLE) AS fpr_cap,
      |  round(CAST(sum(aq) AS DOUBLE) / 1e15, 6) AS pauc,
      |  round(CAST(0.5 AS DOUBLE) * (1 + (CAST(sum(aq) AS DOUBLE) / 1e15
      |    - CAST(0.03125 AS DOUBLE)) / (CAST(0.25 AS DOUBLE)
      |    - CAST(0.03125 AS DOUBLE))), 6) AS pauc_mcclish
      |FROM q GROUP BY o, z""".stripMargin

  // The k = 5 order-priority p-value frame: one-sample two-sided z of
  // each priority's mean order value against the corpus mean/population
  // sd, Φ via the rational fragment, p on the clamped 1e-12 grid.
  private def priorityP(s: SparkSession, d: String): DataFrame = {
    val g = orders(s, d).groupBy(col("o_orderpriority").as("k"))
      .agg(count(lit(1)).cast("long").as("cn"),
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("long").as("cs"),
        sum(expr(
          """CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
            |AS DECIMAL(38,0))
            |* CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)""".stripMargin))
          .cast("decimal(38,0)").as("cq"))
    val tot = g.agg(sum(col("cn")).cast("long").as("tn"),
      sum(col("cs")).cast("long").as("ts"),
      sum(col("cq")).cast("decimal(38,0)").as("tq"))
    g.crossJoin(broadcast(tot)).selectExpr("k", s"$pqSqlE AS pv")
  }
  private val priorityPSql: String =
    s"""g AS (
       |  SELECT o_orderpriority AS k, CAST(count(*) AS BIGINT) AS cn,
       |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS cs,
       |    CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS HUGEINT)
       |      * CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS cq
       |  FROM orders GROUP BY 1),
       |tot AS (SELECT CAST(sum(cn) AS BIGINT) AS tn, CAST(sum(cs) AS BIGINT) AS ts,
       |  CAST(sum(cq) AS DECIMAL(38,0)) AS tq FROM g),
       |pv AS (SELECT k, $pqSqlE AS pv FROM g, tot)""".stripMargin

  // ---------------------------------------------------------------- C1008
  /** stat_pvalue_combiners — the classical p-value combination toolbox
    * over the k = 5 order-priority mean tests: Fisher (−2Σln p with
    * the EXACT χ²₁₀ upper tail — the closed-form Erlang-5 survival,
    * no quadrature), Pearson (−2Σln(1−p), lower tail), Tippett
    * (1−(1−p_min)^k), and the Cauchy combination ACAT
    * (atan-mean of tan((½−p)π)). Every ln/tan term quantizes ·1e12
    * (tan ·1e6) onto integers before the bounded exact sum.
    */
  def statPvalueCombiners(s: SparkSession, d: String): DataFrame =
    priorityP(s, d)
      .selectExpr("pv",
        "CAST(floor(ln(CAST(pv AS DOUBLE) / 1e12) * 1e12 + 0.5) AS BIGINT) AS lq",
        "CAST(floor(ln(1 - CAST(pv AS DOUBLE) / 1e12) * 1e12 + 0.5) AS BIGINT) AS l1q",
        "CAST(floor(tan((CAST(0.5 AS DOUBLE) - CAST(pv AS DOUBLE) / 1e12) * pi()) * 1e6 + 0.5) AS BIGINT) AS tq")
      .agg(count(lit(1)).cast("long").as("k"),
        min(col("pv")).cast("long").as("pmin"),
        sum(col("lq")).cast("long").as("sl"),
        sum(col("l1q")).cast("long").as("sl1"),
        sum(col("tq")).cast("long").as("st"))
      .selectExpr("k",
        "round(-2 * (CAST(sl AS DOUBLE) / 1e12), 6) AS fisher_stat",
        s"""round(${erlang5SurvSqlE("-2 * (CAST(sl AS DOUBLE) / 1e12)")}, 6)
           |AS fisher_p""".stripMargin,
        "round(-2 * (CAST(sl1 AS DOUBLE) / 1e12), 6) AS pearson_stat",
        s"""round(1 - ${erlang5SurvSqlE("-2 * (CAST(sl1 AS DOUBLE) / 1e12)")}, 6)
           |AS pearson_p""".stripMargin,
        "round(1 - power(1 - CAST(pmin AS DOUBLE) / 1e12, 5), 6) AS tippett_p",
        "round(CAST(0.5 AS DOUBLE) - atan(CAST(st AS DOUBLE) / 1e6 / 5) / pi(), 6) AS acat_p")
  val statPvalueCombinersSql: String =
    s"""WITH $priorityPSql,
       |t AS (
       |  SELECT pv,
       |    CAST(floor(ln(CAST(pv AS DOUBLE) / 1e12) * 1e12 + 0.5) AS BIGINT) AS lq,
       |    CAST(floor(ln(1 - CAST(pv AS DOUBLE) / 1e12) * 1e12 + 0.5) AS BIGINT) AS l1q,
       |    CAST(floor(tan((CAST(0.5 AS DOUBLE) - CAST(pv AS DOUBLE) / 1e12) * pi()) * 1e6 + 0.5) AS BIGINT) AS tq
       |  FROM pv),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(min(pv) AS BIGINT) AS pmin,
       |    CAST(sum(lq) AS BIGINT) AS sl, CAST(sum(l1q) AS BIGINT) AS sl1,
       |    CAST(sum(tq) AS BIGINT) AS st
       |  FROM t)
       |SELECT k,
       |  round(-2 * (CAST(sl AS DOUBLE) / 1e12), 6) AS fisher_stat,
       |  round(${erlang5SurvSqlE("-2 * (CAST(sl AS DOUBLE) / 1e12)")}, 6) AS fisher_p,
       |  round(-2 * (CAST(sl1 AS DOUBLE) / 1e12), 6) AS pearson_stat,
       |  round(1 - ${erlang5SurvSqlE("-2 * (CAST(sl1 AS DOUBLE) / 1e12)")}, 6) AS pearson_p,
       |  round(1 - power(1 - CAST(pmin AS DOUBLE) / 1e12, 5), 6) AS tippett_p,
       |  round(CAST(0.5 AS DOUBLE) - atan(CAST(st AS DOUBLE) / 1e6 / 5) / pi(), 6) AS acat_p
       |FROM a""".stripMargin

  // The m = 25 brand p-value frame (same construction over part
  // retail prices) shared by Storey and higher criticism.
  private def brandP(s: SparkSession, d: String): DataFrame = {
    val g = part(s, d).groupBy(col("p_brand").as("k"))
      .agg(count(lit(1)).cast("long").as("cn"),
        sum(expr("CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("long").as("cs"),
        sum(expr(
          """CAST(CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT)
            |AS DECIMAL(38,0))
            |* CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT)""".stripMargin))
          .cast("decimal(38,0)").as("cq"))
    val tot = g.agg(sum(col("cn")).cast("long").as("tn"),
      sum(col("cs")).cast("long").as("ts"),
      sum(col("cq")).cast("decimal(38,0)").as("tq"))
    g.crossJoin(broadcast(tot)).selectExpr("k", s"$pqSqlE AS pv")
  }
  private val brandPSql: String =
    s"""g AS (
       |  SELECT p_brand AS k, CAST(count(*) AS BIGINT) AS cn,
       |    CAST(sum(CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS cs,
       |    CAST(sum(CAST(CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS HUGEINT)
       |      * CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS cq
       |  FROM part GROUP BY 1),
       |tot AS (SELECT CAST(sum(cn) AS BIGINT) AS tn, CAST(sum(cs) AS BIGINT) AS ts,
       |  CAST(sum(cq) AS DECIMAL(38,0)) AS tq FROM g),
       |pv AS (SELECT k, $pqSqlE AS pv FROM g, tot)""".stripMargin

  // ---------------------------------------------------------------- C1009
  /** stat_storey_pi0 — Storey's null-proportion estimate over the
    * m = 25 brand mean tests: π₀(λ) = #{p > λ} / (m(1−λ)) on the
    * λ ∈ {0.20, …, 0.80} grid (capped at 1). The count compares the
    * 1e-12 integer p grid against exact integer λ·1e12 literals —
    * no IEEE in the decision. One output row per λ.
    */
  def statStoreyPi0(s: SparkSession, d: String): DataFrame = {
    val p = brandP(s, d)
    val tot = p.agg(count(lit(1)).cast("long").as("m"))
    p.crossJoin(broadcast(tot))
      .withColumn("lam100", explode(array(
        lit(20L), lit(30L), lit(40L), lit(50L), lit(60L), lit(70L), lit(80L))))
      .groupBy("lam100", "m")
      .agg(sum(expr("CASE WHEN pv > lam100 * CAST(1e10 AS BIGINT) THEN 1L ELSE 0L END"))
        .cast("long").as("n_above"))
      .selectExpr("round(CAST(lam100 AS DOUBLE) / 100, 2) AS lam",
        "n_above",
        """round(least(CAST(n_above AS DOUBLE)
          |  / (m * (1 - CAST(lam100 AS DOUBLE) / 100)), CAST(1 AS DOUBLE)), 6)
          |AS pi0""".stripMargin)
      .orderBy("lam")
  }
  val statStoreyPi0Sql: String =
    s"""WITH $brandPSql,
       |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pv),
       |lam AS (SELECT CAST(unnest([20, 30, 40, 50, 60, 70, 80]) AS BIGINT) AS lam100)
       |SELECT round(CAST(lam100 AS DOUBLE) / 100, 2) AS lam,
       |  CAST(sum(CASE WHEN pv > lam100 * CAST(1e10 AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
       |  round(least(CAST(sum(CASE WHEN pv > lam100 * CAST(1e10 AS BIGINT) THEN 1 ELSE 0 END) AS DOUBLE)
       |    / (max(m) * (1 - CAST(lam100 AS DOUBLE) / 100)), CAST(1 AS DOUBLE)), 6) AS pi0
       |FROM pv, mm, lam GROUP BY lam100 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- C1010
  /** stat_higher_criticism — the Donoho–Jin HC statistic over the
    * m = 25 ordered brand p-values: HC = max_i √m·(i/m − p_(i)) /
    * √(p_(i)(1−p_(i))). Ranks come from the GlobalRank exclusive
    * prefix machinery on the total (p, brand) order (no global
    * window); each HC term quantizes ·1e9 before the exact integer
    * max. Reported with the argmax rank and its p-value.
    */
  def statHigherCriticism(s: SparkSession, d: String): DataFrame = {
    val p = brandP(s, d)
    val spine = graft.plans.GlobalRank.withExclusivePrefixSum(
      p.withColumn("one", lit(1L)), "rk0", col("one"),
      Seq(col("pv").asc, col("k").asc))
    val tot = p.agg(count(lit(1)).cast("long").as("m"))
    val terms = spine.crossJoin(broadcast(tot))
      .selectExpr("m", "rk0 + 1 AS i", "pv",
        """CAST(floor(sqrt(CAST(m AS DOUBLE))
          |  * (CAST(rk0 + 1 AS DOUBLE) / m - CAST(pv AS DOUBLE) / 1e12)
          |  / sqrt(CAST(pv AS DOUBLE) / 1e12 * (1 - CAST(pv AS DOUBLE) / 1e12))
          |  * 1e9 + 0.5) AS BIGINT) AS hq""".stripMargin)
    val mx = terms.groupBy("m").agg(max(col("hq")).cast("long").as("hmax"))
    terms.join(broadcast(mx), Seq("m"))
      .filter(col("hq") === col("hmax"))
      .selectExpr("m", "i AS argmax_rank",
        "round(CAST(pv AS DOUBLE) / 1e12, 6) AS p_at_argmax",
        "round(CAST(hmax AS DOUBLE) / 1e9, 6) AS hc_stat")
      .orderBy("argmax_rank").limit(1)
  }
  val statHigherCriticismSql: String =
    s"""WITH $brandPSql,
       |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pv),
       |spine AS (
       |  SELECT pv, CAST(row_number() OVER (ORDER BY pv, k) AS BIGINT) AS i
       |  FROM pv),
       |terms AS (
       |  SELECT m, i, pv,
       |    CAST(floor(sqrt(CAST(m AS DOUBLE))
       |      * (CAST(i AS DOUBLE) / m - CAST(pv AS DOUBLE) / 1e12)
       |      / sqrt(CAST(pv AS DOUBLE) / 1e12 * (1 - CAST(pv AS DOUBLE) / 1e12))
       |      * 1e9 + 0.5) AS BIGINT) AS hq
       |  FROM spine, mm),
       |mx AS (SELECT m, CAST(max(hq) AS BIGINT) AS hmax FROM terms GROUP BY 1)
       |SELECT t.m, i AS argmax_rank,
       |  round(CAST(pv AS DOUBLE) / 1e12, 6) AS p_at_argmax,
       |  round(CAST(hmax AS DOUBLE) / 1e9, 6) AS hc_stat
       |FROM terms t JOIN mx ON t.m = mx.m AND t.hq = mx.hmax
       |ORDER BY argmax_rank LIMIT 1""".stripMargin

  // ---------------------------------------------------------------- C1011
  /** stat_bayes_ab — the large-sample Bayesian A/B read of purchase
    * share between the two user-parity cohorts: Beta(1+a, 1+n−a)
    * posteriors on each cohort's purchase-event share, the normal
    * approximation of the posterior difference (exact for corpus-scale
    * α+β), P(B > A) = Φ(Δμ/s) via the rational Φ, and the expected
    * loss of shipping B, E[max(p_A−p_B, 0)] = s·φ(Δμ/s) − Δμ·(1−Φ).
    * Scale: one events aggregate into two cohort rows, then O(1).
    */
  def statBayesAb(s: SparkSession, d: String): DataFrame = {
    val g = events(s, d)
      .groupBy(expr("user_id % 2").as("grp"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr("CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END"))
          .cast("long").as("a"))
    val one = g.agg(
      max(expr("CASE WHEN grp = 0 THEN n END")).cast("long").as("n_a"),
      max(expr("CASE WHEN grp = 0 THEN a END")).cast("long").as("conv_a"),
      max(expr("CASE WHEN grp = 1 THEN n END")).cast("long").as("n_b"),
      max(expr("CASE WHEN grp = 1 THEN a END")).cast("long").as("conv_b"))
    one
      .selectExpr("n_a", "conv_a", "n_b", "conv_b",
        "(CAST(1 AS DOUBLE) + conv_a) / (2 + n_a) AS mua",
        "(CAST(1 AS DOUBLE) + conv_b) / (2 + n_b) AS mub",
        """(CAST(1 AS DOUBLE) + conv_a) * (1 + n_a - conv_a)
          |/ ((CAST(2 AS DOUBLE) + n_a) * (2 + n_a) * (3 + n_a)) AS va""".stripMargin,
        """(CAST(1 AS DOUBLE) + conv_b) * (1 + n_b - conv_b)
          |/ ((CAST(2 AS DOUBLE) + n_b) * (2 + n_b) * (3 + n_b)) AS vb""".stripMargin)
      .selectExpr("n_a", "conv_a", "n_b", "conv_b",
        "mub - mua AS dmu", "sqrt(va + vb) AS sd")
      .selectExpr("n_a", "conv_a", "n_b", "conv_b",
        s"round(${bigPhiSqlE("dmu / sd")}, 6) AS p_b_beats_a",
        s"""round(sd * ${phiSqlE("dmu / sd")}
           |- dmu * (1 - ${bigPhiSqlE("dmu / sd")}), 8) AS exp_loss_choose_b""".stripMargin)
  }
  val statBayesAbSql: String =
    s"""WITH g AS (
       |  SELECT user_id % 2 AS grp, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS a
       |  FROM events GROUP BY 1),
       |one AS (
       |  SELECT CAST(max(CASE WHEN grp = 0 THEN n END) AS BIGINT) AS n_a,
       |    CAST(max(CASE WHEN grp = 0 THEN a END) AS BIGINT) AS conv_a,
       |    CAST(max(CASE WHEN grp = 1 THEN n END) AS BIGINT) AS n_b,
       |    CAST(max(CASE WHEN grp = 1 THEN a END) AS BIGINT) AS conv_b
       |  FROM g),
       |m AS (
       |  SELECT n_a, conv_a, n_b, conv_b,
       |    (CAST(1 AS DOUBLE) + conv_a) / (2 + n_a) AS mua,
       |    (CAST(1 AS DOUBLE) + conv_b) / (2 + n_b) AS mub,
       |    (CAST(1 AS DOUBLE) + conv_a) * (1 + n_a - conv_a)
       |    / ((CAST(2 AS DOUBLE) + n_a) * (2 + n_a) * (3 + n_a)) AS va,
       |    (CAST(1 AS DOUBLE) + conv_b) * (1 + n_b - conv_b)
       |    / ((CAST(2 AS DOUBLE) + n_b) * (2 + n_b) * (3 + n_b)) AS vb
       |  FROM one),
       |z AS (
       |  SELECT n_a, conv_a, n_b, conv_b, mub - mua AS dmu, sqrt(va + vb) AS sd
       |  FROM m)
       |SELECT n_a, conv_a, n_b, conv_b,
       |  round(${bigPhiSqlE("dmu / sd")}, 6) AS p_b_beats_a,
       |  round(sd * ${phiSqlE("dmu / sd")}
       |  - dmu * (1 - ${bigPhiSqlE("dmu / sd")}), 8) AS exp_loss_choose_b
       |FROM z""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_p_chart" -> (statPChart _),
    "stat_u_chart" -> (statUChart _),
    "stat_gage_rr" -> (statGageRr _),
    "stat_partial_auc" -> (statPartialAuc _),
    "stat_pvalue_combiners" -> (statPvalueCombiners _),
    "stat_storey_pi0" -> (statStoreyPi0 _),
    "stat_higher_criticism" -> (statHigherCriticism _),
    "stat_bayes_ab" -> (statBayesAb _))

  val oracle: Map[String, String] = Map(
    "stat_p_chart" -> statPChartSql,
    "stat_u_chart" -> statUChartSql,
    "stat_gage_rr" -> statGageRrSql,
    "stat_partial_auc" -> statPartialAucSql,
    "stat_pvalue_combiners" -> statPvalueCombinersSql,
    "stat_storey_pi0" -> statStoreyPi0Sql,
    "stat_higher_criticism" -> statHigherCriticismSql,
    "stat_bayes_ab" -> statBayesAbSql)
}
