package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 108 (C836–C839): the rank/normal-scores battery — Dunn's
  * post-hoc pairwise test after Kruskal–Wallis, the van der Waerden
  * normal-scores k-sample test, the Klotz normal-scores scale test,
  * and the Fligner–Killeen median-centered scale test.
  *
  * Shared discipline: every rank is an EXACT ×2 midrank from the
  * ≤50-bucket integer-quantity histogram (the bounded-domain frame the
  * hardened r12 plan gate proves corpus-independent); normal scores go
  * through the shared Acklam [[QNorm]] fragment (bit-identical doubles
  * in both engines) and are quantized ONCE; every cross-group sum is a
  * fixed-text expression over per-group exact aggregates (never a
  * float sum whose order an engine could permute). Tie corrections are
  * exact integer Σ(t³−t).
  */
object Extras208 {

  /** C836 stat_dunn_posthoc — Dunn's (1964) post-hoc pairwise rank
    * comparison across the five order priorities (the follow-up the
    * C-line Kruskal–Wallis needs when it rejects): mean ×2 midranks
    * per group from the bounded quantity histogram, tie-corrected
    * variance (N(N+1)/12 − Σ(t³−t)/(12(N−1)))(1/nᵢ+1/nⱼ), z per pair,
    * Bonferroni-adjusted two-sided significance at α=0.05 over the 10
    * pairs (critical value Φ⁻¹(1−0.05/20) via the shared Acklam
    * fragment — identical literal arithmetic in both engines).
    */
  def statDunnPosthoc(s: SparkSession, d: String): DataFrame = {
    val base = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        Seq("l_orderkey"))
      .select(col("o_orderpriority").as("g"), expr("CAST(l_quantity AS INT)").as("qv"))
    val hist = base.groupBy("g", "qv").agg(count(lit(1)).cast("long").as("n"))
    val vhist = hist.groupBy("qv").agg(sum(col("n")).cast("long").as("w"))
      .withColumn("c", coalesce(sum(col("w")).over(
        Window.orderBy(col("qv").asc).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("mid2", expr("2 * c + w + 1"))
    val grp = hist.join(vhist.select("qv", "mid2"), Seq("qv"))
      .groupBy("g")
      .agg(sum(col("n")).cast("long").as("ng"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * mid2")).cast("decimal(38,0)").as("r2"))
    val tot = vhist.agg(sum(col("w")).cast("long").as("nn"),
      sum(expr("CAST(w AS DECIMAL(38,0)) * w * w - w")).cast("decimal(38,0)").as("t3"))
    val pairs = grp
      .crossJoin(broadcast(grp.select(col("g").as("g2"), col("ng").as("ng2"), col("r2").as("r22"))))
      .filter(col("g") < col("g2"))
      .crossJoin(broadcast(tot))
    pairs
      .selectExpr("g AS prio_a", "g2 AS prio_b", "ng AS n_a", "ng2 AS n_b",
        """(CAST(r2 AS DOUBLE) / (2 * ng) - CAST(r22 AS DOUBLE) / (2 * ng2))
          |/ sqrt((CAST(nn AS DOUBLE) * (nn + 1) / 12.0
          |        - CAST(t3 AS DOUBLE) / (12.0 * (nn - 1)))
          |       * (1.0 / ng + 1.0 / ng2)) AS z""".stripMargin)
      .selectExpr("prio_a", "prio_b", "n_a", "n_b", "round(z, 4) AS z_dunn",
        s"abs(z) > (${QNorm.sql("0.9975")}) AS reject_bonferroni")
      .orderBy("prio_a", "prio_b")
  }
  val statDunnPosthocSql: String =
    s"""WITH base AS (
      |  SELECT o.o_orderpriority AS g, CAST(l.l_quantity AS INT) AS qv
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
      |hist AS (SELECT g, qv, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1, 2),
      |vhist AS (
      |  SELECT qv, w,
      |    2 * COALESCE(sum(w) OVER (ORDER BY qv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + w + 1 AS mid2
      |  FROM (SELECT qv, CAST(sum(n) AS BIGINT) AS w FROM hist GROUP BY 1)),
      |grp AS (
      |  SELECT h.g, CAST(sum(h.n) AS BIGINT) AS ng,
      |    CAST(sum(CAST(h.n AS HUGEINT) * v.mid2) AS DECIMAL(38,0)) AS r2
      |  FROM hist h JOIN vhist v ON v.qv = h.qv GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(w) AS BIGINT) AS nn,
      |    CAST(sum(CAST(w AS HUGEINT) * w * w - w) AS DECIMAL(38,0)) AS t3
      |  FROM (SELECT qv, CAST(sum(n) AS BIGINT) AS w FROM hist GROUP BY 1)),
      |z AS (
      |  SELECT a.g AS prio_a, b.g AS prio_b, a.ng AS n_a, b.ng AS n_b,
      |    (CAST(a.r2 AS DOUBLE) / (2 * a.ng) - CAST(b.r2 AS DOUBLE) / (2 * b.ng))
      |    / sqrt((CAST(t.nn AS DOUBLE) * (t.nn + 1) / 12.0
      |            - CAST(t.t3 AS DOUBLE) / (12.0 * (t.nn - 1)))
      |           * (1.0 / a.ng + 1.0 / b.ng)) AS z
      |  FROM grp a JOIN grp b ON a.g < b.g, tot t)
      |SELECT prio_a, prio_b, n_a, n_b, round(z, 4) AS z_dunn,
      |  abs(z) > (${QNorm.sql("0.9975")}) AS reject_bonferroni
      |FROM z ORDER BY prio_a, prio_b""".stripMargin

  /** C837 stat_van_der_waerden — the van der Waerden normal-scores
    * k-sample location test across the three return flags: scores
    * Φ⁻¹(mid2/(2(N+1))) via the shared Acklam fragment quantized ·10⁶
    * ONCE per histogram bucket, T1 = (N−1)·Σⱼ(Σaⱼ)²/nⱼ / Σa² with the
    * three group terms in FIXED textual order (A, N, R — no float-sum
    * permutation), χ²₂ decision at the 5.991464547107979 literal. The
    * asymptotically-most-powerful rank test under normality — the
    * bridge between Kruskal–Wallis and ANOVA.
    */
  def statVanDerWaerden(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .groupBy(expr("CAST(l_quantity AS INT)").as("qv"))
      .agg(sum(expr("CASE WHEN l_returnflag = 'A' THEN 1L ELSE 0L END")).cast("long").as("na"),
        sum(expr("CASE WHEN l_returnflag = 'N' THEN 1L ELSE 0L END")).cast("long").as("nb"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("nc"),
        count(lit(1)).cast("long").as("w"))
      .withColumn("c", coalesce(sum(col("w")).over(
        Window.orderBy(col("qv").asc).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("mid2", expr("2 * c + w + 1"))
    val tot = hist.agg(sum(col("w")).cast("long").as("nn"))
    val scored = hist.crossJoin(broadcast(tot))
      .withColumn("sq", expr(
        s"CAST(floor((${QNorm.sql("CAST(mid2 AS DOUBLE) / (2.0 * (nn + 1))")}) * 1e6 + 0.5) AS BIGINT)"))
    scored.groupBy("nn")
      .agg(sum(expr("CAST(na AS DECIMAL(38,0)) * sq")).cast("decimal(38,0)").as("sa"),
        sum(expr("CAST(nb AS DECIMAL(38,0)) * sq")).cast("decimal(38,0)").as("sb"),
        sum(expr("CAST(nc AS DECIMAL(38,0)) * sq")).cast("decimal(38,0)").as("sc"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * sq * sq")).cast("decimal(38,0)").as("s2"),
        sum(col("na")).cast("long").as("ta"),
        sum(col("nb")).cast("long").as("tb"),
        sum(col("nc")).cast("long").as("tc"))
      .selectExpr("nn AS n",
        """round((CASE WHEN ta = 0 THEN 0.0D ELSE CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / ta END
          | + CASE WHEN tb = 0 THEN 0.0D ELSE CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / tb END
          | + CASE WHEN tc = 0 THEN 0.0D ELSE CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / tc END)
          | * (nn - 1) / CAST(s2 AS DOUBLE), 4) AS vdw_t1""".stripMargin,
        "CAST(2 AS INT) AS df",
        """((CASE WHEN ta = 0 THEN 0.0D ELSE CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / ta END
          | + CASE WHEN tb = 0 THEN 0.0D ELSE CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / tb END
          | + CASE WHEN tc = 0 THEN 0.0D ELSE CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / tc END)
          | * (nn - 1) / CAST(s2 AS DOUBLE)) > 5.991464547107979 AS reject_95""".stripMargin)
  }
  val statVanDerWaerdenSql: String = {
    val t1 =
      """(CASE WHEN ta = 0 THEN 0.0 ELSE CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / ta END
        | + CASE WHEN tb = 0 THEN 0.0 ELSE CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / tb END
        | + CASE WHEN tc = 0 THEN 0.0 ELSE CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / tc END)
        | * (nn - 1) / CAST(s2 AS DOUBLE)""".stripMargin
    s"""WITH hist AS (
      |  SELECT CAST(l_quantity AS INT) AS qv,
      |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS nc,
      |    CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1),
      |mid AS (
      |  SELECT qv, na, nb, nc, w,
      |    2 * COALESCE(sum(w) OVER (ORDER BY qv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + w + 1 AS mid2
      |  FROM hist),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS nn FROM hist),
      |scored AS (
      |  SELECT m.*, t.nn,
      |    CAST(floor((${QNorm.sql("CAST(m.mid2 AS DOUBLE) / (2.0 * (t.nn + 1))")}) * 1e6 + 0.5) AS BIGINT) AS sq
      |  FROM mid m, tot t),
      |ag AS (
      |  SELECT nn,
      |    CAST(sum(CAST(na AS HUGEINT) * sq) AS DECIMAL(38,0)) AS sa,
      |    CAST(sum(CAST(nb AS HUGEINT) * sq) AS DECIMAL(38,0)) AS sb,
      |    CAST(sum(CAST(nc AS HUGEINT) * sq) AS DECIMAL(38,0)) AS sc,
      |    CAST(sum(CAST(w AS HUGEINT) * sq * sq) AS DECIMAL(38,0)) AS s2,
      |    CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb,
      |    CAST(sum(nc) AS BIGINT) AS tc
      |  FROM scored GROUP BY 1)
      |SELECT nn AS n, round($t1, 4) AS vdw_t1, CAST(2 AS INT) AS df,
      |  ($t1) > 5.991464547107979 AS reject_95
      |FROM ag""".stripMargin
  }

  /** C838 stat_klotz — the Klotz normal-scores SCALE test (A vs R
    * quantities): squared van der Waerden scores kq = (Φ⁻¹(mid2/
    * (2(N+1))))² quantized at ·10⁴ BEFORE squaring (·10⁸ units after —
    * keeps Σw·kq² inside DECIMAL(38,0) beyond sf1000, where a ·10⁶
    * quantization would overflow at sf100), exact integer score sums,
    * z = (T − n₁·S̄)/√(n₁n₂(N·ΣwS² − (ΣwS)²)/(N²(N−1))). The
    * locally-most-powerful scale test under normality — the
    * normal-scores counterpart of C-line Ansari–Bradley/Mood.
    */
  def statKlotz(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy(expr("CAST(l_quantity AS INT)").as("qv"))
      .agg(sum(expr("CASE WHEN l_returnflag = 'A' THEN 1L ELSE 0L END")).cast("long").as("n1"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("n2"),
        count(lit(1)).cast("long").as("w"))
      .withColumn("c", coalesce(sum(col("w")).over(
        Window.orderBy(col("qv").asc).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("mid2", expr("2 * c + w + 1"))
    val tot = hist.agg(sum(col("w")).cast("long").as("nn"))
    val scored = hist.crossJoin(broadcast(tot))
      .withColumn("sq", expr(
        s"CAST(floor((${QNorm.sql("CAST(mid2 AS DOUBLE) / (2.0 * (nn + 1))")}) * 1e4 + 0.5) AS BIGINT)"))
      .withColumn("kq", expr("sq * sq"))
    scored.groupBy("nn")
      .agg(sum(expr("CAST(n1 AS DECIMAL(38,0)) * kq")).cast("decimal(38,0)").as("t"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * kq")).cast("decimal(38,0)").as("sw"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * kq * kq")).cast("decimal(38,0)").as("sw2"),
        sum(col("n1")).cast("long").as("m1"),
        sum(col("n2")).cast("long").as("m2"))
      .selectExpr("m1 AS n_a", "m2 AS n_r",
        """round((CAST(t AS DOUBLE) - CAST(m1 AS DOUBLE) * CAST(sw AS DOUBLE) / nn)
          |/ sqrt(CAST(m1 AS DOUBLE) * m2
          |       * (CAST(nn AS DOUBLE) * CAST(sw2 AS DOUBLE)
          |          - CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
          |       / (CAST(nn AS DOUBLE) * nn * (nn - 1))), 4) AS klotz_z""".stripMargin)
      .selectExpr("n_a", "n_r", "klotz_z", "abs(klotz_z) > 1.96 AS reject_95")
  }
  val statKlotzSql: String =
    s"""WITH hist AS (
      |  SELECT CAST(l_quantity AS INT) AS qv,
      |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
      |mid AS (
      |  SELECT qv, n1, n2, w,
      |    2 * COALESCE(sum(w) OVER (ORDER BY qv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + w + 1 AS mid2
      |  FROM hist),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS nn FROM hist),
      |scored AS (
      |  SELECT m.*, t.nn,
      |    CAST(floor((${QNorm.sql("CAST(m.mid2 AS DOUBLE) / (2.0 * (t.nn + 1))")}) * 1e4 + 0.5) AS BIGINT) AS sq
      |  FROM mid m, tot t),
      |ag AS (
      |  SELECT nn,
      |    CAST(sum(CAST(n1 AS HUGEINT) * sq * sq) AS DECIMAL(38,0)) AS t,
      |    CAST(sum(CAST(w AS HUGEINT) * sq * sq) AS DECIMAL(38,0)) AS sw,
      |    CAST(sum(CAST(w AS HUGEINT) * sq * sq * sq * sq) AS DECIMAL(38,0)) AS sw2,
      |    CAST(sum(n1) AS BIGINT) AS m1, CAST(sum(n2) AS BIGINT) AS m2
      |  FROM scored GROUP BY 1),
      |z AS (
      |  SELECT m1 AS n_a, m2 AS n_r,
      |    (CAST(t AS DOUBLE) - CAST(m1 AS DOUBLE) * CAST(sw AS DOUBLE) / nn)
      |    / sqrt(CAST(m1 AS DOUBLE) * m2
      |           * (CAST(nn AS DOUBLE) * CAST(sw2 AS DOUBLE)
      |              - CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
      |           / (CAST(nn AS DOUBLE) * nn * (nn - 1))) AS z
      |  FROM ag)
      |SELECT n_a, n_r, round(z, 4) AS klotz_z, abs(round(z, 4)) > 1.96 AS reject_95
      |FROM z""".stripMargin

  /** C839 stat_fligner_killeen — the Fligner–Killeen median-centered
    * scale test across the three return flags (the robust "are the
    * spreads equal" screen R's fligner.test popularized): per-group
    * EXACT medians from the bounded histogram, |x − med_g| re-binned
    * (still provably ≤50-bounded — the gate proves abs(qv − min(CASE))
    * through the closure + boolean rules), scores Φ⁻¹(½ + mid2/
    * (4(N+1))) quantized ·10⁶, χ² = Σnⱼ(āⱼ−ā)²/V² with fixed-order
    * group terms. Brown–Forsythe's rank-based sibling.
    */
  def statFlignerKilleen(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .groupBy(expr("CAST(l_quantity AS INT)").as("qv"))
      .agg(sum(expr("CASE WHEN l_returnflag = 'A' THEN 1L ELSE 0L END")).cast("long").as("na"),
        sum(expr("CASE WHEN l_returnflag = 'N' THEN 1L ELSE 0L END")).cast("long").as("nb"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("nc"))
    val cums = hist
      .withColumn("ca", coalesce(sum(col("na")).over(
        Window.orderBy(col("qv").asc).rowsBetween(Window.unboundedPreceding, 0)), lit(0L)))
      .withColumn("cb", coalesce(sum(col("nb")).over(
        Window.orderBy(col("qv").asc).rowsBetween(Window.unboundedPreceding, 0)), lit(0L)))
      .withColumn("cc", coalesce(sum(col("nc")).over(
        Window.orderBy(col("qv").asc).rowsBetween(Window.unboundedPreceding, 0)), lit(0L)))
    val meds = cums
      .crossJoin(broadcast(hist.agg(sum(col("na")).cast("long").as("ta"),
        sum(col("nb")).cast("long").as("tb"), sum(col("nc")).cast("long").as("tc"))))
      .agg(min(expr("CASE WHEN 2 * ca >= ta THEN qv END")).as("med_a"),
        min(expr("CASE WHEN 2 * cb >= tb THEN qv END")).as("med_b"),
        min(expr("CASE WHEN 2 * cc >= tc THEN qv END")).as("med_c"))
    val withMed = hist.crossJoin(broadcast(meds))
    val dvhist = withMed.select(
        expr("abs(qv - med_a)").as("dv"), col("na").as("ma"), lit(0L).as("mb"), lit(0L).as("mc"))
      .unionAll(withMed.select(
        expr("abs(qv - med_b)").as("dv"), lit(0L).as("ma"), col("nb").as("mb"), lit(0L).as("mc")))
      .unionAll(withMed.select(
        expr("abs(qv - med_c)").as("dv"), lit(0L).as("ma"), lit(0L).as("mb"), col("nc").as("mc")))
      .groupBy("dv")
      .agg(sum(col("ma")).cast("long").as("ma"), sum(col("mb")).cast("long").as("mb"),
        sum(col("mc")).cast("long").as("mc"))
      .withColumn("w", expr("ma + mb + mc"))
      .withColumn("c", coalesce(sum(col("w")).over(
        Window.orderBy(col("dv").asc).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("mid2", expr("2 * c + w + 1"))
    val tot = dvhist.agg(sum(col("w")).cast("long").as("nn"))
    val scored = dvhist.crossJoin(broadcast(tot))
      .withColumn("aq", expr(
        s"CAST(floor((${QNorm.sql("0.5 + CAST(mid2 AS DOUBLE) / (4.0 * (nn + 1))")}) * 1e6 + 0.5) AS BIGINT)"))
    scored.groupBy("nn")
      .agg(sum(expr("CAST(ma AS DECIMAL(38,0)) * aq")).cast("decimal(38,0)").as("sa"),
        sum(expr("CAST(mb AS DECIMAL(38,0)) * aq")).cast("decimal(38,0)").as("sb"),
        sum(expr("CAST(mc AS DECIMAL(38,0)) * aq")).cast("decimal(38,0)").as("sc"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * aq")).cast("decimal(38,0)").as("sw"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * aq * aq")).cast("decimal(38,0)").as("sw2"),
        sum(col("ma")).cast("long").as("ta"),
        sum(col("mb")).cast("long").as("tb"),
        sum(col("mc")).cast("long").as("tc"))
      .selectExpr("nn AS n",
        """round((CASE WHEN ta = 0 THEN 0.0D ELSE
          |   ta * pow(CAST(sa AS DOUBLE) / ta - CAST(sw AS DOUBLE) / nn, 2) END
          | + CASE WHEN tb = 0 THEN 0.0D ELSE
          |   tb * pow(CAST(sb AS DOUBLE) / tb - CAST(sw AS DOUBLE) / nn, 2) END
          | + CASE WHEN tc = 0 THEN 0.0D ELSE
          |   tc * pow(CAST(sc AS DOUBLE) / tc - CAST(sw AS DOUBLE) / nn, 2) END)
          |/ ((CAST(sw2 AS DOUBLE) - CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / nn)
          |   / (nn - 1)), 4) AS fk_x2""".stripMargin,
        "CAST(2 AS INT) AS df")
      .selectExpr("n", "fk_x2", "df", "fk_x2 > 5.991464547107979 AS reject_95")
  }
  val statFlignerKilleenSql: String =
    s"""WITH hist AS (
      |  SELECT CAST(l_quantity AS INT) AS qv,
      |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS nc
      |  FROM lineitem GROUP BY 1),
      |cums AS (
      |  SELECT qv, na, nb, nc,
      |    sum(na) OVER (ORDER BY qv ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
      |    sum(nb) OVER (ORDER BY qv ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
      |    sum(nc) OVER (ORDER BY qv ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      |  FROM hist),
      |gt AS (
      |  SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb,
      |    CAST(sum(nc) AS BIGINT) AS tc
      |  FROM hist),
      |meds AS (
      |  SELECT min(CASE WHEN 2 * c.ca >= g.ta THEN c.qv END) AS med_a,
      |    min(CASE WHEN 2 * c.cb >= g.tb THEN c.qv END) AS med_b,
      |    min(CASE WHEN 2 * c.cc >= g.tc THEN c.qv END) AS med_c
      |  FROM cums c, gt g),
      |dvhist AS (
      |  SELECT dv, CAST(sum(ma) AS BIGINT) AS ma, CAST(sum(mb) AS BIGINT) AS mb,
      |    CAST(sum(mc) AS BIGINT) AS mc
      |  FROM (
      |    SELECT abs(h.qv - m.med_a) AS dv, h.na AS ma, 0 AS mb, 0 AS mc FROM hist h, meds m
      |    UNION ALL
      |    SELECT abs(h.qv - m.med_b), 0, h.nb, 0 FROM hist h, meds m
      |    UNION ALL
      |    SELECT abs(h.qv - m.med_c), 0, 0, h.nc FROM hist h, meds m)
      |  GROUP BY 1),
      |mid AS (
      |  SELECT dv, ma, mb, mc, ma + mb + mc AS w,
      |    2 * COALESCE(sum(ma + mb + mc) OVER (ORDER BY dv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (ma + mb + mc) + 1 AS mid2
      |  FROM dvhist),
      |tot AS (SELECT CAST(sum(ma + mb + mc) AS BIGINT) AS nn FROM dvhist),
      |scored AS (
      |  SELECT m.*, t.nn,
      |    CAST(floor((${QNorm.sql("0.5 + CAST(m.mid2 AS DOUBLE) / (4.0 * (t.nn + 1))")}) * 1e6 + 0.5) AS BIGINT) AS aq
      |  FROM mid m, tot t),
      |ag AS (
      |  SELECT nn,
      |    CAST(sum(CAST(ma AS HUGEINT) * aq) AS DECIMAL(38,0)) AS sa,
      |    CAST(sum(CAST(mb AS HUGEINT) * aq) AS DECIMAL(38,0)) AS sb,
      |    CAST(sum(CAST(mc AS HUGEINT) * aq) AS DECIMAL(38,0)) AS sc,
      |    CAST(sum(CAST(w AS HUGEINT) * aq) AS DECIMAL(38,0)) AS sw,
      |    CAST(sum(CAST(w AS HUGEINT) * aq * aq) AS DECIMAL(38,0)) AS sw2,
      |    CAST(sum(ma) AS BIGINT) AS ta, CAST(sum(mb) AS BIGINT) AS tb,
      |    CAST(sum(mc) AS BIGINT) AS tc
      |  FROM scored GROUP BY 1),
      |x AS (
      |  SELECT nn AS n,
      |    round((CASE WHEN ta = 0 THEN 0.0 ELSE
      |       ta * pow(CAST(sa AS DOUBLE) / ta - CAST(sw AS DOUBLE) / nn, 2) END
      |     + CASE WHEN tb = 0 THEN 0.0 ELSE
      |       tb * pow(CAST(sb AS DOUBLE) / tb - CAST(sw AS DOUBLE) / nn, 2) END
      |     + CASE WHEN tc = 0 THEN 0.0 ELSE
      |       tc * pow(CAST(sc AS DOUBLE) / tc - CAST(sw AS DOUBLE) / nn, 2) END)
      |    / ((CAST(sw2 AS DOUBLE) - CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / nn)
      |       / (nn - 1)), 4) AS fk_x2,
      |    CAST(2 AS INT) AS df
      |  FROM ag)
      |SELECT n, fk_x2, df, fk_x2 > 5.991464547107979 AS reject_95 FROM x""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_dunn_posthoc" -> (statDunnPosthoc _),
    "stat_van_der_waerden" -> (statVanDerWaerden _),
    "stat_klotz" -> (statKlotz _),
    "stat_fligner_killeen" -> (statFlignerKilleen _),
  )

  val oracle: Map[String, String] = Map(
    "stat_dunn_posthoc" -> statDunnPosthocSql,
    "stat_van_der_waerden" -> statVanDerWaerdenSql,
    "stat_klotz" -> statKlotzSql,
    "stat_fligner_killeen" -> statFlignerKilleenSql,
  )
}
