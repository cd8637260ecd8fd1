package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 50 (C604–C607): simplified (centroid) silhouette, Bass
  * diffusion OLS, Durbin–Levinson PACF, Aroon oscillator census.
  */
object Extras150 {

  /** C604 embed_silhouette — the simplified (centroid) silhouette over
    * the labeled embeddings (the per-POINT validity companion to
    * C603's global CH index): centroids as exact rationals sf/nj from
    * ONE per-(label,dim) fixed-point pass (k·d reduce state); each
    * point joins the broadcast k·d centroid frame on dim, so the
    * point-to-centroid distance is sqrt(Σ(f·nj−sf)²)/nj with an exact
    * DECIMAL numerator (one sqrt + one division per pair, n·k pairs —
    * never n² point pairs). a = own-centroid distance (point included
    * in its centroid — the standard simplified variant), b = nearest
    * other centroid via struct-min (label tie-break), s = (b−a)/max.
    * Per-label means are exact nano-quantized integer sums with ONE
    * final division — no float accumulation order anywhere.
    */
  def embedSilhouette(s: SparkSession, d: String): DataFrame = {
    val comp = embeddings(s, d)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("label"), col("pos"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1e9 + 0.5) AS BIGINT)").as("f"))
    val cent = comp.groupBy(col("label").as("clabel"), col("pos"))
      .agg(count(lit(1)).cast("long").as("nj"),
        sum(col("f")).cast("decimal(38,0)").as("sf"))
    val dist = comp.join(broadcast(cent), Seq("pos"))
      .groupBy("vec_id", "label", "clabel")
      .agg(sum(expr(
        "CAST(CAST(f AS DECIMAL(38,0)) * nj - sf AS DECIMAL(38,0)) * (CAST(f AS DECIMAL(38,0)) * nj - sf)"))
        .cast("decimal(38,0)").as("num"),
        max(col("nj")).as("nj"))
      .withColumn("dist", expr("sqrt(CAST(num AS DOUBLE)) / nj"))
    val sil = dist.groupBy("vec_id", "label")
      .agg(max(expr("CASE WHEN clabel = label THEN dist END")).as("a"),
        min(expr("CASE WHEN clabel <> label THEN struct(dist, clabel) END"))
          .getField("dist").as("b"))
      .withColumn("sq", expr(
        """CAST(floor((b - a) / greatest(a, b) * 1e9 + 0.5) AS BIGINT)"""))
    sil.groupBy("label")
      .agg(count(lit(1)).cast("long").as("n_points"),
        sum(col("sq")).cast("long").as("ssum"))
      .selectExpr("label", "n_points",
        "round(CAST(ssum AS DOUBLE) / n_points / 1e9, 6) AS mean_silhouette")
      .orderBy("label")
  }
  val embedSilhouetteSql: String =
    """WITH comp AS (
      |  SELECT e.vec_id, e.label, i.i AS pos,
      |    CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS f
      |  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i),
      |cent AS (
      |  SELECT label AS clabel, pos, CAST(count(*) AS BIGINT) AS nj,
      |    CAST(sum(f) AS DECIMAL(38,0)) AS sf
      |  FROM comp GROUP BY 1, 2),
      |dist AS (
      |  SELECT c.vec_id, c.label, t.clabel,
      |    sqrt(CAST(CAST(sum(CAST(CAST(c.f AS DECIMAL(38,0)) * t.nj - t.sf AS DECIMAL(38,0))
      |      * (CAST(c.f AS DECIMAL(38,0)) * t.nj - t.sf)) AS DECIMAL(38,0)) AS DOUBLE))
      |      / max(t.nj) AS dist
      |  FROM comp c JOIN cent t USING (pos)
      |  GROUP BY 1, 2, 3),
      |sil AS (
      |  SELECT vec_id, label,
      |    max(CASE WHEN clabel = label THEN dist END) AS a,
      |    (min(CASE WHEN clabel <> label THEN struct_pack(d := dist, l := clabel) END)).d AS b
      |  FROM dist GROUP BY 1, 2),
      |sq AS (
      |  SELECT label,
      |    CAST(floor((b - a) / greatest(a, b) * 1e9 + 0.5) AS BIGINT) AS sq
      |  FROM sil)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_points,
      |  round(CAST(CAST(sum(sq) AS BIGINT) AS DOUBLE) / count(*) / 1e9, 6)
      |    AS mean_silhouette
      |FROM sq GROUP BY 1 ORDER BY 1""".stripMargin

  /** C605 analytics_bass_diffusion — the Bass product-diffusion model
    * fit by its standard discrete OLS linearization n_t = a + b·N +
    * c·N² (adopters = customers by FIRST-order month, N = cumulative
    * before t via GlobalRank-safe bounded-frame prefix sum): all eight
    * regression moments (ΣN^0..4, Σn·N^0..2) are EXACT integer/DECIMAL
    * sums in one pass over the bounded monthly frame, the 3×3 normal
    * equations solve by Cramer's rule in deterministic double
    * expressions (identical formula text both engines), R² from a
    * second bounded pass. No per-row doubles touch the corpus scan.
    */
  def analyticsBassDiffusion(s: SparkSession, d: String): DataFrame = {
    val firstO = orders(s, d).groupBy("o_custkey")
      .agg(min(date_trunc("month", col("o_orderdate"))).as("mon"))
    val monthly = firstO.groupBy("mon")
      .agg(count(lit(1)).cast("long").as("n"))
    val wp = Window.orderBy("mon")
      .rowsBetween(Window.unboundedPreceding, -1)
    val mn = monthly
      .withColumn("cum", coalesce(sum(col("n")).over(wp), lit(0L)))
    val mom = mn.agg(
      count(lit(1)).cast("long").as("m"),
      sum(col("cum")).cast("decimal(38,0)").as("s1"),
      sum(expr("cum * cum")).cast("decimal(38,0)").as("s2"),
      sum(expr("CAST(cum AS DECIMAL(38,0)) * cum * cum")).cast("decimal(38,0)").as("s3"),
      sum(expr("CAST(cum AS DECIMAL(38,0)) * cum * cum * cum")).cast("decimal(38,0)").as("s4"),
      sum(col("n")).cast("decimal(38,0)").as("t0"),
      sum(expr("n * cum")).cast("decimal(38,0)").as("t1"),
      sum(expr("CAST(n AS DECIMAL(38,0)) * cum * cum")).cast("decimal(38,0)").as("t2"))
      .selectExpr("m", "CAST(m AS DOUBLE) AS s0", "CAST(s1 AS DOUBLE) AS s1",
        "CAST(s2 AS DOUBLE) AS s2", "CAST(s3 AS DOUBLE) AS s3",
        "CAST(s4 AS DOUBLE) AS s4", "CAST(t0 AS DOUBLE) AS t0",
        "CAST(t1 AS DOUBLE) AS t1", "CAST(t2 AS DOUBLE) AS t2")
      .selectExpr("m", "s0", "s1", "s2", "t0",
        "s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2) AS det",
        "t0*(s2*s4 - s3*s3) - s1*(t1*s4 - s3*t2) + s2*(t1*s3 - s2*t2) AS det_a",
        "s0*(t1*s4 - s3*t2) - t0*(s1*s4 - s3*s2) + s2*(s1*t2 - t1*s2) AS det_b",
        "s0*(s2*t2 - s3*t1) - s1*(s1*t2 - t1*s2) + t0*(s1*s3 - s2*s2) AS det_c")
      .selectExpr("m", "s0", "s1", "t0",
        "det_a / det AS a", "det_b / det AS b", "det_c / det AS c")
    val fit = mn.crossJoin(broadcast(mom))
      .agg(max(col("m")).as("n_months"),
        max(col("t0")).cast("long").as("final_adopters"),
        max(col("a")).as("a"), max(col("b")).as("b"), max(col("c")).as("c"),
        sum(expr(
          "CAST(floor(pow(n - (a + b*cum + c*cum*cum), 2) * 1e6 + 0.5) AS BIGINT)"))
          .cast("long").as("sse"),
        sum(expr("CAST(floor(pow(n - t0 / s0, 2) * 1e6 + 0.5) AS BIGINT)"))
          .cast("long").as("sst"))
    fit.selectExpr("n_months", "final_adopters",
      "round(a, 6) AS coef_a", "round(b, 8) AS coef_b",
      "round(c, 10) AS coef_c",
      "round(1 - CAST(sse AS DOUBLE) / sst, 6) AS r2")
  }
  val analyticsBassDiffusionSql: String =
    """WITH firsto AS (
      |  SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS mon
      |  FROM orders GROUP BY 1),
      |monthly AS (
      |  SELECT mon, CAST(count(*) AS BIGINT) AS n FROM firsto GROUP BY 1),
      |mn AS (
      |  SELECT mon, n, coalesce(sum(n) OVER (ORDER BY mon
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM monthly),
      |momraw AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m,
      |    CAST(count(*) AS DOUBLE) AS s0,
      |    CAST(CAST(sum(cum) AS DECIMAL(38,0)) AS DOUBLE) AS s1,
      |    CAST(CAST(sum(cum * cum) AS DECIMAL(38,0)) AS DOUBLE) AS s2,
      |    CAST(CAST(sum(CAST(cum AS DECIMAL(38,0)) * cum * cum) AS DECIMAL(38,0)) AS DOUBLE) AS s3,
      |    CAST(CAST(sum(CAST(cum AS DECIMAL(38,0)) * cum * cum * cum) AS DECIMAL(38,0)) AS DOUBLE) AS s4,
      |    CAST(CAST(sum(n) AS DECIMAL(38,0)) AS DOUBLE) AS t0,
      |    CAST(CAST(sum(n * cum) AS DECIMAL(38,0)) AS DOUBLE) AS t1,
      |    CAST(CAST(sum(CAST(n AS DECIMAL(38,0)) * cum * cum) AS DECIMAL(38,0)) AS DOUBLE) AS t2
      |  FROM mn),
      |dets AS (
      |  SELECT m, s0, s1, s2, t0,
      |    s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2) AS det,
      |    t0*(s2*s4 - s3*s3) - s1*(t1*s4 - s3*t2) + s2*(t1*s3 - s2*t2) AS det_a,
      |    s0*(t1*s4 - s3*t2) - t0*(s1*s4 - s3*s2) + s2*(s1*t2 - t1*s2) AS det_b,
      |    s0*(s2*t2 - s3*t1) - s1*(s1*t2 - t1*s2) + t0*(s1*s3 - s2*s2) AS det_c
      |  FROM momraw),
      |mom AS (
      |  SELECT m, s0, s1, t0,
      |    det_a / det AS a, det_b / det AS b, det_c / det AS c
      |  FROM dets),
      |fit AS (
      |  SELECT max(m) AS n_months, CAST(max(t0) AS BIGINT) AS final_adopters,
      |    max(a) AS a, max(b) AS b, max(c) AS c,
      |    CAST(sum(CAST(floor(pow(n - (a + b*cum + c*cum*cum), 2) * 1e6 + 0.5)
      |      AS BIGINT)) AS BIGINT) AS sse,
      |    CAST(sum(CAST(floor(pow(n - t0 / s0, 2) * 1e6 + 0.5) AS BIGINT))
      |      AS BIGINT) AS sst
      |  FROM mn, mom)
      |SELECT n_months, final_adopters,
      |  round(a, 6) AS coef_a, round(b, 8) AS coef_b,
      |  round(c, 10) AS coef_c,
      |  round(1 - CAST(sse AS DOUBLE) / sst, 6) AS r2
      |FROM fit""".stripMargin

  /** C606 time_pacf_durbin — partial autocorrelation at lags 1–3 of
    * the daily-revenue series by the Durbin–Levinson recursion:
    * autocovariances are denominator-cleared exact DECIMAL sums of
    * (n·c_t−S)(n·c_{t+k}−S) over the BOUNDED daily frame (lags via
    * lead over the aggregate — calendar cardinality, plan-gate clean),
    * ρk = Ck/C0 as single divisions, then the textbook recursion
    * φ22 = (ρ2−ρ1²)/(1−ρ1²), φ21 = φ11(1−φ22),
    * φ33 = (ρ3−φ21ρ2−φ22ρ1)/(1−φ21ρ1−φ22ρ2) in deterministic doubles
    * (identical expression text both engines).
    */
  def timePacfDurbin(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("c"))
    val tot = bars.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("st"))
    val w = Window.orderBy("day")
    val x = bars.crossJoin(broadcast(tot))
      .withColumn("x", expr("CAST(n * c - st AS DECIMAL(38,0))"))
      .select(col("day"), col("x"),
        lead(col("x"), 1).over(w).as("x1"),
        lead(col("x"), 2).over(w).as("x2"),
        lead(col("x"), 3).over(w).as("x3"))
    val rho = x.agg(
      count(lit(1)).cast("long").as("n_days"),
      sum(expr("x * x")).as("c0d"),
      sum(expr("x * x1")).as("c1d"),
      sum(expr("x * x2")).as("c2d"),
      sum(expr("x * x3")).as("c3d"))
      .selectExpr("n_days",
        "CAST(c1d AS DOUBLE) / CAST(c0d AS DOUBLE) AS r1",
        "CAST(c2d AS DOUBLE) / CAST(c0d AS DOUBLE) AS r2",
        "CAST(c3d AS DOUBLE) / CAST(c0d AS DOUBLE) AS r3")
    rho
      .withColumn("p22", expr("(r2 - r1*r1) / (1 - r1*r1)"))
      .withColumn("p21", expr("r1 * (1 - p22)"))
      .selectExpr("n_days", "round(r1, 6) AS pacf1", "round(p22, 6) AS pacf2",
        """round((r3 - p21*r2 - p22*r1) / (1 - p21*r1 - p22*r2), 6)
          |  AS pacf3""".stripMargin)
  }
  val timePacfDurbinSql: String =
    """WITH bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS DECIMAL(38,0)) AS c
      |  FROM lineitem GROUP BY 1),
      |tot AS (
      |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
      |    CAST(sum(c) AS DECIMAL(38,0)) AS st
      |  FROM bars),
      |x AS (
      |  SELECT day, CAST(n * c - st AS DECIMAL(38,0)) AS x
      |  FROM bars, tot),
      |lagged AS (
      |  SELECT x,
      |    lead(x, 1) OVER (ORDER BY day) AS x1,
      |    lead(x, 2) OVER (ORDER BY day) AS x2,
      |    lead(x, 3) OVER (ORDER BY day) AS x3
      |  FROM x),
      |rho AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(x * x1) AS DOUBLE) / CAST(sum(x * x) AS DOUBLE) AS r1,
      |    CAST(sum(x * x2) AS DOUBLE) / CAST(sum(x * x) AS DOUBLE) AS r2,
      |    CAST(sum(x * x3) AS DOUBLE) / CAST(sum(x * x) AS DOUBLE) AS r3
      |  FROM lagged),
      |dl AS (
      |  SELECT n_days, r1, r2, r3,
      |    (r2 - r1*r1) / (1 - r1*r1) AS p22
      |  FROM rho),
      |dl2 AS (
      |  SELECT n_days, r1, r2, r3, p22, r1 * (1 - p22) AS p21 FROM dl)
      |SELECT n_days, round(r1, 6) AS pacf1, round(p22, 6) AS pacf2,
      |  round((r3 - p21*r2 - p22*r1) / (1 - p21*r1 - p22*r2), 6) AS pacf3
      |FROM dl2""".stripMargin

  /** C607 win_aroon_oscillator — Aroon up/down/oscillator census over
    * the 25-bar trailing window on daily closes (close via struct-max
    * over the deterministic order, same convention as C600): the
    * bars-since-high comes from struct-max of (close, rownum) over the
    * window — ties resolve to the MOST RECENT bar in both engines —
    * so aroon_up = 100·(24−(rn−argmax))/24 is exact integer
    * arithmetic until the two final reported divisions. Windows run
    * over the BOUNDED daily frame (aggregate-below, plan-gate clean).
    */
  def winAroonOscillator(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .select(date_trunc("day", col("l_shipdate")).as("day"),
        col("l_orderkey"), col("l_linenumber"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("p"))
      .groupBy("day")
      .agg(max(struct(col("l_orderkey"), col("l_linenumber"), col("p"))).as("lo"))
      .selectExpr("day", "lo.p AS c")
    val w = Window.orderBy("day")
    val w25 = Window.orderBy("day").rowsBetween(-24, 0)
    bars
      .withColumn("rn", row_number().over(w))
      .withColumn("hi_rn", max(struct(col("c"), col("rn"))).over(w25).getField("rn"))
      .withColumn("lo_rn", min(struct(col("c"), (col("rn") * -1).as("nr"))).over(w25)
        .getField("nr") * -1)
      .filter(col("rn") >= 25)
      .withColumn("up", (lit(24) - (col("rn") - col("hi_rn"))) * 100)
      .withColumn("dn", (lit(24) - (col("rn") - col("lo_rn"))) * 100)
      .agg(count(lit(1)).cast("long").as("n_bars"),
        sum(expr("CASE WHEN up > dn THEN 1L ELSE 0L END")).cast("long").as("n_bullish"),
        sum(expr("CASE WHEN up < dn THEN 1L ELSE 0L END")).cast("long").as("n_bearish"),
        sum(expr("up - dn")).cast("long").as("osc_sum"),
        max(struct(col("day"), (col("up") - col("dn")).as("o"))).as("last"))
      .selectExpr("n_bars", "n_bullish", "n_bearish",
        "round(CAST(osc_sum AS DOUBLE) / n_bars / 24, 6) AS mean_osc",
        "CAST(round(CAST(last.o AS DOUBLE) / 24, 6) AS DOUBLE) AS final_osc")
  }
  val winAroonOscillatorSql: String =
    """WITH px AS (
      |  SELECT date_trunc('day', l_shipdate) AS day, l_orderkey, l_linenumber,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p
      |  FROM lineitem),
      |bars AS (
      |  SELECT day,
      |    (max(struct_pack(k := l_orderkey, ln := l_linenumber, p := p))).p AS c
      |  FROM px GROUP BY day),
      |rn AS (
      |  SELECT day, c, row_number() OVER (ORDER BY day) AS rn FROM bars),
      |win AS (
      |  SELECT day, rn,
      |    (max(struct_pack(c := c, r := rn)) OVER w25).r AS hi_rn,
      |    -((min(struct_pack(c := c, r := -rn)) OVER w25).r) AS lo_rn
      |  FROM rn
      |  WINDOW w25 AS (ORDER BY day ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)),
      |ar AS (
      |  SELECT day,
      |    (24 - (rn - hi_rn)) * 100 AS up,
      |    (24 - (rn - lo_rn)) * 100 AS dn
      |  FROM win WHERE rn >= 25)
      |SELECT CAST(count(*) AS BIGINT) AS n_bars,
      |  CAST(sum(CASE WHEN up > dn THEN 1 ELSE 0 END) AS BIGINT) AS n_bullish,
      |  CAST(sum(CASE WHEN up < dn THEN 1 ELSE 0 END) AS BIGINT) AS n_bearish,
      |  round(CAST(sum(up - dn) AS DOUBLE) / count(*) / 24, 6) AS mean_osc,
      |  CAST(round(CAST((max(struct_pack(d := day, o := up - dn))).o AS DOUBLE)
      |    / 24, 6) AS DOUBLE) AS final_osc
      |FROM ar""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_silhouette" -> (embedSilhouette _),
    "analytics_bass_diffusion" -> (analyticsBassDiffusion _),
    "time_pacf_durbin" -> (timePacfDurbin _),
    "win_aroon_oscillator" -> (winAroonOscillator _),
  )

  val oracle: Map[String, String] = Map(
    "embed_silhouette" -> embedSilhouetteSql,
    "analytics_bass_diffusion" -> analyticsBassDiffusionSql,
    "time_pacf_durbin" -> timePacfDurbinSql,
    "win_aroon_oscillator" -> winAroonOscillatorSql,
  )
}
