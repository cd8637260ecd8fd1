package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 60 (C644–C647): Mantel–Haenszel stratified test, EWMA control
  * chart, trace-based effective rank, price-ending census.
  */
object Extras160 {

  /** C644 stat_mantel_haenszel — the stratified 2×2 association test
    * (exposure = discount ≥5%, outcome = returned, strata = order
    * years): per-stratum counts are exact conditional sums in ONE
    * grouped pass over the BOUNDED 7-stratum frame; E_k and V_k apply
    * their rational denominators as micro-quantized integer divisions
    * (the Krippendorff discipline — no float-ordered sums), CMH χ² with
    * the 0.5 continuity correction and the MH common odds ratio as
    * final doubles.
    */
  def statMantelHaenszel(s: SparkSession, d: String): DataFrame = {
    val strata = lineitem(s, d)
      .groupBy(year(col("l_shipdate")).as("y"))
      .agg(
        sum(expr("CASE WHEN l_discount >= 0.05 AND l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("a"),
        sum(expr("CASE WHEN l_discount >= 0.05 AND l_returnflag <> 'R' THEN 1L ELSE 0L END")).cast("long").as("b"),
        sum(expr("CASE WHEN l_discount < 0.05 AND l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("c"),
        sum(expr("CASE WHEN l_discount < 0.05 AND l_returnflag <> 'R' THEN 1L ELSE 0L END")).cast("long").as("dd"))
      .selectExpr("y", "a", "b", "c", "dd", "a + b + c + dd AS nk")
    strata.agg(
        count(lit(1)).cast("long").as("n_strata"),
        sum(col("a")).cast("long").as("sa"),
        sum(expr("(CAST(a + b AS DECIMAL(38,0)) * (a + c) * 1000000) div nk"))
          .cast("decimal(38,0)").as("se6"),
        sum(expr(
          """(CAST(a + b AS DECIMAL(38,0)) * (c + dd) * (a + c) * (b + dd) * 1000000)
            | div (CAST(nk AS DECIMAL(38,0)) * nk * (nk - 1))""".stripMargin))
          .cast("decimal(38,0)").as("sv6"),
        sum(expr("(CAST(a AS DECIMAL(38,0)) * dd * 1000000) div nk"))
          .cast("decimal(38,0)").as("sad6"),
        sum(expr("(CAST(b AS DECIMAL(38,0)) * c * 1000000) div nk"))
          .cast("decimal(38,0)").as("sbc6"))
      .selectExpr("n_strata",
        """round(pow(abs(CAST(sa AS DOUBLE) - CAST(se6 AS DOUBLE) / 1e6) - 0.5, 2)
          |  / (CAST(sv6 AS DOUBLE) / 1e6), 4) AS cmh_chi2""".stripMargin,
        "round(CAST(sad6 AS DOUBLE) / CAST(sbc6 AS DOUBLE), 6) AS mh_odds_ratio",
        """pow(abs(CAST(sa AS DOUBLE) - CAST(se6 AS DOUBLE) / 1e6) - 0.5, 2)
          |  / (CAST(sv6 AS DOUBLE) / 1e6) > 3.841 AS reject_no_assoc""".stripMargin)
  }
  val statMantelHaenszelSql: String =
    """WITH strata AS (
      |  SELECT EXTRACT(year FROM l_shipdate) AS y,
      |    CAST(sum(CASE WHEN l_discount >= 0.05 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN l_discount >= 0.05 AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN l_discount < 0.05 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN l_discount < 0.05 AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS dd
      |  FROM lineitem GROUP BY 1),
      |k AS (SELECT y, a, b, c, dd, a + b + c + dd AS nk FROM strata),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
      |    CAST(sum(a) AS BIGINT) AS sa,
      |    CAST(sum(CAST(CAST(a + b AS HUGEINT) * (a + c) * 1000000 AS HUGEINT) // nk)
      |      AS DECIMAL(38,0)) AS se6,
      |    CAST(sum(CAST(CAST(a + b AS HUGEINT) * (c + dd) * (a + c) * (b + dd) * 1000000 AS HUGEINT)
      |      // (CAST(nk AS HUGEINT) * nk * (nk - 1))) AS DECIMAL(38,0)) AS sv6,
      |    CAST(sum(CAST(CAST(a AS HUGEINT) * dd * 1000000 AS HUGEINT) // nk) AS DECIMAL(38,0)) AS sad6,
      |    CAST(sum(CAST(CAST(b AS HUGEINT) * c * 1000000 AS HUGEINT) // nk) AS DECIMAL(38,0)) AS sbc6
      |  FROM k)
      |SELECT n_strata,
      |  round(pow(abs(CAST(sa AS DOUBLE) - CAST(se6 AS DOUBLE) / 1e6) - 0.5, 2)
      |    / (CAST(sv6 AS DOUBLE) / 1e6), 4) AS cmh_chi2,
      |  round(CAST(sad6 AS DOUBLE) / CAST(sbc6 AS DOUBLE), 6) AS mh_odds_ratio,
      |  pow(abs(CAST(sa AS DOUBLE) - CAST(se6 AS DOUBLE) / 1e6) - 0.5, 2)
      |    / (CAST(sv6 AS DOUBLE) / 1e6) > 3.841 AS reject_no_assoc
      |FROM m""".stripMargin

  /** C645 stat_ewma_control_chart — the EWMA(λ=½) control chart on
    * daily revenue with the asymptotic ±3σ√(λ/(2−λ)) = ±√3·σ limits:
    * the chart statistic is the 16-term truncated dyadic EWMA (the
    * C166 exact-dyadic convention — z·2¹⁶ = Σ2¹⁵⁻ʲx_{t−j} is an EXACT
    * long; missing history coalesces to 0, the documented truncation),
    * process μ/σ from the denominator-cleared exact corpus moments,
    * violation census + worst excursion in final doubles.
    */
  def statEwmaControlChart(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val tot = bars.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("sc"),
      sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("qc"))
      .selectExpr(
        "CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mu",
        "sqrt(CAST(n * qc - sc * sc AS DOUBLE) / CAST(n * n AS DOUBLE)) AS sigma")
    val w = Window.orderBy("day")
    val z2 = (1 to 15).foldLeft(
        bars.withColumn("z16", col("c") * lit(1L << 15))) { (df, j) =>
      df.withColumn("z16",
        col("z16") + coalesce(lag(col("c"), j).over(w), lit(0L)) * lit(1L << (15 - j)))
    }
    z2.crossJoin(broadcast(tot))
      .withColumn("zt", expr("CAST(z16 AS DOUBLE) / 65536"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(expr("CASE WHEN abs(zt - mu) > sqrt(3.0) * sigma THEN 1L ELSE 0L END"))
          .cast("long").as("n_violations"),
        max(expr("abs(zt - mu) / sigma")).as("worst"))
      .selectExpr("n_days", "n_violations", "round(worst, 4) AS worst_excursion_sigmas")
  }
  val statEwmaControlChartSql: String = {
    val terms = (1 to 15).map(j =>
      s"coalesce(lag(c, $j) OVER (ORDER BY day), 0) * ${1L << (15 - j)}")
      .mkString(" + ")
    s"""WITH bars AS (
       |  SELECT date_trunc('day', l_shipdate) AS day,
       |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
       |      AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
       |    sqrt(CAST(n * qc - sc * sc AS DOUBLE) / CAST(n * n AS DOUBLE)) AS sigma
       |  FROM (SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
       |    CAST(sum(c) AS DECIMAL(38,0)) AS sc,
       |    CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS qc
       |  FROM bars)),
       |z AS (
       |  SELECT CAST(c * ${1L << 15} + $terms AS DOUBLE) / 65536 AS zt
       |  FROM bars)
       |SELECT CAST(count(*) AS BIGINT) AS n_days,
       |  CAST(sum(CASE WHEN abs(zt - mu) > sqrt(3.0) * sigma THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_violations,
       |  round(max(abs(zt - mu) / sigma), 4) AS worst_excursion_sigmas
       |FROM z, tot""".stripMargin
  }

  /** C646 embed_effective_rank — the participation-ratio effective
    * rank PR = (Σλ)²/Σλ² WITHOUT any eigendecomposition: Σλ = tr(C)
    * and Σλ² = ‖C‖²F, both from the SAME cleared covariance cells the
    * CKA row builds (one vec_id-keyed self-join, exact DECIMAL
    * moments, pico-quantized cells, exact Frobenius sums over the
    * bounded 64×64 frame). PR = 64 means isotropic, 1 means rank-1
    * collapse — the capacity-usage scalar of embedding audits.
    */
  def embedEffectiveRank(s: SparkSession, d: String): DataFrame = {
    val comp = embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1e9 + 0.5) AS BIGINT)").as("f"))
    val n = embeddings(s, d).count()
    val cross = comp.as("a")
      .join(comp.selectExpr("vec_id", "pos AS pos2", "f AS f2").as("b"), Seq("vec_id"))
      .groupBy("pos", "pos2")
      .agg(sum(expr("CAST(f AS DECIMAL(38,0)) * f2")).cast("decimal(38,0)").as("m"))
    val sums = comp.groupBy("pos")
      .agg(sum(col("f")).cast("decimal(38,0)").as("sf"))
    val cells = cross
      .join(broadcast(sums), Seq("pos"))
      .join(broadcast(sums.selectExpr("pos AS pos2", "sf AS sf2")), Seq("pos2"))
      .selectExpr("pos", "pos2",
        s"CAST((CAST($n AS DECIMAL(38,0)) * m - sf * sf2) div 1000000000000 AS BIGINT) AS cq")
    cells.agg(
        sum(expr("CASE WHEN pos = pos2 THEN cq ELSE 0L END")).cast("decimal(38,0)").as("tr"),
        sum(expr("CAST(cq AS DECIMAL(38,0)) * cq")).as("fro2"))
      .selectExpr(s"CAST($n AS BIGINT) AS n_vectors",
        """round(CAST(tr AS DOUBLE) * CAST(tr AS DOUBLE)
          |  / CAST(fro2 AS DOUBLE), 4) AS effective_rank""".stripMargin,
        """round(CAST(tr AS DOUBLE) * CAST(tr AS DOUBLE)
          |  / CAST(fro2 AS DOUBLE) / 64, 6) AS rank_utilization""".stripMargin)
  }
  val embedEffectiveRankSql: String =
    """WITH comp AS (
      |  SELECT e.vec_id, i.i - 1 AS pos,
      |    CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS f
      |  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
      |cross_ AS (
      |  SELECT a.pos, b.pos AS pos2,
      |    CAST(sum(CAST(a.f AS DECIMAL(38,0)) * b.f) AS DECIMAL(38,0)) AS m
      |  FROM comp a JOIN comp b USING (vec_id)
      |  GROUP BY 1, 2),
      |sums AS (
      |  SELECT pos, CAST(sum(f) AS DECIMAL(38,0)) AS sf FROM comp GROUP BY 1),
      |cells AS (
      |  SELECT c.pos, c.pos2,
      |    CAST(CAST(CAST(nn.n AS DECIMAL(38,0)) * c.m - s1.sf * s2.sf AS HUGEINT)
      |      // 1000000000000 AS BIGINT) AS cq
      |  FROM cross_ c
      |  JOIN sums s1 ON s1.pos = c.pos
      |  JOIN sums s2 ON s2.pos = c.pos2, nn),
      |m AS (
      |  SELECT CAST(sum(CASE WHEN pos = pos2 THEN cq ELSE 0 END) AS DECIMAL(38,0)) AS tr,
      |    sum(CAST(cq AS DECIMAL(38,0)) * cq) AS fro2
      |  FROM cells)
      |SELECT (SELECT n FROM nn) AS n_vectors,
      |  round(CAST(tr AS DOUBLE) * CAST(tr AS DOUBLE) / CAST(fro2 AS DOUBLE), 4)
      |    AS effective_rank,
      |  round(CAST(tr AS DOUBLE) * CAST(tr AS DOUBLE) / CAST(fro2 AS DOUBLE) / 64, 6)
      |    AS rank_utilization
      |FROM m""".stripMargin

  /** C647 analytics_price_point_endings — the psychological-pricing
    * census: distribution of the cents-ending (price mod 100) bucketed
    * into the retail-salient classes {00, 05-ish, 50, 95, 99, other},
    * plus the χ² against uniform endings — exact integer counts in one
    * pass, the GoF statistic over the BOUNDED 6-class frame.
    */
  def analyticsPricePointEndings(s: SparkSession, d: String): DataFrame = {
    val e = lineitem(s, d)
      .select(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) % 100").as("ending"))
      .withColumn("cls", expr(
        """CASE WHEN ending = 0 THEN '00' WHEN ending = 50 THEN '50'
          |     WHEN ending = 95 THEN '95' WHEN ending = 99 THEN '99'
          |     WHEN ending % 5 = 0 THEN 'x5/x0'
          |     ELSE 'other' END""".stripMargin))
    val tot = e.agg(count(lit(1)).cast("long").as("n"))
    e.groupBy("cls")
      .agg(count(lit(1)).cast("long").as("n_prices"))
      .crossJoin(broadcast(tot))
      .withColumn("expected_share", expr(
        """CASE cls WHEN '00' THEN 0.01 WHEN '50' THEN 0.01 WHEN '95' THEN 0.01
          |     WHEN '99' THEN 0.01 WHEN 'x5/x0' THEN 0.16 ELSE 0.80 END""".stripMargin))
      .selectExpr("cls", "n_prices",
        "round(CAST(n_prices AS DOUBLE) / n, 6) AS share",
        """round(pow(CAST(n_prices AS DOUBLE) - expected_share * n, 2)
          |  / (expected_share * n), 4) AS chi2_term""".stripMargin)
      .orderBy("cls")
  }
  val analyticsPricePointEndingsSql: String =
    """WITH e AS (
      |  SELECT CASE WHEN ending = 0 THEN '00' WHEN ending = 50 THEN '50'
      |         WHEN ending = 95 THEN '95' WHEN ending = 99 THEN '99'
      |         WHEN ending % 5 = 0 THEN 'x5/x0'
      |         ELSE 'other' END AS cls
      |  FROM (SELECT CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) % 100
      |          AS ending FROM lineitem)),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e)
      |SELECT cls, CAST(count(*) AS BIGINT) AS n_prices,
      |  round(CAST(count(*) AS DOUBLE) / max(n), 6) AS share,
      |  round(pow(CAST(count(*) AS DOUBLE)
      |    - (CASE cls WHEN '00' THEN 0.01 WHEN '50' THEN 0.01 WHEN '95' THEN 0.01
      |        WHEN '99' THEN 0.01 WHEN 'x5/x0' THEN 0.16 ELSE 0.80 END) * max(n), 2)
      |    / ((CASE cls WHEN '00' THEN 0.01 WHEN '50' THEN 0.01 WHEN '95' THEN 0.01
      |        WHEN '99' THEN 0.01 WHEN 'x5/x0' THEN 0.16 ELSE 0.80 END) * max(n)), 4)
      |    AS chi2_term
      |FROM e, tot GROUP BY cls ORDER BY cls""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_mantel_haenszel" -> (statMantelHaenszel _),
    "stat_ewma_control_chart" -> (statEwmaControlChart _),
    "embed_effective_rank" -> (embedEffectiveRank _),
    "analytics_price_point_endings" -> (analyticsPricePointEndings _),
  )

  val oracle: Map[String, String] = Map(
    "stat_mantel_haenszel" -> statMantelHaenszelSql,
    "stat_ewma_control_chart" -> statEwmaControlChartSql,
    "embed_effective_rank" -> embedEffectiveRankSql,
    "analytics_price_point_endings" -> analyticsPricePointEndingsSql,
  )
}
