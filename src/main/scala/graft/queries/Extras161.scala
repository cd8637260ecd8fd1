package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 61 (C648–C651): Breslow–Day homogeneity, DFA scaling
  * exponent, graph reciprocity, top-N pushdown exhibit.
  */
object Extras161 {

  /** C648 stat_breslow_day — homogeneity of odds ratios across the
    * year strata (does the C644 association VARY by year?): ψ̂ is the
    * MH common OR from the same micro-quantized exact sums, each
    * stratum's expected cell ã solves the closed-form quadratic
    * ã²(1−ψ)+ã((n0−m1)+ψ(n1+m1))−ψn1m1 = 0 (in-range root selected),
    * per-stratum χ² terms micro-quantized to exact ints so the 7-term
    * sum is exact — X²BD against χ²(k−1).
    */
  def statBreslowDay(s: SparkSession, d: String): DataFrame = {
    val strata = lineitem(s, d)
      .groupBy(year(col("l_shipdate")).as("y"))
      .agg(
        sum(expr("CASE WHEN l_discount >= 0.05 AND l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("a"),
        sum(expr("CASE WHEN l_discount >= 0.05 AND l_returnflag <> 'R' THEN 1L ELSE 0L END")).cast("long").as("b"),
        sum(expr("CASE WHEN l_discount < 0.05 AND l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("c"),
        sum(expr("CASE WHEN l_discount < 0.05 AND l_returnflag <> 'R' THEN 1L ELSE 0L END")).cast("long").as("dd"))
      .selectExpr("y", "a", "b", "c", "dd",
        "a + b AS n1", "c + dd AS n0", "a + c AS m1", "a + b + c + dd AS nk")
    val psi = strata.agg(
        sum(expr("(CAST(a AS DECIMAL(38,0)) * dd * 1000000) div nk")).cast("decimal(38,0)").as("sad6"),
        sum(expr("(CAST(b AS DECIMAL(38,0)) * c * 1000000) div nk")).cast("decimal(38,0)").as("sbc6"))
      .selectExpr("CAST(sad6 AS DOUBLE) / CAST(sbc6 AS DOUBLE) AS psi")
    val terms = strata.crossJoin(broadcast(psi))
      .withColumn("qa", expr("1 - psi"))
      .withColumn("qb", expr("(CAST(n0 AS DOUBLE) - m1) + psi * (CAST(n1 AS DOUBLE) + m1)"))
      .withColumn("qc", expr("-psi * CAST(n1 AS DOUBLE) * m1"))
      .withColumn("r1", expr("(-qb + sqrt(qb * qb - 4 * qa * qc)) / (2 * qa)"))
      .withColumn("r2", expr("(-qb - sqrt(qb * qb - 4 * qa * qc)) / (2 * qa)"))
      .withColumn("lo", expr("greatest(0.0D, CAST(m1 - n0 AS DOUBLE))"))
      .withColumn("hi", expr("least(CAST(m1 AS DOUBLE), CAST(n1 AS DOUBLE))"))
      .withColumn("at", expr(
        "CASE WHEN r1 >= lo AND r1 <= hi THEN r1 ELSE r2 END"))
      .withColumn("va", expr(
        """1 / (1 / at + 1 / (n1 - at) + 1 / (m1 - at)
          |  + 1 / (n0 - m1 + at))""".stripMargin))
      .withColumn("term_q", expr(
        "CAST(floor((a - at) * (a - at) / va * 1e6 + 0.5) AS BIGINT)"))
    terms.agg(count(lit(1)).cast("long").as("n_strata"),
        sum(col("term_q")).cast("long").as("bd6"),
        max(col("psi")).as("psi"))
      .selectExpr("n_strata",
        "round(psi, 6) AS common_or",
        "round(CAST(bd6 AS DOUBLE) / 1e6, 4) AS breslow_day_chi2",
        "CAST(bd6 AS DOUBLE) / 1e6 > 12.592 AS reject_homogeneity")
  }
  val statBreslowDaySql: String =
    """WITH strata AS (
      |  SELECT EXTRACT(year FROM l_shipdate) AS y,
      |    CAST(sum(CASE WHEN l_discount >= 0.05 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN l_discount >= 0.05 AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN l_discount < 0.05 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN l_discount < 0.05 AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS dd
      |  FROM lineitem GROUP BY 1),
      |k AS (
      |  SELECT y, a, b, c, dd, a + b AS n1, c + dd AS n0, a + c AS m1,
      |    a + b + c + dd AS nk
      |  FROM strata),
      |psi AS (
      |  SELECT CAST(CAST(sum(CAST(CAST(a AS HUGEINT) * dd * 1000000 AS HUGEINT) // nk) AS DECIMAL(38,0)) AS DOUBLE)
      |    / CAST(CAST(sum(CAST(CAST(b AS HUGEINT) * c * 1000000 AS HUGEINT) // nk) AS DECIMAL(38,0)) AS DOUBLE) AS psi
      |  FROM k),
      |q AS (
      |  SELECT k.*, psi,
      |    1 - psi AS qa,
      |    (CAST(n0 AS DOUBLE) - m1) + psi * (CAST(n1 AS DOUBLE) + m1) AS qb,
      |    -psi * CAST(n1 AS DOUBLE) * m1 AS qc,
      |    greatest(0.0, CAST(m1 - n0 AS DOUBLE)) AS lo,
      |    least(CAST(m1 AS DOUBLE), CAST(n1 AS DOUBLE)) AS hi
      |  FROM k, psi),
      |r AS (
      |  SELECT *,
      |    (-qb + sqrt(qb * qb - 4 * qa * qc)) / (2 * qa) AS r1,
      |    (-qb - sqrt(qb * qb - 4 * qa * qc)) / (2 * qa) AS r2
      |  FROM q),
      |at_ AS (
      |  SELECT *, CASE WHEN r1 >= lo AND r1 <= hi THEN r1 ELSE r2 END AS at
      |  FROM r),
      |t AS (
      |  SELECT a, at, psi,
      |    1 / (1 / at + 1 / (n1 - at) + 1 / (m1 - at) + 1 / (n0 - m1 + at)) AS va
      |  FROM at_),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
      |    CAST(sum(CAST(floor((a - at) * (a - at) / va * 1e6 + 0.5) AS BIGINT))
      |      AS BIGINT) AS bd6,
      |    max(psi) AS psi
      |  FROM t)
      |SELECT n_strata,
      |  round(psi, 6) AS common_or,
      |  round(CAST(bd6 AS DOUBLE) / 1e6, 4) AS breslow_day_chi2,
      |  CAST(bd6 AS DOUBLE) / 1e6 > 12.592 AS reject_homogeneity
      |FROM m""".stripMargin

  /** C649 time_dfa_alpha — detrended fluctuation analysis of the
    * daily-revenue series at box sizes {8,16,32,64}: the profile is
    * the EXACT prefix sum of the denominator-cleared series (bounded
    * daily frame), per-box linear detrending uses cleared OLS moments
    * (exact DECIMAL — no per-row floats), per-box SSE quantized to
    * exact ints so the per-size mean fluctuation is exact sums + one
    * division, and the log-log slope α evaluates over the four PIVOTED
    * size columns in fixed textual order. α≈0.5 white noise, α≈1 1/f.
    */
  def timeDfaAlpha(s: SparkSession, d: String): DataFrame = {
    val sizes = Seq(8, 16, 32, 64)
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val tot = bars.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("sc"))
    val w = Window.orderBy("day")
    val prof = bars.crossJoin(broadcast(tot))
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("x", expr("CAST(n * c - sc AS DECIMAL(38,0))"))
      .withColumn("p", sum(col("x")).over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
    val long = prof.select(col("t"), col("p"),
      explode(array(sizes.map(sz => lit(sz.toLong)): _*)).as("sz"))
      .withColumn("box", expr("(t - 1) div sz"))
      .withColumn("u", expr("(t - 1) % sz + 1"))
    val boxes = long.groupBy("sz", "box")
      .agg(count(lit(1)).cast("long").as("m"),
        sum(col("u")).cast("decimal(38,0)").as("su"),
        sum(expr("u * u")).cast("decimal(38,0)").as("suu"),
        sum(col("p")).cast("decimal(38,0)").as("sp"),
        sum(expr("CAST(u AS DECIMAL(38,0)) * p")).as("sup"),
        sum(expr("p * p")).as("spp"))
      .filter(col("m") === col("sz"))
      // cleared per-box SSE: (m*spp - sp^2) - (m*sup - su*sp)^2 / (m*suu - su^2),
      // all in doubles from exact moments, then quantized for the exact mean
      .selectExpr("sz",
        """CAST(floor((
          |  (CAST(m AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
          |  - pow(CAST(m AS DOUBLE) * CAST(sup AS DOUBLE) - CAST(su AS DOUBLE) * CAST(sp AS DOUBLE), 2)
          |    / (CAST(m AS DOUBLE) * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
          |) / CAST(m AS DOUBLE) / 1e18 + 0.5) AS BIGINT) AS sse_q""".stripMargin)
    val perSize = boxes.groupBy("sz")
      .agg(count(lit(1)).cast("long").as("nb"),
        sum(col("sse_q")).cast("long").as("ssum"))
      .selectExpr("sz",
        "sqrt(CAST(ssum AS DOUBLE) / nb / sz) AS f")
    val pivCols = sizes.map(sz =>
      max(expr(s"CASE WHEN sz = $sz THEN f END")).as(s"f$sz"))
    val piv = perSize.agg(pivCols.head, pivCols.tail: _*)
    val u = sizes.map(sz => math.log(sz.toDouble))
    val ub = u.sum / u.length
    val num = sizes.zip(u).map { case (sz, ui) =>
      s"(${ui - ub}) * ln(f$sz)" }.mkString(" + ")
    val den = u.map(ui => (ui - ub) * (ui - ub)).sum
    piv.selectExpr(s"round(($num) / $den, 6) AS dfa_alpha")
  }
  val timeDfaAlphaSql: String = {
    val sizes = Seq(8, 16, 32, 64)
    val structs = sizes.map(sz => s"{'sz': CAST($sz AS BIGINT)}").mkString(", ")
    val pivCols = sizes.map(sz =>
      s"max(CASE WHEN sz = $sz THEN f END) AS f$sz").mkString(",\n      |    ")
    val u = sizes.map(sz => math.log(sz.toDouble))
    val ub = u.sum / u.length
    val num = sizes.zip(u).map { case (sz, ui) =>
      s"(${ui - ub}) * ln(f$sz)" }.mkString(" + ")
    val den = u.map(ui => (ui - ub) * (ui - ub)).sum
    s"""WITH bars AS (
       |  SELECT date_trunc('day', l_shipdate) AS day,
       |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
       |      AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1),
       |tot AS (
       |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
       |    CAST(sum(c) AS DECIMAL(38,0)) AS sc
       |  FROM bars),
       |prof AS (
       |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
       |    sum(CAST(n * c - sc AS DECIMAL(38,0)))
       |      OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
       |  FROM bars, tot),
       |longf AS (
       |  SELECT t, p, u.s.sz AS sz, (t - 1) // u.s.sz AS box,
       |    (t - 1) % u.s.sz + 1 AS u
       |  FROM prof, (SELECT unnest([$structs]) AS s) u),
       |boxes AS (
       |  SELECT sz, box, CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(u) AS DECIMAL(38,0)) AS su,
       |    CAST(sum(u * u) AS DECIMAL(38,0)) AS suu,
       |    CAST(sum(p) AS DECIMAL(38,0)) AS sp,
       |    CAST(sum(CAST(u AS DECIMAL(38,0)) * p) AS DECIMAL(38,0)) AS sup,
       |    CAST(sum(p * p) AS DECIMAL(38,0)) AS spp
       |  FROM longf GROUP BY 1, 2),
       |sse AS (
       |  SELECT sz,
       |    CAST(floor((
       |      (CAST(m AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
       |      - pow(CAST(m AS DOUBLE) * CAST(sup AS DOUBLE) - CAST(su AS DOUBLE) * CAST(sp AS DOUBLE), 2)
       |        / (CAST(m AS DOUBLE) * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
       |    ) / CAST(m AS DOUBLE) / 1e18 + 0.5) AS BIGINT) AS sse_q
       |  FROM boxes WHERE m = sz),
       |persize AS (
       |  SELECT sz, sqrt(CAST(CAST(sum(sse_q) AS BIGINT) AS DOUBLE) / count(*) / sz) AS f
       |  FROM sse GROUP BY 1),
       |piv AS (
       |  SELECT $pivCols
       |  FROM persize)
       |SELECT round(($num) / $den, 6) AS dfa_alpha
       |FROM piv""".stripMargin
  }

  /** C650 graph_reciprocity — the directed-graph reciprocity ratio
    * (what fraction of arcs have a reverse arc) on the deterministic
    * event graph: ONE equi-self-join on the (src,dst)↔(dst,src) key —
    * never all-pairs — exact counts, one final division.
    */
  def graphReciprocity(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d).select(col("user_id")).distinct()
    val n = users.count()
    val arcs = users.select(col("user_id").as("src"),
        explode(array(
          (col("user_id") + 1) % n,
          (col("user_id") + 2) % n,
          (col("user_id") * 7 + 3) % n)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val recip = arcs.join(
      arcs.selectExpr("dst AS src", "src AS dst"), Seq("src", "dst"), "left_semi")
    arcs.agg(count(lit(1)).cast("long").as("n_arcs"))
      .crossJoin(broadcast(recip.agg(count(lit(1)).cast("long").as("n_recip"))))
      .selectExpr("n_arcs", "n_recip",
        "round(CAST(n_recip AS DOUBLE) / n_arcs, 6) AS reciprocity")
  }
  val graphReciprocitySql: String =
    """WITH users AS (SELECT DISTINCT user_id FROM events),
      |nn AS (SELECT count(*) AS n FROM users),
      |arcs AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT user_id AS src, (user_id + 1) % n AS dst FROM users, nn
      |    UNION ALL
      |    SELECT user_id, (user_id + 2) % n FROM users, nn
      |    UNION ALL
      |    SELECT user_id, (user_id * 7 + 3) % n FROM users, nn)
      |  WHERE src <> dst),
      |recip AS (
      |  SELECT a.src, a.dst FROM arcs a
      |  WHERE EXISTS (SELECT 1 FROM arcs b WHERE b.src = a.dst AND b.dst = a.src))
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM arcs) AS n_arcs,
      |  (SELECT CAST(count(*) AS BIGINT) FROM recip) AS n_recip,
      |  round((SELECT CAST(count(*) AS DOUBLE) FROM recip)
      |    / (SELECT count(*) FROM arcs), 6) AS reciprocity""".stripMargin

  /** C651 sort_topn_pushdown — the top-N-without-total-sort exhibit:
    * ORDER BY + LIMIT plans as TakeOrderedAndProject (per-partition
    * heaps + one small merge — spec asserts the node and the ABSENCE
    * of a global SortExec), shown on the R1-deterministic total order.
    * The 100 TB story: top-10 of a petabyte never sorts the petabyte.
    */
  def sortTopnPushdown(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
      .orderBy(col("cents").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(10)
  }
  val sortTopnPushdownSql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
      |FROM lineitem
      |ORDER BY cents DESC, l_orderkey, l_linenumber
      |LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_breslow_day" -> (statBreslowDay _),
    "time_dfa_alpha" -> (timeDfaAlpha _),
    "graph_reciprocity" -> (graphReciprocity _),
    "sort_topn_pushdown" -> (sortTopnPushdown _),
  )

  val oracle: Map[String, String] = Map(
    "stat_breslow_day" -> statBreslowDaySql,
    "time_dfa_alpha" -> timeDfaAlphaSql,
    "graph_reciprocity" -> graphReciprocitySql,
    "sort_topn_pushdown" -> sortTopnPushdownSql,
  )
}
