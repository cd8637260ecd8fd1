package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 69 (C680–C683): Cliff's delta, degree centralization,
  * Davies–Bouldin index, IPW treatment effect.
  */
object Extras169 {

  /** C680 stat_cliff_delta — the nonparametric effect sizes Cliff's δ
    * and Vargha–Delaney Â between returnflag groups A and R on
    * quantity: the domain is BOUNDED (≤50 values), so the all-pairs
    * counts collapse to the value histogram — gt = Σ cA_v·cumR_{<v},
    * eq = Σ cA_v·cR_v — EXACT integers from one prefix pass, two final
    * divisions. No pair ever materializes.
    */
  def statCliffDelta(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy(expr("CAST(l_quantity AS BIGINT)").as("q"))
      .agg(sum(expr("CASE WHEN l_returnflag = 'A' THEN 1L ELSE 0L END")).cast("long").as("ca"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("cr"))
    val wp = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    val tot = hist.agg(sum(col("ca")).cast("long").as("na"),
      sum(col("cr")).cast("long").as("nr"))
    hist
      .withColumn("cumr_lt", coalesce(sum(col("cr")).over(wp), lit(0L)))
      .crossJoin(broadcast(tot))
      .agg(max(col("na")).as("na"), max(col("nr")).as("nr"),
        sum(expr("CAST(ca AS DECIMAL(38,0)) * cumr_lt")).cast("decimal(38,0)").as("gt"),
        sum(expr("CAST(ca AS DECIMAL(38,0)) * (nr - cumr_lt - cr)")).cast("decimal(38,0)").as("lt"),
        sum(expr("CAST(ca AS DECIMAL(38,0)) * cr")).cast("decimal(38,0)").as("eq"))
      .selectExpr("na", "nr",
        """round((CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
          |  / (CAST(na AS DOUBLE) * nr), 6) AS cliff_delta""".stripMargin,
        """round((CAST(gt AS DOUBLE) + 0.5 * CAST(eq AS DOUBLE))
          |  / (CAST(na AS DOUBLE) * nr), 6) AS vargha_delaney_a""".stripMargin)
  }
  val statCliffDeltaSql: String =
    """WITH hist AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS q,
      |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
      |pre AS (
      |  SELECT q, ca, cr,
      |    coalesce(sum(cr) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumr_lt
      |  FROM hist),
      |tot AS (
      |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cr) AS BIGINT) AS nr
      |  FROM hist),
      |m AS (
      |  SELECT max(na) AS na, max(nr) AS nr,
      |    CAST(sum(CAST(ca AS DECIMAL(38,0)) * cumr_lt) AS DECIMAL(38,0)) AS gt,
      |    CAST(sum(CAST(ca AS DECIMAL(38,0)) * (nr - cumr_lt - cr)) AS DECIMAL(38,0)) AS lt,
      |    CAST(sum(CAST(ca AS DECIMAL(38,0)) * cr) AS DECIMAL(38,0)) AS eq
      |  FROM pre, tot)
      |SELECT na, nr,
      |  round((CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
      |    / (CAST(na AS DOUBLE) * nr), 6) AS cliff_delta,
      |  round((CAST(gt AS DOUBLE) + 0.5 * CAST(eq AS DOUBLE))
      |    / (CAST(na AS DOUBLE) * nr), 6) AS vargha_delaney_a
      |FROM m""".stripMargin

  /** C681 graph_degree_centralization — Freeman's degree
    * centralization of the symmetrized event graph (how star-like is
    * it?): degrees from one grouped count over the undirected edge
    * frame (C612's convention), C = Σ(dmax−d_i)/((n−1)(n−2)) exact
    * integers with one final division; degree min/max/mean beside it.
    */
  def graphDegreeCentralization(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d).select(col("user_id")).distinct()
    val n = users.count()
    val arcs = users.select(col("user_id").as("src"),
        explode(array(
          (col("user_id") + 1) % n,
          (col("user_id") + 2) % n,
          (col("user_id") * 7 + 3) % n)).as("dst"))
      .filter(col("src") =!= col("dst"))
    val edges = arcs.unionAll(arcs.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("long").as("d"))
    val mx = deg.agg(max(col("d")).as("dmax"))
    deg.crossJoin(broadcast(mx))
      .agg(count(lit(1)).cast("long").as("n_nodes"),
        max(col("dmax")).as("dmax"),
        min(col("d")).cast("long").as("dmin"),
        sum(col("d")).cast("long").as("dsum"),
        sum(expr("dmax - d")).cast("long").as("csum"))
      .selectExpr("n_nodes", "dmax", "dmin",
        "round(CAST(dsum AS DOUBLE) / n_nodes, 4) AS mean_degree",
        """round(CAST(csum AS DOUBLE)
          |  / (CAST(n_nodes - 1 AS DOUBLE) * (n_nodes - 2)), 6)
          |  AS centralization""".stripMargin)
  }
  val graphDegreeCentralizationSql: String =
    """WITH users AS (SELECT DISTINCT user_id FROM events),
      |nn AS (SELECT count(*) AS n FROM users),
      |arcs AS (
      |  SELECT src, dst FROM (
      |    SELECT user_id AS src, (user_id + 1) % n AS dst FROM users, nn
      |    UNION ALL
      |    SELECT user_id, (user_id + 2) % n FROM users, nn
      |    UNION ALL
      |    SELECT user_id, (user_id * 7 + 3) % n FROM users, nn)
      |  WHERE src <> dst),
      |edges AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT src, dst FROM arcs UNION ALL SELECT dst, src FROM arcs)),
      |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1),
      |mx AS (SELECT max(d) AS dmax FROM deg)
      |SELECT CAST(count(*) AS BIGINT) AS n_nodes,
      |  max(mx.dmax) AS dmax, CAST(min(d) AS BIGINT) AS dmin,
      |  round(CAST(sum(d) AS DOUBLE) / count(*), 4) AS mean_degree,
      |  round(CAST(sum(mx.dmax - d) AS DOUBLE)
      |    / (CAST(count(*) - 1 AS DOUBLE) * (count(*) - 2)), 6) AS centralization
      |FROM deg, mx""".stripMargin

  /** C682 embed_davies_bouldin — the Davies–Bouldin cluster-validity
    * index (the triptych closer beside CH and silhouette): per-label
    * scatter s_j = √(W_j/n_j) from exact Huygens moments, centroid
    * distances over the BOUNDED k×k label-pair frame with EXACT
    * cross-multiplied numerators (sf_i·n_j − sf_j·n_i per dim), DB =
    * mean over labels of the worst (s_i+s_j)/d_ij — per-label maxima
    * micro-quantized so the final mean is an exact sum + one division.
    */
  def embedDaviesBouldin(s: SparkSession, d: String): DataFrame = {
    val comp = embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), col("pos"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1e9 + 0.5) AS BIGINT)").as("f"))
    val g = comp.groupBy("label", "pos")
      .agg(count(lit(1)).cast("long").as("nj"),
        sum(col("f")).cast("decimal(38,0)").as("sf"),
        sum(expr("CAST(f AS DECIMAL(38,0)) * f")).cast("decimal(38,0)").as("qf"))
    val scat = g.groupBy("label")
      .agg(max(col("nj")).as("nj"),
        sum(expr("CAST(CAST(nj AS DECIMAL(38,0)) * qf - sf * sf AS DECIMAL(38,0))"))
          .cast("decimal(38,0)").as("wnum"))
      .selectExpr("label", "nj",
        "sqrt(CAST(wnum AS DOUBLE)) / nj / 1e9 AS s")
    val cent = g.selectExpr("label", "pos", "nj", "sf")
    val pairD = cent.as("a")
      .join(cent.selectExpr("label AS label2", "pos", "nj AS nj2", "sf AS sf2").as("b"),
        Seq("pos"))
      .filter(expr("label < label2"))
      .groupBy("label", "label2")
      .agg(sum(expr(
        "CAST(sf * nj2 - sf2 * nj AS DECIMAL(38,0)) * (sf * nj2 - sf2 * nj)"))
        .as("num2"),
        max(col("nj")).as("ni"), max(col("nj2")).as("nj2"))
      .selectExpr("label", "label2",
        "sqrt(CAST(num2 AS DOUBLE)) / (CAST(ni AS DOUBLE) * nj2) / 1e9 AS dij")
    val sym = pairD.selectExpr("label AS i", "label2 AS j", "dij")
      .unionAll(pairD.selectExpr("label2 AS i", "label AS j", "dij"))
    val rij = sym
      .join(broadcast(scat.selectExpr("label AS i", "s AS si")), Seq("i"))
      .join(broadcast(scat.selectExpr("label AS j", "s AS sj")), Seq("j"))
      .withColumn("r", expr("(si + sj) / dij"))
    rij.groupBy("i")
      .agg(max(col("r")).as("ri"))
      .agg(count(lit(1)).cast("long").as("k"),
        sum(expr("CAST(floor(ri * 1e9 + 0.5) AS BIGINT)")).cast("long").as("rq"))
      .selectExpr("k",
        "round(CAST(rq AS DOUBLE) / k / 1e9, 6) AS davies_bouldin")
  }
  val embedDaviesBouldinSql: String =
    """WITH comp AS (
      |  SELECT e.label, i.i AS pos,
      |    CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS f
      |  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i),
      |g AS (
      |  SELECT label, pos, CAST(count(*) AS BIGINT) AS nj,
      |    CAST(sum(f) AS DECIMAL(38,0)) AS sf,
      |    CAST(sum(CAST(f AS DECIMAL(38,0)) * f) AS DECIMAL(38,0)) AS qf
      |  FROM comp GROUP BY 1, 2),
      |scat AS (
      |  SELECT label, max(nj) AS nj,
      |    sqrt(CAST(CAST(sum(CAST(CAST(nj AS DECIMAL(38,0)) * qf - sf * sf AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE)) / max(nj) / 1e9 AS s
      |  FROM g GROUP BY 1),
      |paird AS (
      |  SELECT a.label AS i, b.label AS j,
      |    sqrt(CAST(CAST(sum(CAST(a.sf * b.nj - b.sf * a.nj AS DECIMAL(38,0))
      |      * (a.sf * b.nj - b.sf * a.nj)) AS DECIMAL(38,0)) AS DOUBLE))
      |      / (CAST(max(a.nj) AS DOUBLE) * max(b.nj)) / 1e9 AS dij
      |  FROM g a JOIN g b ON a.pos = b.pos AND a.label < b.label
      |  GROUP BY 1, 2),
      |sym AS (
      |  SELECT i, j, dij FROM paird
      |  UNION ALL SELECT j, i, dij FROM paird),
      |rij AS (
      |  SELECT sym.i, (si.s + sj.s) / sym.dij AS r
      |  FROM sym JOIN scat si ON si.label = sym.i JOIN scat sj ON sj.label = sym.j),
      |ri AS (SELECT i, max(r) AS ri FROM rij GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS k,
      |  round(CAST(CAST(sum(CAST(floor(ri * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
      |    / count(*) / 1e9, 6) AS davies_bouldin
      |FROM ri""".stripMargin

  /** C683 analytics_ipw_ate — the inverse-probability-weighted average
    * treatment effect (the causal upgrade of the C616 uplift row):
    * propensities are per-segment treated shares (BOUNDED 5 segments,
    * exact rationals), the weighted sums y·t/e and y(1−t)/(1−e)
    * collapse to y1_s·n_s/t_s and y0_s·n_s/(n_s−t_s) — applied as
    * HUGEINT-exact micro-quantized divisions per segment — ATE in one
    * final division, reported beside the naive difference.
    */
  def analyticsIpwAte(s: SparkSession, d: String): DataFrame = {
    val seg = lineitem(s, d).select(
        expr("CAST(floor((l_quantity - 1) / 10) AS BIGINT)").as("seg"),
        expr("CASE WHEN l_discount >= 0.05 THEN 1L ELSE 0L END").as("t"),
        expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END").as("y"))
      .groupBy("seg")
      .agg(count(lit(1)).cast("long").as("ns"),
        sum(col("t")).cast("long").as("ts"),
        sum(expr("t * y")).cast("long").as("y1"),
        sum(expr("(1L - t) * y")).cast("long").as("y0"))
    val tot = seg.agg(sum(col("ns")).cast("long").as("n"),
      sum(col("ts")).cast("long").as("ttot"),
      sum(col("y1")).cast("long").as("y1tot"),
      sum(col("y0")).cast("long").as("y0tot"))
    seg.crossJoin(broadcast(tot))
      .withColumn("w1_q", expr(
        "CAST((CAST(y1 AS DECIMAL(38,0)) * ns * 1000000) div ts AS BIGINT)"))
      .withColumn("w0_q", expr(
        "CAST((CAST(y0 AS DECIMAL(38,0)) * ns * 1000000) div (ns - ts) AS BIGINT)"))
      .agg(max(col("n")).as("n"), max(col("ttot")).as("ttot"),
        max(col("y1tot")).as("y1tot"), max(col("y0tot")).as("y0tot"),
        sum(col("w1_q")).cast("long").as("sw1"),
        sum(col("w0_q")).cast("long").as("sw0"))
      .selectExpr("n",
        """round((CAST(sw1 AS DOUBLE) - CAST(sw0 AS DOUBLE)) / 1e6 / n, 6)
          |  AS ipw_ate""".stripMargin,
        """round(CAST(y1tot AS DOUBLE) / ttot
          |  - CAST(y0tot AS DOUBLE) / (n - ttot), 6) AS naive_diff""".stripMargin)
  }
  val analyticsIpwAteSql: String =
    """WITH seg AS (
      |  SELECT CAST(floor((l_quantity - 1) / 10) AS BIGINT) AS seg,
      |    CAST(count(*) AS BIGINT) AS ns,
      |    CAST(sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS ts,
      |    CAST(sum(CASE WHEN l_discount >= 0.05 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS y1,
      |    CAST(sum(CASE WHEN l_discount < 0.05 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS y0
      |  FROM lineitem GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(ns) AS BIGINT) AS n, CAST(sum(ts) AS BIGINT) AS ttot,
      |    CAST(sum(y1) AS BIGINT) AS y1tot, CAST(sum(y0) AS BIGINT) AS y0tot
      |  FROM seg),
      |q AS (
      |  SELECT n, ttot, y1tot, y0tot,
      |    CAST(CAST(CAST(y1 AS HUGEINT) * ns * 1000000 AS HUGEINT) // ts AS BIGINT) AS w1_q,
      |    CAST(CAST(CAST(y0 AS HUGEINT) * ns * 1000000 AS HUGEINT) // (ns - ts) AS BIGINT) AS w0_q
      |  FROM seg, tot),
      |m AS (
      |  SELECT max(n) AS n, max(ttot) AS ttot,
      |    max(y1tot) AS y1tot, max(y0tot) AS y0tot,
      |    CAST(sum(w1_q) AS BIGINT) AS sw1, CAST(sum(w0_q) AS BIGINT) AS sw0
      |  FROM q)
      |SELECT n,
      |  round((CAST(sw1 AS DOUBLE) - CAST(sw0 AS DOUBLE)) / 1e6 / n, 6) AS ipw_ate,
      |  round(CAST(y1tot AS DOUBLE) / ttot
      |    - CAST(y0tot AS DOUBLE) / (n - ttot), 6) AS naive_diff
      |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_cliff_delta" -> (statCliffDelta _),
    "graph_degree_centralization" -> (graphDegreeCentralization _),
    "embed_davies_bouldin" -> (embedDaviesBouldin _),
    "analytics_ipw_ate" -> (analyticsIpwAte _),
  )

  val oracle: Map[String, String] = Map(
    "stat_cliff_delta" -> statCliffDeltaSql,
    "graph_degree_centralization" -> graphDegreeCentralizationSql,
    "embed_davies_bouldin" -> embedDaviesBouldinSql,
    "analytics_ipw_ate" -> analyticsIpwAteSql,
  )
}
