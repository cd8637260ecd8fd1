package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 79 (C720–C723): second-order graph structure on the suite's
  * deterministic event-user graph (the same modular edge rule the
  * PageRank/HITS rows use, so results are comparable across rows) —
  * Katz centrality, 4-cycle counting, the k_nn(k) degree-mixing curve,
  * and the degree heavy-tail audit.
  *
  * Shared discipline: fixed iteration counts with integer-µ state (no
  * float drift across engines), common-neighbor pairs from length-2
  * path equi-joins (degree is bounded by the 3-successor edge rule, so
  * the wedge fan-out is O(E)), and Gini/prefix forms computed from the
  * DEGREE HISTOGRAM with exact triangular-number algebra rather than a
  * corpus-wide sort.
  */
object Extras179 {

  private val KatzIters = 4

  /** The shared deterministic graph: 3 modular successors per user,
    * deduplicated; undirected view = min/max normalized, deduplicated.
    */
  private def dirEdges(s: SparkSession, d: String): (DataFrame, Long) = {
    val users = events(s, d).select(col("user_id")).distinct()
    val n = users.count()
    val edges = users.select(col("user_id").as("src"),
        explode(array(
          (col("user_id") * 7 + 3) % n,
          (col("user_id") * 13 + 11) % n,
          (col("user_id") * 29 + 17) % n)).as("dst"))
      .distinct()
    (edges, n)
  }
  // NOTE: the oracle expands the 3 successor rules via UNION ALL
  // instead of unnest([...]): DuckDB 1.0.0 hits an INTERNAL binder
  // error ("Failed to bind column reference dst") when an
  // unnest-derived column flows into least/greatest in a later CTE.
  private val dirEdgesSql: String =
    """users AS (SELECT DISTINCT user_id FROM events),
      |nn AS (SELECT count(*) AS n FROM users),
      |edges AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT user_id AS src, (user_id * 7 + 3) % (SELECT n FROM nn) AS dst FROM users
      |    UNION ALL
      |    SELECT user_id, (user_id * 13 + 11) % (SELECT n FROM nn) FROM users
      |    UNION ALL
      |    SELECT user_id, (user_id * 29 + 17) % (SELECT n FROM nn) FROM users))""".stripMargin
  private val undirEdgesSql: String =
    """uedges AS (
      |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |  FROM edges WHERE src <> dst)""".stripMargin

  /** C720 graph_katz_centrality — Katz with attenuation α = 0.05 over
    * KatzIters fixed iterations in integer micro-units:
    * x' = 10⁶ + (50·Σ_{v→u} x_v) div 1000 — the "influence including
    * long paths" score PageRank's normalization hides. Top-10 by
    * score, R1 tie-break on user_id.
    */
  def graphKatzCentrality(s: SparkSession, d: String): DataFrame = {
    val (edges, _) = dirEdges(s, d)
    val users = edges.select(col("src").as("user_id"))
      .union(edges.select(col("dst").as("user_id"))).distinct()
    var x = users.select(col("user_id"), lit(1000000L).as("x_mu"))
    for (_ <- 1 to KatzIters) {
      val inflow = edges
        .join(x.select(col("user_id").as("src"), col("x_mu")), "src")
        .groupBy(col("dst").as("user_id"))
        .agg(sum(col("x_mu")).as("inflow"))
      x = users.join(inflow, Seq("user_id"), "left")
        .select(col("user_id"),
          expr("CAST(1000000 + (50 * coalesce(inflow, 0L)) div 1000 AS BIGINT)").as("x_mu"))
    }
    x.orderBy(col("x_mu").desc, col("user_id").asc).limit(10)
  }
  def graphKatzCentralitySqlFor(): String = {
    val iters = (1 to KatzIters).map { i =>
      s"""x$i AS (
         |  SELECT u.user_id,
         |    CAST(1000000 + (50 * coalesce(f.inflow, 0)) // 1000 AS BIGINT) AS x_mu
         |  FROM ausers u LEFT JOIN (
         |    SELECT e.dst AS user_id, sum(r.x_mu) AS inflow
         |    FROM edges e JOIN x${i - 1} r ON r.user_id = e.src
         |    GROUP BY 1) f ON f.user_id = u.user_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $dirEdgesSql,
       |ausers AS (SELECT src AS user_id FROM edges UNION SELECT dst FROM edges),
       |x0 AS (SELECT user_id, CAST(1000000 AS BIGINT) AS x_mu FROM ausers),
       |$iters
       |SELECT user_id, x_mu FROM x$KatzIters
       |ORDER BY x_mu DESC, user_id LIMIT 10""".stripMargin
  }

  /** C721 graph_four_cycles — the 4-cycle census: for every vertex
    * pair at distance 2, count common neighbors via the length-2 path
    * equi-join (wedge table, O(Σdeg²) = O(E) under the bounded-degree
    * edge rule), then C4 = Σ C(cn,2) / 2-orbit correction — here each
    * 4-cycle {u,m1,w,m2} is counted once by the u<w pair via its
    * C(cn,2) mid-pairs. The bipartite-ish redundancy signal triangles
    * miss.
    */
  def graphFourCycles(s: SparkSession, d: String): DataFrame = {
    val (edges, _) = dirEdges(s, d)
    val und = edges.filter(expr("src <> dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val adj = und.select(col("a").as("m"), col("b").as("v"))
      .union(und.select(col("b").as("m"), col("a").as("v")))
    val wedges = adj.as("l").join(adj.as("r"), "m")
      .filter(expr("l.v < r.v"))
      .select(col("l.v").as("u"), col("r.v").as("w"))
    val cn = wedges.groupBy("u", "w").agg(count(lit(1)).cast("long").as("cn"))
    cn.agg(count(lit(1)).cast("long").as("n_dist2_pairs"),
        sum(expr("cn * (cn - 1) div 2")).cast("long").as("c4"),
        max(col("cn")).as("max_common_neighbors"))
      .selectExpr("n_dist2_pairs", "c4", "max_common_neighbors")
  }
  val graphFourCyclesSql: String =
    s"""WITH $dirEdgesSql,
      |$undirEdgesSql,
      |adj AS (SELECT a AS m, b AS v FROM uedges UNION ALL SELECT b, a FROM uedges),
      |wedges AS (
      |  SELECT l.v AS u, r.v AS w FROM adj l JOIN adj r ON l.m = r.m
      |  WHERE l.v < r.v),
      |cn AS (SELECT u, w, CAST(count(*) AS BIGINT) AS cn FROM wedges GROUP BY 1, 2)
      |SELECT CAST(count(*) AS BIGINT) AS n_dist2_pairs,
      |  CAST(sum(cn * (cn - 1) // 2) AS BIGINT) AS c4,
      |  max(cn) AS max_common_neighbors
      |FROM cn""".stripMargin

  /** C722 graph_avg_neighbor_degree — the k_nn(k) degree-mixing curve
    * (Pastor-Satorras et al.): per-vertex mean neighbor degree as an
    * exact rational (Σdeg_nbr quantized ·10⁶ div deg), averaged within
    * each degree class. A falling curve = disassortative hubs — the
    * curve form of the scalar assortativity rows.
    */
  def graphAvgNeighborDegree(s: SparkSession, d: String): DataFrame = {
    val (edges, _) = dirEdges(s, d)
    val und = edges.filter(expr("src <> dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val adj = und.select(col("a").as("v"), col("b").as("nbr"))
      .union(und.select(col("b").as("v"), col("a").as("nbr")))
    val deg = adj.groupBy("v").agg(count(lit(1)).cast("long").as("deg"))
    val knn = adj
      .join(deg.select(col("v").as("nbr"), col("deg").as("dn")), "nbr")
      .groupBy("v").agg(sum(col("dn")).cast("long").as("sdn"))
      .join(deg, "v")
      .selectExpr("v", "deg", "(sdn * 1000000L) div deg AS knn_mu")
    knn.groupBy("deg")
      .agg(count(lit(1)).cast("long").as("n_vertices"),
        sum(col("knn_mu")).cast("decimal(38,0)").as("s_knn"))
      .selectExpr("deg", "n_vertices",
        "round(CAST(s_knn AS DOUBLE) / n_vertices / 1e6, 4) AS avg_knn")
      .orderBy("deg")
  }
  val graphAvgNeighborDegreeSql: String =
    s"""WITH $dirEdgesSql,
      |$undirEdgesSql,
      |adj AS (SELECT a AS v, b AS nbr FROM uedges UNION ALL SELECT b, a FROM uedges),
      |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
      |knn AS (
      |  SELECT s.v, d2.deg, (s.sdn * 1000000) // d2.deg AS knn_mu FROM (
      |    SELECT a.v, CAST(sum(dn.deg) AS BIGINT) AS sdn
      |    FROM adj a JOIN deg dn ON dn.v = a.nbr GROUP BY 1) s
      |  JOIN deg d2 ON d2.v = s.v)
      |SELECT deg, CAST(count(*) AS BIGINT) AS n_vertices,
      |  round(CAST(CAST(sum(knn_mu) AS DECIMAL(38,0)) AS DOUBLE) / count(*) / 1e6, 4) AS avg_knn
      |FROM knn GROUP BY 1 ORDER BY 1""".stripMargin

  /** C723 graph_degree_heavy_tail — the heavy-tail audit in one row:
    * degree Gini from the DEGREE HISTOGRAM via exact triangular-number
    * prefix algebra (no corpus sort), the Molloy–Reed ratio ⟨k²⟩/⟨k⟩
    * (>2 ⇒ a giant component survives random failure), and the top-1%
    * vertices' edge-endpoint share.
    */
  def graphDegreeHeavyTail(s: SparkSession, d: String): DataFrame = {
    val (edges, _) = dirEdges(s, d)
    val und = edges.filter(expr("src <> dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val adj = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
    val hist = adj.groupBy("v").agg(count(lit(1)).cast("long").as("deg"))
      .groupBy("deg").agg(count(lit(1)).cast("long").as("g"))
    val withC = graft.plans.GlobalRank.withExclusivePrefixSum(
      hist, "c", col("g"), Seq(col("deg").asc))
    val tot = hist.agg(sum(col("g")).cast("long").as("n"),
      sum(expr("deg * g")).cast("decimal(38,0)").as("sd"),
      sum(expr("CAST(deg AS DECIMAL(38,0)) * deg * g")).cast("decimal(38,0)").as("sd2"))
    withC.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"), max(col("sd")).as("sd"), max(col("sd2")).as("sd2"),
        // Σ_sorted (2i − n − 1)·deg_i over the tie block [c+1, c+g]
        sum(expr("CAST(deg AS DECIMAL(38,0)) * ((c + g) * (c + g + 1) - c * (c + 1) - g * (n + 1))"))
          .cast("decimal(38,0)").as("gini_num"),
        // top-1% by degree = the ceil(n/100) highest-degree vertices:
        // count from the tail, pro-rating the boundary block
        sum(expr(
          """CAST(deg AS DECIMAL(38,0)) * least(g, greatest(0L, (c + g) - (n - (n + 99) div 100)))"""))
          .cast("decimal(38,0)").as("top_deg"))
      .selectExpr("n",
        "round(CAST(gini_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sd AS DOUBLE)), 6) AS degree_gini",
        "round(CAST(sd2 AS DOUBLE) / CAST(sd AS DOUBLE), 4) AS molloy_reed",
        "round(CAST(top_deg AS DOUBLE) / CAST(sd AS DOUBLE), 6) AS top1pct_share")
  }
  val graphDegreeHeavyTailSql: String =
    s"""WITH $dirEdgesSql,
      |$undirEdgesSql,
      |adj AS (SELECT a AS v FROM uedges UNION ALL SELECT b FROM uedges),
      |dv AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
      |hist AS (SELECT deg, CAST(count(*) AS BIGINT) AS g FROM dv GROUP BY 1),
      |blocks AS (
      |  SELECT deg, g,
      |    COALESCE(sum(g) OVER (ORDER BY deg
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c
      |  FROM hist),
      |tot AS (SELECT CAST(sum(g) AS BIGINT) AS n,
      |  CAST(sum(deg * g) AS DECIMAL(38,0)) AS sd,
      |  CAST(sum(CAST(deg AS DECIMAL(38,0)) * deg * g) AS DECIMAL(38,0)) AS sd2 FROM hist),
      |agg AS (
      |  SELECT max(n) AS n, max(sd) AS sd, max(sd2) AS sd2,
      |    CAST(sum(CAST(deg AS DECIMAL(38,0)) * ((c + g) * (c + g + 1) - c * (c + 1) - g * (n + 1))) AS DECIMAL(38,0)) AS gini_num,
      |    CAST(sum(CAST(deg AS DECIMAL(38,0)) * least(g, greatest(0, (c + g) - (n - (n + 99) // 100)))) AS DECIMAL(38,0)) AS top_deg
      |  FROM blocks, tot)
      |SELECT n,
      |  round(CAST(gini_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sd AS DOUBLE)), 6) AS degree_gini,
      |  round(CAST(sd2 AS DOUBLE) / CAST(sd AS DOUBLE), 4) AS molloy_reed,
      |  round(CAST(top_deg AS DOUBLE) / CAST(sd AS DOUBLE), 6) AS top1pct_share
      |FROM agg""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_katz_centrality" -> (graphKatzCentrality _),
    "graph_four_cycles" -> (graphFourCycles _),
    "graph_avg_neighbor_degree" -> (graphAvgNeighborDegree _),
    "graph_degree_heavy_tail" -> (graphDegreeHeavyTail _),
  )

  val oracle: Map[String, String] = Map(
    "graph_katz_centrality" -> graphKatzCentralitySqlFor(),
    "graph_four_cycles" -> graphFourCyclesSql,
    "graph_avg_neighbor_degree" -> graphAvgNeighborDegreeSql,
    "graph_degree_heavy_tail" -> graphDegreeHeavyTailSql,
  )
}
