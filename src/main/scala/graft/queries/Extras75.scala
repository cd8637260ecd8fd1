package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Seventy-fifth wave: one-way ANOVA, gaps-and-islands activity runs,
  * and the global clustering coefficient of the rule-derived graph.
  */
object Extras75 {

  /** stat_anova_oneway — one-way ANOVA F over document length by
    * language (the corpus-drift test a training pipeline runs per
    * snapshot): all moment sums are EXACT — per-group n/Σx as longs,
    * Σx² as DECIMAL(38,0) with each factor cast to decimal BEFORE the
    * product (int64 would wrap first at ~3e9 large docs — the C341
    * lesson). The one order-sensitive IEEE sum (Σ S_g²/n_g) walks a
    * LANG-SORTED collected list in a higher-order fold — identical
    * sequence in both engines (the agg_entropy pattern); the group
    * list is O(#langs), never the data. F assembles from exact parts
    * in one final IEEE block, round(,6).
    */
  def statAnovaOneway(s: SparkSession, d: String): DataFrame = {
    val g = documents(s, d).groupBy("lang").agg(
      count(lit(1)).as("n_g"),
      sum(col("n_chars")).as("s_g"),
      sum(col("n_chars").cast("decimal(19,0)")
        * col("n_chars").cast("decimal(19,0)")).as("q_g"))
    g.agg(
        count(lit(1)).as("k"),
        sum(col("n_g")).as("n"),
        sum(col("s_g")).as("s"),
        sum(col("q_g")).cast("double").as("q"),
        sort_array(collect_list(struct(col("lang"), col("n_g"), col("s_g"))))
          .as("gl"))
      .withColumn("sgg", expr(
        """aggregate(gl, 0D, (acc, t) ->
          |  acc + CAST(t.s_g AS DOUBLE) * CAST(t.s_g AS DOUBLE)
          |        / CAST(t.n_g AS DOUBLE))""".stripMargin))
      .select(col("k"), col("n"),
        round(col("sgg") - col("s").cast("double") * col("s").cast("double")
          / col("n").cast("double"), 6).as("ss_between"),
        round(col("q") - col("sgg"), 6).as("ss_within"),
        round(((col("sgg") - col("s").cast("double") * col("s").cast("double")
            / col("n").cast("double")) / (col("k") - lit(1)).cast("double"))
          / ((col("q") - col("sgg")) / (col("n") - col("k")).cast("double")), 6)
          .as("f_stat"))
  }
  val statAnovaOnewaySql: String =
    """WITH g AS (
      |  SELECT lang, count(*) AS n_g, CAST(sum(n_chars) AS BIGINT) AS s_g,
      |    sum(CAST(n_chars AS DECIMAL(19,0)) * CAST(n_chars AS DECIMAL(19,0)))
      |      AS q_g
      |  FROM documents GROUP BY 1),
      |tot AS (
      |  SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
      |    CAST(sum(s_g) AS BIGINT) AS s, CAST(sum(q_g) AS DOUBLE) AS q,
      |    list_sort(list(struct_pack(lang := lang, n_g := n_g, s_g := s_g)))
      |      AS gl
      |  FROM g),
      |f AS (
      |  SELECT k, n, s, q,
      |    list_reduce(list_prepend(0.0, list_transform(gl, t ->
      |      CAST(t.s_g AS DOUBLE) * CAST(t.s_g AS DOUBLE)
      |        / CAST(t.n_g AS DOUBLE))), (x, y) -> x + y) AS sgg
      |  FROM tot)
      |SELECT k, n,
      |  round(sgg - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE),
      |    6) AS ss_between,
      |  round(q - sgg, 6) AS ss_within,
      |  round(((sgg - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |      / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
      |    / ((q - sgg) / CAST(n - k AS DOUBLE)), 6) AS f_stat
      |FROM f""".stripMargin

  /** win_gaps_islands — the classic GAPS-AND-ISLANDS shape: each
    * user's distinct active days collapse into runs of consecutive
    * days via the row_number subtraction trick (day − rn is constant
    * within a run — pure arithmetic, no self-join). Scale: the window
    * partitions by user (parallel across users), islands aggregate by
    * (user, run-key) — two keyed exchanges, state O(days per user).
    */
  def winGapsIslands(s: SparkSession, d: String): DataFrame = {
    val days = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    days
      .withColumn("rn",
        row_number().over(Window.partitionBy("user_id").orderBy("day")))
      .withColumn("grp", date_sub(col("day"), col("rn")))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_islands"),
        max(col("len")).as("longest_run"))
      .orderBy("user_id")
  }
  val winGapsIslandsSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |i AS (
      |  SELECT user_id,
      |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
      |      AS INTEGER) AS grp
      |  FROM days),
      |g AS (SELECT user_id, grp, count(*) AS len FROM i GROUP BY 1, 2)
      |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
      |  count(*) AS n_islands, CAST(max(len) AS BIGINT) AS longest_run
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  /** graph_clustering_coeff — GLOBAL clustering coefficient
    * 3·triangles / wedges on the C180 rule-derived graph (the
    * community-structure health number next to C347's assortativity):
    * triangles via the same degree-ordered two-join plan as C119
    * (each triangle found exactly once — no ÷6), wedges as
    * Σ deg·(deg−1)/2 off the degree frame (integer DIV — the product
    * is always even). Everything is exact integer until the single
    * final IEEE ratio. Scale: two distributed equi-joins bounded by
    * lower-neighbor fan-out; the degree frame is O(V).
    */
  def graphClusteringCoeff(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d).select(col("user_id")).distinct()
    val n = users.count()
    val raw = users.select(col("user_id").as("src"),
        explode(array(
          (col("user_id") + 1) % n,
          (col("user_id") + 2) % n,
          (col("user_id") * 7 + 3) % n)).as("dst"))
      .filter(col("src") =!= col("dst"))
    val edges = raw.select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b")).distinct()
    val deg = edges.select(col("a").as("v"))
      .union(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("dv"))
    val wedges = deg.agg(sum(expr("(dv * (dv - 1)) DIV 2")).as("n_wedges"))
    val tri = edges.select(col("a"), col("b").as("m"))
      .join(edges.select(col("a").as("m"), col("b").as("c")), "m")
      .join(edges.select(col("a"), col("b").as("c")), Seq("a", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    edges.agg(count(lit(1)).as("n_edges")).crossJoin(wedges).crossJoin(tri)
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        round(lit(3).cast("double") * col("n_triangles").cast("double")
          / col("n_wedges").cast("double"), 6).as("global_coeff"))
  }
  val graphClusteringCoeffSql: String =
    """WITH users AS (SELECT DISTINCT user_id FROM events),
      |nn AS (SELECT count(*) AS n FROM users),
      |raw AS (
      |  SELECT user_id AS src, (user_id + 1) % n AS dst FROM users, nn
      |  UNION ALL
      |  SELECT user_id, (user_id + 2) % n FROM users, nn
      |  UNION ALL
      |  SELECT user_id, (user_id * 7 + 3) % n FROM users, nn),
      |edges AS (
      |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |  FROM raw WHERE src <> dst),
      |deg AS (
      |  SELECT v, count(*) AS dv FROM (
      |    SELECT a AS v FROM edges UNION ALL SELECT b FROM edges)
      |  GROUP BY 1),
      |w AS (SELECT CAST(sum((dv * (dv - 1)) // 2) AS BIGINT) AS n_wedges
      |      FROM deg),
      |t AS (
      |  SELECT count(*) AS n_triangles
      |  FROM (SELECT e1.a, e1.b AS m, e2.b AS c
      |        FROM edges e1 JOIN edges e2 ON e1.b = e2.a) wd
      |  JOIN edges e3 ON e3.a = wd.a AND e3.b = wd.c)
      |SELECT (SELECT count(*) FROM edges) AS n_edges, n_wedges, n_triangles,
      |  round(3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE), 6)
      |    AS global_coeff
      |FROM w, t""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_anova_oneway" -> (statAnovaOneway _),
    "win_gaps_islands" -> (winGapsIslands _),
    "graph_clustering_coeff" -> (graphClusteringCoeff _))

  val oracle: Map[String, String] = Map(
    "stat_anova_oneway" -> statAnovaOnewaySql,
    "win_gaps_islands" -> winGapsIslandsSql,
    "graph_clustering_coeff" -> graphClusteringCoeffSql)
}
