package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Eighty-sixth wave: distributed BFS levels, temperature-scaled
  * mixture weights, and duplicate-station detection.
  */
object Extras86 {

  /** graph_bfs_levels — breadth-first levels from vertex 0 over the
    * C370 deterministic directed graph, as 5 frontier-expansion rounds:
    * each round is one keyed join (frontier ⋈ edges) + one ANTI join
    * against the visited set, both EAGERLY MATERIALIZED per round
    * (localCheckpoint) to truncate lineage — the iterative-DAG lesson
    * from C370 applies to every frontier algorithm. Census per level:
    * count + vertex envelope. Scale: round cost O(frontier·deg) shuffled
    * by vertex; the visited set stays distributed (no driver collect).
    */
  def graphBfsLevels(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d).select(col("user_id")).distinct()
    val n = users.count()
    val edges = users.select(col("user_id").as("src"),
        explode(array(
          (col("user_id") + 1) % n,
          (col("user_id") + 2) % n,
          (col("user_id") * 7 + 3) % n)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint(true)
    var visited = users.sparkSession.range(1).toDF("v")
      .select(lit(0L).as("v"), lit(0L).as("lvl")).localCheckpoint(true)
    var frontier = visited.select("v")
    for (k <- 1 to 5) {
      frontier = frontier.join(edges, frontier("v") === edges("src"))
        .select(col("dst").as("v")).distinct()
        .join(visited.select("v"), Seq("v"), "left_anti")
        .localCheckpoint(true)
      visited = visited
        .unionAll(frontier.select(col("v"), lit(k.toLong).as("lvl")))
        .localCheckpoint(true)
    }
    visited.groupBy("lvl")
      .agg(count(lit(1)).as("n_vertices"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .orderBy("lvl")
  }
  val graphBfsLevelsSql: String = {
    val base =
      """WITH users AS (SELECT DISTINCT user_id FROM events),
        |nn AS (SELECT count(*) AS n FROM users),
        |edges AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT user_id AS src, (user_id + 1) % n AS dst FROM users, nn
        |    UNION ALL
        |    SELECT user_id, (user_id + 2) % n FROM users, nn
        |    UNION ALL
        |    SELECT user_id, (user_id * 7 + 3) % n FROM users, nn)
        |  WHERE src <> dst),
        |v0 AS MATERIALIZED (SELECT 0 AS v, 0 AS lvl)""".stripMargin
    val rounds = (1 to 5).map { k =>
      s"""f$k AS MATERIALIZED (
         |  SELECT DISTINCT dst AS v FROM edges
         |  WHERE src IN (SELECT v FROM v${k - 1} WHERE lvl = ${k - 1})
         |    AND dst NOT IN (SELECT v FROM v${k - 1})),
         |v$k AS MATERIALIZED (
         |  SELECT v, lvl FROM v${k - 1}
         |  UNION ALL SELECT v, $k AS lvl FROM f$k)""".stripMargin
    }.mkString(",\n", ",\n", "")
    base + rounds +
      """
        |SELECT CAST(lvl AS BIGINT) AS lvl, count(*) AS n_vertices,
        |  CAST(min(v) AS BIGINT) AS min_v, CAST(max(v) AS BIGINT) AS max_v
        |FROM v5 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** pipeline_mixture_temperature — temperature-scaled language
    * sampling weights (the multilingual pretraining rebalance): for
    * each temperature T, w_l = (n_l/N)^(1/T) normalized over languages
    * — the pow/normalize runs on the O(langs) frame with the
    * normalizing Σw the ONLY order-sensitive sum, folded lang-sorted;
    * expected doc counts come back as integers via floor. One corpus
    * pass, 3 temperatures fanned out on the tiny frame.
    */
  def pipelineMixtureTemperature(s: SparkSession, d: String): DataFrame = {
    val langs = documents(s, d).groupBy("lang").agg(count(lit(1)).as("n_l"))
    val tot = langs.agg(sum(col("n_l")).as("n"),
      sort_array(collect_list(struct(col("lang"), col("n_l")))).as("ll"))
    tot
      .select(col("n"), col("ll"),
        explode(array(lit(1.0d), lit(0.7d), lit(0.5d))).as("temp"))
      .withColumn("sw", expr(
        """aggregate(ll, 0D, (acc, t) ->
          |  acc + pow(CAST(t.n_l AS DOUBLE) / CAST(n AS DOUBLE),
          |            1.0D / temp))""".stripMargin))
      .select(col("n"), col("temp"), col("sw"),
        explode(col("ll")).as("lt"))
      .select(col("lt.lang").as("lang"), col("temp"),
        round(pow(col("lt.n_l").cast("double") / col("n").cast("double"),
          lit(1.0d) / col("temp")) / col("sw"), 6).as("p_l"),
        floor(pow(col("lt.n_l").cast("double") / col("n").cast("double"),
          lit(1.0d) / col("temp")) / col("sw") * col("n").cast("double"))
          .cast("long").as("expected_docs"))
      .orderBy("lang", "temp")
  }
  val pipelineMixtureTemperatureSql: String =
    """WITH langs AS (
      |  SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(n_l) AS BIGINT) AS n,
      |    list_sort(list(struct_pack(lang := lang, n_l := n_l))) AS ll
      |  FROM langs),
      |x AS (
      |  SELECT n, ll, temp,
      |    list_reduce(list_prepend(0.0, list_transform(ll, t ->
      |      pow(CAST(t.n_l AS DOUBLE) / CAST(n AS DOUBLE), 1.0 / temp))),
      |      (a, b) -> a + b) AS sw
      |  FROM tot CROSS JOIN (VALUES (1.0), (0.7), (0.5)) AS tt(temp))
      |SELECT u.lang AS lang, temp,
      |  round(pow(CAST(u.n_l AS DOUBLE) / CAST(n AS DOUBLE), 1.0 / temp)
      |    / sw, 6) AS p_l,
      |  CAST(floor(pow(CAST(u.n_l AS DOUBLE) / CAST(n AS DOUBLE), 1.0 / temp)
      |    / sw * CAST(n AS DOUBLE)) AS BIGINT) AS expected_docs
      |FROM x, unnest(ll) AS r(u)
      |ORDER BY lang, temp""".stripMargin

  /** ref_duplicate_stations — duplicate-station screen (the data-QC
    * check for repeated casts at the same coordinates by different
    * cruises): station cells derive from the C131 integer coordinate
    * scheme WITHOUT ever touching floating point — the cell key is the
    * 5-degree integer pair — so grouping is exact by construction.
    * Top-10 multi-cruise cells by the exact (n_cruises, cell) key,
    * beside a global census row folded in via GROUPING SETS (one pass,
    * no second scan).
    */
  def refDuplicateStations(s: SparkSession, d: String): DataFrame = {
    val pts = events(s, d).select(col("user_id").as("cruise"),
      expr("event_id * 7919 % 36000 div 500").as("lon_c"),
      expr("event_id * 4409 % 18000 div 500").as("lat_c"))
    pts.groupBy("lon_c", "lat_c")
      .agg(count_distinct(col("cruise")).as("n_cruises"),
        count(lit(1)).as("n_obs"))
      .filter(col("n_cruises") >= 2)
      .orderBy(col("n_cruises").desc, col("lon_c"), col("lat_c"))
      .limit(10)
  }
  val refDuplicateStationsSql: String =
    """SELECT event_id * 7919 % 36000 // 500 AS lon_c,
      |  event_id * 4409 % 18000 // 500 AS lat_c,
      |  count(DISTINCT user_id) AS n_cruises, count(*) AS n_obs
      |FROM events
      |GROUP BY 1, 2 HAVING count(DISTINCT user_id) >= 2
      |ORDER BY n_cruises DESC, lon_c, lat_c LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_bfs_levels" -> (graphBfsLevels _),
    "pipeline_mixture_temperature" -> (pipelineMixtureTemperature _),
    "ref_duplicate_stations" -> (refDuplicateStations _))

  val oracle: Map[String, String] = Map(
    "graph_bfs_levels" -> graphBfsLevelsSql,
    "pipeline_mixture_temperature" -> pipelineMixtureTemperatureSql,
    "ref_duplicate_stations" -> refDuplicateStationsSql)
}
