package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sixty-third wave: multi-level hive-style partitioning with compound
  * pruning, VALUES inline tables, and neighbor-set Jaccard similarity
  * on the bipartite graph.
  */
object Extras63 {

  /** sink_partitioned_multicol — MULTI-LEVEL hive-style partitioning
    * (C14's single-level twin, the layout a 100 TB lake actually uses:
    * coarse dimension first, finer second): write orders partitioned by
    * (status, priority), read back filtering BOTH levels — the scan
    * must touch only the one matching leaf directory (compound
    * partition pruning, both filters as PartitionFilters, zero data
    * rows read from any other leaf).
    */
  def sinkPartitionedMulticol(s: SparkSession, d: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mpart_").toString
    orders(s, d)
      .write.mode("overwrite")
      .partitionBy("o_orderstatus", "o_orderpriority").parquet(tmp)
    s.read.parquet(tmp)
      .filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }
  val sinkPartitionedMulticolSql: String =
    s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       |  ${dsumSql("o_totalprice")} AS total
       |FROM orders
       |WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** sql_inline_values — the VALUES inline-table constructor as a
    * first-class relation: a literal lookup table declared IN the
    * query joins against the scan — the SQL spelling of a broadcast
    * dictionary (C230), no temp view or file needed. The optimizer
    * folds it to a LocalRelation and broadcasts it.
    */
  def sqlInlineValues(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_iv")
    s.sql(
      """SELECT v.tier, count(*) AS n,
        |  CAST(min(o_totalprice) AS DOUBLE) AS min_price
        |FROM orders_iv
        |JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
        |             ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
        |             ('5-LOW', 'cold')) AS v(pri, tier)
        |  ON o_orderpriority = v.pri
        |GROUP BY v.tier ORDER BY v.tier""".stripMargin)
  }
  val sqlInlineValuesSql: String =
    """SELECT v.tier, count(*) AS n, CAST(min(o_totalprice) AS DOUBLE) AS min_price
      |FROM orders
      |JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
      |             ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
      |             ('5-LOW', 'cold')) AS v(pri, tier)
      |  ON o_orderpriority = v.pri
      |GROUP BY v.tier ORDER BY v.tier""".stripMargin

  /** graph_neighbor_jaccard — node similarity by NEIGHBOR-SET Jaccard
    * on the supplier↔customer bipartite graph (C305's degree census
    * upgraded to pairwise structure — "which suppliers serve the same
    * customers"): DIRECT co-occurrence counting — each customer emits
    * its supplier PAIRS (one self-join keyed on the customer), one
    * count aggregation yields every |N(a)∩N(b)| EXACTLY, and Jaccard
    * follows from the degree frame. Cost is Σ_c cf(c)² — the shape
    * that scales on a DENSE graph, where C5's prefix filter cannot
    * bite at a low structural threshold (measured here: the
    * candidate-then-verify plan multiplied candidates by full
    * adjacency lists, 150 s at sf0.1; this direct count runs the same
    * result in seconds). At web scale the one guard this needs is a
    * hub cap: customers with cf above a bound get sampled or dropped
    * with a quantified recall statement — the corpus here is far below
    * any such bound. Emits supplier pairs with Jaccard ≥ 0.2
    * (neighbor-set overlap is diluted by breadth as the graph
    * densifies, so the structural threshold sits lower than
    * text-shingle thresholds).
    */
  def graphNeighborJaccard(s: SparkSession, d: String): DataFrame = {
    val edges = lineitem(s, d).select(col("l_suppkey"), col("l_orderkey"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("sk"), col("o_custkey").as("ck")).distinct()
    val sizes = edges.groupBy("sk").agg(count(lit(1)).as("deg"))
    val inter = edges.select(col("sk").as("sa"), col("ck"))
      .join(edges.select(col("sk").as("sb"), col("ck")), "ck")
      .filter(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("sk").as("sa"), col("deg").as("da")), "sa")
      .join(sizes.select(col("sk").as("sb"), col("deg").as("db")), "sb")
      .select(col("sa"), col("sb"),
        (col("n_inter").cast("double") / (col("da") + col("db") - col("n_inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .orderBy("sa", "sb")
  }
  val graphNeighborJaccardSql: String =
    """WITH e AS (
      |  SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |adj AS (SELECT sk, list_sort(list(ck)) AS ns FROM e GROUP BY sk)
      |SELECT a.sk AS sa, b.sk AS sb,
      |  CAST(len(list_intersect(a.ns, b.ns)) AS DOUBLE)
      |    / (len(a.ns) + len(b.ns) - len(list_intersect(a.ns, b.ns))) AS jaccard
      |FROM adj a JOIN adj b ON a.sk < b.sk
      |WHERE CAST(len(list_intersect(a.ns, b.ns)) AS DOUBLE)
      |    / (len(a.ns) + len(b.ns) - len(list_intersect(a.ns, b.ns))) >= 0.2
      |ORDER BY sa, sb""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sink_partitioned_multicol" -> (sinkPartitionedMulticol _),
    "sql_inline_values" -> (sqlInlineValues _),
    "graph_neighbor_jaccard" -> (graphNeighborJaccard _))

  val oracle: Map[String, String] = Map(
    "sink_partitioned_multicol" -> sinkPartitionedMulticolSql,
    "sql_inline_values" -> sqlInlineValuesSql,
    "graph_neighbor_jaccard" -> graphNeighborJaccardSql)
}
