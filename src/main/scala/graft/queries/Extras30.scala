package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Thirtieth wave: iterative graph ranking in exact integer
  * arithmetic, training-data mixture sampling, the weighted median,
  * and the TPC-H Q10 shape.
  */
object Extras30 {

  private val PrIters = 5

  /** graph_pagerank_fixed — PageRank in FIXED-POINT integer
    * arithmetic: the one trick that makes an iterative rank
    * DETERMINISTIC on a distributed engine. Float PageRank sums
    * neighbor contributions in shuffle order (non-associative — every
    * run a different last ulp); here ranks live in integer micro-units
    * (10⁶ = 1.0), contributions are integer divisions, and integer
    * sums are order-independent, so five iterations land bit-identical
    * on any cluster AND in the oracle. The graph: each event user
    * links to three rule-derived users (mod the user count); damping
    * 0.85 as the exact integer ops ·850 div 1000. Per iteration: one
    * join + one aggregation — O(|E|) per round, no driver-side graph.
    */
  def graphPagerankFixed(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d).select(col("user_id")).distinct()
    val n = users.count()
    val edges = users.select(col("user_id").as("src"),
        explode(array(
          (col("user_id") * 7 + 3) % n,
          (col("user_id") * 13 + 11) % n,
          (col("user_id") * 29 + 17) % n)).as("dst"))
      .distinct() // rule collisions → multi-edges collapse, degree from data
    val deg = edges.groupBy("src").agg(count(lit(1)).as("degree"))
    var ranks = users.select(col("user_id"), lit(1000000L).as("rank_mu"))
    for (_ <- 1 to PrIters) {
      val contrib = edges.join(deg, "src")
        .join(ranks.select(col("user_id").as("src"), col("rank_mu")), "src")
        .select(col("dst").as("user_id"),
          expr("rank_mu div degree").as("c"))
        .groupBy("user_id").agg(sum(col("c")).as("inflow"))
      ranks = users
        .join(contrib, Seq("user_id"), "left")
        .select(col("user_id"),
          expr("CAST(150000 + (850 * coalesce(inflow, 0)) div 1000 AS BIGINT)")
            .as("rank_mu"))
    }
    ranks.orderBy("user_id")
  }
  def graphPagerankFixedSqlFor(): String = {
    val base =
      """WITH users AS (SELECT DISTINCT user_id FROM events),
        |n AS (SELECT count(*) AS n FROM users),
        |edges AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT user_id AS src,
        |      unnest([(user_id * 7 + 3) % (SELECT n FROM n),
        |              (user_id * 13 + 11) % (SELECT n FROM n),
        |              (user_id * 29 + 17) % (SELECT n FROM n)]) AS dst
        |    FROM users)),
        |deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY 1),
        |r0 AS (SELECT user_id, CAST(1000000 AS BIGINT) AS rank_mu FROM users)""".stripMargin
    val iters = (1 to PrIters).map { i =>
      s"""r$i AS (
         |  SELECT u.user_id,
         |    CAST(150000 + 850 * coalesce(f.inflow, 0) // 1000 AS BIGINT) AS rank_mu
         |  FROM users u LEFT JOIN (
         |    SELECT e.dst AS user_id, sum(r.rank_mu // d.degree) AS inflow
         |    FROM edges e JOIN deg d ON e.src = d.src
         |    JOIN r${i - 1} r ON r.user_id = e.src
         |    GROUP BY 1) f ON f.user_id = u.user_id)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$iters\nSELECT user_id, rank_mu FROM r$PrIters ORDER BY user_id"
  }

  /** sample_mixture_quota — DOMAIN-MIXTURE sampling, the
    * training-data curation step that balances sources: each language
    * gets an exact integer quota (floor(weight·1000) per mille of its
    * own document count), filled by the smallest-md5 rule (C163's
    * deterministic uniform sampler) WITHIN each language. One window
    * pass; reproducible across engines, runs, and cluster layouts —
    * which is the whole point of quota sampling for training mixes.
    */
  def sampleMixtureQuota(s: SparkSession, d: String): DataFrame = {
    val permille = typedLit(Map("en" -> 500L, "de" -> 800L, "fr" -> 800L,
      "es" -> 250L, "zh" -> 250L))
    val w = Window.partitionBy("lang")
      .orderBy(col("h").asc, col("doc_id").asc)
    val nl = Window.partitionBy("lang")
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string").cast("binary")).as("h"))
      .withColumn("permille", permille(col("lang")))
      .withColumn("rk", row_number().over(w))
      .withColumn("nl_cnt", count(lit(1)).over(nl))
      .withColumn("quota", expr("(nl_cnt * permille) div 1000"))
      .filter(col("rk") <= col("quota"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
        min(col("h")).as("h_min"), max(col("h")).as("h_max"))
      .orderBy("lang")
  }
  val sampleMixtureQuotaSql: String =
    """WITH ranked AS (
      |  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk,
      |    count(*) OVER (PARTITION BY lang)
      |      * CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 800
      |                  WHEN 'fr' THEN 800 WHEN 'es' THEN 250
      |                  ELSE 250 END // 1000 AS quota
      |  FROM documents)
      |SELECT lang, count(*) AS n_sampled, min(h) AS h_min, max(h) AS h_max
      |FROM ranked WHERE rk <= quota
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** agg_weighted_median — the weighted median (quantity-weighted
    * price per returnflag): sort each group by value, take the first
    * row whose cumulative weight reaches half the total — pure
    * integer/window arithmetic on exact inputs, no percentile
    * interpolation ambiguity. One window pass + one aggregate; both
    * engines walk the identical total order (value, then key).
    */
  def aggWeightedMedian(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").asc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem(s, d)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_quantity").cast("long").as("qty"))
      .withColumn("cum_w", sum(col("qty")).over(w))
      .withColumn("total_w", sum(col("qty")).over(Window.partitionBy("l_returnflag")))
      .filter(col("cum_w") * 2 >= col("total_w"))
      .groupBy("l_returnflag")
      .agg(min_by(col("l_extendedprice"),
          struct(col("cum_w"), col("l_orderkey"), col("l_linenumber")))
        .as("weighted_median"))
      .orderBy("l_returnflag")
  }
  val aggWeightedMedianSql: String =
    """SELECT l_returnflag, l_extendedprice AS weighted_median
      |FROM (
      |  SELECT l_returnflag, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY cum_w ASC, l_orderkey ASC, l_linenumber ASC) AS rn
      |  FROM (
      |    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
      |      sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_returnflag
      |        ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
      |      sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_returnflag) AS total_w
      |    FROM lineitem)
      |  WHERE cum_w * 2 >= total_w)
      |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin

  /** analytics_q10_shape — TPC-H Q10 (returned-item revenue by
    * customer): a 4-table join where the AGGREGATE keys on the
    * customer attributes, then top-20 by revenue. The plan lesson:
    * revenue = Σ price·(1−disc) accumulates as exact decimals
    * (R2), the aggregate is two-phase, and the final top-20 is
    * TakeOrderedAndProject — never a global sort.
    */
  def analyticsQ10Shape(s: SparkSession, d: String): DataFrame = {
    val rev = dec(col("l_extendedprice")) * oneMinus(col("l_discount"))
    lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsumx(rev).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }
  val analyticsQ10ShapeSql: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
      |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
      |    AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, c_custkey ASC
      |LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank_fixed" -> (graphPagerankFixed _),
    "sample_mixture_quota" -> (sampleMixtureQuota _),
    "agg_weighted_median" -> (aggWeightedMedian _),
    "analytics_q10_shape" -> (analyticsQ10Shape _))

  val oracle: Map[String, String] = Map(
    "graph_pagerank_fixed" -> graphPagerankFixedSqlFor(),
    "sample_mixture_quota" -> sampleMixtureQuotaSql,
    "agg_weighted_median" -> aggWeightedMedianSql,
    "analytics_q10_shape" -> analyticsQ10ShapeSql)
}
