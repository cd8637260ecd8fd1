package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** 104th wave — partition-quality scoring for the LPA communities
  * (Newman modularity, exact-integer formulation) and Chatterjee's ξ
  * rank correlation (the modern "does x predict y at all" statistic).
  */
object Extras104 {

  /** graph_modularity_score — NEWMAN MODULARITY Q of the partition
    * [[Extras101.graphLabelPropagation]] produces: the standard "is
    * this community structure better than chance" score (Newman &
    * Girvan 2004). Directed-double-count convention over the
    * symmetrized edge set (every undirected edge appears twice, so
    * M = Σ degrees): Q = Σ_c (E_c/M − (D_c/M)²) with E_c the directed
    * edges inside community c and D_c its degree mass — rewritten as
    * ONE exact integer expression Q = (M·ΣE_c − ΣD_c²) / M², so no
    * per-community float summation order exists; the only IEEE op is
    * the final division of two exact longs (≤ 8·10⁷ here; at edge
    * counts beyond 2⁵³ the factors would need DECIMAL(38,0), noted for
    * the 100 TB reader). Labels broadcast into the edge stream (the
    * label table is O(users), edges are the big side), two
    * aggregations total. The oracle reuses the EXACT same unrolled-CTE
    * label computation ([[Extras101.lpaCtePrefix]]) — the two engines
    * cannot score different partitions.
    */
  def graphModularityScore(s: SparkSession, d: String): DataFrame = {
    val edges = Extras101.lpaEdges(s, d)
    val labels = Extras101.lpaLabels(s, d) // staged parquet: cheap re-read
    val lsrc = labels.select(col("user_id").as("src"), col("lbl").as("cs"))
    val ldst = labels.select(col("user_id").as("dst"), col("lbl").as("cd"))
    val ew = edges.join(broadcast(lsrc), "src").join(broadcast(ldst), "dst")
      .agg(count(lit(1)).as("m_directed"),
        sum(when(col("cs") === col("cd"), 1L).otherwise(0L)).as("e_within"))
    val sq = edges.join(broadcast(lsrc), "src")
      .groupBy("cs").agg(count(lit(1)).as("dc"))
      .agg(sum(col("dc") * col("dc")).as("sum_deg_sq"))
    ew.crossJoin(sq)
      .select(col("m_directed"), col("e_within"), col("sum_deg_sq"),
        round((col("m_directed") * col("e_within") - col("sum_deg_sq"))
            .cast("double")
          / (col("m_directed") * col("m_directed")).cast("double"), 6)
          .as("q"))
  }
  val graphModularityScoreSql: String =
    s"""${Extras101.lpaCtePrefix},
       |lab AS (SELECT user_id, lbl FROM l${Extras101.LpaRounds}),
       |ew AS (
       |  SELECT CAST(count(*) AS BIGINT) AS m_directed,
       |    CAST(sum(CASE WHEN ls.lbl = ld.lbl THEN 1 ELSE 0 END) AS BIGINT)
       |      AS e_within
       |  FROM edges e
       |  JOIN lab ls ON ls.user_id = e.src
       |  JOIN lab ld ON ld.user_id = e.dst),
       |dc AS (
       |  SELECT ls.lbl, CAST(count(*) AS BIGINT) AS dcnt
       |  FROM edges e JOIN lab ls ON ls.user_id = e.src GROUP BY 1),
       |sq AS (SELECT CAST(sum(dcnt * dcnt) AS BIGINT) AS sum_deg_sq FROM dc)
       |SELECT m_directed, e_within, sum_deg_sq,
       |  round(CAST(m_directed * e_within - sum_deg_sq AS DOUBLE)
       |    / CAST(m_directed * m_directed AS DOUBLE), 6) AS q
       |FROM ew, sq""".stripMargin

  /** stat_xi_correlation — CHATTERJEE'S ξ (JASA 2020), the modern rank
    * correlation that detects ARBITRARY functional dependence (not
    * just monotone like Spearman/Kendall): per nation, does order date
    * predict order price? Ties-robust formulation, all in exact
    * integers: r_i = #{y_j ≤ y_i} and l_i = #{y_j ≥ y_i} are
    * peers-inclusive cumulative counts (the default RANGE window frame
    * in BOTH engines), Σ|r_{i+1} − r_i| walks the x-order (date, then
    * order key — a total order, so the walk is deterministic), and
    * ξ = 1 − n·Σ|Δr| / (2·Σ l(n−l)) divides two exact longs once.
    * Windows partition by nation — bounded by the 25-nation dimension;
    * at true corpus scale the per-nation rank pass would ride
    * GlobalRank's range-partitioned two-pass instead of a single
    * partition, same integers out. ξ ≈ 0 ⇒ independent, ξ → 1 ⇒ y is
    * a measurable function of x; date does not determine price, so
    * this also pins near-zero-but-deterministic output.
    */
  def statXiCorrelation(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .join(broadcast(customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
    val wy = Window.partitionBy("nation").orderBy(col("o_totalprice").asc)
    val wyd = Window.partitionBy("nation").orderBy(col("o_totalprice").desc)
    val wn = Window.partitionBy("nation")
    val wx = Window.partitionBy("nation")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val u = base
      .withColumn("r", count(lit(1)).over(wy))
      .withColumn("l", count(lit(1)).over(wyd))
      .withColumn("nn", count(lit(1)).over(wn))
      .withColumn("rprev", lag(col("r"), 1).over(wx))
    u.groupBy("nation")
      .agg(count(lit(1)).as("n"),
        sum(abs(col("r") - col("rprev"))).as("sd"),
        sum(col("l") * (col("nn") - col("l"))).as("dn"))
      .select(col("nation"), col("n"),
        round(lit(1.0) - (col("n") * col("sd")).cast("double")
          / (lit(2) * col("dn")).cast("double"), 6).as("xi"))
      .orderBy("nation")
  }
  val statXiCorrelationSql: String =
    """WITH base AS (
      |  SELECT n.n_name AS nation, o.o_orderkey, o.o_orderdate,
      |    o.o_totalprice
      |  FROM orders o
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n ON n.n_nationkey = c.c_nationkey),
      |t AS (
      |  SELECT nation, o_orderkey, o_orderdate,
      |    count(*) OVER (PARTITION BY nation ORDER BY o_totalprice ASC) AS r,
      |    count(*) OVER (PARTITION BY nation ORDER BY o_totalprice DESC) AS l,
      |    count(*) OVER (PARTITION BY nation) AS nn
      |  FROM base),
      |u AS (
      |  SELECT nation, r, l, nn,
      |    lag(r) OVER (PARTITION BY nation
      |      ORDER BY o_orderdate ASC, o_orderkey ASC) AS rprev
      |  FROM t),
      |a AS (
      |  SELECT nation, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(abs(r - rprev)) AS BIGINT) AS sd,
      |    CAST(sum(l * (nn - l)) AS BIGINT) AS dn
      |  FROM u GROUP BY 1)
      |SELECT nation, n,
      |  round(1.0 - CAST(n * sd AS DOUBLE) / CAST(2 * dn AS DOUBLE), 6) AS xi
      |FROM a ORDER BY nation""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_modularity_score" -> (graphModularityScore _),
    "stat_xi_correlation" -> (statXiCorrelation _))

  val oracle: Map[String, String] = Map(
    "graph_modularity_score" -> graphModularityScoreSql,
    "stat_xi_correlation" -> statXiCorrelationSql)
}
