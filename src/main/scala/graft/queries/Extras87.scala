package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Eighty-seventh wave: Hill tail-index estimation, week-over-week
  * alignment, and deterministic random walks over an edge table.
  */
object Extras87 {

  /** stat_hill_tail — the Hill estimator of the document-length tail
    * index (the heavy-tail screen a corpus-sizing model needs): the
    * top-(k+1) order statistics arrive through a distributed
    * TakeOrdered (exact, deterministic via the (len, id) tie-break —
    * never a global sort), and the Σln(x_i/x_k) term — the only
    * order-sensitive IEEE sum — folds over the k-element sorted list
    * on a 1-row frame. Estimator inputs are exact integers.
    */
  def statHillTail(s: SparkSession, d: String): DataFrame = {
    val k = 200
    val top = documents(s, d).select(col("n_chars"), col("doc_id"))
      .orderBy(col("n_chars").desc, col("doc_id")).limit(k + 1)
    top
      .agg(sort_array(collect_list(struct(col("n_chars"), col("doc_id"))),
        asc = false).as("tl"))
      .select(
        lit(k.toLong).as("k"),
        element_at(col("tl"), k + 1).getField("n_chars").as("x_k"),
        round(lit(k.toDouble) / expr(
          s"""aggregate(slice(tl, 1, $k), 0D, (acc, t) ->
             |  acc + ln(CAST(t.n_chars AS DOUBLE)
             |           / CAST(tl[${k}].n_chars AS DOUBLE)))""".stripMargin),
          6).as("hill_alpha"))
  }
  val statHillTailSql: String =
    """WITH top AS (
      |  SELECT n_chars, doc_id FROM documents
      |  ORDER BY n_chars DESC, doc_id LIMIT 201),
      |l AS (
      |  SELECT list_reverse(list_sort(list(struct_pack(
      |    n_chars := n_chars, doc_id := doc_id)))) AS tl
      |  FROM top)
      |SELECT CAST(200 AS BIGINT) AS k,
      |  tl[201].n_chars AS x_k,
      |  round(200.0 / list_reduce(list_prepend(0.0,
      |    list_transform(tl[1:200], t ->
      |      ln(CAST(t.n_chars AS DOUBLE) / CAST(tl[201].n_chars AS DOUBLE)))),
      |    (a, b) -> a + b), 6) AS hill_alpha
      |FROM l""".stripMargin

  /** time_wow_align — week-over-week change aligned by day-of-week
    * (the seasonality-safe growth readout): daily exact-decimal
    * revenue, the 7-row lag rides the O(days) aggregate frame, and
    * the percent change is one IEEE block per row. Rows without a
    * prior-week partner are reported with NULL change, not dropped.
    */
  def timeWowAlign(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
    val w = Window.orderBy("day")
    daily
      .withColumn("prev", lag(col("rev"), 7).over(w))
      .select(col("day").cast("timestamp_ntz").as("day"),
        col("rev").cast("double").as("rev"),
        col("prev").cast("double").as("rev_prev_week"),
        round((col("rev") - col("prev")).cast("double")
          / col("prev").cast("double") * 100.0d, 6).as("wow_pct"))
      .orderBy("day")
  }
  val timeWowAlignSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    sum(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
      |  FROM orders GROUP BY 1),
      |l AS (
      |  SELECT day, rev, lag(rev, 7) OVER (ORDER BY day) AS prev
      |  FROM daily)
      |SELECT CAST(day AS TIMESTAMP) AS day,
      |  CAST(rev AS DOUBLE) AS rev,
      |  CAST(prev AS DOUBLE) AS rev_prev_week,
      |  round(CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE) * 100.0, 6)
      |    AS wow_pct
      |FROM l ORDER BY day""".stripMargin

  /** graph_random_walk — 4-step deterministic "random" walks from
    * every vertex over the C370 edge TABLE (neighbors resolved by
    * join, not formula — the shape a real graph requires): per-vertex
    * neighbor lists get stable indices (row_number per src over the
    * O(E) frame), each step picks index hash(v, step) % degree and is
    * one keyed join, EAGERLY MATERIALIZED per step (the C370/C386
    * lineage rule). Output: the arrival-count histogram — how many
    * endpoints absorb 1, 2, … walks — bounded by max in-degree⁴.
    */
  def graphRandomWalk(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d).select(col("user_id")).distinct()
    val n = users.count()
    val edges = users.select(col("user_id").as("src"),
        explode(array(
          (col("user_id") + 1) % n,
          (col("user_id") + 2) % n,
          (col("user_id") * 7 + 3) % n)).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val wIdx = Window.partitionBy("src").orderBy("dst")
    val indexed = edges
      .withColumn("idx", row_number().over(wIdx).cast("long") - 1L)
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
      .localCheckpoint(true)
    var walk = users.select(col("user_id").as("v0"), col("user_id").as("v"))
    for (step <- 1 to 4) {
      walk = walk
        .join(indexed, walk("v") === indexed("src"))
        .filter(pmod(col("v") * 2654435761L + lit(step.toLong * 97L),
          col("deg")) === col("idx"))
        .select(col("v0"), col("dst").as("v"))
        .localCheckpoint(true)
    }
    walk.groupBy("v").agg(count(lit(1)).as("n_arrivals"))
      .groupBy("n_arrivals").agg(count(lit(1)).as("n_endpoints"))
      .orderBy("n_arrivals")
  }
  val graphRandomWalkSql: String = {
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
        |indexed AS MATERIALIZED (
        |  SELECT src, dst,
        |    row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
        |    count(*) OVER (PARTITION BY src) AS deg
        |  FROM edges),
        |w0 AS MATERIALIZED (SELECT user_id AS v0, user_id AS v FROM users)"""
        .stripMargin
    val steps = (1 to 4).map { step =>
      s"""w$step AS MATERIALIZED (
         |  SELECT v0, dst AS v FROM w${step - 1} JOIN indexed
         |    ON w${step - 1}.v = indexed.src
         |  WHERE (w${step - 1}.v * 2654435761 + ${step * 97}) % deg = idx)"""
        .stripMargin
    }.mkString(",\n", ",\n", "")
    base + steps +
      """
        |SELECT n_arrivals, count(*) AS n_endpoints FROM (
        |  SELECT v, count(*) AS n_arrivals FROM w4 GROUP BY 1)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_hill_tail" -> (statHillTail _),
    "time_wow_align" -> (timeWowAlign _),
    "graph_random_walk" -> (graphRandomWalk _))

  val oracle: Map[String, String] = Map(
    "stat_hill_tail" -> statHillTailSql,
    "time_wow_align" -> timeWowAlignSql,
    "graph_random_walk" -> graphRandomWalkSql)
}
