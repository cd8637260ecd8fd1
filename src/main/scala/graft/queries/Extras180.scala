package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 80 (C724–C727): interval algebra + operations-research
  * closed forms — Allen's 13-relation census, the newsvendor critical
  * fractile, EOQ, and Cochran's sample-size formula.
  *
  * Shared discipline: interval pairs come from a PER-CUSTOMER
  * equi-join (bounded fan-out per key, never a global interval θ
  * join); quantile order statistics are exact histogram prefix
  * positions; every OR closed form is a final double over exact
  * integer/decimal sums.
  */
object Extras180 {

  /** C724 join_interval_allen — the Allen interval-relation census
    * over same-customer order pairs (interval = an order's [first,
    * last] lineitem ship-day): classify each pair into the 13
    * relations (before/meets/overlaps/starts/during/finishes + the 6
    * inverses + equals) with one deterministic CASE chain, count per
    * relation. The temporal-join taxonomy row: which relation
    * dominates tells a pipeline which interval-join algorithm its
    * data actually needs.
    */
  def joinIntervalAllen(s: SparkSession, d: String): DataFrame = {
    val iv = lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(min(date_trunc("day", col("l_shipdate"))).as("s"),
        max(date_trunc("day", col("l_shipdate"))).as("e"))
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        Seq("l_orderkey"))
    val pairs = iv.as("a")
      .join(iv.as("b"), expr("a.o_custkey = b.o_custkey AND a.l_orderkey < b.l_orderkey"))
    val rel = expr(
      """CASE
        |  WHEN a.s = b.s AND a.e = b.e THEN 'equals'
        |  WHEN a.e < b.s THEN 'before'
        |  WHEN b.e < a.s THEN 'after'
        |  WHEN a.e = b.s THEN 'meets'
        |  WHEN b.e = a.s THEN 'met_by'
        |  WHEN a.s = b.s AND a.e < b.e THEN 'starts'
        |  WHEN a.s = b.s AND a.e > b.e THEN 'started_by'
        |  WHEN a.e = b.e AND a.s > b.s THEN 'finishes'
        |  WHEN a.e = b.e AND a.s < b.s THEN 'finished_by'
        |  WHEN a.s > b.s AND a.e < b.e THEN 'during'
        |  WHEN a.s < b.s AND a.e > b.e THEN 'contains'
        |  WHEN a.s < b.s AND a.e >= b.s AND a.e < b.e THEN 'overlaps'
        |  ELSE 'overlapped_by' END""".stripMargin)
    pairs.select(rel.as("relation"))
      .groupBy("relation").agg(count(lit(1)).cast("long").as("n_pairs"))
      .orderBy("relation")
  }
  val joinIntervalAllenSql: String =
    """WITH iv AS (
      |  SELECT l.l_orderkey, o.o_custkey,
      |    min(date_trunc('day', l.l_shipdate)) AS s,
      |    max(date_trunc('day', l.l_shipdate)) AS e
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.s AS a_s, a.e AS a_e, b.s AS b_s, b.e AS b_e
      |  FROM iv a JOIN iv b
      |    ON a.o_custkey = b.o_custkey AND a.l_orderkey < b.l_orderkey),
      |rel AS (
      |  SELECT CASE
      |    WHEN a_s = b_s AND a_e = b_e THEN 'equals'
      |    WHEN a_e < b_s THEN 'before'
      |    WHEN b_e < a_s THEN 'after'
      |    WHEN a_e = b_s THEN 'meets'
      |    WHEN b_e = a_s THEN 'met_by'
      |    WHEN a_s = b_s AND a_e < b_e THEN 'starts'
      |    WHEN a_s = b_s AND a_e > b_e THEN 'started_by'
      |    WHEN a_e = b_e AND a_s > b_s THEN 'finishes'
      |    WHEN a_e = b_e AND a_s < b_s THEN 'finished_by'
      |    WHEN a_s > b_s AND a_e < b_e THEN 'during'
      |    WHEN a_s < b_s AND a_e > b_e THEN 'contains'
      |    WHEN a_s < b_s AND a_e >= b_s AND a_e < b_e THEN 'overlaps'
      |    ELSE 'overlapped_by' END AS relation
      |  FROM pairs)
      |SELECT relation, CAST(count(*) AS BIGINT) AS n_pairs
      |FROM rel GROUP BY 1 ORDER BY 1""".stripMargin

  /** C725 analytics_newsvendor — the newsvendor order quantity at the
    * critical fractile cu/(cu+co) = 3/(3+1) = 0.75 for the top-5
    * parts by total quantity: q* = the smallest daily demand whose
    * exact cumulative day count reaches ⌈0.75·n_days⌉ (histogram
    * prefix order statistic, per part). The canonical
    * stock-under-uncertainty closed form.
    */
  def analyticsNewsvendor(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(col("l_partkey"), date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("q"))
    val top = daily.groupBy("l_partkey")
      .agg(sum(col("q")).cast("long").as("total_q"), count(lit(1)).cast("long").as("n_days"))
      .orderBy(col("total_q").desc, col("l_partkey").asc).limit(5)
    val hist = daily.join(broadcast(top.select("l_partkey")), Seq("l_partkey"))
      .groupBy("l_partkey", "q").agg(count(lit(1)).cast("long").as("g"))
    val wp = Window.partitionBy("l_partkey").orderBy("q")
      .rowsBetween(Window.unboundedPreceding, 0)
    hist.withColumn("cl", sum(col("g")).over(wp))
      .join(broadcast(top), Seq("l_partkey"))
      .groupBy(col("l_partkey"), col("total_q"), col("n_days"))
      .agg(min(expr("CASE WHEN 4 * cl >= 3 * n_days THEN q END")).as("q_star"))
      .selectExpr("l_partkey", "n_days", "total_q", "q_star",
        "round(CAST(q_star AS DOUBLE) * n_days / total_q, 4) AS q_star_vs_mean")
      .orderBy(col("total_q").desc, col("l_partkey").asc)
  }
  val analyticsNewsvendorSql: String =
    """WITH daily AS (
      |  SELECT l_partkey, date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2),
      |top5 AS (
      |  SELECT l_partkey, CAST(sum(q) AS BIGINT) AS total_q,
      |    CAST(count(*) AS BIGINT) AS n_days
      |  FROM daily GROUP BY 1 ORDER BY total_q DESC, l_partkey LIMIT 5),
      |hist AS (
      |  SELECT d.l_partkey, d.q, CAST(count(*) AS BIGINT) AS g
      |  FROM daily d JOIN top5 t ON t.l_partkey = d.l_partkey
      |  GROUP BY 1, 2),
      |wcl AS (
      |  SELECT l_partkey, q,
      |    CAST(sum(g) OVER (PARTITION BY l_partkey ORDER BY q
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cl
      |  FROM hist)
      |SELECT w.l_partkey, t.n_days, t.total_q,
      |  min(CASE WHEN 4 * w.cl >= 3 * t.n_days THEN w.q END) AS q_star,
      |  round(CAST(min(CASE WHEN 4 * w.cl >= 3 * t.n_days THEN w.q END) AS DOUBLE)
      |    * t.n_days / t.total_q, 4) AS q_star_vs_mean
      |FROM wcl w JOIN top5 t ON t.l_partkey = w.l_partkey
      |GROUP BY 1, 2, 3 ORDER BY t.total_q DESC, w.l_partkey""".stripMargin

  /** C726 analytics_eoq — the economic order quantity
    * √(2·D·K/h) per brand: D = mean annual demand (total quantity
    * over the exact day span, scaled to 365 days), K = 100 fixed
    * order cost, h = 20% of the brand's exact mean unit price.
    * Top-10 brands by demand; all inputs exact sums, one sqrt at the
    * end.
    */
  def analyticsEoq(s: SparkSession, d: String): DataFrame = {
    val span = lineitem(s, d).agg(
      (datediff(max(col("l_shipdate")), min(col("l_shipdate"))) + 1).cast("long").as("days"))
    lineitem(s, d)
      .join(part(s, d).select(col("p_partkey").as("l_partkey"), col("p_brand")), Seq("l_partkey"))
      .groupBy("p_brand")
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).cast("long").as("tq"),
        sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("decimal(38,0)").as("sc"),
        count(lit(1)).cast("long").as("n"))
      .crossJoin(broadcast(span))
      .selectExpr("p_brand", "tq", "days",
        "CAST(tq AS DOUBLE) * 365 / days AS annual_d",
        "CAST(sc AS DOUBLE) / 100 / tq AS unit_price")
      .selectExpr("p_brand", "round(annual_d, 2) AS annual_demand",
        "round(unit_price, 4) AS unit_price",
        "round(sqrt(2 * annual_d * 100 / (0.2 * unit_price)), 2) AS eoq")
      .orderBy(col("annual_demand").desc, col("p_brand").asc).limit(10)
  }
  val analyticsEoqSql: String =
    """WITH span AS (
      |  SELECT CAST(date_diff('day', min(l_shipdate), max(l_shipdate)) + 1 AS BIGINT) AS days
      |  FROM lineitem),
      |g AS (
      |  SELECT p.p_brand, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS tq,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sc
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1),
      |m AS (
      |  SELECT p_brand, tq, s.days,
      |    CAST(tq AS DOUBLE) * 365 / s.days AS annual_d,
      |    CAST(sc AS DOUBLE) / 100 / tq AS unit_price
      |  FROM g, span s)
      |SELECT p_brand, round(annual_d, 2) AS annual_demand,
      |  round(unit_price, 4) AS unit_price,
      |  round(sqrt(2 * annual_d * 100 / (0.2 * unit_price)), 2) AS eoq
      |FROM m ORDER BY annual_demand DESC, p_brand LIMIT 10""".stripMargin

  /** C727 sample_cochran_size — Cochran's required sample size for a
    * ±2% margin on each source's english share at 95%:
    * n₀ = z²p̂(1−p̂)/e², then the finite-population correction
    * n = n₀/(1 + (n₀−1)/N). The "how many docs must I label" planning
    * row; exact counts in, one closed form out. Top-5 sources by N,
    * R1-ordered.
    */
  def sampleCochranSize(s: SparkSession, d: String): DataFrame = {
    documents(s, d).groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_pop"),
        sum(expr("CASE WHEN lang = 'en' THEN 1L ELSE 0L END")).cast("long").as("x"))
      .orderBy(col("n_pop").desc, col("source").asc).limit(5)
      .selectExpr("source", "n_pop",
        "CAST(x AS DOUBLE) / n_pop AS p")
      .selectExpr("source", "n_pop", "round(p, 6) AS p_hat",
        "3.8416 * p * (1 - p) / 0.0004 AS n0")
      .selectExpr("source", "n_pop", "p_hat",
        "round(n0, 2) AS n0",
        "round(n0 / (1 + (n0 - 1) / n_pop), 2) AS n_fpc")
      .orderBy(col("n_pop").desc, col("source").asc)
  }
  val sampleCochranSizeSql: String =
    """WITH src AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_pop,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS x
      |  FROM documents GROUP BY 1
      |  ORDER BY n_pop DESC, source LIMIT 5),
      |p AS (SELECT source, n_pop, CAST(x AS DOUBLE) / n_pop AS p FROM src),
      |m AS (SELECT source, n_pop, round(p, 6) AS p_hat,
      |  3.8416 * p * (1 - p) / 0.0004 AS n0 FROM p)
      |SELECT source, n_pop, p_hat, round(n0, 2) AS n0,
      |  round(n0 / (1 + (n0 - 1) / n_pop), 2) AS n_fpc
      |FROM m ORDER BY n_pop DESC, source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_interval_allen" -> (joinIntervalAllen _),
    "analytics_newsvendor" -> (analyticsNewsvendor _),
    "analytics_eoq" -> (analyticsEoq _),
    "sample_cochran_size" -> (sampleCochranSize _),
  )

  val oracle: Map[String, String] = Map(
    "join_interval_allen" -> joinIntervalAllenSql,
    "analytics_newsvendor" -> analyticsNewsvendorSql,
    "analytics_eoq" -> analyticsEoqSql,
    "sample_cochran_size" -> sampleCochranSizeSql,
  )
}
