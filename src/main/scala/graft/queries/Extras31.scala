package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Thirty-first wave: AQE's runtime join re-selection, parameterized
  * SQL, the NA-handling API, lag over gaps, and typed flatMapGroups.
  */
object Extras31 {

  /** join_aqe_runtime_broadcast — AQE's second adaptive join trick
    * (C165 was skew): the dim side here shrinks to a handful of rows
    * only AFTER a non-pushable md5 filter, so the STATIC planner (file
    * sizes, no stats) chooses a sort-merge join — and at runtime AQE
    * reads the actual shuffle size, demotes the exchange to a local
    * read and re-plans a broadcast hash join mid-query. At 100 TB this
    * is the difference between shuffling a fact table because the
    * planner guessed wrong and never shuffling it at all; PlanSpec
    * asserts the final adaptive plan contains the BroadcastHashJoin
    * the initial plan lacked.
    */
  def joinAqeRuntimeBroadcast(s: SparkSession, d: String): DataFrame =
    withAqeBroadcastConfs(s) {
      val out = aqeBroadcastFrame(s, d)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("o_orderpriority")
      // materialize so AQE re-plans THIS run; bounded aggregate (5
      // priorities) pinned as local rows instead of a cache() entry —
      // see joinSkewAqe for the rationale
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
        .orderBy("o_orderpriority")
    }

  /** Static broadcast off, ADAPTIVE broadcast on — the split that lets
    * the runtime convert a statically-planned SMJ once real shuffle
    * sizes are known (the production setting where the static
    * estimator cannot be trusted after selective filters).
    */
  private[graft] def withAqeBroadcastConfs[T](s: SparkSession)(body: => T): T = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> s.conf.getOption(k)).toMap
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      body
    } finally saved.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    }
  }

  /** The selective-dim join (md5 filter defeats static size estimates). */
  private[graft] def aqeBroadcastFrame(s: SparkSession, d: String): DataFrame = {
    val dim = customer(s, d)
      .filter(substring(md5(col("c_custkey").cast("string").cast("binary")), 1, 1)
        .isin("0", "1"))
      .select(col("c_custkey"))
    orders(s, d).join(dim, col("o_custkey") === col("c_custkey"))
  }
  val joinAqeRuntimeBroadcastSql: String =
    s"""SELECT o_orderpriority, count(*) AS n, ${dsumSql("o_totalprice")} AS revenue
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) IN ('0', '1')
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** sql_named_params — PARAMETERIZED SQL (`spark.sql(text, args)`,
    * Spark 4): named markers bind typed values server-side, so query
    * text never concatenates user input — the injection-safe front
    * door a query service must expose (the reference's search API
    * takes user-typed filters; C132 proved the SQL surface, this
    * proves the safe way to feed it).
    */
  def sqlNamedParams(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("g_prm_orders")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
        |FROM g_prm_orders
        |WHERE o_totalprice >= :minPrice AND o_orderstatus = :status
        |GROUP BY 1 ORDER BY 1""".stripMargin,
      Map("minPrice" -> 50000.0, "status" -> "O"))
  }
  val sqlNamedParamsSql: String =
    s"""SELECT o_orderpriority, count(*) AS n, ${dsumSql("o_totalprice")} AS revenue
       |FROM orders
       |WHERE o_totalprice >= 50000.0 AND o_orderstatus = 'O'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** na_funcs — the DataFrameNaFunctions battery: `na.fill` (typed
    * defaults per column), `na.drop` (row-wise null thresholds) and
    * `na.replace` (value remapping) over a frame with RULE-planted
    * nulls. The census proves each path: filled rows keep their count
    * with defaults, drop removes exactly the planted rows, replace
    * rewrites only the targeted values.
    */
  def naFuncs(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderstatus")).as("status_n"),
      when(col("o_orderkey") % 11 === 0, lit(null).cast("double"))
        .otherwise(col("o_totalprice")).as("price_n"))
    val filled = base.na.fill(Map("status_n" -> "X", "price_n" -> 0.0))
      .na.replace("status_n", Map("F" -> "FINISHED"))
    val dropped = base.na.drop(Seq("status_n", "price_n"))
    filled.agg(
        count(lit(1)).as("n_filled_rows"),
        count(when(col("status_n") === "X", 1)).as("n_status_default"),
        count(when(col("status_n") === "FINISHED", 1)).as("n_replaced"),
        count(when(col("price_n") === 0.0, 1)).as("n_price_default"))
      .crossJoin(dropped.agg(count(lit(1)).as("n_after_drop")))
  }
  val naFuncsSql: String =
    """SELECT count(*) AS n_filled_rows,
      |  count(*) FILTER (WHERE o_orderkey % 7 = 0) AS n_status_default,
      |  count(*) FILTER (WHERE o_orderkey % 7 <> 0 AND o_orderstatus = 'F')
      |    AS n_replaced,
      |  count(*) FILTER (WHERE o_orderkey % 11 = 0 OR o_totalprice = 0.0)
      |    AS n_price_default,
      |  count(*) FILTER (WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 0)
      |    AS n_after_drop
      |FROM orders""".stripMargin

  /** win_lag_ignore_nulls — lag with IGNORE NULLS: each purchase sees
    * the user's previous NON-NULL amount even when intermediate events
    * carry no value (planted: every 3rd purchase's value nulled). The
    * gap-jumping navigation C50 proved for last(), on the offset
    * function family.
    */
  def winLagIgnoreNulls(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_id") % 3 === 0, lit(null).cast("double"))
          .otherwise(col("value")).as("v"))
      .select(col("event_id"), col("user_id"),
        lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_value"),
        lag(col("v"), 1, null, ignoreNulls = false).over(w).as("prev_raw"))
      .orderBy("event_id")
  }
  val winLagIgnoreNullsSql: String =
    """SELECT event_id, user_id,
      |  lag(v, 1 IGNORE NULLS) OVER w AS prev_value,
      |  lag(v, 1) OVER w AS prev_raw
      |FROM (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
      |  FROM events WHERE event_type = 'purchase')
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |ORDER BY event_id""".stripMargin

  /** typed_flatmap_groups — `KeyValueGroupedDataset.flatMapGroups`:
    * the typed per-group generator (0..n output rows per group, unlike
    * mapGroups' exactly-one) — here each customer emits its top-2
    * orders by (price desc, key asc). The group's rows are sorted
    * in-memory, which is the API's honest contract: groups must fit an
    * executor (bounded here: orders per customer), and anything bigger
    * belongs in the window formulation (B20).
    */
  def typedFlatmapGroups(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (cust, rows) =>
        rows.toSeq.sortBy(r => (-r._3, r._2)).take(2).zipWithIndex
          .map { case ((_, okey, price), i) => (cust, i.toLong + 1, okey, price) }
      }
      .toDF("o_custkey", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rk")
  }
  val typedFlatmapGroupsSql: String =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      |  FROM orders)
      |WHERE rk <= 2 ORDER BY o_custkey, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_aqe_runtime_broadcast" -> (joinAqeRuntimeBroadcast _),
    "sql_named_params" -> (sqlNamedParams _),
    "na_funcs" -> (naFuncs _),
    "win_lag_ignore_nulls" -> (winLagIgnoreNulls _),
    "typed_flatmap_groups" -> (typedFlatmapGroups _))

  val oracle: Map[String, String] = Map(
    "join_aqe_runtime_broadcast" -> joinAqeRuntimeBroadcastSql,
    "sql_named_params" -> sqlNamedParamsSql,
    "na_funcs" -> naFuncsSql,
    "win_lag_ignore_nulls" -> winLagIgnoreNullsSql,
    "typed_flatmap_groups" -> typedFlatmapGroupsSql)
}
