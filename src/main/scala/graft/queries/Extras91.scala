package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Ninety-first wave: DISTINCT ON emulation, Kaplan–Meier survival,
  * and mixed-layer-depth detection.
  */
object Extras91 {

  /** sql_distinct_on_emulation — Postgres/DuckDB `DISTINCT ON (k)
    * ORDER BY k, s` (first row per key in a sort order) has no Spark
    * SQL counterpart; the scalable emulation is ONE partial-aggregable
    * min over a struct whose leading fields are the sort key — no
    * row_number window, no shuffle beyond the keyed aggregate. Here:
    * each customer's cheapest order (ties → lowest orderkey, the
    * struct's tie-break field).
    */
  def sqlDistinctOnEmulation(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(min(struct(dec(col("o_totalprice")).as("p"),
        col("o_orderkey").as("k"),
        col("o_orderdate").as("dt"))).as("first"))
      .select(col("o_custkey"), col("first.k").as("o_orderkey"),
        col("first.p").cast("double").as("cheapest_price"),
        col("first.dt").cast("timestamp_ntz").as("o_orderdate"))
      .orderBy("o_custkey")
  val sqlDistinctOnEmulationSql: String =
    """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE)
      |    AS cheapest_price,
      |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
      |FROM orders
      |ORDER BY o_custkey, CAST(o_totalprice AS DECIMAL(14,2)), o_orderkey"""
      .stripMargin

  /** stat_kaplan_meier — the Kaplan–Meier survival curve of customer
    * lifetime (days between first and last order, repeat customers,
    * no censoring): deaths-per-day collapse to the O(distinct
    * lifetimes) frame, at-risk counts are exact integer arithmetic on
    * a cumulative window, and S(t)=Π(1−d/n) runs as exp of the
    * cumulative Σln — an IEEE sum whose ACCUMULATION ORDER is fully
    * defined by the window's ORDER BY, hence bit-identical across
    * engines. The fact table is touched once.
    */
  def statKaplanMeier(s: SparkSession, d: String): DataFrame = {
    val life = orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(datediff(max(col("o_orderdate").cast("date")),
        min(col("o_orderdate").cast("date"))).as("t"))
      .filter(col("t") > 0)
    val byT = life.groupBy("t").agg(count(lit(1)).as("d"))
    val tot = life.agg(count(lit(1)).as("n0"))
    val w = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    byT.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n0") - coalesce(sum(col("d")).over(wPrev), lit(0L)))
      .withColumn("term",
        lit(1.0d) - col("d").cast("double") / col("n_risk").cast("double"))
      // the final time point has d = n_risk → term 0 → S(t) = 0; keep
      // it out of the ln (DuckDB errors on ln(0), Spark nulls)
      .withColumn("surv",
        when(col("term") === 0.0d, lit(0.0d))
          .otherwise(exp(sum(when(col("term") > 0.0d, log(col("term")))
            .otherwise(lit(0.0d))).over(w))))
      .select(col("t").cast("long").as("t_days"), col("d"), col("n_risk"),
        round(col("surv"), 6).as("s_t"))
      .orderBy("t_days")
  }
  val statKaplanMeierSql: String =
    """WITH life AS (
      |  SELECT o_custkey,
      |    date_diff('day', min(CAST(o_orderdate AS DATE)),
      |      max(CAST(o_orderdate AS DATE))) AS t
      |  FROM orders GROUP BY 1 HAVING t > 0),
      |byt AS (SELECT t, count(*) AS d FROM life GROUP BY 1),
      |tot AS (SELECT count(*) AS n0 FROM life),
      |r AS (
      |  SELECT t, d,
      |    n0 - coalesce(sum(d) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      |  FROM byt, tot)
      |SELECT CAST(t AS BIGINT) AS t_days, d, CAST(n_risk AS BIGINT) AS n_risk,
      |  round(CASE WHEN term = 0.0 THEN 0.0 ELSE
      |    exp(sum(CASE WHEN term > 0.0 THEN ln(term) ELSE 0.0 END)
      |      OVER (ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) END,
      |    6) AS s_t
      |FROM (SELECT *,
      |  1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS term FROM r)
      |ORDER BY t_days""".stripMargin

  /** ref_mixed_layer_depth — the oceanographic mixed-layer-depth
    * screen (shallowest depth where the value departs from the
    * surface value by more than a threshold): the surface value is
    * the profile's min-depth observation via one struct-min
    * aggregate, the departure test is row-local against the broadcast
    * O(profiles) frame, and the MLD is a conditional min — two keyed
    * partial-agg passes, no window over the fact, no sort.
    */
  def refMixedLayerDepth(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("user_id").as("cruise"),
        (col("event_id") % 200).as("depth_dm"), col("event_id"),
        dec(col("value")).as("v"))
    val surf = e.groupBy("cruise")
      .agg(min(struct(col("depth_dm"), col("event_id"), col("v")))
        .getField("v").as("v_surf"))
    e.join(broadcast(surf), Seq("cruise"))
      .groupBy("cruise")
      .agg(count(lit(1)).as("n_obs"), max(col("v_surf")).as("v_surf"),
        min(when(abs(col("v") - col("v_surf")) > lit(100).cast(M),
          col("depth_dm"))).as("mld_dm"))
      .filter(col("mld_dm").isNotNull)
      .select(col("cruise"), col("n_obs"),
        col("v_surf").cast("double").as("v_surf"), col("mld_dm"))
      .orderBy("cruise")
  }
  val refMixedLayerDepthSql: String =
    """WITH e AS (
      |  SELECT user_id AS cruise, event_id % 200 AS depth_dm, event_id,
      |    CAST(value AS DECIMAL(14,2)) AS v
      |  FROM events),
      |surf AS (
      |  SELECT cruise,
      |    min(struct_pack(depth_dm := depth_dm, event_id := event_id,
      |      v := v)).v AS v_surf
      |  FROM e GROUP BY 1)
      |SELECT e.cruise, count(*) AS n_obs,
      |  CAST(max(v_surf) AS DOUBLE) AS v_surf,
      |  min(CASE WHEN abs(v - v_surf) > CAST(100 AS DECIMAL(14,2))
      |    THEN depth_dm END) AS mld_dm
      |FROM e JOIN surf ON e.cruise = surf.cruise
      |GROUP BY 1 HAVING mld_dm IS NOT NULL ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_distinct_on_emulation" -> (sqlDistinctOnEmulation _),
    "stat_kaplan_meier" -> (statKaplanMeier _),
    "ref_mixed_layer_depth" -> (refMixedLayerDepth _))

  val oracle: Map[String, String] = Map(
    "sql_distinct_on_emulation" -> sqlDistinctOnEmulationSql,
    "stat_kaplan_meier" -> statKaplanMeierSql,
    "ref_mixed_layer_depth" -> refMixedLayerDepthSql)
}
