package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Eighty-third wave: Wald–Wolfowitz runs test, integer-scaled CUSUM
  * change detection, and contingency mutual information.
  */
object Extras83 {

  /** stat_runs_test — Wald–Wolfowitz runs test for randomness of the
    * daily revenue series around its median: the median is
    * percentile_disc ELEMENT selection (exact decimal), ties dropped
    * (standard), run boundaries counted by a lag over the O(days)
    * aggregate frame, and the z statistic assembled from pure integer
    * counts in one final IEEE block.
    */
  def statRunsTest(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
    val med = daily.agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY rev)").as("med"))
    val signed = daily.crossJoin(broadcast(med))
      .filter(col("rev") =!= col("med"))
      .select(col("day"), (col("rev") > col("med")).cast("long").as("sgn"))
    val w = Window.orderBy("day")
    signed
      .withColumn("brk",
        when(lag(col("sgn"), 1).over(w).isNull
          || lag(col("sgn"), 1).over(w) =!= col("sgn"), 1L).otherwise(0L))
      .agg(sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("sgn") === 0, 1L).otherwise(0L)).as("n2"),
        sum(col("brk")).as("runs"))
      .select(col("n1"), col("n2"), col("runs"),
        round((col("runs").cast("double")
          - (lit(2.0d) * col("n1") * col("n2")
            / (col("n1") + col("n2")).cast("double") + lit(1.0d)))
          / sqrt(lit(2.0d) * col("n1") * col("n2")
            * (lit(2.0d) * col("n1") * col("n2") - col("n1") - col("n2"))
            / ((col("n1") + col("n2")).cast("double")
              * (col("n1") + col("n2")).cast("double")
              * (col("n1") + col("n2") - 1).cast("double"))), 6).as("z"))
  }
  val statRunsTestSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    sum(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
      |  FROM orders GROUP BY 1),
      |med AS (
      |  SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY rev) AS med
      |  FROM daily),
      |signed AS (
      |  SELECT day, CASE WHEN rev > med THEN 1 ELSE 0 END AS sgn
      |  FROM daily, med WHERE rev <> med),
      |runs AS (
      |  SELECT sgn,
      |    CASE WHEN lag(sgn, 1) OVER (ORDER BY day) IS NULL
      |      OR lag(sgn, 1) OVER (ORDER BY day) <> sgn THEN 1 ELSE 0 END AS brk
      |  FROM signed)
      |SELECT
      |  CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |  CAST(sum(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |  CAST(sum(brk) AS BIGINT) AS runs,
      |  round((CAST(sum(brk) AS DOUBLE)
      |    - (2.0 * sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
      |         * sum(CASE WHEN sgn = 0 THEN 1 ELSE 0 END)
      |       / CAST(count(*) AS DOUBLE) + 1.0))
      |    / sqrt(2.0 * sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
      |         * sum(CASE WHEN sgn = 0 THEN 1 ELSE 0 END)
      |      * (2.0 * sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
      |           * sum(CASE WHEN sgn = 0 THEN 1 ELSE 0 END)
      |         - sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
      |         - sum(CASE WHEN sgn = 0 THEN 1 ELSE 0 END))
      |      / (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE)
      |         * CAST(count(*) - 1 AS DOUBLE))), 6) AS z
      |FROM runs""".stripMargin

  /** stat_cusum_shift — CUSUM level-shift detection per event stream
    * with the INTEGER-SCALED deviation trick: the mean-centered
    * cumulative sum Σ(x−S/n) is irrational in decimal, but n·Σx−cnt·S
    * is EXACT — every comparison (including the argmax day) happens on
    * exact decimals, and the single IEEE division back to data units
    * happens once per stream at the end. The cumulative walk runs over
    * the O(days) per-stream frame, never the fact table.
    */
  def statCusumShift(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(dec(col("value"))).cast(DecimalType(25, 2)).as("dv"),
        count(lit(1)).as("cnt"))
    val tot = daily.groupBy("event_type")
      .agg(sum(col("dv")).cast(DecimalType(25, 2)).as("s_tot"),
        sum(col("cnt")).cast(DecimalType(10, 0)).as("n_tot"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(tot), "event_type")
      .withColumn("dev", col("n_tot") * col("dv")
        - col("cnt").cast(DecimalType(10, 0)) * col("s_tot"))
      .withColumn("cusum", sum(col("dev")).over(w))
      .groupBy("event_type")
      .agg(max(col("n_tot")).as("n_tot"),
        min(struct((-abs(col("cusum"))).as("na"), col("day"))).as("pk"))
      .select(col("event_type"),
        round((-col("pk.na")).cast("double") / col("n_tot").cast("double"), 4)
          .as("max_cusum"),
        col("pk.day").cast("timestamp_ntz").as("shift_day"))
      .orderBy("event_type")
  }
  val statCusumShiftSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(value AS DECIMAL(14,2))) AS DECIMAL(25,2)) AS dv,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type, CAST(sum(dv) AS DECIMAL(25,2)) AS s_tot,
      |    CAST(sum(cnt) AS DECIMAL(10,0)) AS n_tot
      |  FROM daily GROUP BY 1),
      |c AS (
      |  SELECT daily.event_type, day, n_tot,
      |    sum(n_tot * dv - CAST(cnt AS DECIMAL(10,0)) * s_tot)
      |      OVER (PARTITION BY daily.event_type ORDER BY day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
      |  FROM daily JOIN tot ON daily.event_type = tot.event_type)
      |SELECT event_type,
      |  round(CAST(-(min(struct_pack(na := -abs(cusum), day := day)).na)
      |      AS DOUBLE) / CAST(max(n_tot) AS DOUBLE), 4) AS max_cusum,
      |  CAST(min(struct_pack(na := -abs(cusum), day := day)).day AS TIMESTAMP)
      |    AS shift_day
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** stat_mutual_info — mutual information between event stream and
    * value magnitude bucket: the contingency table is one partial-agg
    * pass (cells bounded types×buckets), margins ride a second
    * aggregate of the CELL frame (the fact is touched once), and the
    * Σ p·log term — the only order-sensitive sum — walks a
    * cell-sorted O(cells) fold on a 1-row frame. Inputs to every IEEE
    * op are exact integers.
    */
  def statMutualInfo(s: SparkSession, d: String): DataFrame = {
    val cells = events(s, d)
      .groupBy(col("event_type").as("i"),
        floor(col("value") / 100.0d).cast("long").as("j"))
      .agg(count(lit(1)).as("nij"))
    val ri = cells.groupBy("i").agg(sum(col("nij")).as("ri"))
    val cj = cells.groupBy("j").agg(sum(col("nij")).as("cj"))
    cells.join(broadcast(ri), "i").join(broadcast(cj), "j")
      .agg(sum(col("nij")).as("n"),
        count(lit(1)).as("n_cells"),
        sort_array(collect_list(struct(col("i"), col("j"), col("nij"),
          col("ri"), col("cj")))).as("cl"))
      .withColumn("mi", expr(
        """aggregate(cl, 0D, (acc, t) ->
          |  acc + CAST(t.nij AS DOUBLE) / CAST(n AS DOUBLE)
          |    * ln(CAST(t.nij AS DOUBLE) * CAST(n AS DOUBLE)
          |         / (CAST(t.ri AS DOUBLE) * CAST(t.cj AS DOUBLE))))"""
          .stripMargin))
      .select(col("n"), col("n_cells"), round(col("mi"), 6).as("mi_nats"))
  }
  val statMutualInfoSql: String =
    """WITH cells AS (
      |  SELECT event_type AS i,
      |    CAST(floor(value / 100.0) AS BIGINT) AS j, count(*) AS nij
      |  FROM events GROUP BY 1, 2),
      |ri AS (SELECT i, sum(nij) AS ri FROM cells GROUP BY 1),
      |cj AS (SELECT j, sum(nij) AS cj FROM cells GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(nij) AS BIGINT) AS n, count(*) AS n_cells,
      |    list_sort(list(struct_pack(i := cells.i, j := cells.j,
      |      nij := nij, ri := ri.ri, cj := cj.cj))) AS cl
      |  FROM cells JOIN ri ON cells.i = ri.i JOIN cj ON cells.j = cj.j)
      |SELECT n, n_cells,
      |  round(list_reduce(list_prepend(0.0, list_transform(cl, t ->
      |    CAST(t.nij AS DOUBLE) / CAST(n AS DOUBLE)
      |      * ln(CAST(t.nij AS DOUBLE) * CAST(n AS DOUBLE)
      |           / (CAST(t.ri AS DOUBLE) * CAST(t.cj AS DOUBLE))))),
      |    (x, y) -> x + y), 6) AS mi_nats
      |FROM tot""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_runs_test" -> (statRunsTest _),
    "stat_cusum_shift" -> (statCusumShift _),
    "stat_mutual_info" -> (statMutualInfo _))

  val oracle: Map[String, String] = Map(
    "stat_runs_test" -> statRunsTestSql,
    "stat_cusum_shift" -> statCusumShiftSql,
    "stat_mutual_info" -> statMutualInfoSql)
}
