package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.Tables._

/** Per-user running (count, exact-integer cents) fold on the Spark-4
  * `transformWithState` API — state is an explicit, named,
  * individually-evolvable [[ValueState]] on the RocksDB store. The
  * fold is order-insensitive (sums), so undefined iterator order
  * cannot leak into results.
  */
private[queries] class RunningAggProcessor
    extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)](
      "agg", Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    val (n0, c0) = if (st.exists()) st.get() else (0L, 0L)
    var n = n0; var c = c0
    rows.foreach { r => n += 1; c += math.round(r._2 * 100) }
    st.update((n, c))
    Iterator((user, n, c / 100.0))
  }
}

/** Twentieth wave: the Spark-4 `transformWithState` arbitrary-state
  * API — with a DuckDB oracle.
  */
object Extras20 {

  /** stream_transform_with_state — `transformWithState` (Spark 4's
    * successor to `flatMapGroupsWithState`, C15's modern twin): state
    * lives in NAMED, typed, independently-evolvable state variables
    * (ValueState/ListState/MapState with optional TTL) on the RocksDB
    * state store — the API built for state-schema evolution and
    * per-variable TTL at production scale, where fmgws's single opaque
    * state blob cannot evolve. The fold itself is the C15 contract
    * (per-user count + exact cents), so the same oracle grades both —
    * old and new API provably agree. The RocksDB provider requirement
    * is scoped to this query and restored after.
    */
  def streamTransformWithState(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val sch = Streaming.rawSchema(s, d)
      val dir = Streaming.stageDir(s, d, copies = 1, sentinels = false)
      val typed = s.readStream.schema(sch).parquet(dir)
        .select(col("user_id"), col("value"))
        .as[(Long, Double)]
      val updated = typed
        .groupByKey(_._1)
        .transformWithState(new RunningAggProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n_events", "sum_value")
      Streaming.runToBatch(s, updated, "update")
        .orderBy("user_id")
    } finally {
      prev match {
        case Some(p) => s.conf.set(key, p)
        case None => s.conf.unset(key)
      }
    }
  }
  val streamTransformWithStateSql: String =
    s"""SELECT user_id, count(*) AS n_events, ${dsumSql("value")} AS sum_value
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_transform_with_state" -> (streamTransformWithState _),
  )

  val oracle: Map[String, String] = Map(
    "stream_transform_with_state" -> streamTransformWithStateSql,
  )
}
