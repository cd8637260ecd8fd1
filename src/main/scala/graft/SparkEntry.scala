package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.aggHashGroupby(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.Windows.queries ++
    graft.queries.Scalars.queries ++
    graft.queries.LlmOps.queries ++
    graft.queries.Streaming.queries ++
    graft.queries.RefDsl.queries ++
    graft.queries.TextOps.queries ++
    graft.queries.DedupExtras.queries ++
    graft.queries.Multimodal.queries ++
    graft.queries.RefSurface.queries ++
    graft.queries.Analytics.queries ++
    graft.queries.Extras2.queries ++
    graft.queries.Extras3.queries ++
    graft.queries.Extras4.queries ++
    graft.queries.Extras5.queries ++
    graft.queries.Extras6.queries ++
    graft.queries.Extras7.queries ++
    graft.queries.Extras8.queries ++
    graft.queries.Extras9.queries ++
    graft.queries.Extras10.queries ++
    graft.queries.Extras11.queries ++
    graft.queries.Extras12.queries ++
    graft.queries.Extras13.queries ++
    graft.queries.Extras14.queries ++
    graft.queries.Extras15.queries ++
    graft.queries.Extras16.queries ++
    graft.queries.Extras17.queries ++
    graft.queries.Extras18.queries ++
    graft.queries.Extras19.queries ++
    graft.queries.Extras20.queries ++
    graft.queries.Extras21.queries ++
    graft.queries.Extras22.queries ++
    graft.queries.Extras23.queries ++
    graft.queries.Extras24.queries ++
    graft.queries.Extras25.queries ++
    graft.queries.Extras26.queries ++
    graft.queries.Extras27.queries ++
    graft.queries.Extras28.queries ++
    graft.queries.Extras29.queries ++
    graft.queries.Extras30.queries ++
    graft.queries.Extras31.queries ++
    graft.queries.Extras32.queries ++
    graft.queries.Extras33.queries ++
    graft.queries.Extras34.queries ++
    graft.queries.Extras35.queries ++
    graft.queries.Extras36.queries ++
    graft.queries.Extras37.queries ++
    graft.queries.Extras38.queries ++
    graft.queries.Extras39.queries ++
    graft.queries.Extras40.queries ++
    graft.queries.Extras41.queries ++
    graft.queries.Extras42.queries ++
    graft.queries.Extras43.queries ++
    graft.queries.Extras44.queries ++
    graft.queries.Extras45.queries ++
    graft.queries.Extras46.queries ++
    graft.queries.Extras47.queries ++
    graft.queries.Extras48.queries ++
    graft.queries.Extras49.queries ++
    graft.queries.Extras50.queries ++
    graft.queries.Extras51.queries ++
    graft.queries.Pipeline.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
    graft.queries.Windows.oracle ++
    graft.queries.Scalars.oracle ++
    graft.queries.LlmOps.oracle ++
    graft.queries.Streaming.oracle ++
    graft.queries.RefDsl.oracle ++
    graft.queries.TextOps.oracle ++
    graft.queries.DedupExtras.oracle ++
    graft.queries.Multimodal.oracle ++
    graft.queries.RefSurface.oracle ++
    graft.queries.Analytics.oracle ++
    graft.queries.Extras2.oracle ++
    graft.queries.Extras3.oracle ++
    graft.queries.Extras4.oracle ++
    graft.queries.Extras5.oracle ++
    graft.queries.Extras6.oracle ++
    graft.queries.Extras7.oracle ++
    graft.queries.Extras8.oracle ++
    graft.queries.Extras9.oracle ++
    graft.queries.Extras10.oracle ++
    graft.queries.Extras11.oracle ++
    graft.queries.Extras12.oracle ++
    graft.queries.Extras13.oracle ++
    graft.queries.Extras14.oracle ++
    graft.queries.Extras15.oracle ++
    graft.queries.Extras16.oracle ++
    graft.queries.Extras17.oracle ++
    graft.queries.Extras18.oracle ++
    graft.queries.Extras19.oracle ++
    graft.queries.Extras20.oracle ++
    graft.queries.Extras21.oracle ++
    graft.queries.Extras22.oracle ++
    graft.queries.Extras23.oracle ++
    graft.queries.Extras24.oracle ++
    graft.queries.Extras25.oracle ++
    graft.queries.Extras26.oracle ++
    graft.queries.Extras27.oracle ++
    graft.queries.Extras28.oracle ++
    graft.queries.Extras29.oracle ++
    graft.queries.Extras30.oracle ++
    graft.queries.Extras31.oracle ++
    graft.queries.Extras32.oracle ++
    graft.queries.Extras33.oracle ++
    graft.queries.Extras34.oracle ++
    graft.queries.Extras35.oracle ++
    graft.queries.Extras36.oracle ++
    graft.queries.Extras37.oracle ++
    graft.queries.Extras38.oracle ++
    graft.queries.Extras39.oracle ++
    graft.queries.Extras40.oracle ++
    graft.queries.Extras41.oracle ++
    graft.queries.Extras42.oracle ++
    graft.queries.Extras43.oracle ++
    graft.queries.Extras44.oracle ++
    graft.queries.Extras45.oracle ++
    graft.queries.Extras46.oracle ++
    graft.queries.Extras47.oracle ++
    graft.queries.Extras48.oracle ++
    graft.queries.Extras49.oracle ++
    graft.queries.Extras50.oracle ++
    graft.queries.Extras51.oracle ++
    graft.queries.Pipeline.oracle
}
