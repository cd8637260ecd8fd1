package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Ninety-fourth wave: sign-bit embedding quantization, repeat-purchase
  * intervals, and water-mass classification.
  */
object Extras94 {

  /** embed_binary_quantize — 1-bit/dim sign quantization of the 64-dim
    * embeddings into ONE 64-bit word per vector (the binary-embedding
    * compression every billion-scale ANN index ships): the word is an
    * exact integer Σ 2^i·[x_i>0] built in a single partial-agg pass,
    * LSH buckets are the high word's top byte (pure shift), and the
    * intra-bucket mean Hamming distance — computed with bit_count(a⊕b)
    * on the bucket-keyed pair join — certifies bucket coherence.
    * The 64 bits split across TWO 32-bit words so no sum ever touches
    * the int64 sign bit (bit 63 wraps negative in Spark and promotes
    * DuckDB's sum to HUGEINT — representations would diverge).
    * Everything is exact integer arithmetic end to end.
    */
  def embedBinaryQuantize(s: SparkSession, d: String): DataFrame = {
    val words = embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos"),
        when(col("col") > 0.0f, lit(1L)).otherwise(lit(0L)).as("bit"))
      .groupBy("vec_id")
      .agg(
        sum(when(col("pos") < 32,
          col("bit") * expr("shiftleft(1L, CAST(pos AS INT))"))
          .otherwise(0L)).as("lo"),
        sum(when(col("pos") >= 32,
          col("bit") * expr("shiftleft(1L, CAST(pos - 32 AS INT))"))
          .otherwise(0L)).as("hi"))
      .withColumn("bucket", shiftright(col("hi"), 24).bitwiseAND(lit(255L)))
    val pairs = words.select(col("bucket"), col("vec_id").as("ia"),
        col("lo").as("la"), col("hi").as("ha"))
      .join(words.select(col("bucket"), col("vec_id").as("ib"),
        col("lo").as("lb"), col("hi").as("hb")), "bucket")
      .filter(col("ia") < col("ib"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"),
        sum((bit_count(col("la").bitwiseXOR(col("lb")))
          + bit_count(col("ha").bitwiseXOR(col("hb")))).cast("long"))
          .as("ham_sum"))
    words.groupBy("bucket").agg(count(lit(1)).as("n_vecs"))
      .join(pairs, Seq("bucket"), "left")
      .filter(col("n_vecs") >= 3)
      .select(col("bucket"), col("n_vecs"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        round(col("ham_sum").cast("double")
          / col("n_pairs").cast("double"), 6).as("mean_hamming"))
      .orderBy("bucket")
  }
  val embedBinaryQuantizeSql: String =
    """WITH words AS (
      |  SELECT vec_id,
      |    CAST(sum(CASE WHEN embedding[i] > 0.0 AND i <= 32
      |      THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(sum(CASE WHEN embedding[i] > 0.0 AND i > 32
      |      THEN (CAST(1 AS BIGINT) << (i - 33)) ELSE 0 END) AS BIGINT) AS hi
      |  FROM embeddings, generate_series(1, 64) AS g(i)
      |  GROUP BY 1),
      |wb AS (
      |  SELECT vec_id, lo, hi, (hi >> 24) & 255 AS bucket FROM words),
      |pairs AS (
      |  SELECT a.bucket, count(*) AS n_pairs,
      |    CAST(sum(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))
      |      AS BIGINT) AS ham_sum
      |  FROM wb a JOIN wb b
      |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      |  GROUP BY 1)
      |SELECT v.bucket, n_vecs,
      |  coalesce(n_pairs, 0) AS n_pairs,
      |  round(CAST(ham_sum AS DOUBLE) / CAST(n_pairs AS DOUBLE), 6)
      |    AS mean_hamming
      |FROM (SELECT bucket, count(*) AS n_vecs FROM wb GROUP BY 1) v
      |LEFT JOIN pairs ON v.bucket = pairs.bucket
      |WHERE n_vecs >= 3 ORDER BY v.bucket""".stripMargin

  /** analytics_repeat_interval — the repeat-purchase cadence: gaps
    * between consecutive orders per customer (keyed lag window — the
    * partition is the customer, state O(orders per customer)), then a
    * week-bucketed histogram of the gap distribution as exact
    * integers. No global sort, no whole-frame percentile buffer.
    */
  def analyticsRepeatInterval(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("d"), col("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("d"))
      .withColumn("gap", datediff(col("d"), lag(col("d"), 1).over(w)))
      .filter(col("gap").isNotNull)
      .groupBy((col("gap").cast("long") / 7L).cast("long").as("gap_weeks"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap")).cast("long").as("min_days"),
        max(col("gap")).cast("long").as("max_days"))
      .orderBy("gap_weeks")
  }
  val analyticsRepeatIntervalSql: String =
    """WITH g AS (
      |  SELECT date_diff('day',
      |    lag(CAST(o_orderdate AS DATE), 1) OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
      |    CAST(o_orderdate AS DATE)) AS gap
      |  FROM orders)
      |SELECT CAST(gap // 7 AS BIGINT) AS gap_weeks, count(*) AS n_gaps,
      |  CAST(min(gap) AS BIGINT) AS min_days,
      |  CAST(max(gap) AS BIGINT) AS max_days
      |FROM g WHERE gap IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** ref_water_mass_census — water-mass classification (the T/S-box
    * screen oceanographers run on every profile): synthetic "temp"
    * and "salinity" derive row-locally from the value/id scheme, the
    * class is a multi-branch CASE riding the scan (codegen'd, no
    * join), and the census is one partial-agg pass with per-class
    * envelopes. Output bounded by the class list.
    */
  def refWaterMassCensus(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(dec(col("value")).as("t"),
        (col("event_id") % 40).cast("long").as("sal"))
      .withColumn("mass",
        when(col("t") < 200 && col("sal") < 20, "polar")
          .when(col("t") < 200, "deep")
          .when(col("t") < 600 && col("sal") >= 30, "central")
          .when(col("t") < 600, "intermediate")
          .otherwise("surface"))
      .groupBy("mass")
      .agg(count(lit(1)).as("n_obs"),
        min(col("t")).cast("double").as("t_min"),
        max(col("t")).cast("double").as("t_max"),
        min(col("sal")).as("sal_min"), max(col("sal")).as("sal_max"))
      .orderBy("mass")
  val refWaterMassCensusSql: String =
    """WITH x AS (
      |  SELECT CAST(value AS DECIMAL(14,2)) AS t, event_id % 40 AS sal
      |  FROM events)
      |SELECT CASE
      |    WHEN t < 200 AND sal < 20 THEN 'polar'
      |    WHEN t < 200 THEN 'deep'
      |    WHEN t < 600 AND sal >= 30 THEN 'central'
      |    WHEN t < 600 THEN 'intermediate'
      |    ELSE 'surface' END AS mass,
      |  count(*) AS n_obs,
      |  CAST(min(t) AS DOUBLE) AS t_min, CAST(max(t) AS DOUBLE) AS t_max,
      |  min(sal) AS sal_min, max(sal) AS sal_max
      |FROM x GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_binary_quantize" -> (embedBinaryQuantize _),
    "analytics_repeat_interval" -> (analyticsRepeatInterval _),
    "ref_water_mass_census" -> (refWaterMassCensus _))

  val oracle: Map[String, String] = Map(
    "embed_binary_quantize" -> embedBinaryQuantizeSql,
    "analytics_repeat_interval" -> analyticsRepeatIntervalSql,
    "ref_water_mass_census" -> refWaterMassCensusSql)
}
