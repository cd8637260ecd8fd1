package graft.queries

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables._

/** Buffer for the geomean Aggregator (B39): exact fixed-point log sum.
  * Top-level (not nested/private) so Spark's janino-generated encoder
  * code can reach the constructor — nested private case classes force a
  * codegen fallback to the interpreted path.
  */
case class GeoBuf(sumNano: Long, n: Long)

/** Scalar-function battery + extension surface (SURVEY.md §2-B B31–B39).
  *
  * All of B31–B37 are pure built-in expression work: row-level, fully
  * codegen'd inside WholeStageCodegen, no shuffle except the final R1
  * sort (and the small aggregations). At 100 TB these are scan-bound —
  * the expressions ride along with the parquet scan for free.
  *
  * Determinism: string/date/int functions are exact; the math battery
  * (B33) confines itself to IEEE-exact ops (abs/ceil/floor/sqrt/fmod)
  * plus libm functions (ln/pow) guarded by round(,6) — and the geomean
  * UDAF (B39) quantizes per-row logs to fixed-point so its SUM is exact
  * integer arithmetic, shuffle-order independent (see Scaladoc there).
  */
object Scalars {

  /** B31 str_funcs — upper/substr/trim/concat/length/replace/like over
    * part. Every function is a codegen'd built-in (no UDF): the entire
    * row transform fuses into the parquet scan stage.
    */
  def strFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_name").like("%a%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 10).as("name_prefix"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_type"), lit(" "), lit("_")).as("type_snake"))
      .orderBy("p_partkey")
  val strFuncsSql: String =
    """SELECT p_partkey,
      |  upper(p_name) AS name_upper,
      |  substr(p_name, 1, 10) AS name_prefix,
      |  trim(concat('  ', p_brand, '  ')) AS brand_trim,
      |  concat(p_brand, ':', p_type) AS brand_type,
      |  length(p_name) AS name_len,
      |  replace(p_type, ' ', '_') AS type_snake
      |FROM part
      |WHERE p_name LIKE '%a%'
      |ORDER BY p_partkey""".stripMargin

  /** B32 date_funcs — year/month/day/quarter extraction, month
    * truncation, interval arithmetic over orders. Timestamps stay NTZ
    * end-to-end so parquet dumps compare naively against DuckDB.
    */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mth"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).as("mon_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"))
      .orderBy("o_orderkey")
  val dateFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  CAST(month(o_orderdate) AS INTEGER) AS mth,
      |  CAST(day(o_orderdate) AS INTEGER) AS dom,
      |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      |  date_trunc('month', o_orderdate) AS mon_start,
      |  o_orderdate + INTERVAL 30 DAY AS due_date
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** B33 math_funcs — abs/ceil/floor/round/sqrt/ln/pow/mod battery.
    * sqrt and fmod are IEEE-exact (correctly rounded / exact remainder);
    * ln and pow are libm calls that can differ by 1 ulp across engines,
    * so they are published through round(,6) only.
    */
  def mathFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(
        col("p_partkey"),
        abs(col("p_retailprice") - 1000.0).as("abs_delta"),
        ceil(col("p_retailprice")).as("ceil_price"),
        floor(col("p_retailprice")).as("floor_price"),
        round(col("p_retailprice") / 7.0, 2).as("div_round"),
        sqrt(col("p_retailprice")).as("sqrt_price"),
        round(log(col("p_retailprice")), 6).as("ln_price"),
        pow(col("p_size"), 2).as("size_sq"),
        (col("p_size") % 7).as("size_mod"),
        (col("p_retailprice") % 10.0).as("price_fmod"))
      .orderBy("p_partkey")
  val mathFuncsSql: String =
    """SELECT p_partkey,
      |  abs(p_retailprice - 1000.0) AS abs_delta,
      |  CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
      |  CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
      |  round(p_retailprice / 7.0, 2) AS div_round,
      |  sqrt(p_retailprice) AS sqrt_price,
      |  round(ln(p_retailprice), 6) AS ln_price,
      |  pow(p_size, 2) AS size_sq,
      |  CAST(p_size % 7 AS INTEGER) AS size_mod,
      |  fmod(p_retailprice, 10.0) AS price_fmod
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** B34 json_funcs — extract `$.k` from events.props (JSON-in-string),
    * aggregate by it. get_json_object is a codegen'd path expression —
    * no UDF, no full JSON parse into a struct.
    */
  def jsonFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"), col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("k")
  val jsonFuncsSql: String =
    s"""SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
       |  count(*) AS n, ${dsumSql("value")} AS sum_value
       |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  /** B35 array_funcs — size/element_at/slice over the embedding vectors.
    * Float values pass through untouched (no arithmetic), so float32
    * round-trips bit-exactly. The slice stays in the plan but is
    * published as four scalar columns (h1–h4): the driver's comparator
    * can't hash array cells (R4: scalar output columns only).
    */
  def arrayFuncs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_val"),
        element_at(col("embedding"), -1).as("last_val"),
        slice(col("embedding"), 1, 4).as("head4"))
      .select(
        col("vec_id"),
        col("dim"),
        col("first_val"),
        col("last_val"),
        element_at(col("head4"), 1).as("h1"),
        element_at(col("head4"), 2).as("h2"),
        element_at(col("head4"), 3).as("h3"),
        element_at(col("head4"), 4).as("h4"))
      .orderBy("vec_id")
  val arrayFuncsSql: String =
    """SELECT vec_id,
      |  CAST(len(embedding) AS INTEGER) AS dim,
      |  embedding[1] AS first_val,
      |  embedding[-1] AS last_val,
      |  embedding[1:4][1] AS h1,
      |  embedding[1:4][2] AS h2,
      |  embedding[1:4][3] AS h3,
      |  embedding[1:4][4] AS h4
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  /** B36 map_funcs — build one map event_type→count via
    * map_from_entries(collect_list(struct)), then explode back to rows.
    * The map never reaches the output (R4) — the oracle is the plain
    * group-by the round-trip must reproduce.
    */
  def mapFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt")))).as("m"))
      .select(explode(col("m")).as(Seq("event_type", "cnt")))
      .orderBy("event_type")
  val mapFuncsSql: String =
    """SELECT event_type, count(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** B37 explode_posexplode — posexplode the first 8 dims of 3
    * embedding vectors (a Generator plan node). dim is 1-based to align
    * with DuckDB's generate_subscripts.
    */
  def explodePosexplode(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .filter(col("vec_id") < 3)
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 8)))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"), col("col").as("val"))
      .orderBy("vec_id", "dim")
  val explodePosexplodeSql: String =
    """SELECT vec_id,
      |  CAST(generate_subscripts(embedding[1:8], 1) AS BIGINT) AS dim,
      |  unnest(embedding[1:8]) AS val
      |FROM embeddings
      |WHERE vec_id < 3
      |ORDER BY vec_id, dim""".stripMargin

  /** explode_outer_tokens — OUTER generator semantics: extract each
    * document's rare long tokens (length ≥ 7 — MEASURED: 394 docs
    * carry 934 such tokens, 106 docs carry none); the 106 survive as a
    * null row (plain explode would drop them — the classic
    * silent-row-loss bug in extraction pipelines). Null ordering is
    * pinned explicitly (Spark asc = nulls first; DuckDB needs NULLS
    * FIRST spelled out).
    */
  def explodeOuterTokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        explode_outer(expr(
          "filter(split(lower(text), ' '), t -> length(t) >= 7)")).as("long_tok"))
      .orderBy(col("doc_id").asc, col("long_tok").asc_nulls_first)
  val explodeOuterTokensSql: String =
    """WITH lt AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(lower(text), ' '),
      |      t -> length(t) >= 7)) AS long_tok
      |  FROM documents)
      |SELECT d.doc_id, lt.long_tok
      |FROM documents d LEFT JOIN lt ON d.doc_id = lt.doc_id
      |ORDER BY d.doc_id ASC, long_tok ASC NULLS FIRST""".stripMargin

  /** B38 udf_scalar — discount-band labeling as a Scala UDF, then a
    * per-band aggregate. The UDF is a black box to Catalyst (breaks
    * codegen fusion and pushdown past it) — kept deliberately as the
    * UDF-surface exhibit; the equivalent built-in `when` chain is what
    * the other queries use. Comparisons are against the same double
    * literals in both engines, so banding is exact.
    */
  private val discountBand = udf { disc: Double =>
    if (disc < 0.03) "low" else if (disc < 0.07) "mid" else "high"
  }
  def udfScalar(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(discountBand(col("l_discount")).as("band"), col("l_extendedprice"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("band")
  val udfScalarSql: String =
    s"""SELECT CASE WHEN l_discount < 0.03 THEN 'low'
       |            WHEN l_discount < 0.07 THEN 'mid'
       |            ELSE 'high' END AS band,
       |  count(*) AS n, ${dsumSql("l_extendedprice")} AS sum_price
       |FROM lineitem GROUP BY 1 ORDER BY band""".stripMargin

  /** B39 udaf_geomean — geometric mean of l_quantity per returnflag as a
    * typed Aggregator[Double, buf, Double].
    *
    * Shuffle-order determinism: a naive sum of ln(x) doubles depends on
    * partial-merge order. Instead each row's ln is quantized once to
    * fixed-point nanounits (Long); the buffer sums Longs — exact integer
    * arithmetic, any merge order. The oracle mirrors the quantization:
    * round(ln(x)*1e9) summed as BIGINT. Final exp() and round(,6) run on
    * bit-identical inputs in both engines.
    */
  private[graft] object GeoMean extends Aggregator[Double, GeoBuf, Double] {
    def zero: GeoBuf = GeoBuf(0L, 0L)
    def reduce(b: GeoBuf, x: Double): GeoBuf =
      GeoBuf(b.sumNano + math.round(math.log(x) * 1e9), b.n + 1)
    def merge(a: GeoBuf, b: GeoBuf): GeoBuf = GeoBuf(a.sumNano + b.sumNano, a.n + b.n)
    def finish(b: GeoBuf): Double =
      if (b.n == 0) Double.NaN else math.exp(b.sumNano.toDouble / 1e9 / b.n)
    def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
  def udafGeomean(s: SparkSession, d: String): DataFrame = {
    val geomean = udaf(GeoMean)
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(round(geomean(col("l_quantity")), 6).as("geo_qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }
  val udafGeomeanSql: String =
    """SELECT l_returnflag,
      |  round(exp(CAST(sum(CAST(round(ln(l_quantity) * 1e9, 0) AS BIGINT)) AS DOUBLE)
      |            / 1e9 / count(*)), 6) AS geo_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** agg_percentiles — exact interpolated quartiles of quantity per
    * returnflag (`percentile` ≡ DuckDB `quantile_cont`: both sort and
    * linearly interpolate at p·(n−1), the same IEEE arithmetic on the
    * same inputs). Exact percentile requires a per-group sort; the
    * scale path is `approx_percentile` (t-digest) — same API shape.
    *
    * Output is three scalar columns (q1/q2/q3), not an array — the
    * driver's comparator sorts by column values, and array cells are
    * unhashable there (R4: scalar output columns only). One internal
    * percentile(array) evaluation, indexed; the sort happens once.
    */
  def aggPercentiles(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("quartiles"),
        count(lit(1)).as("n"))
      .select(
        col("l_returnflag"),
        element_at(col("quartiles"), 1).as("q1"),
        element_at(col("quartiles"), 2).as("q2"),
        element_at(col("quartiles"), 3).as("q3"),
        col("n"))
      .orderBy("l_returnflag")
  val aggPercentilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS q1,
      |  quantile_cont(l_quantity, 0.50) AS q2,
      |  quantile_cont(l_quantity, 0.75) AS q3,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** agg_approx_percentile — the at-scale variant of [[aggPercentiles]]:
    * Spark's approx_percentile (a bounded-size quantile sketch per
    * group, mergeable across partitions) instead of the exact per-group
    * sort. This is the 100 TB answer named in aggPercentiles' Scaladoc:
    * fixed memory per group, one pass, map-side combine. No DuckDB
    * oracle (sketch-specific, returns an actual element rather than an
    * interpolated value); SketchSpec bounds it against the exact
    * quartiles.
    */
  def aggApproxPercentile(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 10000)").as("aq"),
        count(lit(1)).as("n"))
      .select(
        col("l_returnflag"),
        element_at(col("aq"), 1).as("q1"),
        element_at(col("aq"), 2).as("q2"),
        element_at(col("aq"), 3).as("q3"),
        col("n"))
      .orderBy("l_returnflag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_percentiles" -> (aggPercentiles _),
    "agg_approx_percentile" -> (aggApproxPercentile _),
    "str_funcs" -> (strFuncs _),
    "date_funcs" -> (dateFuncs _),
    "math_funcs" -> (mathFuncs _),
    "json_funcs" -> (jsonFuncs _),
    "array_funcs" -> (arrayFuncs _),
    "map_funcs" -> (mapFuncs _),
    "explode_posexplode" -> (explodePosexplode _),
    "explode_outer_tokens" -> (explodeOuterTokens _),
    "udf_scalar" -> (udfScalar _),
    "udaf_geomean" -> (udafGeomean _),
  )

  val oracle: Map[String, String] = Map(
    "agg_percentiles" -> aggPercentilesSql,
    "str_funcs" -> strFuncsSql,
    "date_funcs" -> dateFuncsSql,
    "math_funcs" -> mathFuncsSql,
    "json_funcs" -> jsonFuncsSql,
    "array_funcs" -> arrayFuncsSql,
    "map_funcs" -> mapFuncsSql,
    "explode_posexplode" -> explodePosexplodeSql,
    "explode_outer_tokens" -> explodeOuterTokensSql,
    "udf_scalar" -> udfScalarSql,
    "udaf_geomean" -> udafGeomeanSql,
  )
}
