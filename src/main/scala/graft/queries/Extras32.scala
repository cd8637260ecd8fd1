package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Thirty-second wave: correlated existence subqueries, the stat API's
  * contingency table, explicit null-ordering semantics, bitmap-based
  * mergeable distinct counting, and asymmetric containment dedup.
  */
object Extras32 {

  /** subquery_exists_correlated — correlated EXISTS / NOT EXISTS, the
    * two existence quantifiers the DSL surface (B50) compiles to when a
    * filter references a sibling collection. Catalyst decorrelates both
    * into joins (RewritePredicateSubquery: EXISTS → left-semi,
    * NOT EXISTS → left-anti), so at 100 TB each subquery costs one
    * distributed join, never a per-row probe. Customers that have at
    * least one finished order but no order above 400k, censused per
    * market segment.
    */
  def subqueryExistsCorrelated(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("g_exc_customer")
    orders(s, d).createOrReplaceTempView("g_exc_orders")
    s.sql(
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM g_exc_customer c
        |WHERE EXISTS (SELECT 1 FROM g_exc_orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM g_exc_orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }
  val subqueryExistsCorrelatedSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** stat_crosstab — `DataFrameStatFunctions.crosstab`: the pairwise
    * contingency table (status × priority counts) in one distributed
    * pass. Cell values are exact longs; the value-derived column names
    * are renamed to parquet-safe snake case ("4-NOT SPECIFIED" contains
    * a space). One group-by over (a, b) then a tiny driver-side pivot
    * of the distinct-value grid — scalable as long as the CATEGORY
    * cardinality product is small, which is the API's contract.
    */
  def statCrosstab(s: SparkSession, d: String): DataFrame = {
    val renames = Seq(
      "1-URGENT" -> "n_urgent", "2-HIGH" -> "n_high", "3-MEDIUM" -> "n_medium",
      "4-NOT SPECIFIED" -> "n_not_specified", "5-LOW" -> "n_low")
    val ct = orders(s, d).stat.crosstab("o_orderstatus", "o_orderpriority")
    renames.foldLeft(ct) { case (df, (from, to)) => df.withColumnRenamed(from, to) }
      .withColumnRenamed("o_orderstatus_o_orderpriority", "o_orderstatus")
      .orderBy("o_orderstatus")
  }
  val statCrosstabSql: String =
    """SELECT o_orderstatus,
      |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
      |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_medium,
      |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_not_specified,
      |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** sort_nulls_ordering — the four explicit null placements
    * (ASC/DESC × NULLS FIRST/LAST) as side-by-side rank columns over
    * RULE-planted nulls. Spark's DEFAULTS differ from DuckDB's (Spark:
    * nulls first on ASC, last on DESC; DuckDB: nulls last everywhere),
    * so a query service porting ORDER BY clauses must pin the placement
    * explicitly — this row proves all four agree when pinned. Ranks are
    * per-priority windows (parallel across partitions, no global sort).
    */
  def sortNullsOrdering(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d).select(
      col("o_orderkey"), col("o_orderpriority"),
      when(col("o_orderkey") % 5 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderstatus")).as("status_n"),
      when(col("o_orderkey") % 7 === 0, lit(null).cast("double"))
        .otherwise(col("o_totalprice")).as("price_n"))
    def w(c: org.apache.spark.sql.Column) =
      Window.partitionBy("o_orderpriority").orderBy(c, col("o_orderkey"))
    base.select(
      col("o_orderkey"), col("o_orderpriority"), col("status_n"), col("price_n"),
      row_number().over(w(col("status_n").asc_nulls_first)).cast("bigint").as("rn_asc_nf"),
      row_number().over(w(col("status_n").asc_nulls_last)).cast("bigint").as("rn_asc_nl"),
      row_number().over(w(col("price_n").desc_nulls_first)).cast("bigint").as("rn_desc_nf"),
      row_number().over(w(col("price_n").desc_nulls_last)).cast("bigint").as("rn_desc_nl"))
      .orderBy("o_orderkey")
  }
  val sortNullsOrderingSql: String =
    """SELECT o_orderkey, o_orderpriority, status_n, price_n,
      |  row_number() OVER (PARTITION BY o_orderpriority
      |    ORDER BY status_n ASC NULLS FIRST, o_orderkey) AS rn_asc_nf,
      |  row_number() OVER (PARTITION BY o_orderpriority
      |    ORDER BY status_n ASC NULLS LAST, o_orderkey) AS rn_asc_nl,
      |  row_number() OVER (PARTITION BY o_orderpriority
      |    ORDER BY price_n DESC NULLS FIRST, o_orderkey) AS rn_desc_nf,
      |  row_number() OVER (PARTITION BY o_orderpriority
      |    ORDER BY price_n DESC NULLS LAST, o_orderkey) AS rn_desc_nl
      |FROM (
      |  SELECT o_orderkey, o_orderpriority,
      |    CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS status_n,
      |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS price_n
      |  FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** agg_bitmap_distinct — EXACT distinct counting through mergeable
    * bitmaps (`bitmap_construct_agg` / `bitmap_or_agg` / `bitmap_count`,
    * Spark ≥ 3.5): keys split into 32768-bit buckets, each (group,
    * bucket) builds a bitmap map-side, bucket partials OR-merge, and
    * bit counts sum — the ClickHouse/Snowflake trick that gives exact
    * COUNT(DISTINCT) with partial aggregation at 100 TB instead of a
    * full shuffle of raw keys. Second branch re-merges the SAME
    * per-priority partials across groups via bitmap_or_agg for the
    * grand total — proving reuse of partials, the cube/rollup property
    * approximate HLL (B18) only gives with error.
    */
  def aggBitmapDistinct(s: SparkSession, d: String): DataFrame = {
    val partials = orders(s, d)
      .select(col("o_orderpriority"),
        expr("bitmap_bucket_number(o_custkey)").as("bkt"),
        expr("bitmap_bit_position(o_custkey)").as("pos"))
      .groupBy("o_orderpriority", "bkt")
      .agg(expr("bitmap_construct_agg(pos)").as("bm"))
    val perPriority = partials
      .groupBy("o_orderpriority")
      .agg(sum(expr("bitmap_count(bm)")).as("n_cust_distinct"))
    val overall = partials
      .groupBy("bkt")
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
      .agg(sum(expr("bitmap_count(bm)")).as("n_cust_total"))
    perPriority.crossJoin(overall).orderBy("o_orderpriority")
  }
  val aggBitmapDistinctSql: String =
    """SELECT o_orderpriority,
      |  count(DISTINCT o_custkey) AS n_cust_distinct,
      |  (SELECT count(DISTINCT o_custkey) FROM orders) AS n_cust_total
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** dedup_containment — asymmetric near-dup detection: ordered pairs
    * where ≥ 70% of doc A's 3-gram shingles also occur in doc B
    * (|A∩B|/|A| ≥ 0.7) — catches quotes, excerpts and wrapper pages
    * that symmetric Jaccard (C5) misses because the union dilutes the
    * score. Same exact prefix-filter shape as C5, made one-sided: only
    * A's rare-first prefix (length |A| − ⌈0.7·|A|⌉ + 1, integer math)
    * joins against FULL shingle lists — if |A∩B|/|A| ≥ t then A's
    * prefix must intersect B under any shared total order, so the
    * boilerplate-shingle k² blowup stays defused on the probe side
    * while the result is provably exact. Reuses C5's codegen'd
    * [[graft.functions.ShingleHash3]] shingles AND the staged shingle
    * aggregates (sizes/dfreq) — the shuffled passes over the exploded
    * frame run once per corpus, not once per shingle consumer.
    */
  def dedupContainment(s: SparkSession, d: String): DataFrame = {
    val (sh, prefix) = DedupExtras.ngramShinglesAndPrefix(s, d, num = 7, den = 10)
    val sizes = ShingleStage.sizes(s, d)
    val cand = prefix.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), "shingle")
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") / col("n_a")).as("containment"))
      .filter(col("containment") >= 0.7)
      .orderBy("doc_a", "doc_b")
  }
  val dedupContainmentSql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
      |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS g
      |  FROM documents)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(a.g) AS containment
      |FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
      |WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(a.g) >= 0.7
      |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "subquery_exists_correlated" -> (subqueryExistsCorrelated _),
    "stat_crosstab" -> (statCrosstab _),
    "sort_nulls_ordering" -> (sortNullsOrdering _),
    "agg_bitmap_distinct" -> (aggBitmapDistinct _),
    "dedup_containment" -> (dedupContainment _))

  val oracle: Map[String, String] = Map(
    "subquery_exists_correlated" -> subqueryExistsCorrelatedSql,
    "stat_crosstab" -> statCrosstabSql,
    "sort_nulls_ordering" -> sortNullsOrderingSql,
    "agg_bitmap_distinct" -> aggBitmapDistinctSql,
    "dedup_containment" -> dedupContainmentSql)
}
