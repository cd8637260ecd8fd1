package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 57 (C632–C635): Krippendorff's alpha, typed variance
  * Aggregator, HOF struct fold, Tukey median polish.
  */
object Extras157 {

  /** C632 stat_krippendorff_alpha — inter-rater reliability with
    * VARIABLE raters per unit (the Fleiss row requires fixed m; real
    * labeling queues don't): units = orders with ≥2 lineitem "votes"
    * (returnflag), the observed disagreement grouped by unit size m
    * (BOUNDED distinct m), each group's Σn_uc(n_u−n_uc) an exact
    * integer, the 1/(m−1) factor applied as a micro-quantized integer
    * division on that bounded frame (error < 1e-10 — no float-ordered
    * summation), expected disagreement from the exact category totals,
    * α = 1 − Do/De with two final divisions.
    */
  def statKrippendorffAlpha(s: SparkSession, d: String): DataFrame = {
    val votes = lineitem(s, d)
      .groupBy("l_orderkey", "l_returnflag")
      .agg(count(lit(1)).cast("long").as("nuc"))
    val wu = Window.partitionBy("l_orderkey")
    val unit = votes.withColumn("nu", sum(col("nuc")).over(wu))
      .filter(col("nu") >= 2)
    val byM = unit.groupBy("nu")
      .agg(countDistinct(col("l_orderkey")).cast("long").as("units_m"),
        sum(expr("nuc * (nu - nuc)")).cast("long").as("am"))
    val doS = byM.agg(sum(col("units_m")).cast("long").as("n_units"),
      sum(expr("(am * 1000000L) div (nu - 1)")).cast("long").as("do_scaled"))
    val nc = unit.groupBy("l_returnflag")
      .agg(sum(col("nuc")).cast("long").as("ncat"))
      .agg(sum(col("ncat")).cast("long").as("n"),
        sum(expr("ncat * ncat")).cast("decimal(38,0)").as("nc2"))
    doS.crossJoin(broadcast(nc))
      .selectExpr("n_units", "n AS n_values",
        "CAST(do_scaled AS DOUBLE) / 1e6 / n AS do_",
        "(CAST(n AS DOUBLE) * n - CAST(nc2 AS DOUBLE)) / (CAST(n AS DOUBLE) * (n - 1)) AS de_")
      .selectExpr("n_units", "n_values",
        "round(do_, 6) AS disagreement_obs",
        "round(de_, 6) AS disagreement_exp",
        "round(1 - do_ / de_, 6) AS alpha")
  }
  val statKrippendorffAlphaSql: String =
    """WITH votes AS (
      |  SELECT l_orderkey, l_returnflag, CAST(count(*) AS BIGINT) AS nuc
      |  FROM lineitem GROUP BY 1, 2),
      |unit AS (
      |  SELECT l_orderkey, l_returnflag, nuc,
      |    sum(nuc) OVER (PARTITION BY l_orderkey) AS nu
      |  FROM votes QUALIFY nu >= 2),
      |bym AS (
      |  SELECT nu, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS units_m,
      |    CAST(sum(nuc * (nu - nuc)) AS BIGINT) AS am
      |  FROM unit GROUP BY 1),
      |dos AS (
      |  SELECT CAST(sum(units_m) AS BIGINT) AS n_units,
      |    CAST(sum((am * 1000000) // (nu - 1)) AS BIGINT) AS do_scaled
      |  FROM bym),
      |nc AS (
      |  SELECT CAST(sum(ncat) AS BIGINT) AS n,
      |    CAST(sum(ncat * ncat) AS DECIMAL(38,0)) AS nc2
      |  FROM (SELECT CAST(sum(nuc) AS BIGINT) AS ncat FROM unit GROUP BY l_returnflag)),
      |m AS (
      |  SELECT n_units, n AS n_values,
      |    CAST(do_scaled AS DOUBLE) / 1e6 / n AS do_,
      |    (CAST(n AS DOUBLE) * n - CAST(nc2 AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * (n - 1)) AS de_
      |  FROM dos, nc)
      |SELECT n_units, n_values,
      |  round(do_, 6) AS disagreement_obs,
      |  round(de_, 6) AS disagreement_exp,
      |  round(1 - do_ / de_, 6) AS alpha
      |FROM m""".stripMargin

  /** The exact-moment variance Aggregator: the buffer carries integer
    * (n, Σq, Σq²) so the merge is ASSOCIATIVE AND EXACT — the typed
    * custom-aggregation machinery (B39's family) demonstrated on the
    * parallel-merge shape Welford solves approximately, solved exactly
    * instead. Quantities are ≤50, so Σq² stays in a long to ~10¹⁵ rows.
    */
  object VarAgg extends Aggregator[Long, (Long, Long, Long), (Long, Long, Long)] {
    def zero: (Long, Long, Long) = (0L, 0L, 0L)
    def reduce(b: (Long, Long, Long), q: Long): (Long, Long, Long) =
      (b._1 + 1, b._2 + q, b._3 + q * q)
    def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
      (a._1 + b._1, a._2 + b._2, a._3 + b._3)
    def finish(b: (Long, Long, Long)): (Long, Long, Long) = b
    def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)
    def outputEncoder = bufferEncoder
  }

  /** C633 typed_variance_aggregator — a custom typed Aggregator whose
    * merge is exact (integer moment buffer — see [[VarAgg]]): per
    * returnflag population variance of quantity, computed by the
    * Dataset typed-aggregation path and reported via the cleared
    * (nΣq²−S²)/n² form. The oracle replays the same exact formula —
    * NOT the engine's float var_pop — so the row is ulp-safe.
    */
  def typedVarianceAggregator(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .select(col("l_returnflag").as("g"), expr("CAST(l_quantity AS BIGINT)").as("q"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(VarAgg.toColumn.name("m"))
      .toDF("g", "m")
      .selectExpr("g", "m._1 AS n", "m._2 AS s", "m._3 AS qq")
      .selectExpr("g", "n",
        """round(CAST(n AS DOUBLE) * qq / (CAST(n AS DOUBLE) * n)
          |  - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 6)
          |  AS var_pop_qty""".stripMargin)
      .orderBy("g")
  }
  val typedVarianceAggregatorSql: String =
    """WITH m AS (
      |  SELECT l_returnflag AS g, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
      |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS qq
      |  FROM lineitem GROUP BY 1)
      |SELECT g, n,
      |  round(CAST(n AS DOUBLE) * qq / (CAST(n AS DOUBLE) * n)
      |    - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 6) AS var_pop_qty
      |FROM m ORDER BY g""".stripMargin

  /** C634 hof_struct_fold — ONE higher-order aggregate() fold with a
    * STRUCT accumulator computing min/max/sum/count of token lengths
    * per document in a single pass over the token array (no explode,
    * no four separate passes); per-language report from exact integer
    * sums. The codegen'd lambda is the 100 TB point: per-doc state
    * stays in registers, nothing but four ints per doc shuffles.
    */
  def hofStructFold(s: SparkSession, d: String): DataFrame = {
    documents(s, d)
      .withColumn("st", expr(
        """aggregate(split(text, ' ', -1),
          |  named_struct('mn', 1073741824, 'mx', 0, 'sm', 0L, 'cnt', 0L),
          |  (acc, t) -> named_struct(
          |    'mn', least(acc.mn, length(t)),
          |    'mx', greatest(acc.mx, length(t)),
          |    'sm', acc.sm + length(t),
          |    'cnt', acc.cnt + 1L))""".stripMargin))
      .groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(expr("st.mn")).cast("long").as("sum_min_len"),
        sum(expr("st.mx")).cast("long").as("sum_max_len"),
        sum(expr("st.sm")).cast("long").as("total_token_chars"),
        sum(expr("st.cnt")).cast("long").as("total_tokens"))
      .selectExpr("lang", "n_docs",
        "round(CAST(sum_min_len AS DOUBLE) / n_docs, 4) AS avg_min_token_len",
        "round(CAST(sum_max_len AS DOUBLE) / n_docs, 4) AS avg_max_token_len",
        "total_tokens",
        "round(CAST(total_token_chars AS DOUBLE) / total_tokens, 4) AS avg_token_len")
      .orderBy("lang")
  }
  val hofStructFoldSql: String =
    """WITH per AS (
      |  SELECT lang,
      |    list_aggregate(list_transform(string_split(text, ' '), t -> strlen(t)), 'min') AS mn,
      |    list_aggregate(list_transform(string_split(text, ' '), t -> strlen(t)), 'max') AS mx,
      |    list_aggregate(list_transform(string_split(text, ' '), t -> strlen(t)), 'sum') AS sm,
      |    len(string_split(text, ' ')) AS cnt
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(CAST(CAST(sum(mn) AS BIGINT) AS DOUBLE) / count(*), 4) AS avg_min_token_len,
      |  round(CAST(CAST(sum(mx) AS BIGINT) AS DOUBLE) / count(*), 4) AS avg_max_token_len,
      |  CAST(sum(cnt) AS BIGINT) AS total_tokens,
      |  round(CAST(CAST(sum(sm) AS BIGINT) AS DOUBLE) / CAST(sum(cnt) AS BIGINT), 4)
      |    AS avg_token_len
      |FROM per GROUP BY 1 ORDER BY 1""".stripMargin

  /** C635 stat_median_polish — one full Tukey median-polish sweep on
    * the year×quarter revenue matrix (the robust two-way decomposition
    * of exploratory data analysis): the matrix is CALENDAR-BOUNDED
    * (28 cells), the 4-value row medians are exact integers via the
    * 2·median = S−min−max identity (doubled-cents units throughout),
    * the 7-value column medians are exact order statistics (rank
    * window, residual+year tie-break), and the report is the quarter
    * column effects + the max |residual| — one division per output.
    */
  def statMedianPolish(s: SparkSession, d: String): DataFrame = {
    val cells = lineitem(s, d)
      .groupBy(year(col("l_shipdate")).as("y"), quarter(col("l_shipdate")).as("q"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val wy = Window.partitionBy("y")
    val r1 = cells
      .withColumn("rowmed2", sum(col("c")).over(wy) - min(col("c")).over(wy)
        - max(col("c")).over(wy))
      .withColumn("r", col("c") * 2 - col("rowmed2"))
    val wq = Window.partitionBy("q").orderBy(col("r").asc, col("y").asc)
    val wqc = Window.partitionBy("q")
    val r2 = r1
      .withColumn("rk", row_number().over(wq).cast("long"))
      .withColumn("ny", count(lit(1)).over(wqc))
      .withColumn("colmed", max(expr("CASE WHEN rk * 2 = ny + 1 THEN r END")).over(wqc))
      .withColumn("res", col("r") - col("colmed"))
    r2.groupBy("q")
      .agg(count(lit(1)).cast("long").as("n_years"),
        max(col("colmed")).as("cm"),
        max(expr("abs(res)")).cast("long").as("maxres"))
      .selectExpr("CAST(q AS BIGINT) AS q",
        "n_years",
        "round(CAST(cm AS DOUBLE) / 200, 4) AS col_effect",
        "round(CAST(maxres AS DOUBLE) / 200, 4) AS max_abs_residual")
      .orderBy("q")
  }
  val statMedianPolishSql: String =
    """WITH cells AS (
      |  SELECT EXTRACT(year FROM l_shipdate) AS y,
      |    EXTRACT(quarter FROM l_shipdate) AS q,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |r1 AS (
      |  SELECT y, q,
      |    c * 2 - (sum(c) OVER (PARTITION BY y) - min(c) OVER (PARTITION BY y)
      |      - max(c) OVER (PARTITION BY y)) AS r
      |  FROM cells),
      |r2 AS (
      |  SELECT y, q, r,
      |    CAST(row_number() OVER (PARTITION BY q ORDER BY r, y) AS BIGINT) AS rk,
      |    count(*) OVER (PARTITION BY q) AS ny
      |  FROM r1),
      |r3 AS (
      |  SELECT y, q, r, ny,
      |    max(CASE WHEN rk * 2 = ny + 1 THEN r END) OVER (PARTITION BY q) AS colmed
      |  FROM r2)
      |SELECT CAST(q AS BIGINT) AS q, CAST(count(*) AS BIGINT) AS n_years,
      |  round(CAST(max(colmed) AS DOUBLE) / 200, 4) AS col_effect,
      |  round(CAST(max(abs(r - colmed)) AS DOUBLE) / 200, 4) AS max_abs_residual
      |FROM r3 GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_krippendorff_alpha" -> (statKrippendorffAlpha _),
    "typed_variance_aggregator" -> (typedVarianceAggregator _),
    "hof_struct_fold" -> (hofStructFold _),
    "stat_median_polish" -> (statMedianPolish _),
  )

  val oracle: Map[String, String] = Map(
    "stat_krippendorff_alpha" -> statKrippendorffAlphaSql,
    "typed_variance_aggregator" -> typedVarianceAggregatorSql,
    "hof_struct_fold" -> hofStructFoldSql,
    "stat_median_polish" -> statMedianPolishSql,
  )
}
