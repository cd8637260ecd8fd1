package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 68 (C676–C679): Brier–Murphy decomposition, Fisher-z
  * meta-analysis, DISTRIBUTE/SORT BY exhibit, null-key isolation.
  */
object Extras168 {

  /** C676 stat_brier_decomposition — Murphy's decomposition of the
    * Brier score for "discount×10 forecasts the return probability":
    * the forecast domain is BOUNDED (11 distinct discounts), so the
    * score is exact — Σ(p−y)² = Σ(k−10y)²/100 in integers — and the
    * reliability/resolution terms apply their per-bin rational means
    * as micro-quantized divisions over the bin frame. The spec asserts
    * Murphy's identity Brier = REL − RES + UNC within quantization.
    */
  def statBrierDecomposition(s: SparkSession, d: String): DataFrame = {
    val v = lineitem(s, d).select(
      expr("CAST(round(l_discount * 10) AS BIGINT)").as("k"),
      expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END").as("y"))
    val bins = v.groupBy("k")
      .agg(count(lit(1)).cast("long").as("nk"), sum(col("y")).cast("long").as("yk"),
        sum(expr("(k - 10 * y) * (k - 10 * y)")).cast("long").as("sq"))
    val tot = bins.agg(sum(col("nk")).cast("long").as("n"),
      sum(col("yk")).cast("long").as("ytot"), sum(col("sq")).cast("long").as("sqtot"))
    bins.crossJoin(broadcast(tot))
      // REL term: nk*(k/10 - yk/nk)^2 = (k*nk - 10*yk)^2/(100*nk)
      .withColumn("rel_q", expr(
        """CAST((CAST(k * nk - 10 * yk AS DECIMAL(38,0))
          |  * (k * nk - 10 * yk) * 1000000) div (CAST(100 AS DECIMAL(38,0)) * nk)
          |  AS BIGINT)""".stripMargin))
      // RES term: nk*(yk/nk - ytot/n)^2 = (yk*n - ytot*nk)^2/(nk*n^2)
      .withColumn("res_q", expr(
        """CAST((CAST(yk * n - ytot * nk AS DECIMAL(38,0))
          |  * (yk * n - ytot * nk) * 1000000)
          |  div (CAST(nk AS DECIMAL(38,0)) * n * n) AS BIGINT)""".stripMargin))
      .agg(max(col("n")).as("n"), max(col("ytot")).as("ytot"),
        max(col("sqtot")).as("sqtot"),
        sum(col("rel_q")).cast("long").as("rel6"),
        sum(col("res_q")).cast("long").as("res6"))
      .selectExpr("n",
        "round(CAST(sqtot AS DOUBLE) / 100 / n, 6) AS brier",
        "round(CAST(rel6 AS DOUBLE) / 1e6 / n, 6) AS reliability",
        "round(CAST(res6 AS DOUBLE) / 1e6 / n, 6) AS resolution",
        """round(CAST(ytot AS DOUBLE) / n * (1 - CAST(ytot AS DOUBLE) / n), 6)
          |  AS uncertainty""".stripMargin)
  }
  val statBrierDecompositionSql: String =
    """WITH v AS (
      |  SELECT CAST(round(l_discount * 10) AS BIGINT) AS k,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem),
      |bins AS (
      |  SELECT k, CAST(count(*) AS BIGINT) AS nk, CAST(sum(y) AS BIGINT) AS yk,
      |    CAST(sum((k - 10 * y) * (k - 10 * y)) AS BIGINT) AS sq
      |  FROM v GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(nk) AS BIGINT) AS n, CAST(sum(yk) AS BIGINT) AS ytot,
      |    CAST(sum(sq) AS BIGINT) AS sqtot
      |  FROM bins),
      |q AS (
      |  SELECT nk, n, ytot, sqtot,
      |    CAST(CAST(CAST(k * nk - 10 * yk AS HUGEINT)
      |      * (k * nk - 10 * yk) * 1000000 AS HUGEINT)
      |      // (CAST(100 AS HUGEINT) * nk) AS BIGINT) AS rel_q,
      |    CAST(CAST(CAST(yk * n - ytot * nk AS HUGEINT)
      |      * (yk * n - ytot * nk) * 1000000 AS HUGEINT)
      |      // (CAST(nk AS HUGEINT) * n * n) AS BIGINT) AS res_q
      |  FROM bins, tot),
      |m AS (
      |  SELECT max(n) AS n, max(ytot) AS ytot, max(sqtot) AS sqtot,
      |    CAST(sum(rel_q) AS BIGINT) AS rel6, CAST(sum(res_q) AS BIGINT) AS res6
      |  FROM q)
      |SELECT n,
      |  round(CAST(sqtot AS DOUBLE) / 100 / n, 6) AS brier,
      |  round(CAST(rel6 AS DOUBLE) / 1e6 / n, 6) AS reliability,
      |  round(CAST(res6 AS DOUBLE) / 1e6 / n, 6) AS resolution,
      |  round(CAST(ytot AS DOUBLE) / n * (1 - CAST(ytot AS DOUBLE) / n), 6)
      |    AS uncertainty
      |FROM m""".stripMargin

  /** C677 stat_fisher_z_meta — random-effects-free meta-analysis of
    * the quantity↔price correlation across the 7 year strata: per-year
    * Pearson r from cleared exact DECIMAL moments, Fisher z = atanh(r)
    * nano-quantized so the (n−3)-weighted pool and Cochran's Q are
    * exact sums over the BOUNDED stratum frame, pooled r = tanh(z̄).
    */
  def statFisherZMeta(s: SparkSession, d: String): DataFrame = {
    val strata = lineitem(s, d)
      .groupBy(year(col("l_shipdate")).as("yr"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr("CAST(l_quantity AS BIGINT)")).cast("decimal(38,0)").as("sx"),
        sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)"))
          .cast("decimal(38,0)").as("sxx"),
        sum(expr(
          "CAST(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS DECIMAL(38,0)) * CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("decimal(38,0)").as("syy"),
        sum(expr(
          "CAST(l_quantity AS BIGINT) * CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("decimal(38,0)").as("sxy"))
      .selectExpr("yr", "n",
        """CAST(n * sxy - sx * sy AS DOUBLE)
          |/ sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
          |/ sqrt(CAST(n * syy - sy * sy AS DOUBLE)) AS r""".stripMargin)
      .withColumn("zq", expr(
        "CAST(floor(0.5 * ln((1 + r) / (1 - r)) * 1e9 + 0.5) AS BIGINT)"))
      .withColumn("w", expr("n - 3"))
    val pooled = strata.agg(count(lit(1)).cast("long").as("k"),
        sum(expr("w * zq")).cast("decimal(38,0)").as("swz"),
        sum(col("w")).cast("long").as("sw"))
      .selectExpr("k", "sw",
        "CAST(swz AS DOUBLE) / CAST(sw AS DOUBLE) / 1e9 AS zbar")
    strata.crossJoin(broadcast(pooled))
      .agg(max(col("k")).as("k_studies"),
        max(expr("round((exp(2 * zbar) - 1) / (exp(2 * zbar) + 1), 6)")).as("pooled_r"),
        sum(expr(
          "CAST(floor(w * pow(CAST(zq AS DOUBLE) / 1e9 - zbar, 2) * 1e6 + 0.5) AS BIGINT)"))
          .cast("long").as("q6"))
      .selectExpr("k_studies", "pooled_r",
        "round(CAST(q6 AS DOUBLE) / 1e6, 4) AS cochran_q",
        "CAST(q6 AS DOUBLE) / 1e6 > 12.592 AS heterogeneous")
  }
  val statFisherZMetaSql: String =
    """WITH strata AS (
      |  SELECT EXTRACT(year FROM l_shipdate) AS yr, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS DECIMAL(38,0)) * CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS syy,
      |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sxy
      |  FROM lineitem GROUP BY 1),
      |r AS (
      |  SELECT yr, n,
      |    CAST(n * sxy - sx * sy AS DOUBLE)
      |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |      / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) AS r
      |  FROM strata),
      |z AS (
      |  SELECT yr, n, n - 3 AS w,
      |    CAST(floor(0.5 * ln((1 + r) / (1 - r)) * 1e9 + 0.5) AS BIGINT) AS zq
      |  FROM r),
      |pooled AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(w) AS BIGINT) AS sw,
      |    CAST(CAST(sum(w * zq) AS DECIMAL(38,0)) AS DOUBLE)
      |      / CAST(sum(w) AS DOUBLE) / 1e9 AS zbar
      |  FROM z),
      |m AS (
      |  SELECT max(p.k) AS k_studies, max(round((exp(2 * p.zbar) - 1) / (exp(2 * p.zbar) + 1), 6)) AS pooled_r,
      |    CAST(sum(CAST(floor(z.w * pow(CAST(z.zq AS DOUBLE) / 1e9 - p.zbar, 2) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS q6
      |  FROM z, pooled p)
      |SELECT k_studies, pooled_r,
      |  round(CAST(q6 AS DOUBLE) / 1e6, 4) AS cochran_q,
      |  CAST(q6 AS DOUBLE) / 1e6 > 12.592 AS heterogeneous
      |FROM m""".stripMargin

  /** C678 sql_distribute_sort_by — the Spark-dialect DISTRIBUTE BY /
    * SORT BY surface under an order-agnostic consumer: Catalyst's
    * EliminateSorts DROPS the per-partition sort entirely (the
    * aggregate doesn't need it) and the aggregate REUSES the
    * DISTRIBUTE BY hash exchange — the spec asserts exactly that (no
    * non-global SortExec survives; the only sort is the final 3-row
    * ORDER BY). The 100 TB point: the optimizer deletes work the
    * query didn't need, and the explicit distribution feeds the
    * aggregate for free.
    */
  def sqlDistributeSortBy(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("li_dsb")
    s.sql(
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
        |  FROM li_dsb
        |  DISTRIBUTE BY l_returnflag SORT BY l_returnflag, cents
        |)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }
  val sqlDistributeSortBySql: String =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS total_cents
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** C679 join_null_key_isolation — the null-skew production pattern:
    * with 10% of foreign keys synthetically nulled, a naive outer join
    * funnels every null row through one hash bucket; the isolated plan
    * UNIONs the null rows (a filter, no shuffle at all) with the
    * inner join of the non-null split. Census proves the isolation is
    * lossless: matched/null/total counts + value conservation.
    */
  def joinNullKeyIsolation(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(
      expr("CASE WHEN l_orderkey % 10 = 0 THEN CAST(NULL AS BIGINT) ELSE l_orderkey END").as("fk"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
    val ord = orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
    val nonNull = li.filter(col("fk").isNotNull)
      .join(ord, li("fk") === ord("o_orderkey"), "inner")
      .select(lit("matched").as("bucket"), col("cents"))
    val nulls = li.filter(col("fk").isNull)
      .select(lit("null_key").as("bucket"), col("cents"))
    nonNull.unionAll(nulls)
      .groupBy("bucket")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("cents")).cast("long").as("total_cents"))
      .orderBy("bucket")
  }
  val joinNullKeyIsolationSql: String =
    """WITH li AS (
      |  SELECT CASE WHEN l_orderkey % 10 = 0 THEN NULL ELSE l_orderkey END AS fk,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
      |  FROM lineitem)
      |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS total_cents
      |FROM (
      |  SELECT 'matched' AS bucket, li.cents
      |  FROM li JOIN orders ON li.fk = o_orderkey
      |  UNION ALL
      |  SELECT 'null_key', cents FROM li WHERE fk IS NULL)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_brier_decomposition" -> (statBrierDecomposition _),
    "stat_fisher_z_meta" -> (statFisherZMeta _),
    "sql_distribute_sort_by" -> (sqlDistributeSortBy _),
    "join_null_key_isolation" -> (joinNullKeyIsolation _),
  )

  val oracle: Map[String, String] = Map(
    "stat_brier_decomposition" -> statBrierDecompositionSql,
    "stat_fisher_z_meta" -> statFisherZMetaSql,
    "sql_distribute_sort_by" -> sqlDistributeSortBySql,
    "join_null_key_isolation" -> joinNullKeyIsolationSql,
  )
}
