package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 93 (C776–C779): supply-chain + trade analytics — the bullwhip
  * CV² amplification ratio, Balassa revealed comparative advantage,
  * a service-level safety-stock table, and year-over-year brand rank
  * churn.
  *
  * Shared discipline: every daily/segment series is an exact
  * cent-integer aggregate; CV², RCA, and σ_d come from integer moment
  * sums with one IEEE expression at the end; ranks are
  * row_number with explicit deterministic tie-breaks over agg-bounded
  * frames.
  */
object Extras193 {

  /** C776 analytics_bullwhip_ratio — the bullwhip effect measured as
    * CV²(daily order value placed) / CV²(daily line value shipped):
    * order-side demand signal vs downstream shipment signal, each an
    * exact daily cent series. Ratio > 1 = variance amplification up
    * the chain. Both CV²s use population moments; n_days differ (the
    * two calendars) and are reported.
    */
  def analyticsBullwhipRatio(s: SparkSession, d: String): DataFrame = {
    def cv2(df: DataFrame): DataFrame = df
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("v")).cast("decimal(38,0)").as("sn"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("qn"))
      .selectExpr("n",
        """((CAST(qn AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / n) / n)
          |/ (CAST(sn AS DOUBLE) / n * (CAST(sn AS DOUBLE) / n)) AS cv2""".stripMargin)
    val ord = cv2(orders(s, d)
      .groupBy(expr("date_trunc('day', o_orderdate)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v")))
      .selectExpr("n AS n_days_orders", "cv2 AS cv2_orders")
    val shp = cv2(lineitem(s, d)
      .groupBy(expr("date_trunc('day', l_shipdate)").as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v")))
      .selectExpr("n AS n_days_ship", "cv2 AS cv2_ship")
    ord.crossJoin(broadcast(shp))
      .selectExpr("n_days_orders", "n_days_ship",
        "round(cv2_orders, 6) AS cv2_orders", "round(cv2_ship, 6) AS cv2_ship",
        "round(cv2_orders / cv2_ship, 6) AS bullwhip_ratio")
  }
  val analyticsBullwhipRatioSql: String =
    """WITH od AS (
      |  SELECT date_trunc('day', o_orderdate) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |sd AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM lineitem GROUP BY 1),
      |oc AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS DECIMAL(38,0)) AS sn,
      |    CAST(sum(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS qn
      |  FROM od),
      |sc AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS DECIMAL(38,0)) AS sn,
      |    CAST(sum(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS qn
      |  FROM sd),
      |r AS (
      |  SELECT oc.n AS n_days_orders, sc.n AS n_days_ship,
      |    ((CAST(oc.qn AS DOUBLE) - CAST(oc.sn AS DOUBLE) * CAST(oc.sn AS DOUBLE) / oc.n) / oc.n)
      |      / (CAST(oc.sn AS DOUBLE) / oc.n * (CAST(oc.sn AS DOUBLE) / oc.n)) AS cv2o,
      |    ((CAST(sc.qn AS DOUBLE) - CAST(sc.sn AS DOUBLE) * CAST(sc.sn AS DOUBLE) / sc.n) / sc.n)
      |      / (CAST(sc.sn AS DOUBLE) / sc.n * (CAST(sc.sn AS DOUBLE) / sc.n)) AS cv2s
      |  FROM oc, sc)
      |SELECT n_days_orders, n_days_ship,
      |  round(cv2o, 6) AS cv2_orders, round(cv2s, 6) AS cv2_ship,
      |  round(cv2o / cv2s, 6) AS bullwhip_ratio
      |FROM r""".stripMargin

  /** C777 analytics_balassa_rca — Balassa revealed comparative
    * advantage of each supplier nation in each part-type class
    * (first word of p_type, 6 classes):
    * RCA = (x_nc/x_n·)/(x_·c/x_··) = x_nc·x_·· / (x_n·  · x_·c),
    * from exact cent sums of shipped line value. Emitted for every
    * (nation, class) cell, ordered — the classic trade-specialization
    * matrix reframed on the supplier dimension.
    */
  def analyticsBalassaRca(s: SparkSession, d: String): DataFrame = {
    val x = lineitem(s, d)
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy(col("s_nationkey").as("nk"),
        expr("split_part(p_type, ' ', 1)").as("cls"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("xnc"))
    val byN = x.groupBy("nk").agg(sum(col("xnc")).cast("decimal(38,0)").as("xn"))
    val byC = x.groupBy("cls").agg(sum(col("xnc")).cast("decimal(38,0)").as("xc"))
    val tot = x.agg(sum(col("xnc")).cast("decimal(38,0)").as("xt"))
    x.join(broadcast(byN), Seq("nk")).join(broadcast(byC), Seq("cls"))
      .crossJoin(broadcast(tot))
      .selectExpr("nk", "cls",
        """round(CAST(xnc AS DOUBLE) * CAST(xt AS DOUBLE)
          |/ (CAST(xn AS DOUBLE) * CAST(xc AS DOUBLE)), 6) AS rca""".stripMargin)
      .orderBy(col("nk").asc, col("cls").asc)
  }
  val analyticsBalassaRcaSql: String =
    """WITH x AS (
      |  SELECT s.s_nationkey AS nk, split_part(p.p_type, ' ', 1) AS cls,
      |    CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS xnc
      |  FROM lineitem l
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1, 2),
      |byn AS (SELECT nk, CAST(sum(xnc) AS DECIMAL(38,0)) AS xn FROM x GROUP BY 1),
      |byc AS (SELECT cls, CAST(sum(xnc) AS DECIMAL(38,0)) AS xc FROM x GROUP BY 1),
      |tot AS (SELECT CAST(sum(xnc) AS DECIMAL(38,0)) AS xt FROM x)
      |SELECT x.nk, x.cls,
      |  round(CAST(x.xnc AS DOUBLE) * CAST(t.xt AS DOUBLE)
      |    / (CAST(n.xn AS DOUBLE) * CAST(c.xc AS DOUBLE)), 6) AS rca
      |FROM x
      |JOIN byn n ON n.nk = x.nk
      |JOIN byc c ON c.cls = x.cls
      |CROSS JOIN tot t
      |ORDER BY x.nk, x.cls""".stripMargin

  /** C778 analytics_safety_stock — per-brand safety stock at a fixed
    * 95% cycle service level (z = 1.645) and L = 7-day lead time:
    * daily shipped-quantity mean and population σ_d from exact integer
    * moments over the brand's ACTIVE ship days, SS = z·σ_d·√L,
    * ROP = μ_d·L + SS. The direct textbook sizing every replenishment
    * loop runs; emitted for all 25 brands, ordered.
    */
  def analyticsSafetyStock(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), expr("date_trunc('day', l_shipdate)").as("day"))
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).cast("long").as("q"))
    daily.groupBy("brand")
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("q")).cast("decimal(38,0)").as("sq"),
        sum(expr("CAST(q AS DECIMAL(38,0)) * q")).cast("decimal(38,0)").as("qq"))
      .selectExpr("brand", "n_days",
        "CAST(sq AS DOUBLE) / n_days AS mu",
        "sqrt((CAST(qq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n_days) / n_days) AS sd")
      .selectExpr("brand", "n_days", "round(mu, 6) AS mean_daily_qty",
        "round(1.645D * sd * sqrt(CAST(7 AS DOUBLE)), 6) AS safety_stock",
        "round(mu * 7 + 1.645D * sd * sqrt(CAST(7 AS DOUBLE)), 6) AS reorder_point")
      .orderBy(col("brand").asc)
  }
  val analyticsSafetyStockSql: String =
    """WITH daily AS (
      |  SELECT p.p_brand AS brand, date_trunc('day', l.l_shipdate) AS day,
      |    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1, 2),
      |m AS (
      |  SELECT brand, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(q) AS DECIMAL(38,0)) AS sq,
      |    CAST(sum(CAST(q AS DECIMAL(38,0)) * q) AS DECIMAL(38,0)) AS qq
      |  FROM daily GROUP BY 1),
      |v AS (
      |  SELECT brand, n_days, CAST(sq AS DOUBLE) / n_days AS mu,
      |    sqrt((CAST(qq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n_days) / n_days) AS sd
      |  FROM m)
      |SELECT brand, n_days, round(mu, 6) AS mean_daily_qty,
      |  round(1.645 * sd * sqrt(CAST(7 AS DOUBLE)), 6) AS safety_stock,
      |  round(mu * 7 + 1.645 * sd * sqrt(CAST(7 AS DOUBLE)), 6) AS reorder_point
      |FROM v ORDER BY brand""".stripMargin

  /** C779 analytics_rank_churn — brand revenue-rank churn 1995→1996:
    * per-year brand ranks (row_number over exact cent revenue desc,
    * brand asc tie-break, agg-bounded 25-row frames), joined; emits
    * the brand count, mean |Δrank| (exact rational), max mover, and
    * the top-10 overlap count. The leaderboard-stability audit — how
    * much does a year reshuffle the catalog?
    */
  def analyticsRankChurn(s: SparkSession, d: String): DataFrame = {
    def ranks(yr: Int): DataFrame = lineitem(s, d)
      .filter(expr(s"year(l_shipdate) = $yr"))
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("rev"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rev").desc, col("brand").asc)))
      .select(col("brand"), col("rk"))
    val j = ranks(1995).withColumnRenamed("rk", "r1")
      .join(ranks(1996).withColumnRenamed("rk", "r2"), Seq("brand"))
    j.agg(count(lit(1)).cast("long").as("n_brands"),
        sum(expr("abs(r1 - r2)")).cast("long").as("sad"),
        max(expr("abs(r1 - r2)")).cast("long").as("max_move"),
        sum(expr("CASE WHEN r1 <= 10 AND r2 <= 10 THEN 1L ELSE 0L END"))
          .cast("long").as("top10_overlap"))
      .selectExpr("n_brands",
        "round(CAST(sad AS DOUBLE) / n_brands, 6) AS mean_abs_rank_change",
        "max_move", "top10_overlap")
  }
  val analyticsRankChurnSql: String =
    """WITH r95 AS (
      |  SELECT brand, row_number() OVER (ORDER BY rev DESC, brand) AS r1
      |  FROM (
      |    SELECT p.p_brand AS brand,
      |      CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS rev
      |    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |    WHERE year(l.l_shipdate) = 1995 GROUP BY 1)),
      |r96 AS (
      |  SELECT brand, row_number() OVER (ORDER BY rev DESC, brand) AS r2
      |  FROM (
      |    SELECT p.p_brand AS brand,
      |      CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS rev
      |    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |    WHERE year(l.l_shipdate) = 1996 GROUP BY 1)),
      |j AS (SELECT a.brand, a.r1, b.r2 FROM r95 a JOIN r96 b ON b.brand = a.brand)
      |SELECT CAST(count(*) AS BIGINT) AS n_brands,
      |  round(CAST(CAST(sum(abs(r1 - r2)) AS BIGINT) AS DOUBLE) / count(*), 6) AS mean_abs_rank_change,
      |  CAST(max(abs(r1 - r2)) AS BIGINT) AS max_move,
      |  CAST(sum(CASE WHEN r1 <= 10 AND r2 <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS top10_overlap
      |FROM j""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_bullwhip_ratio" -> (analyticsBullwhipRatio _),
    "analytics_balassa_rca" -> (analyticsBalassaRca _),
    "analytics_safety_stock" -> (analyticsSafetyStock _),
    "analytics_rank_churn" -> (analyticsRankChurn _),
  )

  val oracle: Map[String, String] = Map(
    "analytics_bullwhip_ratio" -> analyticsBullwhipRatioSql,
    "analytics_balassa_rca" -> analyticsBalassaRcaSql,
    "analytics_safety_stock" -> analyticsSafetyStockSql,
    "analytics_rank_churn" -> analyticsRankChurnSql,
  )
}
