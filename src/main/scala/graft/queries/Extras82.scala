package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Eighty-second wave: Brown–Forsythe variance homogeneity, market-basket
  * lift mining, and Bollinger volatility bands.
  */
object Extras82 {

  /** stat_brown_forsythe — the median-centered Levene test (variance
    * homogeneity across event streams, C353 ANOVA's robust companion):
    * per-group medians by percentile_disc ELEMENT selection broadcast
    * back (O(groups) row frame), |x−med| stays EXACT decimal so the
    * moment sums are shuffle-order independent, and the F statistic is
    * assembled in ONE final IEEE block with the only order-sensitive
    * sum a group-sorted O(k) fold (the C353 pattern).
    */
  def statBrownForsythe(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("event_type"), dec(col("value")).as("v"))
    val med = e.groupBy("event_type").agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").as("med"))
    val z = e.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("v") - col("med")).as("z"))
    val g = z.groupBy("event_type").agg(
      count(lit(1)).as("n_g"),
      sum(col("z")).as("s_g"),
      sum(col("z") * col("z")).as("q_g"))
    g.agg(
        count(lit(1)).as("k"),
        sum(col("n_g")).as("n"),
        sum(col("s_g")).cast("double").as("s"),
        sum(col("q_g")).cast("double").as("q"),
        sort_array(collect_list(struct(col("event_type"), col("n_g"),
          col("s_g").cast("double").as("s_g")))).as("gl"))
      .withColumn("sgg", expr(
        """aggregate(gl, 0D, (acc, t) ->
          |  acc + t.s_g * t.s_g / CAST(t.n_g AS DOUBLE))""".stripMargin))
      .select(col("k"), col("n"),
        round(col("sgg") - col("s") * col("s") / col("n").cast("double"), 6)
          .as("ss_between"),
        round(col("q") - col("sgg"), 6).as("ss_within"),
        round(((col("sgg") - col("s") * col("s") / col("n").cast("double"))
            / (col("k") - lit(1)).cast("double"))
          / ((col("q") - col("sgg")) / (col("n") - col("k")).cast("double")), 6)
          .as("f_stat"))
  }
  val statBrownForsytheSql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(value AS DECIMAL(14,2)) AS v FROM events),
      |med AS (
      |  SELECT event_type,
      |    percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS med
      |  FROM e GROUP BY 1),
      |z AS (
      |  SELECT e.event_type, abs(e.v - med.med) AS z
      |  FROM e JOIN med ON e.event_type = med.event_type),
      |g AS (
      |  SELECT event_type, count(*) AS n_g, sum(z) AS s_g,
      |    sum(z * z) AS q_g
      |  FROM z GROUP BY 1),
      |tot AS (
      |  SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
      |    CAST(sum(s_g) AS DOUBLE) AS s, CAST(sum(q_g) AS DOUBLE) AS q,
      |    list_sort(list(struct_pack(event_type := event_type, n_g := n_g,
      |      s_g := CAST(s_g AS DOUBLE)))) AS gl
      |  FROM g),
      |f AS (
      |  SELECT k, n, s, q,
      |    list_reduce(list_prepend(0.0, list_transform(gl, t ->
      |      t.s_g * t.s_g / CAST(t.n_g AS DOUBLE))), (x, y) -> x + y) AS sgg
      |  FROM tot)
      |SELECT k, n,
      |  round(sgg - s * s / CAST(n AS DOUBLE), 6) AS ss_between,
      |  round(q - sgg, 6) AS ss_within,
      |  round(((sgg - s * s / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
      |    / ((q - sgg) / CAST(n - k AS DOUBLE)), 6) AS f_stat
      |FROM f""".stripMargin

  /** analytics_basket_lift — market-basket pair mining over order
    * line items: the pair frame is a self-join keyed by ORDER (bounded
    * by Σ items²-per-order, not |lineitem|²), supports partial-agg per
    * pair, lift assembled IEEE from exact integer counts; top-20
    * selected by the EXACT integer key (n12 DESC, part ids) so the
    * cut is deterministic — lift is reported, never sorted on.
    */
  def analyticsBasketLift(s: SparkSession, d: String): DataFrame = {
    // The distinct (order, part) frame feeds FOUR consumers (order
    // count, per-part counts, both sides of the pair self-join) — pin
    // it so the 600k-row distinct shuffle runs once, not per consumer.
    val li = lineitem(s, d).select(col("l_orderkey"), col("l_partkey")).distinct()
      .localCheckpoint(true)
    val nOrders = li.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val perPart = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    val pairs = li.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n12"))
      .orderBy(col("n12").desc, col("a"), col("b")).limit(20)
    pairs
      .join(perPart.select(col("l_partkey").as("a"), col("n_part").as("n1")), "a")
      .join(perPart.select(col("l_partkey").as("b"), col("n_part").as("n2")), "b")
      .crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("n12"), col("n1"), col("n2"),
        round(col("n12").cast("double") * col("n_orders").cast("double")
          / (col("n1").cast("double") * col("n2").cast("double")), 6).as("lift"))
      .orderBy(col("n12").desc, col("a"), col("b"))
  }
  val analyticsBasketLiftSql: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |no AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
      |pp AS (SELECT l_partkey, count(*) AS n_part FROM li GROUP BY 1),
      |pairs AS (
      |  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS n12
      |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
      |    AND x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2
      |  ORDER BY n12 DESC, a, b LIMIT 20)
      |SELECT a, b, n12, p1.n_part AS n1, p2.n_part AS n2,
      |  round(CAST(n12 AS DOUBLE) * CAST(n_orders AS DOUBLE)
      |    / (CAST(p1.n_part AS DOUBLE) * CAST(p2.n_part AS DOUBLE)), 6) AS lift
      |FROM pairs JOIN pp p1 ON pairs.a = p1.l_partkey
      |  JOIN pp p2 ON pairs.b = p2.l_partkey
      |  CROSS JOIN no
      |ORDER BY n12 DESC, a, b""".stripMargin

  /** win_bollinger_bands — 7-day Bollinger volatility bands over daily
    * revenue: the sliding sums (Σx, Σx²) run in EXACT decimal over the
    * calendar-bounded O(days) aggregate frame (the fact table never
    * enters a window), variance/bands assembled per-row in one IEEE
    * block from the exact sums. Band output rounds to 2 decimals
    * (money precision), NOT 6: Σx² carries ~19 significant digits, and
    * a >53-bit decimal→double cast is correctly rounded in Spark
    * (BigDecimal.doubleValue) but DOUBLE-ROUNDED in DuckDB
    * (int128→double, then /10⁴) — the resulting 1-ulp input skew
    * landed on round()'s half-way boundary in ~0.4% of cells at
    * round(…,6) (caught by the r8 sf0.1 cross-check); at 2 decimals
    * the boundary band is 10⁴× wider than the ulp skew and the
    * comparison is robust at any sf.
    */
  def winBollingerBands(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    daily
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s1", sum(col("rev")).over(w).cast("double"))
      .withColumn("s2", sum(col("rev") * col("rev")).over(w).cast("double"))
      .filter(col("cnt") === 7)
      .select(col("day").cast("timestamp_ntz").as("day"),
        col("rev").cast("double").as("rev"),
        round(col("s1") / 7.0d, 6).as("sma7"),
        round(col("s1") / 7.0d
          - lit(2.0d) * sqrt((lit(7.0d) * col("s2") - col("s1") * col("s1"))
            / 49.0d), 2).as("band_lo"),
        round(col("s1") / 7.0d
          + lit(2.0d) * sqrt((lit(7.0d) * col("s2") - col("s1") * col("s1"))
            / 49.0d), 2).as("band_hi"))
      .orderBy("day")
  }
  val winBollingerBandsSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    sum(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
      |  FROM orders GROUP BY 1),
      |w AS (
      |  SELECT day, CAST(rev AS DOUBLE) AS rev,
      |    count(*) OVER win AS cnt,
      |    CAST(sum(rev) OVER win AS DOUBLE) AS s1,
      |    CAST(sum(rev * rev) OVER win AS DOUBLE) AS s2
      |  FROM daily
      |  WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT CAST(day AS TIMESTAMP) AS day, rev,
      |  round(s1 / 7.0, 6) AS sma7,
      |  round(s1 / 7.0 - 2.0 * sqrt((7.0 * s2 - s1 * s1) / 49.0), 2)
      |    AS band_lo,
      |  round(s1 / 7.0 + 2.0 * sqrt((7.0 * s2 - s1 * s1) / 49.0), 2)
      |    AS band_hi
      |FROM w WHERE cnt = 7 ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_brown_forsythe" -> (statBrownForsythe _),
    "analytics_basket_lift" -> (analyticsBasketLift _),
    "win_bollinger_bands" -> (winBollingerBands _))

  val oracle: Map[String, String] = Map(
    "stat_brown_forsythe" -> statBrownForsytheSql,
    "analytics_basket_lift" -> analyticsBasketLiftSql,
    "win_bollinger_bands" -> winBollingerBandsSql)
}
