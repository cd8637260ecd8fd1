package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 34 (C540–C543): SAX motif mining, Benjamini–Hochberg FDR,
  * Kaufman efficiency ratio, and the deterministic Poisson bootstrap.
  */
object Extras134 {

  /** C540 time_sax_motifs — SAX (Symbolic Aggregate approXimation)
    * motif mining on daily revenue: 8-day PAA segments, alphabet
    * {a,b,c,d} at the N(0,1) quartile breakpoints ±0.6745, 3-segment
    * sliding words, top-10 by frequency. μ, σ and every PAA mean stay
    * IEEE-identical across engines (exact integer sums → one formula);
    * symbol assignment compares PAA against μ+q·σ doubles built from
    * the same exact inputs. The word window slides over the ~N/8
    * segment frame (bounded by the aggregate below it), never the
    * corpus.
    */
  def timeSaxMotifs(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .withColumn("t", row_number().over(Window.orderBy("day")).cast("long"))
      .withColumn("seg", expr("(t - 1) div 8"))
    val stats = daily.agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("c")).cast("long").as("sc"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("scc"))
      .selectExpr("n", "CAST(sc AS DOUBLE) / n AS mu",
        """sqrt(CAST(CAST(n AS DECIMAL(38,0)) * scc
          |  - CAST(sc AS DECIMAL(38,0)) * sc AS DOUBLE))
          |  / n AS sigma""".stripMargin)
    val segs = daily.groupBy("seg")
      .agg(count(lit(1)).as("cnt"), sum(col("c")).cast("long").as("segsum"))
      .filter(col("cnt") === 8)
      .crossJoin(broadcast(stats))
      .selectExpr("seg",
        """CASE WHEN CAST(segsum AS DOUBLE) / 8 < mu - 0.6745 * sigma THEN 'a'
          |  WHEN CAST(segsum AS DOUBLE) / 8 < mu THEN 'b'
          |  WHEN CAST(segsum AS DOUBLE) / 8 < mu + 0.6745 * sigma THEN 'c'
          |  ELSE 'd' END AS sym""".stripMargin)
    val words = segs
      .withColumn("s2", lead(col("sym"), 1).over(Window.orderBy("seg")))
      .withColumn("s3", lead(col("sym"), 2).over(Window.orderBy("seg")))
      .filter(col("s3").isNotNull)
      .selectExpr("concat(sym, s2, s3) AS word")
    words.groupBy("word").agg(count(lit(1)).cast("long").as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("word"))
      .limit(10)
  }
  val timeSaxMotifsSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |td AS (
      |  SELECT c, (CAST(row_number() OVER (ORDER BY day) AS BIGINT) - 1) // 8
      |    AS seg
      |  FROM daily),
      |stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / count(*) AS mu,
      |    sqrt(CAST(CAST(count(*) AS DECIMAL(38,0))
      |        * CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))
      |      - CAST(CAST(sum(c) AS BIGINT) AS DECIMAL(38,0))
      |        * CAST(sum(c) AS BIGINT) AS DOUBLE)) / count(*) AS sigma
      |  FROM td),
      |segs AS (
      |  SELECT seg,
      |    CASE WHEN CAST(segsum AS DOUBLE) / 8 < mu - 0.6745 * sigma THEN 'a'
      |      WHEN CAST(segsum AS DOUBLE) / 8 < mu THEN 'b'
      |      WHEN CAST(segsum AS DOUBLE) / 8 < mu + 0.6745 * sigma THEN 'c'
      |      ELSE 'd' END AS sym
      |  FROM (
      |    SELECT seg, count(*) AS cnt, CAST(sum(c) AS BIGINT) AS segsum
      |    FROM td GROUP BY 1) g, stats
      |  WHERE cnt = 8),
      |words AS (
      |  SELECT sym || lead(sym, 1) OVER w || lead(sym, 2) OVER w AS word
      |  FROM segs WINDOW w AS (ORDER BY seg))
      |SELECT word, CAST(count(*) AS BIGINT) AS n_occurrences
      |FROM words WHERE word IS NOT NULL
      |GROUP BY 1 ORDER BY n_occurrences DESC, word LIMIT 10""".stripMargin

  /** C541 stat_benjamini_hochberg — multiple-testing control over the
    * per-event-type Mann–Kendall trend family (C473's statistic):
    * two-sided p from |z| via the Abramowitz–Stegun 26.2.17 Φ
    * polynomial (pure arithmetic on engine-identical doubles — no
    * erf dependency), then the BH step-up at α=0.05: reject all
    * p ≤ p_(k*) where k* is the largest rank with p ≤ rank·α/m. The
    * rank window runs over the m=5-row family frame, not the corpus.
    */
  def statBenjaminiHochberg(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(dec(col("value"))).as("v"))
    val l = daily.select(col("event_type"), col("day").as("d1"), col("v").as("v1"))
    val r = daily.select(col("event_type"), col("day").as("d2"), col("v").as("v2"))
    val sCount = l.join(r, Seq("event_type")).filter(col("d1") < col("d2"))
      .groupBy("event_type")
      .agg(sum(when(col("v2") > col("v1"), 1L)
        .when(col("v2") < col("v1"), -1L).otherwise(0L)).as("s"))
    val nDays = daily.groupBy("event_type").agg(count(lit(1)).as("n"))
    val zp = sCount.join(broadcast(nDays), "event_type")
      .withColumn("var_s",
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5)).cast("double") / 18.0d)
      .withColumn("z",
        when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(col("var_s")))
          .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(col("var_s")))
          .otherwise(0.0d))
      .selectExpr("event_type", "z",
        // A&S 26.2.17 upper-tail polynomial; p = 2*(1 - Phi(|z|))
        """2 * (exp(-abs(z) * abs(z) / 2) / 2.5066282746310002
          |  * (0.319381530 * (1 / (1 + 0.2316419 * abs(z)))
          |    - 0.356563782 * pow(1 / (1 + 0.2316419 * abs(z)), 2)
          |    + 1.781477937 * pow(1 / (1 + 0.2316419 * abs(z)), 3)
          |    - 1.821255978 * pow(1 / (1 + 0.2316419 * abs(z)), 4)
          |    + 1.330274429 * pow(1 / (1 + 0.2316419 * abs(z)), 5)))
          |  AS p""".stripMargin)
    val ranked = zp
      .withColumn("rk", row_number().over(
        Window.orderBy(col("p"), col("event_type"))).cast("long"))
      .withColumn("m", count(lit(1)).over(Window.partitionBy()).cast("long"))
      .withColumn("crit", expr("CAST(rk AS DOUBLE) * 0.05 / m"))
    val kstar = ranked.agg(
      coalesce(max(when(col("p") <= col("crit"), col("rk"))), lit(0L))
        .as("kstar"))
    ranked.crossJoin(broadcast(kstar))
      .selectExpr("event_type", "round(z, 6) AS z", "round(p, 9) AS p",
        "rk", "round(crit, 9) AS bh_crit", "rk <= kstar AS rejected")
      .orderBy("rk")
  }
  val statBenjaminiHochbergSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    sum(CAST(value AS DECIMAL(14,2))) AS v
      |  FROM events GROUP BY 1, 2),
      |sc AS (
      |  SELECT l.event_type,
      |    CAST(sum(CASE WHEN r.v > l.v THEN 1
      |      WHEN r.v < l.v THEN -1 ELSE 0 END) AS BIGINT) AS s
      |  FROM daily l JOIN daily r
      |    ON l.event_type = r.event_type AND l.day < r.day
      |  GROUP BY 1),
      |nd AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1),
      |zv AS (
      |  SELECT sc.event_type,
      |    CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
      |        / sqrt(CAST(n * (n - 1) * (2 * n + 5) AS DOUBLE) / 18.0)
      |      WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
      |        / sqrt(CAST(n * (n - 1) * (2 * n + 5) AS DOUBLE) / 18.0)
      |      ELSE 0.0 END AS z
      |  FROM sc JOIN nd ON sc.event_type = nd.event_type),
      |zp AS (
      |  SELECT event_type, z,
      |    2 * (exp(-abs(z) * abs(z) / 2) / 2.5066282746310002
      |      * (0.319381530 * (1 / (1 + 0.2316419 * abs(z)))
      |        - 0.356563782 * pow(1 / (1 + 0.2316419 * abs(z)), 2)
      |        + 1.781477937 * pow(1 / (1 + 0.2316419 * abs(z)), 3)
      |        - 1.821255978 * pow(1 / (1 + 0.2316419 * abs(z)), 4)
      |        + 1.330274429 * pow(1 / (1 + 0.2316419 * abs(z)), 5))) AS p
      |  FROM zv),
      |ranked AS (
      |  SELECT event_type, z, p,
      |    CAST(row_number() OVER (ORDER BY p, event_type) AS BIGINT) AS rk,
      |    CAST(count(*) OVER () AS BIGINT) AS m
      |  FROM zp),
      |ks AS (
      |  SELECT coalesce(max(CASE WHEN p <= CAST(rk AS DOUBLE) * 0.05 / m
      |    THEN rk END), 0) AS kstar
      |  FROM ranked)
      |SELECT event_type, round(z, 6) AS z, round(p, 9) AS p, rk,
      |  round(CAST(rk AS DOUBLE) * 0.05 / m, 9) AS bh_crit,
      |  rk <= kstar AS rejected
      |FROM ranked, ks ORDER BY rk""".stripMargin

  /** C542 win_kaufman_er — Kaufman's efficiency ratio on daily
    * revenue: ER = |c_t − c_{t−10}| / Σ|daily changes| over the same
    * 10-day window — the trending-vs-churn screen ahead of adaptive
    * MAs. Numerator and denominator are exact BIGINT cents (the
    * window sums integers, never floats); ONE IEEE division per row.
    * The window frame sits above the daily aggregate.
    */
  def winKaufmanEr(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val wo = Window.orderBy("day")
    daily
      .withColumn("chg", abs(col("c") - lag(col("c"), 1).over(wo)))
      .withColumn("net", abs(col("c") - lag(col("c"), 10).over(wo)))
      .withColumn("vol", sum(col("chg")).over(wo.rowsBetween(-9, 0)))
      .filter(col("net").isNotNull)
      .selectExpr("day", "round(CAST(c AS DOUBLE) / 100, 6) AS revenue",
        """round(CAST(net AS DOUBLE) / nullif(vol, 0), 6)
          |  AS efficiency_ratio""".stripMargin)
      .orderBy("day")
  }
  val winKaufmanErSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |w AS (
      |  SELECT day, c,
      |    abs(c - lag(c, 1) OVER (ORDER BY day)) AS chg,
      |    abs(c - lag(c, 10) OVER (ORDER BY day)) AS net
      |  FROM daily),
      |v AS (
      |  SELECT day, c, net,
      |    sum(chg) OVER (ORDER BY day ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
      |      AS vol
      |  FROM w)
      |SELECT day, round(CAST(c AS DOUBLE) / 100, 6) AS revenue,
      |  round(CAST(net AS DOUBLE) / nullif(vol, 0), 6) AS efficiency_ratio
      |FROM v WHERE net IS NOT NULL ORDER BY day""".stripMargin

  /** C543 stat_poisson_bootstrap_ci — the MAP-SIDE bootstrap: B=32
    * replicates of the mean order value, each order carrying a
    * DETERMINISTIC Poisson(1) weight per replicate (inverse-CDF over
    * the md5-fraction uniform — reproducible across engines and
    * executors, no RNG state). Each replicate reduces map-side to one
    * (Σw·x, Σw) pair — the corpus is read once, shuffled as 32 tiny
    * rows. Replicate means quantize at 1e-6 so the bootstrap SE and
    * the rank-based 80% CI (ranks 4/29 of 32) are exact-integer work.
    */
  def statPoissonBootstrapCi(s: SparkSession, d: String): DataFrame = {
    val weighted = orders(s, d)
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("x"))
      .select(col("o_orderkey"), col("x"),
        explode(expr("sequence(0, 31)")).as("b"))
      .withColumn("u", expr(
        "conv(substring(md5(concat(o_orderkey, ':', b)), 1, 6), 16, 10) / 16777216.0"))
      .withColumn("w", expr(
        """CASE WHEN u < 0.367879441 THEN 0 WHEN u < 0.735758882 THEN 1
          |  WHEN u < 0.919698603 THEN 2 WHEN u < 0.980988245 THEN 3
          |  WHEN u < 0.996340153 THEN 4 WHEN u < 0.999405815 THEN 5
          |  WHEN u < 0.999916758 THEN 6 WHEN u < 0.999989891 THEN 7
          |  ELSE 8 END""".stripMargin))
    val reps = weighted.groupBy("b")
      .agg(sum(expr("w * x")).cast("long").as("swx"),
        sum(col("w")).cast("long").as("swn"))
      .selectExpr("b",
        """CAST(floor(CAST(swx AS DOUBLE) / nullif(swn, 0) / 100 * 1e6 + 0.5)
          |  AS BIGINT) AS q""".stripMargin)
      .withColumn("rk", row_number().over(Window.orderBy(col("q"), col("b"))))
    val full = orders(s, d).agg(
      count(lit(1)).cast("long").as("n_orders"),
      sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("sx"))
    reps.agg(
        count(lit(1)).cast("long").as("n_replicates"),
        sum(col("q")).cast("long").as("sq"),
        sum(expr("CAST(q AS DECIMAL(38,0)) * q")).as("sqq"),
        min(when(col("rk") === 4, col("q"))).as("qlo"),
        min(when(col("rk") === 29, col("q"))).as("qhi"))
      .crossJoin(broadcast(full))
      .selectExpr("n_orders", "n_replicates",
        "round(CAST(sx AS DOUBLE) / n_orders / 100, 6) AS mean_order_value",
        """round(sqrt(CAST(CAST(n_replicates AS DECIMAL(38,0)) * sqq
          |    - CAST(sq AS DECIMAL(38,0)) * sq AS DOUBLE)
          |  / (CAST(n_replicates AS DOUBLE) * (n_replicates - 1)))
          |  / 1e6, 6) AS boot_se""".stripMargin,
        "round(CAST(qlo AS DOUBLE) / 1e6, 6) AS ci80_lo",
        "round(CAST(qhi AS DOUBLE) / 1e6, 6) AS ci80_hi")
  }
  val statPoissonBootstrapCiSql: String =
    """WITH weighted AS (
      |  SELECT o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS x, b,
      |    CAST('0x' || substr(md5(o_orderkey || ':' || b), 1, 6) AS BIGINT)
      |      / 16777216.0 AS u
      |  FROM orders, (SELECT unnest(generate_series(0, 31)) AS b) bs),
      |pw AS (
      |  SELECT b, x,
      |    CASE WHEN u < 0.367879441 THEN 0 WHEN u < 0.735758882 THEN 1
      |      WHEN u < 0.919698603 THEN 2 WHEN u < 0.980988245 THEN 3
      |      WHEN u < 0.996340153 THEN 4 WHEN u < 0.999405815 THEN 5
      |      WHEN u < 0.999916758 THEN 6 WHEN u < 0.999989891 THEN 7
      |      ELSE 8 END AS w
      |  FROM weighted),
      |reps AS (
      |  SELECT b,
      |    CAST(floor(CAST(CAST(sum(w * x) AS BIGINT) AS DOUBLE)
      |      / nullif(CAST(sum(w) AS BIGINT), 0) / 100 * 1e6 + 0.5) AS BIGINT)
      |      AS q
      |  FROM pw GROUP BY 1),
      |ranked AS (
      |  SELECT q, row_number() OVER (ORDER BY q, b) AS rk FROM reps),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_replicates,
      |    CAST(sum(q) AS BIGINT) AS sq,
      |    CAST(sum(CAST(q AS DECIMAL(38,0)) * q) AS DECIMAL(38,0)) AS sqq,
      |    min(CASE WHEN rk = 4 THEN q END) AS qlo,
      |    min(CASE WHEN rk = 29 THEN q END) AS qhi
      |  FROM ranked),
      |full_s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS sx
      |  FROM orders)
      |SELECT n_orders, n_replicates,
      |  round(CAST(sx AS DOUBLE) / n_orders / 100, 6) AS mean_order_value,
      |  round(sqrt(CAST(CAST(n_replicates AS DECIMAL(38,0)) * sqq
      |      - CAST(sq AS DECIMAL(38,0)) * sq AS DOUBLE)
      |    / (CAST(n_replicates AS DOUBLE) * (n_replicates - 1)))
      |    / 1e6, 6) AS boot_se,
      |  round(CAST(qlo AS DOUBLE) / 1e6, 6) AS ci80_lo,
      |  round(CAST(qhi AS DOUBLE) / 1e6, 6) AS ci80_hi
      |FROM agg, full_s""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_sax_motifs" -> (timeSaxMotifs _),
    "stat_benjamini_hochberg" -> (statBenjaminiHochberg _),
    "win_kaufman_er" -> (winKaufmanEr _),
    "stat_poisson_bootstrap_ci" -> (statPoissonBootstrapCi _),
  )

  val oracle: Map[String, String] = Map(
    "time_sax_motifs" -> timeSaxMotifsSql,
    "stat_benjamini_hochberg" -> statBenjaminiHochbergSql,
    "win_kaufman_er" -> winKaufmanErSql,
    "stat_poisson_bootstrap_ci" -> statPoissonBootstrapCiSql,
  )
}
