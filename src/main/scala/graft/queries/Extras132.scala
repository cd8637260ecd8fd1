package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 32 (C532–C535): rescaled-range Hurst exponent, Lorenz-curve
  * revenue concentration, Cook's-distance regression influence, and
  * Mood's median test.
  */
object Extras132 {

  /** C532 time_hurst_rs — rescaled-range (R/S) Hurst exponent of the
    * daily-revenue series over dyadic block sizes {16…256}: within
    * each full block, the cumulative deviation is cleared of its
    * rational mean (n·cs_k − k·Sc, exact BIGINT), so R·n = max−min is
    * exact and R/S = Rn/√(n·ΣC² − Sc²) needs ONE IEEE sqrt+division
    * per block from exact integers. Block mean of ln(R/S) stays exact
    * via 1e-9-grain quantization + integer division; H is the log–log
    * OLS slope over the 5 sizes (exact DECIMAL normal equations, one
    * final division). Every window partitions on (size, block).
    */
  def timeHurstRs(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .withColumn("t", row_number().over(Window.orderBy("day")).cast("long"))
    val exploded = daily.select(col("t"), col("c"),
        explode(expr("array(16L, 32L, 64L, 128L, 256L)")).as("size"))
      .withColumn("block", expr("(t - 1) div size"))
      .withColumn("pos", expr("(t - 1) % size + 1"))
    val w = Window.partitionBy("size", "block")
    val wo = w.orderBy("t")
    val windowed = exploded
      .withColumn("cs", sum(col("c")).over(
        wo.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("sc", sum(col("c")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") === col("size"))
      .withColumn("nd", expr("size * cs - pos * sc"))
    val blocks = windowed.groupBy("size", "block")
      .agg(max(col("nd")).as("nd_max"), min(col("nd")).as("nd_min"),
        max(col("sc")).as("scb"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("scc"))
      .selectExpr("size", "nd_max - nd_min AS rn",
        """CAST(size AS DECIMAL(38,0)) * scc
          |  - CAST(scb AS DECIMAL(38,0)) * scb AS den""".stripMargin)
      .filter(expr("rn > 0 AND den > 0"))
      .selectExpr("size",
        """CAST(floor(ln(CAST(rn AS DOUBLE)
          |  / sqrt(CAST(den AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS q""".stripMargin)
    val perSize = blocks.groupBy("size")
      .agg(count(lit(1)).cast("long").as("n_blocks"),
        sum(col("q")).cast("long").as("sq"))
      .withColumn("yq", expr("sq div n_blocks"))
      .withColumn("xq", expr("CAST(floor(ln(size) * 1e9 + 0.5) AS BIGINT)"))
    val fit = perSize.agg(
        count(lit(1)).cast("long").as("k"),
        sum(col("xq")).cast("decimal(38,0)").as("sx"),
        sum(col("yq")).cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(xq AS DECIMAL(38,0)) * xq")).as("sxx"),
        sum(expr("CAST(xq AS DECIMAL(38,0)) * yq")).as("sxy"))
      .selectExpr(
        """round(CAST(k * sxy - sx * sy AS DOUBLE)
          |  / CAST(k * sxx - sx * sx AS DOUBLE), 6) AS hurst_h""".stripMargin)
    perSize.crossJoin(broadcast(fit))
      .selectExpr("size", "n_blocks",
        "round(CAST(sq AS DOUBLE) / n_blocks / 1e9, 6) AS mean_log_rs",
        "hurst_h")
      .orderBy("size")
  }
  val timeHurstRsSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |td AS (
      |  SELECT c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      |  FROM daily),
      |exploded AS (
      |  SELECT t, c, size, (t - 1) // size AS block,
      |    (t - 1) % size + 1 AS pos
      |  FROM td, (VALUES (CAST(16 AS BIGINT)), (32), (64), (128), (256))
      |    sz(size)),
      |windowed AS (
      |  SELECT size, block, pos, c,
      |    sum(c) OVER (PARTITION BY size, block ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
      |    sum(c) OVER (PARTITION BY size, block) AS sc,
      |    count(*) OVER (PARTITION BY size, block) AS cnt
      |  FROM exploded),
      |blocks0 AS (
      |  SELECT size, block,
      |    max(size * cs - pos * sc) - min(size * cs - pos * sc) AS rn,
      |    CAST(size AS DECIMAL(38,0))
      |      * CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))
      |      - CAST(max(sc) AS DECIMAL(38,0)) * CAST(max(sc) AS DECIMAL(38,0))
      |      AS den
      |  FROM windowed WHERE cnt = size GROUP BY 1, 2),
      |blocks AS (
      |  SELECT size,
      |    CAST(floor(ln(CAST(rn AS DOUBLE) / sqrt(CAST(den AS DOUBLE)))
      |      * 1e9 + 0.5) AS BIGINT) AS q
      |  FROM blocks0 WHERE rn > 0 AND den > 0),
      |per_size AS (
      |  SELECT size, CAST(count(*) AS BIGINT) AS n_blocks,
      |    CAST(sum(q) AS BIGINT) AS sq,
      |    CAST(sum(q) AS BIGINT) // CAST(count(*) AS BIGINT) AS yq,
      |    CAST(floor(ln(size) * 1e9 + 0.5) AS BIGINT) AS xq
      |  FROM blocks GROUP BY 1),
      |fit AS (
      |  SELECT round(CAST(k * sxy - sx * sy AS DOUBLE)
      |      / CAST(k * sxx - sx * sx AS DOUBLE), 6) AS hurst_h
      |  FROM (
      |    SELECT CAST(count(*) AS BIGINT) AS k,
      |      CAST(sum(xq) AS DECIMAL(38,0)) AS sx,
      |      CAST(sum(yq) AS DECIMAL(38,0)) AS sy,
      |      CAST(sum(CAST(xq AS DECIMAL(38,0)) * xq) AS DECIMAL(38,0)) AS sxx,
      |      CAST(sum(CAST(xq AS DECIMAL(38,0)) * yq) AS DECIMAL(38,0)) AS sxy
      |    FROM per_size) t)
      |SELECT size, n_blocks,
      |  round(CAST(sq AS DOUBLE) / n_blocks / 1e9, 6) AS mean_log_rs,
      |  hurst_h
      |FROM per_size, fit ORDER BY size""".stripMargin

  /** C533 analytics_lorenz_deciles — revenue-concentration Lorenz
    * curve + Gini over customers ranked by lifetime spend: the rank is
    * the two-pass [[graft.plans.GlobalRank]] (range-partition +
    * offset join — NO single-task global window over the customer
    * corpus), deciles by ⌈10·rk/n⌉, cumulative shares over the 10-row
    * decile frame. Gini comes from the trapezoid rule cleared to ONE
    * exact DECIMAL numerator over n·S — a single final IEEE division.
    */
  def analyticsLorenzDeciles(s: SparkSession, d: String): DataFrame = {
    val spend = orders(s, d)
      .groupBy("o_custkey")
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("cents"))
    val ranked = graft.plans.GlobalRank.withGlobalRowNumberAndTotal(
      spend, "rk", "n", Seq(col("cents"), col("o_custkey")))
    val deciles = ranked
      .selectExpr("(10 * rk + n - 1) div n AS decile", "cents", "n")
      .groupBy("decile")
      .agg(count(lit(1)).cast("long").as("n_cust"),
        sum(col("cents")).cast("long").as("dc"),
        max(col("n")).cast("long").as("n"))
      .withColumn("cum_cust", sum(col("n_cust")).over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_cents", sum(col("dc")).over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)))
    val tot = deciles.agg(max(col("n")).as("nn"),
      sum(col("dc")).cast("decimal(38,0)").as("ss"),
      sum(expr("""CAST(n_cust AS DECIMAL(38,0))
        | * (2 * cum_cents - dc)""".stripMargin)).as("trap"))
    deciles.crossJoin(broadcast(tot))
      .selectExpr("decile", "n_cust",
        "round(CAST(dc AS DOUBLE) / 100, 6) AS revenue",
        "round(CAST(cum_cust AS DOUBLE) / nn, 6) AS cum_cust_share",
        "round(CAST(cum_cents AS DOUBLE) / CAST(ss AS DOUBLE), 6) AS cum_rev_share",
        """round(1.0 - CAST(trap AS DOUBLE)
          |  / (CAST(nn AS DOUBLE) * CAST(ss AS DOUBLE)), 6) AS gini""".stripMargin)
      .orderBy("decile")
  }
  val analyticsLorenzDecilesSql: String =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |ranked AS (
      |  SELECT cents,
      |    CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS rk,
      |    CAST(count(*) OVER () AS BIGINT) AS n
      |  FROM spend),
      |deciles AS (
      |  SELECT (10 * rk + n - 1) // n AS decile,
      |    CAST(count(*) AS BIGINT) AS n_cust,
      |    CAST(sum(cents) AS BIGINT) AS dc,
      |    CAST(max(n) AS BIGINT) AS n
      |  FROM ranked GROUP BY 1),
      |cum AS (
      |  SELECT decile, n_cust, dc, n,
      |    CAST(sum(n_cust) OVER w AS BIGINT) AS cum_cust,
      |    CAST(sum(dc) OVER w AS BIGINT) AS cum_cents
      |  FROM deciles
      |  WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW)),
      |tot AS (
      |  SELECT max(n) AS nn, CAST(sum(dc) AS DECIMAL(38,0)) AS ss,
      |    CAST(sum(CAST(n_cust AS DECIMAL(38,0)) * (2 * cum_cents - dc))
      |      AS DECIMAL(38,0)) AS trap
      |  FROM cum)
      |SELECT decile, n_cust,
      |  round(CAST(dc AS DOUBLE) / 100, 6) AS revenue,
      |  round(CAST(cum_cust AS DOUBLE) / nn, 6) AS cum_cust_share,
      |  round(CAST(cum_cents AS DOUBLE) / CAST(ss AS DOUBLE), 6) AS cum_rev_share,
      |  round(1.0 - CAST(trap AS DOUBLE)
      |    / (CAST(nn AS DOUBLE) * CAST(ss AS DOUBLE)), 6) AS gini
      |FROM cum, tot ORDER BY decile""".stripMargin

  /** C534 stat_cooks_distance — the ten most influential days of the
    * daily-revenue trend regression by Cook's distance. Shares C528's
    * exact cleared-denominator residual (Ê_t scaled by n·D, quantized
    * to milli-cents by one IEEE division of exact integers); leverage
    * clears the same way — h_t = [D + (n·t − Σt)²]/(n·D) — so
    * D_t = ê²·Hn·nD·(n−2)/(2·SSE·(nD−Hn)²) is a single fixed-order
    * IEEE chain over exact integers, identical in both engines.
    * Top-10 via ORDER BY + LIMIT (TakeOrdered — no global window).
    */
  def statCooksDistance(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .withColumn("t", row_number().over(Window.orderBy("day")).cast("long"))
    val fit = daily.agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("t")).cast("long").as("st"),
        sum(col("c")).cast("long").as("sc"),
        sum(expr("t * t")).cast("long").as("stt"),
        sum(expr("t * c")).cast("long").as("stc"))
      .selectExpr("n", "st",
        "CAST(n AS DECIMAL(38,0)) * stc - CAST(st AS DECIMAL(38,0)) * sc AS nb",
        "CAST(n AS DECIMAL(38,0)) * stt - CAST(st AS DECIMAL(38,0)) * st AS dd",
        "CAST(st AS DECIMAL(38,0)) AS std", "CAST(sc AS DECIMAL(38,0)) AS scd")
      .selectExpr("n", "st", "nb", "dd",
        "scd * dd - nb * std AS a2",
        "CAST(n AS DECIMAL(38,0)) * dd AS nd")
    val eq = daily.crossJoin(broadcast(fit))
      .selectExpr("day", "t", "n", "st", "dd", "nd",
        """CAST(floor(CAST(CAST(c AS DECIMAL(38,0)) * nd - a2
          |  - nb * CAST(n AS DECIMAL(38,0)) * t AS DOUBLE)
          |  / CAST(nd AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS e""".stripMargin)
      .selectExpr("day", "t", "n", "nd", "e",
        """dd + CAST(n * t - st AS DECIMAL(38,0)) * (n * t - st)
          |  AS hn""".stripMargin)
    val sse = eq.agg(sum(expr("CAST(e AS DECIMAL(38,0)) * e")).as("sse"))
    eq.crossJoin(broadcast(sse))
      .selectExpr("day", "e",
        """round(CAST(e AS DOUBLE) * e * CAST(hn AS DOUBLE)
          |  * CAST(nd AS DOUBLE) * (n - 2)
          |  / (2.0 * CAST(sse AS DOUBLE) * CAST(nd - hn AS DOUBLE)
          |     * CAST(nd - hn AS DOUBLE)), 6) AS cooks_d""".stripMargin,
        "round(CAST(e AS DOUBLE) / 100000, 6) AS residual_dollars")
      .selectExpr("day", "cooks_d", "residual_dollars")
      .orderBy(col("cooks_d").desc, col("day"))
      .limit(10)
  }
  val statCooksDistanceSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |td AS (
      |  SELECT day, c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      |  FROM daily),
      |sums AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(c) AS BIGINT) AS sc,
      |    CAST(sum(t * t) AS BIGINT) AS stt, CAST(sum(t * c) AS BIGINT) AS stc
      |  FROM td),
      |fit0 AS (
      |  SELECT n, st,
      |    CAST(n AS DECIMAL(38,0)) * stc - CAST(st AS DECIMAL(38,0)) * sc AS nb,
      |    CAST(n AS DECIMAL(38,0)) * stt - CAST(st AS DECIMAL(38,0)) * st AS dd,
      |    CAST(st AS DECIMAL(38,0)) AS std, CAST(sc AS DECIMAL(38,0)) AS scd
      |  FROM sums),
      |fit AS (
      |  SELECT n, st, nb, dd, scd * dd - nb * std AS a2,
      |    CAST(n AS DECIMAL(38,0)) * dd AS nd
      |  FROM fit0),
      |eq AS (
      |  SELECT day, t, n, nd, dd,
      |    CAST(floor(CAST(CAST(c AS DECIMAL(38,0)) * nd - a2
      |      - nb * CAST(n AS DECIMAL(38,0)) * t AS DOUBLE)
      |      / CAST(nd AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS e,
      |    dd + CAST(n * t - st AS DECIMAL(38,0)) * (n * t - st) AS hn
      |  FROM td, fit),
      |ssev AS (
      |  SELECT CAST(sum(CAST(e AS DECIMAL(38,0)) * e) AS DECIMAL(38,0)) AS sse
      |  FROM eq)
      |SELECT day,
      |  round(CAST(e AS DOUBLE) * e * CAST(hn AS DOUBLE)
      |    * CAST(nd AS DOUBLE) * (n - 2)
      |    / (2.0 * CAST(sse AS DOUBLE) * CAST(nd - hn AS DOUBLE)
      |       * CAST(nd - hn AS DOUBLE)), 6) AS cooks_d,
      |  round(CAST(e AS DOUBLE) / 100000, 6) AS residual_dollars
      |FROM eq, ssev
      |ORDER BY cooks_d DESC, day LIMIT 10""".stripMargin

  /** C535 stat_mood_median — Mood's median test on document length
    * (n_chars) between the en and de strata: the grand lower median
    * comes from the VALUE-FREQUENCY histogram (domain-bounded, no
    * corpus-scale sort — a group-by on n_chars then a cumulative
    * window over the bounded distinct-value frame), the 2×2
    * above/at-or-below table is one conditional aggregate, and the
    * χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) assembles in one
    * fixed-order IEEE chain over exact integer cell counts.
    */
  def statMoodMedian(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .filter(col("lang").isin("en", "de"))
      .select(col("lang"), col("n_chars"))
    val hist = docs.groupBy("n_chars").agg(count(lit(1)).as("f"))
      .withColumn("cum", sum(col("f")).over(
        Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)))
    val tot = docs.agg(count(lit(1)).cast("long").as("nn"))
    val med = hist.crossJoin(broadcast(tot))
      .filter(expr("cum >= (nn + 1) div 2"))
      .agg(min(col("n_chars")).cast("long").as("med"))
    docs.crossJoin(broadcast(med))
      .agg(
        max(col("med")).as("median_chars"),
        sum(when(col("lang") === "en" && col("n_chars") > col("med"), 1L)
          .otherwise(0L)).cast("long").as("a"),
        sum(when(col("lang") === "en" && col("n_chars") <= col("med"), 1L)
          .otherwise(0L)).cast("long").as("b"),
        sum(when(col("lang") === "de" && col("n_chars") > col("med"), 1L)
          .otherwise(0L)).cast("long").as("c"),
        sum(when(col("lang") === "de" && col("n_chars") <= col("med"), 1L)
          .otherwise(0L)).cast("long").as("dd"))
      .selectExpr("median_chars", "a", "b", "c", "dd AS d",
        """round(CAST(a + b + c + dd AS DOUBLE) * (a * dd - b * c)
          |  * (a * dd - b * c)
          |  / (CAST(a + b AS DOUBLE) * (c + dd) * (a + c) * (b + dd)),
          |  6) AS chi2""".stripMargin)
      .selectExpr("median_chars", "a", "b", "c", "d", "chi2",
        "chi2 > 3.841 AS significant")
  }
  val statMoodMedianSql: String =
    """WITH docs AS (
      |  SELECT lang, n_chars FROM documents WHERE lang IN ('en', 'de')),
      |hist AS (
      |  SELECT n_chars, count(*) AS f FROM docs GROUP BY 1),
      |cumh AS (
      |  SELECT n_chars,
      |    sum(f) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS cum
      |  FROM hist),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
      |med AS (
      |  SELECT CAST(min(n_chars) AS BIGINT) AS med
      |  FROM cumh, tot WHERE cum >= (nn + 1) // 2),
      |cells AS (
      |  SELECT max(med) AS median_chars,
      |    CAST(sum(CASE WHEN lang = 'en' AND n_chars > med THEN 1 ELSE 0 END)
      |      AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN lang = 'en' AND n_chars <= med THEN 1 ELSE 0 END)
      |      AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN lang = 'de' AND n_chars > med THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN lang = 'de' AND n_chars <= med THEN 1 ELSE 0 END)
      |      AS BIGINT) AS dd
      |  FROM docs, med),
      |x AS (
      |  SELECT median_chars, a, b, c, dd AS d,
      |    round(CAST(a + b + c + dd AS DOUBLE) * (a * dd - b * c)
      |      * (a * dd - b * c)
      |      / (CAST(a + b AS DOUBLE) * (c + dd) * (a + c) * (b + dd)),
      |      6) AS chi2
      |  FROM cells)
      |SELECT median_chars, a, b, c, d, chi2, chi2 > 3.841 AS significant
      |FROM x""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_hurst_rs" -> (timeHurstRs _),
    "analytics_lorenz_deciles" -> (analyticsLorenzDeciles _),
    "stat_cooks_distance" -> (statCooksDistance _),
    "stat_mood_median" -> (statMoodMedian _),
  )

  val oracle: Map[String, String] = Map(
    "time_hurst_rs" -> timeHurstRsSql,
    "analytics_lorenz_deciles" -> analyticsLorenzDecilesSql,
    "stat_cooks_distance" -> statCooksDistanceSql,
    "stat_mood_median" -> statMoodMedianSql,
  )
}
