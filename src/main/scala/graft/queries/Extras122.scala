package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 22 (C485–C490): changepoint detection, portmanteau
  * autocorrelation testing, Markov transition matrices, ranking
  * evaluation (NDCG), channel-breakout screening, and the Nelson–Aalen
  * cumulative-hazard estimator.
  */
object Extras122 {

  /** C485 time_changepoint_binary — single-changepoint detection by
    * binary segmentation over the daily revenue series: the split k
    * maximizing the between-segment objective B(k) = S_k²/k +
    * (S−S_k)²/(n−k) (equivalently the SSE reduction; derived from
    * prefix sums, O(days) candidates). Determinism: prefix/total sums
    * are EXACT BIGINT cents, B is one identical IEEE formula per
    * candidate (bit-equal inputs → bit-equal doubles → identical
    * ranking), ties broken by day; 30-day guard bands exclude trivial
    * edge splits. The candidate scan is a window over the O(days)
    * daily aggregate — nothing quadratic.
    */
  def timeChangepointBinary(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val tot = daily.agg(count(lit(1)).cast("long").as("n"),
      sum(col("c")).cast("long").as("stot"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("k", row_number().over(Window.orderBy("day")).cast("long"))
      .withColumn("sk", sum(col("c")).over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .filter(col("k") >= 30 && col("n") - col("k") >= 30)
      .withColumn("gain",
        expr("""CAST(sk AS DOUBLE) * sk / k
                + CAST(stot - sk AS DOUBLE) * (stot - sk) / (n - k)
                - CAST(stot AS DOUBLE) * stot / n"""))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("gain").desc, col("day"))))
      .filter(col("rn") === 1)
      .select(
        col("day").as("split_day"), col("k").as("n_left"),
        (col("n") - col("k")).as("n_right"),
        round(col("sk").cast("double") / col("k") / 100, 6).as("mean_left"),
        round((col("stot") - col("sk")).cast("double")
          / (col("n") - col("k")) / 100, 6).as("mean_right"),
        round(col("gain") / 1e4, 2).as("gain"))
  }
  val timeChangepointBinarySql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS stot FROM daily),
      |pre AS (
      |  SELECT day, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
      |    CAST(sum(c) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sk
      |  FROM daily),
      |g AS (
      |  SELECT day, k, n - k AS nr, sk, stot, n,
      |    CAST(sk AS DOUBLE) * sk / k
      |      + CAST(stot - sk AS DOUBLE) * (stot - sk) / (n - k)
      |      - CAST(stot AS DOUBLE) * stot / n AS gain
      |  FROM pre, tot
      |  WHERE k >= 30 AND n - k >= 30),
      |r AS (
      |  SELECT *, row_number() OVER (ORDER BY gain DESC, day) AS rn FROM g)
      |SELECT day AS split_day, k AS n_left, nr AS n_right,
      |  round(CAST(sk AS DOUBLE) / k / 100, 6) AS mean_left,
      |  round(CAST(stot - sk AS DOUBLE) / nr / 100, 6) AS mean_right,
      |  round(gain / 1e4, 2) AS gain
      |FROM r WHERE rn = 1""".stripMargin

  /** C486 stat_ljung_box — Ljung–Box portmanteau test (are the first
    * 10 autocorrelations of daily revenue jointly zero): Q = n(n+2)·
    * Σ_{k=1..10} ρ̂k²/(n−k). Each ρ̂k comes from the n²-scaled exact
    * identity ρk = [n²·Sxy − n·S·(Σt+Σh) + (n−k)·S²] / [n·(n·SS − S²)]
    * — every term an exact DECIMAL(38,0) (products reach ~1e28), ONE
    * IEEE division per lag, per-lag ρ²/(n−k) at a 1e-12 fixed-point
    * grain summed exactly over the 10 bounded lags. Lagged pairs come
    * from a 10-way offset self-join on the dense row_number — O(10·
    * days), not a window-per-lag pile-up; both engines use the same
    * relational shape (no array/unnest dialect exposure).
    */
  def statLjungBox(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS DECIMAL(38,0))"))
        .cast("decimal(38,0)").as("c"))
      .withColumn("rn", row_number().over(Window.orderBy("day")).cast("long"))
    val tot = daily.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("stot"),
      sum(expr("c * c")).cast("decimal(38,0)").as("ss"))
    // lags arrive by EXPLODING a literal array on the left side (a 10×
    // generator, no join), so the lag-offset condition is a plain
    // equi-join on (ra − lag) = rb — hash-joinable, never a BNLJ
    val a = daily.select(col("rn").as("ra"), col("c").as("ca"))
      .withColumn("lag", explode(array((1L to 10L).map(lit): _*)))
    val b = daily.select(col("rn").as("rb"), col("c").as("cb"))
    val pairs = a
      .join(b, col("rb") === col("ra") - col("lag"))
      .groupBy("lag")
      .agg(
        sum(expr("ca * cb")).cast("decimal(38,0)").as("sxy"),
        sum(col("ca")).cast("decimal(38,0)").as("stail"),
        sum(col("cb")).cast("decimal(38,0)").as("shead"))
    pairs.crossJoin(broadcast(tot))
      .withColumn("rho", expr(
        """CAST(CAST(n AS DECIMAL(38,0)) * n * sxy
             - CAST(n AS DECIMAL(38,0)) * stot * (stail + shead)
             + CAST(n - lag AS DECIMAL(38,0)) * stot * stot AS DOUBLE)
           / CAST(CAST(n AS DECIMAL(38,0))
             * (CAST(n AS DECIMAL(38,0)) * ss - stot * stot) AS DOUBLE)"""))
      .withColumn("fx", expr(
        "CAST(floor(rho * rho / (n - lag) * 1e12 + 0.5) AS BIGINT)"))
      .agg(
        max(col("n")).as("n_days"),
        round(max(col("n")).cast("double") * (max(col("n")) + 2)
          * sum(col("fx")).cast("double") / 1e12, 4).as("q_stat"))
      .selectExpr("n_days", "q_stat", "CAST(10 AS BIGINT) AS dof",
        "q_stat > 18.31 AS reject_white_noise")
  }
  val statLjungBoxSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS c
      |  FROM lineitem GROUP BY 1),
      |srs AS (
      |  SELECT c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
      |  FROM daily),
      |tot AS (
      |  SELECT count(*) AS n, CAST(sum(c) AS DECIMAL(38,0)) AS stot,
      |    CAST(sum(c * c) AS DECIMAL(38,0)) AS ss
      |  FROM srs),
      |ks AS (SELECT unnest(generate_series(1, 10)) AS lag),
      |pairs AS (
      |  SELECT ks.lag,
      |    CAST(sum(a.c * b.c) AS DECIMAL(38,0)) AS sxy,
      |    CAST(sum(a.c) AS DECIMAL(38,0)) AS stail,
      |    CAST(sum(b.c) AS DECIMAL(38,0)) AS shead
      |  FROM srs a, ks, srs b
      |  WHERE b.rn = a.rn - ks.lag
      |  GROUP BY 1),
      |rho AS (
      |  SELECT lag, n,
      |    CAST(CAST(n AS DECIMAL(38,0)) * n * sxy
      |         - CAST(n AS DECIMAL(38,0)) * stot * (stail + shead)
      |         + CAST(n - lag AS DECIMAL(38,0)) * stot * stot AS DOUBLE)
      |      / CAST(CAST(n AS DECIMAL(38,0))
      |         * (CAST(n AS DECIMAL(38,0)) * ss - stot * stot) AS DOUBLE) AS rho
      |  FROM pairs, tot),
      |fx AS (
      |  SELECT n, CAST(floor(rho * rho / (n - lag) * 1e12 + 0.5) AS BIGINT) AS fx
      |  FROM rho)
      |SELECT max(n) AS n_days,
      |  round(CAST(max(n) AS DOUBLE) * (max(n) + 2)
      |    * CAST(sum(fx) AS DOUBLE) / 1e12, 4) AS q_stat,
      |  CAST(10 AS BIGINT) AS dof,
      |  round(CAST(max(n) AS DOUBLE) * (max(n) + 2)
      |    * CAST(sum(fx) AS DOUBLE) / 1e12, 4) > 18.31 AS reject_white_noise
      |FROM fx""".stripMargin

  /** C487 analytics_markov_transitions — first-order Markov transition
    * matrix over per-user event sequences: lead(event_type) within the
    * (ts, event_id)-ordered user stream (the same total order every
    * sessionization row uses), pair counts, row-normalized
    * probabilities as ONE exact-integer division each. The window and
    * the pair aggregate share the user_id shuffle; the matrix itself
    * is O(types²) — driver-trivial.
    */
  def analyticsMarkovTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double")
        / sum(col("n")).over(Window.partitionBy("from_type")), 6))
      .orderBy("from_type", "to_type")
  }
  val analyticsMarkovTransitionsSql: String =
    """WITH seq AS (
      |  SELECT event_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events),
      |pairs AS (
      |  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      |  FROM seq WHERE next_type IS NOT NULL
      |  GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 6) AS p
      |FROM pairs ORDER BY from_type, to_type""".stripMargin

  /** C488 text_ndcg_eval — ranking-quality evaluation: NDCG@10 of a
    * BM25-style length-normalized ranking against graded relevance =
    * raw term frequency, for the corpus' top-5 document-frequency
    * terms (deterministic probe set: df DESC, term). The system score
    * tf/(tf + 1.2·(0.25 + 0.75·dl/avdl)) is one IEEE expression over
    * exact integer tf/dl/avdl inputs — bit-equal cross-engine, and
    * row_number breaks any remaining tie on doc_id. DCG and IDCG are
    * 1e-9 fixed-point BIGINT sums over the bounded @10 frames. Scale:
    * everything rides the (term) and (doc) shuffles; the probe set is
    * a 5-row broadcast.
    */
  def textNdcgEval(s: SparkSession, d: String): DataFrame = {
    val tf = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).cast("long").as("dl"))
    val avdl = dl.agg((sum(col("dl")).cast("double") / count(lit(1))).as("avdl"))
    val probes = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("prn", row_number().over(
        Window.orderBy(col("df").desc, col("term"))))
      .filter(col("prn") <= 5).drop("prn")
    val scored = tf.join(broadcast(probes), "term")
      .join(dl, "doc_id").crossJoin(broadcast(avdl))
      .withColumn("score", expr(
        "CAST(tf AS DOUBLE) / (tf + 1.2 * (0.25 + 0.75 * dl / avdl))"))
      .withColumn("r_sys", row_number().over(
        Window.partitionBy("term").orderBy(col("score").desc, col("doc_id"))))
      .withColumn("r_ideal", row_number().over(
        Window.partitionBy("term").orderBy(col("tf").desc, col("doc_id"))))
    scored.groupBy("term")
      .agg(
        max(col("df")).as("df"),
        sum(when(col("r_sys") <= 10, expr(
          "CAST(floor(tf / log2(r_sys + 1) * 1e9 + 0.5) AS BIGINT)"))
          .otherwise(0L)).cast("long").as("dcg_fx"),
        sum(when(col("r_ideal") <= 10, expr(
          "CAST(floor(tf / log2(r_ideal + 1) * 1e9 + 0.5) AS BIGINT)"))
          .otherwise(0L)).cast("long").as("idcg_fx"))
      .select(col("term"), col("df"),
        round(col("dcg_fx").cast("double") / col("idcg_fx"), 6).as("ndcg_10"))
      .orderBy("term")
  }
  val textNdcgEvalSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      |avdl AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avdl FROM dl),
      |probes AS (
      |  SELECT term, df FROM (
      |    SELECT term, count(*) AS df,
      |      row_number() OVER (ORDER BY count(*) DESC, term) AS prn
      |    FROM tf GROUP BY term)
      |  WHERE prn <= 5),
      |scored AS (
      |  SELECT tf.term, probes.df, tf.tf,
      |    row_number() OVER (PARTITION BY tf.term
      |      ORDER BY CAST(tf.tf AS DOUBLE) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avdl.avdl)) DESC,
      |        tf.doc_id) AS r_sys,
      |    row_number() OVER (PARTITION BY tf.term
      |      ORDER BY tf.tf DESC, tf.doc_id) AS r_ideal
      |  FROM tf
      |  JOIN probes ON tf.term = probes.term
      |  JOIN dl ON tf.doc_id = dl.doc_id
      |  CROSS JOIN avdl)
      |SELECT term, max(df) AS df,
      |  round(CAST(CAST(sum(CASE WHEN r_sys <= 10
      |      THEN CAST(floor(tf / log2(r_sys + 1) * 1e9 + 0.5) AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS DOUBLE)
      |    / CAST(sum(CASE WHEN r_ideal <= 10
      |      THEN CAST(floor(tf / log2(r_ideal + 1) * 1e9 + 0.5) AS BIGINT)
      |      ELSE 0 END) AS BIGINT), 6) AS ndcg_10
      |FROM scored GROUP BY term ORDER BY term""".stripMargin

  /** C489 win_donchian_breakout — Donchian channel screening with ZERO
    * floating point anywhere: daily hi/lo/close in exact cents (close
    * = the day's last fill by the unique (orderkey, linenumber) key,
    * via max_by/arg_max on orderkey·100+linenumber), 20-day prior
    * channel from rows(-20, -1) frame max/min, breakout = exact BIGINT
    * comparison, yearly rollup. The channel window runs over the
    * O(days) daily aggregate.
    */
  def winDonchianBreakout(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .select(col("l_shipdate"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("pc"),
        (col("l_orderkey") * 100 + col("l_linenumber")).as("fillkey"))
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(max(col("pc")).as("hi"), min(col("pc")).as("lo"),
        max_by(col("pc"), col("fillkey")).as("close"))
    val wc = Window.orderBy("day").rowsBetween(-20, -1)
    daily
      .withColumn("rn", row_number().over(Window.orderBy("day")))
      .withColumn("ch_hi", max(col("hi")).over(wc))
      .withColumn("ch_lo", min(col("lo")).over(wc))
      .filter(col("rn") > 20)
      .groupBy(year(col("day")).cast("long").as("yr"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(when(col("close") > col("ch_hi"), 1L).otherwise(0L))
          .cast("long").as("n_breakout_up"),
        sum(when(col("close") < col("ch_lo"), 1L).otherwise(0L))
          .cast("long").as("n_breakout_down"))
      .orderBy("yr")
  }
  val winDonchianBreakoutSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    max(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS hi,
      |    min(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS lo,
      |    arg_max(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT),
      |      l_orderkey * 100 + l_linenumber) AS close
      |  FROM lineitem GROUP BY 1),
      |ch AS (
      |  SELECT day, close,
      |    row_number() OVER (ORDER BY day) AS rn,
      |    max(hi) OVER (ORDER BY day ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS ch_hi,
      |    min(lo) OVER (ORDER BY day ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS ch_lo
      |  FROM daily)
      |SELECT CAST(year(day) AS BIGINT) AS yr, count(*) AS n_days,
      |  CAST(sum(CASE WHEN close > ch_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_breakout_up,
      |  CAST(sum(CASE WHEN close < ch_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_breakout_down
      |FROM ch WHERE rn > 20
      |GROUP BY 1 ORDER BY yr""".stripMargin

  /** C490 stat_nelson_aalen — Nelson–Aalen cumulative-hazard estimator
    * over the same customer-lifetime table as the C317 Kaplan–Meier
    * row (time = first→last order gap, all events uncensored): H(t) =
    * Σ_{tᵢ≤t} dᵢ/n_riskᵢ. The per-time hazard increment rounds to a
    * 1e-9 fixed-point BIGINT so the cumulative sum is EXACT (the KM
    * row's ordered float-product idiom, hardened further); the
    * Breslow survivor exp(−H) is one IEEE call per row. Window runs
    * over the bounded distinct-time table.
    */
  def statNelsonAalen(s: SparkSession, d: String): DataFrame = {
    val life = orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(datediff(max(col("o_orderdate").cast("date")),
        min(col("o_orderdate").cast("date"))).as("t"))
      .filter(col("t") > 0)
    val byT = life.groupBy("t").agg(count(lit(1)).as("d"))
    val tot = life.agg(count(lit(1)).as("n0"))
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val w = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n0") - coalesce(sum(col("d")).over(wPrev), lit(0L)))
      .withColumn("fx", expr(
        "CAST(floor(1e9 * d / n_risk + 0.5) AS BIGINT)"))
      .withColumn("h", sum(col("fx")).over(w).cast("long").cast("double") / 1e9)
      .select(col("t").cast("long").as("t_days"), col("d"),
        col("n_risk").cast("long").as("n_risk"),
        round(col("h"), 6).as("h_t"),
        round(exp(-col("h")), 6).as("s_breslow"))
      .orderBy("t_days")
  }
  val statNelsonAalenSql: String =
    """WITH life AS (
      |  SELECT o_custkey,
      |    date_diff('day', min(CAST(o_orderdate AS DATE)),
      |      max(CAST(o_orderdate AS DATE))) AS t
      |  FROM orders GROUP BY 1 HAVING t > 0),
      |byt AS (SELECT t, count(*) AS d FROM life GROUP BY 1),
      |tot AS (SELECT count(*) AS n0 FROM life),
      |r AS (
      |  SELECT t, d,
      |    n0 - coalesce(sum(d) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      |  FROM byt, tot),
      |fx AS (
      |  SELECT t, d, n_risk,
      |    CAST(floor(1e9 * d / n_risk + 0.5) AS BIGINT) AS fx
      |  FROM r),
      |h AS (
      |  SELECT t, d, n_risk,
      |    CAST(CAST(sum(fx) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS DOUBLE) / 1e9 AS h
      |  FROM fx)
      |SELECT CAST(t AS BIGINT) AS t_days, d, CAST(n_risk AS BIGINT) AS n_risk,
      |  round(h, 6) AS h_t, round(exp(-h), 6) AS s_breslow
      |FROM h ORDER BY t_days""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_changepoint_binary" -> (timeChangepointBinary _),
    "stat_ljung_box" -> (statLjungBox _),
    "analytics_markov_transitions" -> (analyticsMarkovTransitions _),
    "text_ndcg_eval" -> (textNdcgEval _),
    "win_donchian_breakout" -> (winDonchianBreakout _),
    "stat_nelson_aalen" -> (statNelsonAalen _),
  )

  val oracle: Map[String, String] = Map(
    "time_changepoint_binary" -> timeChangepointBinarySql,
    "stat_ljung_box" -> statLjungBoxSql,
    "analytics_markov_transitions" -> analyticsMarkovTransitionsSql,
    "text_ndcg_eval" -> textNdcgEvalSql,
    "win_donchian_breakout" -> winDonchianBreakoutSql,
    "stat_nelson_aalen" -> statNelsonAalenSql,
  )
}
