package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 89 (C760–C763): classifier-audit + agreement + sequence
  * information — multiclass MCC, balanced accuracy, linear-weighted
  * Cohen's κ, and the Markov-chain entropy rate.
  *
  * Shared discipline: confusion matrices are EXACT count tables from
  * one scan (the "majority-lang-of-source" baseline predictor is
  * computed from the data itself, deterministically); κ_w margins and
  * weights are exact integer algebra over the ≤25-cell table;
  * per-transition entropy terms are quantized ·10⁶ before summing.
  */
object Extras189 {

  /** The shared confusion: true lang vs the majority-lang-of-source
    * baseline prediction (R1 tie-break on lang), exact counts.
    */
  private def confusion(s: SparkSession, d: String): DataFrame = {
    val bySrcLang = documents(s, d).groupBy("source", "lang")
      .agg(count(lit(1)).cast("long").as("m"))
    val pred = bySrcLang
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("m").desc, col("lang").asc)))
      .filter(col("rk") === 1)
      .select(col("source"), col("lang").as("pred"))
    documents(s, d).join(broadcast(pred), Seq("source"))
      .groupBy(col("lang").as("t"), col("pred").as("p"))
      .agg(count(lit(1)).cast("long").as("m"))
  }
  private val confusionSql: String =
    """bsl AS (
      |  SELECT source, lang, CAST(count(*) AS BIGINT) AS m
      |  FROM documents GROUP BY 1, 2),
      |pred AS (
      |  SELECT source, lang AS pred FROM (
      |    SELECT source, lang,
      |      row_number() OVER (PARTITION BY source ORDER BY m DESC, lang) AS rk
      |    FROM bsl) WHERE rk = 1),
      |conf AS (
      |  SELECT d.lang AS t, p.pred AS p, CAST(count(*) AS BIGINT) AS m
      |  FROM documents d JOIN pred p ON p.source = d.source
      |  GROUP BY 1, 2)""".stripMargin

  /** C760 stat_mcc_multiclass — the multiclass Matthews correlation
    * (Gorodkin's R_K) of the majority-source baseline:
    * (c·s − Σ_k t_k·p_k)/√((s²−Σp²)(s²−Σt²)) from exact confusion
    * counts (c = trace, s = total, t/p = margins). The single-number
    * audit that punishes majority-class gaming, generalizing the
    * binary MCC row.
    */
  def statMccMulticlass(s: SparkSession, d: String): DataFrame = {
    val conf = confusion(s, d)
    val margT = conf.groupBy("t").agg(sum(col("m")).cast("long").as("tk"))
      .agg(sum(expr("CAST(tk AS DECIMAL(38,0)) * tk")).cast("decimal(38,0)").as("t2"))
    val margP = conf.groupBy("p").agg(sum(col("m")).cast("long").as("pk"))
      .agg(sum(expr("CAST(pk AS DECIMAL(38,0)) * pk")).cast("decimal(38,0)").as("p2"))
    val cross = conf.groupBy("t").agg(sum(col("m")).cast("long").as("tk"))
      .join(conf.groupBy("p").agg(sum(col("m")).cast("long").as("pk")),
        expr("t = p"), "full_outer")
      .agg(sum(expr("CAST(coalesce(tk, 0L) AS DECIMAL(38,0)) * coalesce(pk, 0L)"))
        .cast("decimal(38,0)").as("tp_cross"))
    val base = conf.agg(sum(col("m")).cast("long").as("s"),
      sum(expr("CASE WHEN t = p THEN m ELSE 0L END")).cast("long").as("c"))
    base.crossJoin(broadcast(margT)).crossJoin(broadcast(margP))
      .crossJoin(broadcast(cross))
      // degenerate guard: a single-class predictor (every source shares
      // one majority lang — true at sf0.1) makes s² = Σp² and the MCC
      // denominator 0; the standard convention is MCC = 0 there
      .selectExpr("s", "c",
        """round(CASE WHEN CAST(s AS DECIMAL(38,0)) * s = p2
          |  OR CAST(s AS DECIMAL(38,0)) * s = t2 THEN 0.0D
          |ELSE (CAST(c AS DOUBLE) * s - CAST(tp_cross AS DOUBLE))
          |  / sqrt((CAST(s AS DOUBLE) * s - CAST(p2 AS DOUBLE))
          |    * (CAST(s AS DOUBLE) * s - CAST(t2 AS DOUBLE))) END, 6) AS mcc""".stripMargin,
        "round(CAST(c AS DOUBLE) / s, 6) AS accuracy")
  }
  val statMccMulticlassSql: String =
    s"""WITH $confusionSql,
      |mt AS (
      |  SELECT CAST(sum(CAST(tk AS DECIMAL(38,0)) * tk) AS DECIMAL(38,0)) AS t2
      |  FROM (SELECT t, CAST(sum(m) AS BIGINT) AS tk FROM conf GROUP BY 1)),
      |mp AS (
      |  SELECT CAST(sum(CAST(pk AS DECIMAL(38,0)) * pk) AS DECIMAL(38,0)) AS p2
      |  FROM (SELECT p, CAST(sum(m) AS BIGINT) AS pk FROM conf GROUP BY 1)),
      |cr AS (
      |  SELECT CAST(sum(CAST(coalesce(a.tk, 0) AS DECIMAL(38,0)) * coalesce(b.pk, 0)) AS DECIMAL(38,0)) AS tp_cross
      |  FROM (SELECT t, CAST(sum(m) AS BIGINT) AS tk FROM conf GROUP BY 1) a
      |  FULL OUTER JOIN (SELECT p, CAST(sum(m) AS BIGINT) AS pk FROM conf GROUP BY 1) b
      |    ON a.t = b.p),
      |base AS (
      |  SELECT CAST(sum(m) AS BIGINT) AS s,
      |    CAST(sum(CASE WHEN t = p THEN m ELSE 0 END) AS BIGINT) AS c
      |  FROM conf)
      |SELECT s, c,
      |  round(CASE WHEN CAST(s AS DECIMAL(38,0)) * s = p2
      |    OR CAST(s AS DECIMAL(38,0)) * s = t2 THEN 0.0
      |  ELSE (CAST(c AS DOUBLE) * s - CAST(tp_cross AS DOUBLE))
      |    / sqrt((CAST(s AS DOUBLE) * s - CAST(p2 AS DOUBLE))
      |      * (CAST(s AS DOUBLE) * s - CAST(t2 AS DOUBLE))) END, 6) AS mcc,
      |  round(CAST(c AS DOUBLE) / s, 6) AS accuracy
      |FROM base, mt, mp, cr""".stripMargin

  /** C761 stat_balanced_accuracy — macro-averaged recall of the same
    * baseline classifier: per-true-class recall as an exact rational
    * quantized ·10⁶, averaged over classes. The accuracy that an
    * 80%-majority corpus cannot inflate; reported with the worst
    * class's recall.
    */
  def statBalancedAccuracy(s: SparkSession, d: String): DataFrame = {
    val conf = confusion(s, d)
    conf.groupBy("t")
      .agg(sum(col("m")).cast("long").as("nt"),
        sum(expr("CASE WHEN t = p THEN m ELSE 0L END")).cast("long").as("ct"))
      .select(expr("CAST(floor(CAST(ct AS DOUBLE) / nt * 1e6 + 0.5) AS BIGINT)").as("rq"))
      .agg(count(lit(1)).cast("long").as("k"),
        sum(col("rq")).cast("long").as("sr"), min(col("rq")).as("minr"))
      .selectExpr("k",
        "round(CAST(sr AS DOUBLE) / k / 1e6, 6) AS balanced_accuracy",
        "round(CAST(minr AS DOUBLE) / 1e6, 6) AS worst_class_recall")
  }
  val statBalancedAccuracySql: String =
    s"""WITH $confusionSql,
      |pr AS (
      |  SELECT t, CAST(sum(m) AS BIGINT) AS nt,
      |    CAST(sum(CASE WHEN t = p THEN m ELSE 0 END) AS BIGINT) AS ct
      |  FROM conf GROUP BY 1),
      |q AS (SELECT CAST(floor(CAST(ct AS DOUBLE) / nt * 1e6 + 0.5) AS BIGINT) AS rq FROM pr)
      |SELECT CAST(count(*) AS BIGINT) AS k,
      |  round(CAST(CAST(sum(rq) AS BIGINT) AS DOUBLE) / count(*) / 1e6, 6) AS balanced_accuracy,
      |  round(CAST(min(rq) AS DOUBLE) / 1e6, 6) AS worst_class_recall
      |FROM q""".stripMargin

  /** C762 stat_weighted_kappa — linear-weighted Cohen's κ on the
    * priority×price-band 5×5 table (wave 83's): κ_w = 1 −
    * Σw_ij·O_ij / Σw_ij·E_ij·(1/n) with w_ij = |i−j| (the constant
    * /(k−1) cancels), O exact counts, E = row·col margins. Penalizes
    * BIG ordinal disagreements more than adjacent ones — what the
    * unweighted κ row cannot express.
    */
  def statWeightedKappa(s: SparkSession, d: String): DataFrame = {
    val cells = orders(s, d)
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS INT)").as("x"),
        expr(
          """CASE WHEN o_totalprice < 60000 THEN 1 WHEN o_totalprice < 120000 THEN 2
            |WHEN o_totalprice < 180000 THEN 3 WHEN o_totalprice < 240000 THEN 4
            |ELSE 5 END""".stripMargin).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).cast("long").as("m"))
    val wo = cells.agg(sum(col("m")).cast("long").as("n"),
      sum(expr("CAST(abs(x - y) AS DECIMAL(38,0)) * m")).cast("decimal(38,0)").as("wo"))
    val we = cells.groupBy("x").agg(sum(col("m")).cast("long").as("mx"))
      .crossJoin(broadcast(cells.groupBy("y").agg(sum(col("m")).cast("long").as("my")).limit(100)))
      .agg(sum(expr("CAST(abs(x - y) AS DECIMAL(38,0)) * mx * my")).cast("decimal(38,0)").as("we"))
    wo.crossJoin(broadcast(we))
      .selectExpr("n",
        """round(1 - CAST(wo AS DOUBLE) * n / CAST(we AS DOUBLE), 6)
          |AS weighted_kappa""".stripMargin)
  }
  val statWeightedKappaSql: String =
    """WITH cells AS (
      |  SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS x,
      |    CASE WHEN o_totalprice < 60000 THEN 1 WHEN o_totalprice < 120000 THEN 2
      |      WHEN o_totalprice < 180000 THEN 3 WHEN o_totalprice < 240000 THEN 4
      |      ELSE 5 END AS y,
      |    CAST(count(*) AS BIGINT) AS m
      |  FROM orders GROUP BY 1, 2),
      |wo AS (
      |  SELECT CAST(sum(m) AS BIGINT) AS n,
      |    CAST(sum(CAST(abs(x - y) AS DECIMAL(38,0)) * m) AS DECIMAL(38,0)) AS wo
      |  FROM cells),
      |we AS (
      |  SELECT CAST(sum(CAST(abs(a.x - b.y) AS DECIMAL(38,0)) * a.mx * b.my) AS DECIMAL(38,0)) AS we
      |  FROM (SELECT x, CAST(sum(m) AS BIGINT) AS mx FROM cells GROUP BY 1) a,
      |       (SELECT y, CAST(sum(m) AS BIGINT) AS my FROM cells GROUP BY 1) b)
      |SELECT n,
      |  round(1 - CAST(wo AS DOUBLE) * n / CAST(we AS DOUBLE), 6) AS weighted_kappa
      |FROM wo, we""".stripMargin

  /** C763 time_markov_entropy_rate — the entropy rate of the
    * event-type chain: per-user consecutive transitions (lead over
    * the per-user time order, R1 tie-break on event_id), empirical
    * H = −Σ_{ij} (n_ij/N)·ln(n_ij/n_i·) with per-transition terms
    * quantized ·10⁶; emitted beside the zeroth-order entropy of the
    * stationary frequencies — the gap measures how much the PREVIOUS
    * event type predicts the next one.
    */
  def timeMarkovEntropyRate(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val trans = events(s, d)
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("a"), col("nxt").as("b"))
      .agg(count(lit(1)).cast("long").as("nij"))
    val margA = trans.groupBy("a").agg(sum(col("nij")).cast("long").as("ni"))
    val tot = trans.agg(sum(col("nij")).cast("long").as("nn"))
    trans.join(broadcast(margA), Seq("a")).crossJoin(broadcast(tot))
      .agg(max(col("nn")).as("nn"),
        sum(expr(
          """CAST(floor(CAST(nij AS DOUBLE) * ln(CAST(ni AS DOUBLE) / nij) * 1e6 + 0.5) AS BIGINT)"""))
          .cast("long").as("hq"))
      .selectExpr("nn",
        "round(CAST(hq AS DOUBLE) / 1e6 / nn, 6) AS entropy_rate_nats")
      .crossJoin(broadcast(
        trans.groupBy("a").agg(sum(col("nij")).cast("long").as("ni"))
          .crossJoin(broadcast(trans.agg(sum(col("nij")).cast("long").as("nn2"))))
          .agg(sum(expr(
            "CAST(floor(CAST(ni AS DOUBLE) * ln(CAST(nn2 AS DOUBLE) / ni) * 1e6 + 0.5) AS BIGINT)"))
            .cast("long").as("h0q"), max(col("nn2")).as("nn2"))
          .selectExpr("round(CAST(h0q AS DOUBLE) / 1e6 / nn2, 6) AS entropy_order0_nats")))
      .selectExpr("nn AS n_transitions", "entropy_rate_nats", "entropy_order0_nats",
        "round(entropy_order0_nats - entropy_rate_nats, 6) AS predictive_info_nats")
  }
  val timeMarkovEntropyRateSql: String =
    """WITH seq AS (
      |  SELECT event_type AS a,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
      |  FROM events),
      |trans AS (
      |  SELECT a, b, CAST(count(*) AS BIGINT) AS nij
      |  FROM seq WHERE b IS NOT NULL GROUP BY 1, 2),
      |ma AS (SELECT a, CAST(sum(nij) AS BIGINT) AS ni FROM trans GROUP BY 1),
      |tot AS (SELECT CAST(sum(nij) AS BIGINT) AS nn FROM trans),
      |h1 AS (
      |  SELECT max(t.nn) AS nn,
      |    CAST(sum(CAST(floor(CAST(tr.nij AS DOUBLE) * ln(CAST(m.ni AS DOUBLE) / tr.nij) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS hq
      |  FROM trans tr JOIN ma m ON m.a = tr.a, tot t),
      |h0 AS (
      |  SELECT CAST(sum(CAST(floor(CAST(m.ni AS DOUBLE) * ln(CAST(t.nn AS DOUBLE) / m.ni) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS h0q,
      |    max(t.nn) AS nn2
      |  FROM ma m, tot t)
      |SELECT h1.nn AS n_transitions,
      |  round(CAST(h1.hq AS DOUBLE) / 1e6 / h1.nn, 6) AS entropy_rate_nats,
      |  round(CAST(h0.h0q AS DOUBLE) / 1e6 / h0.nn2, 6) AS entropy_order0_nats,
      |  round(round(CAST(h0.h0q AS DOUBLE) / 1e6 / h0.nn2, 6)
      |    - round(CAST(h1.hq AS DOUBLE) / 1e6 / h1.nn, 6), 6) AS predictive_info_nats
      |FROM h1, h0""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_mcc_multiclass" -> (statMccMulticlass _),
    "stat_balanced_accuracy" -> (statBalancedAccuracy _),
    "stat_weighted_kappa" -> (statWeightedKappa _),
    "time_markov_entropy_rate" -> (timeMarkovEntropyRate _),
  )

  val oracle: Map[String, String] = Map(
    "stat_mcc_multiclass" -> statMccMulticlassSql,
    "stat_balanced_accuracy" -> statBalancedAccuracySql,
    "stat_weighted_kappa" -> statWeightedKappaSql,
    "time_markov_entropy_rate" -> timeMarkovEntropyRateSql,
  )
}
