package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 52 (C612–C615): double-sweep pseudo-diameter, Hotelling T²,
  * Matthews correlation, empirical variogram.
  */
object Extras152 {

  /** C612 graph_diameter_doublesweep — the standard pseudo-diameter
    * lower-bound heuristic: BFS from vertex 0 with a FIXED 5-superstep
    * budget (each superstep one distinct-join over the edge frame —
    * the scale-safe bounded-round form, same discipline as C86's BFS),
    * pick the farthest vertex (level desc, id asc — deterministic),
    * BFS again from it; the second eccentricity is the classic
    * double-sweep diameter lower bound. The only collect is the
    * 1-row sweep-2 start. Deterministic synthetic graph over event
    * users (u→u+1, u+2, 7u+3 mod n), as in the BFS row.
    */
  def graphDiameterDoublesweep(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d).select(col("user_id")).distinct()
    val n = users.count()
    val arcs = users.select(col("user_id").as("src"),
        explode(array(
          (col("user_id") + 1) % n,
          (col("user_id") + 2) % n,
          (col("user_id") * 7 + 3) % n)).as("dst"))
      .filter(col("src") =!= col("dst"))
    // undirected: the double-sweep bound ecc(v2) >= ecc(v0) needs symmetry
    val edges = arcs.unionAll(arcs.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    def sweep(start: Long): DataFrame = {
      var visited = users.sparkSession.range(1)
        .select(lit(start).as("v"), lit(0L).as("lvl")).localCheckpoint(true)
      var frontier = visited.select("v")
      for (k <- 1 to 5) {
        frontier = frontier.join(edges, frontier("v") === edges("src"))
          .select(col("dst").as("v")).distinct()
          .join(visited.select("v"), Seq("v"), "left_anti")
          .localCheckpoint(true)
        visited = visited
          .unionAll(frontier.select(col("v"), lit(k.toLong).as("lvl")))
          .localCheckpoint(true)
      }
      visited
    }
    val s1 = sweep(0L)
    val far1 = s1.agg(max(struct(col("lvl"), (col("v") * -1).as("nv"))).as("m"))
      .selectExpr("m.lvl AS ecc1", "m.nv * -1 AS v2")
      .collect().head
    val (ecc1, v2) = (far1.getLong(0), far1.getLong(1))
    val s2 = sweep(v2)
    s2.agg(count(lit(1)).cast("long").as("n_reached"),
        max(struct(col("lvl"), (col("v") * -1).as("nv"))).as("m"))
      .selectExpr(s"CAST($ecc1 AS BIGINT) AS ecc_sweep1",
        s"CAST($v2 AS BIGINT) AS start2",
        "n_reached", "m.lvl AS pseudo_diameter", "m.nv * -1 AS far_vertex")
  }
  val graphDiameterDoublesweepSql: String = {
    val base =
      """WITH users AS (SELECT DISTINCT user_id FROM events),
        |nn AS (SELECT count(*) AS n FROM users),
        |arcs AS (
        |  SELECT src, dst FROM (
        |    SELECT user_id AS src, (user_id + 1) % n AS dst FROM users, nn
        |    UNION ALL
        |    SELECT user_id, (user_id + 2) % n FROM users, nn
        |    UNION ALL
        |    SELECT user_id, (user_id * 7 + 3) % n FROM users, nn)
        |  WHERE src <> dst),
        |edges AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT src, dst FROM arcs UNION ALL SELECT dst, src FROM arcs)),
        |v0 AS MATERIALIZED (SELECT 0 AS v, 0 AS lvl)""".stripMargin
    def rounds(pfx: String): String = (1 to 5).map { k =>
      s"""${pfx}f$k AS MATERIALIZED (
         |  SELECT DISTINCT dst AS v FROM edges
         |  WHERE src IN (SELECT v FROM $pfx${k - 1} WHERE lvl = ${k - 1})
         |    AND dst NOT IN (SELECT v FROM $pfx${k - 1})),
         |$pfx$k AS MATERIALIZED (
         |  SELECT v, lvl FROM $pfx${k - 1}
         |  UNION ALL SELECT v, $k AS lvl FROM ${pfx}f$k)""".stripMargin
    }.mkString(",\n", ",\n", "")
    base + rounds("v") +
      """,
        |pick AS MATERIALIZED (
        |  SELECT (max(struct_pack(lvl := lvl, nv := -v))).lvl AS ecc1,
        |    -((max(struct_pack(lvl := lvl, nv := -v))).nv) AS v2
        |  FROM v5),
        |w0 AS MATERIALIZED (SELECT v2 AS v, 0 AS lvl FROM pick)""".stripMargin +
      rounds("w") +
      """
        |SELECT CAST(ecc1 AS BIGINT) AS ecc_sweep1, CAST(v2 AS BIGINT) AS start2,
        |  CAST(count(*) AS BIGINT) AS n_reached,
        |  CAST((max(struct_pack(lvl := lvl, nv := -v))).lvl AS BIGINT)
        |    AS pseudo_diameter,
        |  CAST(-((max(struct_pack(lvl := lvl, nv := -v))).nv) AS BIGINT)
        |    AS far_vertex
        |FROM w5, pick GROUP BY 1, 2""".stripMargin
  }

  /** C613 stat_hotelling_t2 — the two-sample multivariate mean test on
    * (quantity, price-cents) between returnflag A and R: all twelve
    * per-group moments are exact conditional sums in ONE corpus pass
    * (no per-group scan), the pooled 2×2 covariance inverts in CLOSED
    * FORM, T² = (n_A·n_R/(n_A+n_R))·dᵀS⁻¹d and its exact F transform
    * F = T²(n−3)/(2(n−2)) run in deterministic doubles over the
    * 1-row moment frame.
    */
  def statHotellingT2(s: SparkSession, d: String): DataFrame = {
    val v = lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .select(expr("l_returnflag = 'A'").as("ga"),
        expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("y"))
    v.agg(
        sum(expr("CASE WHEN ga THEN 1L ELSE 0L END")).cast("long").as("na"),
        sum(expr("CASE WHEN ga THEN 0L ELSE 1L END")).cast("long").as("nb"),
        sum(expr("CASE WHEN ga THEN x ELSE 0L END")).cast("decimal(38,0)").as("sxa"),
        sum(expr("CASE WHEN ga THEN 0L ELSE x END")).cast("decimal(38,0)").as("sxb"),
        sum(expr("CASE WHEN ga THEN y ELSE 0L END")).cast("decimal(38,0)").as("sya"),
        sum(expr("CASE WHEN ga THEN 0L ELSE y END")).cast("decimal(38,0)").as("syb"),
        sum(expr("CASE WHEN ga THEN x * x ELSE 0L END")).cast("decimal(38,0)").as("sxxa"),
        sum(expr("CASE WHEN ga THEN 0L ELSE x * x END")).cast("decimal(38,0)").as("sxxb"),
        sum(expr("CASE WHEN ga THEN CAST(y AS DECIMAL(38,0)) * y ELSE CAST(0 AS DECIMAL(38,0)) END")).cast("decimal(38,0)").as("syya"),
        sum(expr("CASE WHEN ga THEN CAST(0 AS DECIMAL(38,0)) ELSE CAST(y AS DECIMAL(38,0)) * y END")).cast("decimal(38,0)").as("syyb"),
        sum(expr("CASE WHEN ga THEN x * y ELSE 0L END")).cast("decimal(38,0)").as("sxya"),
        sum(expr("CASE WHEN ga THEN 0L ELSE x * y END")).cast("decimal(38,0)").as("sxyb"))
      .selectExpr("na", "nb",
        "(CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * sxa / na) + (CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * sxb / nb) AS wxx",
        "(CAST(syya AS DOUBLE) - CAST(sya AS DOUBLE) * sya / na) + (CAST(syyb AS DOUBLE) - CAST(syb AS DOUBLE) * syb / nb) AS wyy",
        "(CAST(sxya AS DOUBLE) - CAST(sxa AS DOUBLE) * sya / na) + (CAST(sxyb AS DOUBLE) - CAST(sxb AS DOUBLE) * syb / nb) AS wxy",
        "CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb AS dx",
        "CAST(sya AS DOUBLE) / na - CAST(syb AS DOUBLE) / nb AS dy")
      .selectExpr("na", "nb", "dx", "dy",
        "wxx / (na + nb - 2) AS pxx", "wyy / (na + nb - 2) AS pyy",
        "wxy / (na + nb - 2) AS pxy")
      .selectExpr("na", "nb",
        """(CAST(na AS DOUBLE) * nb / (na + nb))
          |  * (dx * (pyy * dx - pxy * dy) + dy * (pxx * dy - pxy * dx))
          |  / (pxx * pyy - pxy * pxy) AS t2""".stripMargin)
      .selectExpr("na", "nb", "round(t2, 4) AS t2",
        "round(t2 * (na + nb - 3) / (2 * (CAST(na AS DOUBLE) + nb - 2)), 4) AS f_stat")
  }
  val statHotellingT2Sql: String =
    """WITH v AS (
      |  SELECT l_returnflag = 'A' AS ga,
      |    CAST(l_quantity AS BIGINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
      |m AS (
      |  SELECT
      |    CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN ga THEN 0 ELSE 1 END) AS BIGINT) AS nb,
      |    CAST(sum(CASE WHEN ga THEN x ELSE 0 END) AS DECIMAL(38,0)) AS sxa,
      |    CAST(sum(CASE WHEN ga THEN 0 ELSE x END) AS DECIMAL(38,0)) AS sxb,
      |    CAST(sum(CASE WHEN ga THEN y ELSE 0 END) AS DECIMAL(38,0)) AS sya,
      |    CAST(sum(CASE WHEN ga THEN 0 ELSE y END) AS DECIMAL(38,0)) AS syb,
      |    CAST(sum(CASE WHEN ga THEN x * x ELSE 0 END) AS DECIMAL(38,0)) AS sxxa,
      |    CAST(sum(CASE WHEN ga THEN 0 ELSE x * x END) AS DECIMAL(38,0)) AS sxxb,
      |    CAST(sum(CASE WHEN ga THEN CAST(y AS DECIMAL(38,0)) * y ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS syya,
      |    CAST(sum(CASE WHEN ga THEN CAST(0 AS DECIMAL(38,0)) ELSE CAST(y AS DECIMAL(38,0)) * y END) AS DECIMAL(38,0)) AS syyb,
      |    CAST(sum(CASE WHEN ga THEN x * y ELSE 0 END) AS DECIMAL(38,0)) AS sxya,
      |    CAST(sum(CASE WHEN ga THEN 0 ELSE x * y END) AS DECIMAL(38,0)) AS sxyb
      |  FROM v),
      |w AS (
      |  SELECT na, nb,
      |    (CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * sxa / na) + (CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * sxb / nb) AS wxx,
      |    (CAST(syya AS DOUBLE) - CAST(sya AS DOUBLE) * sya / na) + (CAST(syyb AS DOUBLE) - CAST(syb AS DOUBLE) * syb / nb) AS wyy,
      |    (CAST(sxya AS DOUBLE) - CAST(sxa AS DOUBLE) * sya / na) + (CAST(sxyb AS DOUBLE) - CAST(sxb AS DOUBLE) * syb / nb) AS wxy,
      |    CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb AS dx,
      |    CAST(sya AS DOUBLE) / na - CAST(syb AS DOUBLE) / nb AS dy
      |  FROM m),
      |p AS (
      |  SELECT na, nb, dx, dy,
      |    wxx / (na + nb - 2) AS pxx, wyy / (na + nb - 2) AS pyy,
      |    wxy / (na + nb - 2) AS pxy
      |  FROM w),
      |t AS (
      |  SELECT na, nb,
      |    (CAST(na AS DOUBLE) * nb / (na + nb))
      |      * (dx * (pyy * dx - pxy * dy) + dy * (pxx * dy - pxy * dx))
      |      / (pxx * pyy - pxy * pxy) AS t2
      |  FROM p)
      |SELECT na, nb, round(t2, 4) AS t2,
      |  round(t2 * (na + nb - 3) / (2 * (CAST(na AS DOUBLE) + nb - 2)), 4) AS f_stat
      |FROM t""".stripMargin

  /** C614 stat_matthews_corr — the MCC classifier-quality metric (the
    * balanced confusion-matrix summary LLM data-filter evals report):
    * classifier = "document mentions ' the '" predicting lang='en',
    * all four confusion cells exact integer counts in one pass, MCC =
    * (TP·TN−FP·FN)/√((TP+FP)(TP+FN)(TN+FP)(TN+FN)) plus precision/
    * recall/accuracy — four final double expressions from exact longs.
    */
  def statMatthewsCorr(s: SparkSession, d: String): DataFrame = {
    val v = documents(s, d).select(
      expr("CASE WHEN lang = 'en' THEN 1L ELSE 0L END").as("a"),
      expr("CASE WHEN instr(lower(text), ' the ') > 0 THEN 1L ELSE 0L END").as("p"))
    v.agg(sum(expr("a * p")).cast("long").as("tp"),
        sum(expr("(1 - a) * p")).cast("long").as("fp"),
        sum(expr("a * (1 - p)")).cast("long").as("fn"),
        sum(expr("(1 - a) * (1 - p)")).cast("long").as("tn"))
      .selectExpr("tp", "fp", "fn", "tn",
        """round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
          |  / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn) * (tn + fp) * (tn + fn)), 6)
          |  AS mcc""".stripMargin,
        "round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_",
        "round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_",
        "round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy")
  }
  val statMatthewsCorrSql: String =
    """WITH v AS (
      |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
      |    CASE WHEN position(' the ' IN lower(text)) > 0 THEN 1 ELSE 0 END AS p
      |  FROM documents),
      |m AS (
      |  SELECT CAST(sum(a * p) AS BIGINT) AS tp,
      |    CAST(sum((1 - a) * p) AS BIGINT) AS fp,
      |    CAST(sum(a * (1 - p)) AS BIGINT) AS fn,
      |    CAST(sum((1 - a) * (1 - p)) AS BIGINT) AS tn
      |  FROM v)
      |SELECT tp, fp, fn, tn,
      |  round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
      |    / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn) * (tn + fp) * (tn + fn)), 6)
      |    AS mcc,
      |  round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_,
      |  round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_,
      |  round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy
      |FROM m""".stripMargin

  /** C615 time_variogram — the empirical semivariogram of the daily-
    * revenue series at lags {1,2,3,5,7,14,30}: seven leads in ONE
    * WindowExec over the BOUNDED daily frame (aggregate-below), lag
    * differences exact integer cents, γ(h) = Σd² div (2·pairs) as an EXACT
    * integer (decimal→double casts above 2^53 round differently across
    * engines — the r10 variogram lesson); the normalized γ(h)/σ² uses the
    * denominator-cleared variance — every reported float is a single
    * division of exact quantities.
    */
  def timeVariogram(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    val lags = Seq(1, 2, 3, 5, 7, 14, 30)
    val withLeads = lags.foldLeft(bars) { (df, h) =>
      df.withColumn(s"l$h", lead(col("c"), h).over(w))
    }
    val tot = bars.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("sc"),
      sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("qc"))
    val long = withLeads.select(col("day"), col("c"),
      explode(array(lags.map(h =>
        struct(lit(h).cast("long").as("h"), col(s"l$h").as("lc"))): _*)).as("e"))
      .select(col("e.h").as("h"), col("c"), col("e.lc").as("lc"))
      .filter(col("lc").isNotNull)
    long.groupBy("h")
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(expr("CAST(lc - c AS DECIMAL(38,0)) * (lc - c)"))
          .cast("decimal(38,0)").as("sd2"))
      .crossJoin(broadcast(tot))
      .selectExpr("h", "n_pairs",
        "CAST(sd2 div (2 * n_pairs) AS BIGINT) AS gamma",
        """round(CAST(sd2 AS DOUBLE) / (2 * n_pairs)
          |  / (CAST(n * qc - sc * sc AS DOUBLE) / CAST(n * n AS DOUBLE)), 6)
          |  AS gamma_over_var""".stripMargin)
      .orderBy("h")
  }
  val timeVariogramSql: String =
    """WITH bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |tot AS (
      |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
      |    CAST(sum(c) AS DECIMAL(38,0)) AS sc,
      |    CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS qc
      |  FROM bars),
      |leads AS (
      |  SELECT c,
      |    lead(c, 1) OVER w AS l1, lead(c, 2) OVER w AS l2,
      |    lead(c, 3) OVER w AS l3, lead(c, 5) OVER w AS l5,
      |    lead(c, 7) OVER w AS l7, lead(c, 14) OVER w AS l14,
      |    lead(c, 30) OVER w AS l30
      |  FROM bars WINDOW w AS (ORDER BY day)),
      |longf AS (
      |  SELECT h, c, lc FROM (
      |    SELECT c, 1 AS h, l1 AS lc FROM leads UNION ALL
      |    SELECT c, 2, l2 FROM leads UNION ALL
      |    SELECT c, 3, l3 FROM leads UNION ALL
      |    SELECT c, 5, l5 FROM leads UNION ALL
      |    SELECT c, 7, l7 FROM leads UNION ALL
      |    SELECT c, 14, l14 FROM leads UNION ALL
      |    SELECT c, 30, l30 FROM leads)
      |  WHERE lc IS NOT NULL)
      |SELECT CAST(h AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(CAST(sum(CAST(lc - c AS DECIMAL(38,0)) * (lc - c)) AS HUGEINT)
      |    // (2 * count(*)) AS BIGINT) AS gamma,
      |  round(CAST(CAST(sum(CAST(lc - c AS DECIMAL(38,0)) * (lc - c)) AS DECIMAL(38,0)) AS DOUBLE)
      |    / (2 * count(*))
      |    / (CAST((SELECT n * qc - sc * sc FROM tot) AS DOUBLE)
      |       / CAST((SELECT n * n FROM tot) AS DOUBLE)), 6) AS gamma_over_var
      |FROM longf GROUP BY h ORDER BY h""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_diameter_doublesweep" -> (graphDiameterDoublesweep _),
    "stat_hotelling_t2" -> (statHotellingT2 _),
    "stat_matthews_corr" -> (statMatthewsCorr _),
    "time_variogram" -> (timeVariogram _),
  )

  val oracle: Map[String, String] = Map(
    "graph_diameter_doublesweep" -> graphDiameterDoublesweepSql,
    "stat_hotelling_t2" -> statHotellingT2Sql,
    "stat_matthews_corr" -> statMatthewsCorrSql,
    "time_variogram" -> timeVariogramSql,
  )
}
