package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 115 (C864–C867): sketch accuracy + forecasting + econometric
  * decomposition + image texture — a fully deterministic count-min
  * sketch with its overestimate census, the Theta method (M3 winner),
  * the Oaxaca–Blinder gap decomposition, and per-channel edge density
  * through the real PNG codec.
  *
  * Shared discipline: sketches are md5-deterministic (no RNG, both
  * engines replay the identical hash arithmetic); smoothing loops run
  * over bounded calendar dictionaries with recursive-CTE oracles;
  * moments are exact DECIMAL sums with one final IEEE evaluation.
  */
object Extras215 {

  /** C864 agg_count_min_sketch — a deterministic count-min sketch
    * (d = 4 md5-salted hash rows × w = 64 buckets) over the per-customer
    * order counts, audited against the exact answer: build the 256-cell
    * table in ONE map-side-combining aggregation (each row explodes to
    * its 4 cells), then answer the exact top-10 customers' point
    * queries with min-over-rows and report each overestimate. The
    * sketch never underestimates (CMS guarantee) — `overestimate >= 0`
    * row by row — and the census shows the collision cost of 64
    * buckets at this cardinality. 100 TB shape: the cell table stays
    * 256 rows no matter the corpus; the only full pass is the combine.
    */
  def aggCountMinSketch(s: SparkSession, d: String): DataFrame = {
    def bucket(iCol: String, keyCol: String): String =
      s"CAST(conv(substring(md5(concat('cms', $iCol, ':', CAST($keyCol AS STRING))), 1, 6), 16, 10) AS BIGINT) % 64"
    val cells = orders(s, d)
      .select(col("o_custkey"), explode(expr("sequence(1, 4)")).as("i"))
      .groupBy(col("i"), expr(bucket("i", "o_custkey")).as("b"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val probes = orders(s, d)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).cast("long").as("exact"))
      .orderBy(col("exact").desc, col("custkey").asc)
      .limit(10)
    probes
      .select(col("custkey"), col("exact"), explode(expr("sequence(1, 4)")).as("i"))
      .withColumn("b", expr(bucket("i", "custkey")))
      .join(broadcast(cells), Seq("i", "b"))
      .groupBy("custkey", "exact")
      .agg(min(col("cnt")).as("cms_estimate"))
      .withColumn("overestimate", col("cms_estimate") - col("exact"))
      .orderBy(col("exact").desc, col("custkey").asc)
  }
  val aggCountMinSketchSql: String = {
    def bucket(iE: String, keyE: String): String =
      s"CAST(CAST('0x' || substr(md5('cms' || CAST($iE AS VARCHAR) || ':' || CAST($keyE AS VARCHAR)), 1, 6) AS BIGINT) % 64 AS BIGINT)"
    s"""WITH ex AS (
      |  SELECT o_custkey, unnest(generate_series(1, 4)) AS i FROM orders),
      |cells AS (
      |  SELECT i, ${bucket("i", "o_custkey")} AS b,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM ex GROUP BY 1, 2),
      |probes AS (
      |  SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS exact
      |  FROM orders GROUP BY 1
      |  ORDER BY exact DESC, custkey ASC LIMIT 10),
      |pq AS (
      |  SELECT custkey, exact, unnest(generate_series(1, 4)) AS i FROM probes),
      |est AS (
      |  SELECT p.custkey, p.exact, min(c.cnt) AS cms_estimate
      |  FROM pq p JOIN cells c
      |    ON c.i = p.i AND c.b = ${bucket("p.i", "p.custkey")}
      |  GROUP BY 1, 2)
      |SELECT custkey, exact, cms_estimate, cms_estimate - exact AS overestimate
      |FROM est ORDER BY exact DESC, custkey ASC""".stripMargin
  }

  /** C865 time_theta_method — the Theta method (the M3-competition
    * winner) on the monthly revenue series: the θ=0 line is the OLS
    * trend from exact moments (Σt, Σt², Σx, Σtx all exact integers /
    * DECIMAL cents), the θ=2 line 2xₜ−(a+btₜ) is smoothed by SES
    * (α = 0.3, L₀ = y₀) over the bounded ~84-month dictionary, and the
    * one-step forecast is the equal-weight combination
    * ½·L_final + ½·(a + b·n). Scala loop vs recursive-CTE oracle with
    * identical literal arithmetic.
    */
  def timeThetaMethod(s: SparkSession, d: String): DataFrame = {
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .orderBy("m")
      .collect().map(_.getLong(1))
    val n = ms.length
    val sx = ms.map(BigInt(_)).sum
    val st = BigInt(n.toLong * (n - 1) / 2)
    val stt = (0 until n).map(t => BigInt(t.toLong * t)).sum
    val stx = ms.zipWithIndex.map { case (v, t) => BigInt(v) * t }.sum
    val b = (n.toDouble * stx.toDouble - st.toDouble * sx.toDouble) /
      (n.toDouble * stt.toDouble - st.toDouble * st.toDouble)
    val a = (sx.toDouble - b * st.toDouble) / n
    var lvl = 2.0 * ms(0) - a
    for (t <- 1 until n) {
      val y = 2.0 * ms(t) - (a + b * t)
      lvl = 0.3 * y + 0.7 * lvl
    }
    val fc = 0.5 * lvl + 0.5 * (a + b * n)
    import s.implicits._
    Seq((n.toLong, b, lvl, fc)).toDF("n0", "b0", "l0", "f0")
      .selectExpr("n0 AS n_months",
        "round(b0 / 100, 4) AS trend_dollars_per_month",
        "round(l0 / 100, 2) AS ses_level_dollars",
        "round(f0 / 100, 2) AS forecast_dollars")
  }
  val timeThetaMethodSql: String =
    """WITH RECURSIVE monthly AS (
      |  SELECT date_trunc('month', o_orderdate) AS m,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) - 1 AS BIGINT) AS t,
      |    v, CAST(v AS DOUBLE) AS x
      |  FROM monthly),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(t) AS DOUBLE) AS st, CAST(sum(t * t) AS DOUBLE) AS stt,
      |    CAST(CAST(sum(v) AS HUGEINT) AS DOUBLE) AS sx,
      |    CAST(CAST(sum(CAST(v AS HUGEINT) * t) AS HUGEINT) AS DOUBLE) AS stx
      |  FROM seq),
      |ab AS (
      |  SELECT n,
      |    (n * stx - st * sx) / (n * stt - st * st) AS b,
      |    (sx - (n * stx - st * sx) / (n * stt - st * st) * st) / n AS a
      |  FROM mom),
      |rec AS (
      |  SELECT CAST(0 AS BIGINT) AS t, 2.0 * q.x - ab.a AS lvl
      |  FROM seq q, ab WHERE q.t = 0
      |  UNION ALL
      |  SELECT r.t + 1,
      |    0.3 * (2.0 * q.x - (ab.a + ab.b * (r.t + 1))) + 0.7 * r.lvl
      |  FROM rec r JOIN seq q ON q.t = r.t + 1, ab),
      |fin AS (SELECT lvl FROM rec ORDER BY t DESC LIMIT 1)
      |SELECT ab.n AS n_months,
      |  round(ab.b / 100, 4) AS trend_dollars_per_month,
      |  round(fin.lvl / 100, 2) AS ses_level_dollars,
      |  round((0.5 * fin.lvl + 0.5 * (ab.a + ab.b * ab.n)) / 100, 2) AS forecast_dollars
      |FROM fin, ab""".stripMargin

  /** C866 analytics_oaxaca_blinder — the Oaxaca–Blinder threefold
    * decomposition of the AUTOMOBILE−FURNITURE mean order-total gap
    * with account balance as the explanatory covariate: per-group OLS
    * (α_g, β_g) from exact DECIMAL moments (n, Σx, Σy, Σxy, Σx² in one
    * conditional-aggregation pass), gap = endowments (Δx̄·β_B) +
    * coefficients (x̄_B·Δβ + Δα) + interaction (Δx̄·Δβ) — the identity
    * E+C+I = ȳ_A−ȳ_B holds exactly in the emitted doubles. The
    * standard wage-gap econometrics shape, aimed at segment revenue.
    */
  def analyticsOaxacaBlinder(s: SparkSession, d: String): DataFrame = {
    val base = customer(s, d)
      .filter(col("c_mktsegment").isin("AUTOMOBILE", "FURNITURE"))
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .select((col("c_mktsegment") === "AUTOMOBILE").as("ga"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)").as("x"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("y"))
    def m(c: String, grp: Boolean): String = {
      val flag = if (grp) "ga" else "NOT ga"
      s"CAST(sum(CASE WHEN $flag THEN CAST($c AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))"
    }
    base.agg(
      expr(s"${m("1", grp = true)}").as("na"), expr(s"${m("x", grp = true)}").as("sxa"),
      expr(s"${m("y", grp = true)}").as("sya"),
      expr(s"${m("CAST(x AS DECIMAL(38,0)) * y", grp = true)}").as("sxya"),
      expr(s"${m("CAST(x AS DECIMAL(38,0)) * x", grp = true)}").as("sxxa"),
      expr(s"${m("1", grp = false)}").as("nb"), expr(s"${m("x", grp = false)}").as("sxb"),
      expr(s"${m("y", grp = false)}").as("syb"),
      expr(s"${m("CAST(x AS DECIMAL(38,0)) * y", grp = false)}").as("sxyb"),
      expr(s"${m("CAST(x AS DECIMAL(38,0)) * x", grp = false)}").as("sxxb"))
      .selectExpr("CAST(na AS BIGINT) AS n_auto", "CAST(nb AS BIGINT) AS n_furn",
        "CAST(na AS DOUBLE) AS nad", "CAST(nb AS DOUBLE) AS nbd",
        "CAST(sxa AS DOUBLE) AS sxad", "CAST(sya AS DOUBLE) AS syad",
        "CAST(sxya AS DOUBLE) AS sxyad", "CAST(sxxa AS DOUBLE) AS sxxad",
        "CAST(sxb AS DOUBLE) AS sxbd", "CAST(syb AS DOUBLE) AS sybd",
        "CAST(sxyb AS DOUBLE) AS sxybd", "CAST(sxxb AS DOUBLE) AS sxxbd")
      .selectExpr("n_auto", "n_furn",
        "(nad * sxyad - sxad * syad) / (nad * sxxad - sxad * sxad) AS betaa",
        "(nbd * sxybd - sxbd * sybd) / (nbd * sxxbd - sxbd * sxbd) AS betab",
        "sxad / nad AS xa", "sxbd / nbd AS xb",
        "syad / nad AS ya", "sybd / nbd AS yb")
      .selectExpr("n_auto", "n_furn",
        "round((ya - yb) / 100, 4) AS gap_dollars",
        "round((xa - xb) * betab / 100, 4) AS endowments",
        "round((xb * (betaa - betab) + ((ya - betaa * xa) - (yb - betab * xb))) / 100, 4) AS coefficients",
        "round((xa - xb) * (betaa - betab) / 100, 4) AS interaction")
  }
  val analyticsOaxacaBlinderSql: String =
    """WITH base AS (
      |  SELECT c_mktsegment = 'AUTOMOBILE' AS ga,
      |    CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS x,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  WHERE c_mktsegment IN ('AUTOMOBILE', 'FURNITURE')),
      |mom AS (
      |  SELECT
      |    CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS DECIMAL(38,0)) AS na,
      |    CAST(sum(CASE WHEN ga THEN x ELSE 0 END) AS DECIMAL(38,0)) AS sxa,
      |    CAST(sum(CASE WHEN ga THEN y ELSE 0 END) AS DECIMAL(38,0)) AS sya,
      |    CAST(sum(CASE WHEN ga THEN CAST(x AS HUGEINT) * y ELSE 0 END) AS DECIMAL(38,0)) AS sxya,
      |    CAST(sum(CASE WHEN ga THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS DECIMAL(38,0)) AS sxxa,
      |    CAST(sum(CASE WHEN ga THEN 0 ELSE 1 END) AS DECIMAL(38,0)) AS nb,
      |    CAST(sum(CASE WHEN ga THEN 0 ELSE x END) AS DECIMAL(38,0)) AS sxb,
      |    CAST(sum(CASE WHEN ga THEN 0 ELSE y END) AS DECIMAL(38,0)) AS syb,
      |    CAST(sum(CASE WHEN ga THEN 0 ELSE CAST(x AS HUGEINT) * y END) AS DECIMAL(38,0)) AS sxyb,
      |    CAST(sum(CASE WHEN ga THEN 0 ELSE CAST(x AS HUGEINT) * x END) AS DECIMAL(38,0)) AS sxxb
      |  FROM base),
      |dd AS (
      |  SELECT CAST(na AS BIGINT) AS n_auto, CAST(nb AS BIGINT) AS n_furn,
      |    CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
      |    CAST(sxa AS DOUBLE) AS sxad, CAST(sya AS DOUBLE) AS syad,
      |    CAST(sxya AS DOUBLE) AS sxyad, CAST(sxxa AS DOUBLE) AS sxxad,
      |    CAST(sxb AS DOUBLE) AS sxbd, CAST(syb AS DOUBLE) AS sybd,
      |    CAST(sxyb AS DOUBLE) AS sxybd, CAST(sxxb AS DOUBLE) AS sxxbd
      |  FROM mom),
      |ols AS (
      |  SELECT n_auto, n_furn,
      |    (nad * sxyad - sxad * syad) / (nad * sxxad - sxad * sxad) AS betaa,
      |    (nbd * sxybd - sxbd * sybd) / (nbd * sxxbd - sxbd * sxbd) AS betab,
      |    sxad / nad AS xa, sxbd / nbd AS xb,
      |    syad / nad AS ya, sybd / nbd AS yb
      |  FROM dd)
      |SELECT n_auto, n_furn,
      |  round((ya - yb) / 100, 4) AS gap_dollars,
      |  round((xa - xb) * betab / 100, 4) AS endowments,
      |  round((xb * (betaa - betab) + ((ya - betaa * xa) - (yb - betab * xb))) / 100, 4) AS coefficients,
      |  round((xa - xb) * (betaa - betab) / 100, 4) AS interaction
      |FROM ols""".stripMargin

  /** Per-doc, per-channel gradient partials from the decoded PNG. */
  case class GradPartials(doc_id: Long, channel: Int, np: Long,
    sg: Long, ne: Long, mg: Long)

  /** C867 multimodal_image_edge_density — per-channel edge statistics
    * of the PNG corpus: the same-channel horizontal gradient
    * |v[i+3]−v[i]| over the interleaved-RGB byte stream (stride 3, no
    * doc-boundary crossing), its mean, the edge fraction at the ≥32
    * threshold, and the max gradient — the texture/sharpness feature
    * block an image-quality filter runs next to the color moments.
    * The REAL CRC-checked PNG codec round-trips every payload inside
    * the typed mapPartitions boundary (bytes never shuffle; only 3
    * tiny partials per doc), and the oracle mirrors the arithmetic on
    * the ASCII fixture.
    */
  def multimodalImageEdgeDensity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val partials = documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val blob = graft.sources.MediaCodec.encodePng(payload)
          val pixels = graft.sources.MediaCodec.decodePayload(id, blob)
          val np = new Array[Long](3); val sg = new Array[Long](3)
          val ne = new Array[Long](3); val mg = new Array[Long](3)
          var i = 0
          while (i + 3 < pixels.length) {
            val ch = i % 3
            val g = math.abs((pixels(i + 3) & 0xff) - (pixels(i) & 0xff)).toLong
            np(ch) += 1; sg(ch) += g
            if (g >= 32) ne(ch) += 1
            if (g > mg(ch)) mg(ch) = g
            i += 1
          }
          (0 until 3).map(ch => GradPartials(id, ch, np(ch), sg(ch), ne(ch), mg(ch)))
        }
      }
      .toDF()
    partials.groupBy("channel")
      .agg(sum(col("np")).cast("long").as("n_pairs"),
        sum(col("sg")).cast("decimal(38,0)").as("tg"),
        sum(col("ne")).cast("long").as("n_edges"),
        max(col("mg")).cast("long").as("max_grad"))
      .selectExpr("channel", "n_pairs",
        "round(CAST(tg AS DOUBLE) / n_pairs, 6) AS mean_grad",
        "round(CAST(n_edges AS DOUBLE) / n_pairs, 6) AS edge_frac",
        "max_grad")
      .orderBy("channel")
  }
  val multimodalImageEdgeDensitySql: String =
    """WITH b AS (
      |  SELECT (p - 1) % 3 AS channel,
      |    abs(CAST(ascii(text[p + 3]) AS BIGINT) - ascii(text[p])) AS g
      |  FROM documents, LATERAL (SELECT unnest(generate_series(1, strlen(text) - 3)) AS p)),
      |m AS (
      |  SELECT channel, CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(g) AS DECIMAL(38,0)) AS tg,
      |    CAST(sum(CASE WHEN g >= 32 THEN 1 ELSE 0 END) AS BIGINT) AS n_edges,
      |    CAST(max(g) AS BIGINT) AS max_grad
      |  FROM b GROUP BY 1)
      |SELECT CAST(channel AS INT) AS channel, n_pairs,
      |  round(CAST(tg AS DOUBLE) / n_pairs, 6) AS mean_grad,
      |  round(CAST(n_edges AS DOUBLE) / n_pairs, 6) AS edge_frac,
      |  max_grad
      |FROM m ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_count_min_sketch" -> (aggCountMinSketch _),
    "time_theta_method" -> (timeThetaMethod _),
    "analytics_oaxaca_blinder" -> (analyticsOaxacaBlinder _),
    "multimodal_image_edge_density" -> (multimodalImageEdgeDensity _),
  )

  val oracle: Map[String, String] = Map(
    "agg_count_min_sketch" -> aggCountMinSketchSql,
    "time_theta_method" -> timeThetaMethodSql,
    "analytics_oaxaca_blinder" -> analyticsOaxacaBlinderSql,
    "multimodal_image_edge_density" -> multimodalImageEdgeDensitySql,
  )
}
