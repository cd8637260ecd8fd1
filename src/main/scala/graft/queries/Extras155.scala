package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 55 (C624–C627): Weibull median-rank fit, Tukey HSD matrix,
  * embedding isotropy score, PNG color moments.
  */
object Extras155 {

  /** C624 stat_weibull_fit — Weibull shape/scale by median-rank
    * regression on order→ship lead times: the day-valued times have
    * BOUNDED cardinality (~122 distinct), so the rank prefix runs over
    * the distinct-day frame (aggregate-below window, never a corpus
    * sort), Bénard's F = (i−0.3)/(n+0.4) at the tie-group's last rank,
    * both regression coordinates ln(t) and ln(−ln(1−F)) NANO-QUANTIZED
    * to exact ints so the count-weighted OLS moments are exact DECIMAL
    * sums; shape = slope and scale = exp(−a/k) as final doubles.
    */
  def statWeibullFit(s: SparkSession, d: String): DataFrame = {
    val t = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("t"))
      .filter(col("t") >= 1)
    val byT = t.groupBy("t").agg(count(lit(1)).cast("long").as("w"))
    val wp = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    val tot = byT.agg(sum(col("w")).cast("long").as("n"))
    val pts = byT
      .withColumn("i", sum(col("w")).over(wp))
      .crossJoin(broadcast(tot))
      .selectExpr("w",
        "CAST(floor(ln(CAST(t AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS xq",
        """CAST(floor(ln(-ln(1 - (CAST(i AS DOUBLE) - 0.3) / (n + 0.4))) * 1e9 + 0.5)
          |  AS BIGINT) AS yq""".stripMargin)
    pts.agg(sum(col("w")).cast("decimal(38,0)").as("sw"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * xq")).cast("decimal(38,0)").as("sx"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * yq")).cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * xq * yq")).cast("decimal(38,0)").as("sxy"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * xq * xq")).cast("decimal(38,0)").as("sxx"))
      .selectExpr("CAST(sw AS BIGINT) AS n_times",
        """(CAST(sw AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |/ (CAST(sw AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |  AS k""".stripMargin,
        "CAST(sx AS DOUBLE) AS sxd", "CAST(sy AS DOUBLE) AS syd",
        "CAST(sw AS DOUBLE) AS swd")
      .selectExpr("n_times", "round(k, 6) AS shape_k",
        """round(exp(-((syd - k * sxd) / swd / 1e9) / k), 4)
          |  AS scale_days""".stripMargin)
  }
  val statWeibullFitSql: String =
    """WITH t AS (
      |  SELECT CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS t
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE datediff('day', o_orderdate, l_shipdate) >= 1),
      |byt AS (SELECT t, CAST(count(*) AS BIGINT) AS w FROM t GROUP BY 1),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS n FROM byt),
      |pts AS (
      |  SELECT w,
      |    CAST(floor(ln(CAST(t AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS xq,
      |    CAST(floor(ln(-ln(1 - (CAST(sum(w) OVER (ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) - 0.3)
      |      / (n + 0.4))) * 1e9 + 0.5) AS BIGINT) AS yq
      |  FROM byt, tot),
      |m AS (
      |  SELECT CAST(sum(w) AS DECIMAL(38,0)) AS sw,
      |    CAST(sum(CAST(w AS DECIMAL(38,0)) * xq) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(w AS DECIMAL(38,0)) * yq) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(w AS DECIMAL(38,0)) * xq * yq) AS DECIMAL(38,0)) AS sxy,
      |    CAST(sum(CAST(w AS DECIMAL(38,0)) * xq * xq) AS DECIMAL(38,0)) AS sxx
      |  FROM pts),
      |k AS (
      |  SELECT CAST(sw AS BIGINT) AS n_times,
      |    (CAST(sw AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(sw AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS k,
      |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
      |    CAST(sw AS DOUBLE) AS swd
      |  FROM m)
      |SELECT n_times, round(k, 6) AS shape_k,
      |  round(exp(-((syd - k * sxd) / swd / 1e9) / k), 4) AS scale_days
      |FROM k""".stripMargin

  /** C625 stat_tukey_hsd_matrix — Tukey's honestly-significant-
    * difference table across the 5 priority groups on order value:
    * per-group n/S/Q exact in one pass, pooled MSE from the cleared
    * within-SS, the 10 pairwise q statistics over the BOUNDED group-
    * pair frame (self-join of the 5-row aggregate — q_ij =
    * |m̄i−m̄j|/√(MSE/2·(1/ni+1/nj))), flagged at the q(5,∞,.05)=3.858
    * critical value. Every float is a final expression from exact ints.
    */
  def statTukeyHsdMatrix(s: SparkSession, d: String): DataFrame = {
    val g = orders(s, d).select(
        expr("substring(o_orderpriority, 1, 1)").as("grp"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("grp")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("c")).cast("decimal(38,0)").as("sc"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("qc"))
    val mse = g.agg(sum(expr(
        "CAST(qc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n")).as("wss"),
        sum(col("n")).cast("long").as("nt"),
        count(lit(1)).cast("long").as("k"))
      .selectExpr("wss / (nt - k) AS mse")
    g.as("a").join(g.as("b"), expr("a.grp < b.grp"))
      .crossJoin(broadcast(mse))
      .selectExpr("a.grp AS g1", "b.grp AS g2",
        "round(CAST(a.sc AS DOUBLE) / a.n / 100 - CAST(b.sc AS DOUBLE) / b.n / 100, 4) AS mean_diff",
        """round(abs(CAST(a.sc AS DOUBLE) / a.n - CAST(b.sc AS DOUBLE) / b.n)
          |/ sqrt(mse / 2 * (1.0 / a.n + 1.0 / b.n)), 4) AS q_stat""".stripMargin,
        """abs(CAST(a.sc AS DOUBLE) / a.n - CAST(b.sc AS DOUBLE) / b.n)
          |/ sqrt(mse / 2 * (1.0 / a.n + 1.0 / b.n)) > 3.858 AS significant""".stripMargin)
      .orderBy("g1", "g2")
  }
  val statTukeyHsdMatrixSql: String =
    """WITH g AS (
      |  SELECT substring(o_orderpriority, 1, 1) AS grp,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS DECIMAL(38,0)) AS sc,
      |    CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
      |      AS DECIMAL(38,0)) * CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS DECIMAL(38,0)) AS qc
      |  FROM orders GROUP BY 1),
      |mse AS (
      |  SELECT sum(CAST(qc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n)
      |      / (sum(n) - count(*)) AS mse
      |  FROM g)
      |SELECT a.grp AS g1, b.grp AS g2,
      |  round(CAST(a.sc AS DOUBLE) / a.n / 100 - CAST(b.sc AS DOUBLE) / b.n / 100, 4)
      |    AS mean_diff,
      |  round(abs(CAST(a.sc AS DOUBLE) / a.n - CAST(b.sc AS DOUBLE) / b.n)
      |    / sqrt(mse / 2 * (1.0 / a.n + 1.0 / b.n)), 4) AS q_stat,
      |  abs(CAST(a.sc AS DOUBLE) / a.n - CAST(b.sc AS DOUBLE) / b.n)
      |    / sqrt(mse / 2 * (1.0 / a.n + 1.0 / b.n)) > 3.858 AS significant
      |FROM g a JOIN g b ON a.grp < b.grp, mse
      |ORDER BY 1, 2""".stripMargin

  /** C626 embed_isotropy_score — the pairwise-cosine isotropy
    * diagnostic WITHOUT pairs: for nano-quantized vectors,
    * Σ_{i≠j} vᵢ·vⱼ = ‖Σv‖² − Σ‖v‖² exactly, so the mean pairwise dot
    * (the first-order isotropy score of embedding-quality analysis)
    * needs only the per-dim component sums — one corpus pass, k·d
    * reduce state, zero joins at ANY scale. Reported: mean pairwise
    * cosine-scale dot, mean squared norm, and their ratio (0 for a
    * perfectly isotropic cloud, 1 for rank-1 collapse).
    */
  def embedIsotropyScore(s: SparkSession, d: String): DataFrame = {
    val comp = embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("pos"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1e9 + 0.5) AS BIGINT)").as("f"))
    val perDim = comp.groupBy("pos")
      .agg(sum(col("f")).cast("decimal(38,0)").as("sf"),
        sum(expr("CAST(f AS DECIMAL(38,0)) * f")).cast("decimal(38,0)").as("qf"),
        count(lit(1)).cast("long").as("n"))
    perDim.agg(max(col("n")).as("n"),
        sum(expr("sf * sf")).as("a2"),
        sum(col("qf")).cast("decimal(38,0)").as("b2"))
      .selectExpr("n",
        "CAST(a2 AS DOUBLE) / 1e18 AS a", "CAST(b2 AS DOUBLE) / 1e18 AS b")
      .selectExpr("n",
        "round((a - b) / (CAST(n AS DOUBLE) * (n - 1)), 8) AS mean_pair_dot",
        "round(b / n, 6) AS mean_sq_norm",
        """round(((a - b) / (CAST(n AS DOUBLE) * (n - 1))) / (b / n), 8)
          |  AS anisotropy_ratio""".stripMargin)
  }
  val embedIsotropyScoreSql: String =
    """WITH comp AS (
      |  SELECT i.i AS pos,
      |    CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS f
      |  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i),
      |perdim AS (
      |  SELECT pos, CAST(sum(f) AS DECIMAL(38,0)) AS sf,
      |    CAST(sum(CAST(f AS DECIMAL(38,0)) * f) AS DECIMAL(38,0)) AS qf,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM comp GROUP BY 1),
      |m AS (
      |  SELECT max(n) AS n,
      |    CAST(sum(sf * sf) AS DOUBLE) / 1e18 AS a,
      |    CAST(CAST(sum(qf) AS DECIMAL(38,0)) AS DOUBLE) / 1e18 AS b
      |  FROM perdim)
      |SELECT n,
      |  round((a - b) / (CAST(n AS DOUBLE) * (n - 1)), 8) AS mean_pair_dot,
      |  round(b / n, 6) AS mean_sq_norm,
      |  round(((a - b) / (CAST(n AS DOUBLE) * (n - 1))) / (b / n), 8)
      |    AS anisotropy_ratio
      |FROM m""".stripMargin

  /** Per-doc, per-channel moment partials from the decoded PNG. */
  case class ChannelMoments(doc_id: Long, channel: Int, np: Long,
    s1: Long, s2: Long, s3: Long)

  /** C627 multimodal_color_moments — per-channel color moments of the
    * PNG corpus (the mean/variance/skewness feature block of image
    * quality filters): the REAL CRC-checked PNG codec round-trips the
    * payload inside the same typed mapPartitions boundary as the other
    * media rows (bytes never shuffle — only 3 tiny partials per doc),
    * interleaved-RGB convention (byte index mod 3), corpus moments
    * from exact integer Σb/Σb²/Σb³, skewness's cleared cubic form as
    * final doubles. Oracle mirrors the byte arithmetic on the ASCII
    * fixture (see multimodal_extract's note).
    */
  def multimodalColorMoments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val partials = documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val blob = graft.sources.MediaCodec.encodePng(payload)
          val pixels = graft.sources.MediaCodec.decodePayload(id, blob)
          val np = new Array[Long](3)
          val s1 = new Array[Long](3); val s2 = new Array[Long](3)
          val s3 = new Array[Long](3)
          var i = 0
          while (i < pixels.length) {
            val ch = i % 3
            val b = (pixels(i) & 0xff).toLong
            np(ch) += 1; s1(ch) += b; s2(ch) += b * b; s3(ch) += b * b * b
            i += 1
          }
          (0 until 3).map(ch => ChannelMoments(id, ch, np(ch), s1(ch), s2(ch), s3(ch)))
        }
      }
      .toDF()
    partials.groupBy("channel")
      .agg(sum(col("np")).cast("decimal(38,0)").as("n"),
        sum(col("s1")).cast("decimal(38,0)").as("t1"),
        sum(col("s2")).cast("decimal(38,0)").as("t2"),
        sum(col("s3")).cast("decimal(38,0)").as("t3"))
      .selectExpr("channel", "CAST(n AS BIGINT) AS n_bytes",
        "CAST(t1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_",
        """CAST(n * t2 - t1 * t1 AS DOUBLE)
          |/ (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_""".stripMargin,
        """CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(t3 AS DOUBLE)
          |- 3 * CAST(n AS DOUBLE) * CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE)
          |+ 2 * CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE)
          |  AS m3num""".stripMargin)
      .selectExpr("channel", "n_bytes",
        "round(mean_, 6) AS mean_byte",
        "round(var_, 6) AS var_byte",
        "round(m3num / (CAST(n_bytes AS DOUBLE) * n_bytes * n_bytes) / pow(var_, 1.5), 6) AS skew_byte")
      .orderBy("channel")
  }
  val multimodalColorMomentsSql: String =
    """WITH b AS (
      |  SELECT (p - 1) % 3 AS channel, CAST(ascii(text[p]) AS BIGINT) AS v
      |  FROM documents, LATERAL (SELECT unnest(generate_series(1, strlen(text))) AS p)),
      |m AS (
      |  SELECT channel, CAST(count(*) AS DECIMAL(38,0)) AS n,
      |    CAST(sum(v) AS DECIMAL(38,0)) AS t1,
      |    CAST(sum(v * v) AS DECIMAL(38,0)) AS t2,
      |    CAST(sum(v * v * v) AS DECIMAL(38,0)) AS t3
      |  FROM b GROUP BY 1),
      |c AS (
      |  SELECT channel, CAST(n AS BIGINT) AS n_bytes,
      |    CAST(t1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_,
      |    CAST(n * t2 - t1 * t1 AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_,
      |    CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(t3 AS DOUBLE)
      |      - 3 * CAST(n AS DOUBLE) * CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE)
      |      + 2 * CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) AS m3num
      |  FROM m)
      |SELECT CAST(channel AS INT) AS channel, n_bytes,
      |  round(mean_, 6) AS mean_byte,
      |  round(var_, 6) AS var_byte,
      |  round(m3num / (CAST(n_bytes AS DOUBLE) * n_bytes * n_bytes)
      |    / pow(var_, 1.5), 6) AS skew_byte
      |FROM c ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_weibull_fit" -> (statWeibullFit _),
    "stat_tukey_hsd_matrix" -> (statTukeyHsdMatrix _),
    "embed_isotropy_score" -> (embedIsotropyScore _),
    "multimodal_color_moments" -> (multimodalColorMoments _),
  )

  val oracle: Map[String, String] = Map(
    "stat_weibull_fit" -> statWeibullFitSql,
    "stat_tukey_hsd_matrix" -> statTukeyHsdMatrixSql,
    "embed_isotropy_score" -> embedIsotropyScoreSql,
    "multimodal_color_moments" -> multimodalColorMomentsSql,
  )
}
