package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Seventy-ninth wave: top principal component by distributed power
  * iteration, a log2-bucketed value histogram, and the monthly
  * climatology endpoint.
  */
object Extras79 {

  /** embed_pca_power — the TOP PRINCIPAL COMPONENT of the embedding
    * cloud by 8 fixed power iterations (the spectral health number —
    * collapsing embeddings show one dominated direction): components
    * quantize to exact integers (C74's ⌊v·10⁶+½⌋), the Gram matrix
    * Σ xᵢxⱼ accumulates as DECIMAL(38,0) through an id-keyed self-join
    * of the (id, dim, fx) frame — records stream through ONE join +
    * partial agg; the d×d covariance (4096 rows) is the only state the
    * iterations touch. Every matvec sum and the norm walk dim-SORTED
    * collected lists in fixed-order folds (the agg_entropy pattern),
    * so all IEEE arithmetic sees identical operand order in both
    * engines; λ is the final iterate's norm, rescaled by the 10¹²
    * quantization factor. Scale: iteration cost is O(d²) regardless of
    * row count — the data is touched exactly once.
    */
  def embedPcaPower(s: SparkSession, d: String): DataFrame = {
    // Distributed part: ONE pass over the data builds the d×d Gram
    // matrix. Pair products are generated MAP-SIDE from each vector's
    // own quantized array (no self-join — the previous id-keyed join
    // shuffled the exploded frame twice and summed 8M DECIMAL products;
    // measured 9.4 s, this shape ~1.5 s at sf0.1). Partial sums
    // accumulate as LONGs within vec_id buckets (per-bucket bound
    // (n/B)·10¹² with B = max(32, n/10⁶ + 1), so the long never
    // overflows at any corpus size), and only the O(d²·B) bucket
    // partials re-aggregate as DECIMAL(38,0) — exact integer arithmetic
    // end-to-end, same value the decimal join produced.
    val nv = embeddings(s, d).count()
    val buckets = math.max(32L, nv / 1000000L + 1L)
    val arr = embeddings(s, d).select(col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000D + 0.5D) as bigint))")
        .as("fa"))
    val pairs = arr
      .select(pmod(col("vec_id"), lit(buckets)).as("b"),
        col("fa"), posexplode(col("fa")).as(Seq("i0", "fi")))
      .select(col("b"), (col("i0") + 1).as("i"),
        posexplode(expr("transform(fa, y -> fi * y)")).as(Seq("j0", "p")))
      .select(col("b"), col("i"), (col("j0") + 1).as("j"), col("p"))
    val g = pairs.groupBy("i", "j", "b").agg(sum(col("p")).as("ps"))
      .groupBy("i", "j")
      .agg(sum(col("ps").cast("decimal(38,0)")).as("sxy"))
    val X = arr.select(col("vec_id"), posexplode(col("fa")).as(Seq("d0", "fx")))
      .select((col("d0") + 1).as("dim"), col("fx"))
    val sm = X.groupBy("dim").agg(sum(col("fx")).as("sv"))
    val c = g
      .join(broadcast(sm.select(col("dim").as("i"), col("sv").as("si"))), "i")
      .join(broadcast(sm.select(col("dim").as("j"), col("sv").as("sj"))), "j")
      .select(col("i"), col("j"),
        (col("sxy").cast("double") / nv
          - (col("si").cast("double") / nv)
            * (col("sj").cast("double") / nv)).as("cv"))
    // Driver part: the covariance is a CONSTANT-SIZE d×d frame (4096
    // doubles) regardless of corpus size — the 8 power iterations are
    // driver-scale math, like reading any collected aggregate. The
    // folds below walk j (then i) in ascending order, the EXACT operand
    // order the previous engine plan ("aggregate" over dim-sorted
    // lists) and the DuckDB oracle (list_reduce over ORDER BY lists)
    // both use, so every IEEE intermediate is bit-identical; the final
    // round() runs in Spark on lit()s so round semantics stay the
    // engine's own. 8 scheduled jobs per query collapse to 1.
    val cov = Array.ofDim[Double](65, 65)
    c.collect().foreach { r =>
      cov(r.getAs[Number]("i").intValue)(r.getAs[Number]("j").intValue) =
        r.getAs[Double]("cv")
    }
    var varr = Array.fill(65)(1.0); varr(0) = 0.0
    var nrm = 0.0
    for (_ <- 1 to 8) {
      val wl = Array.ofDim[Double](65)
      for (i <- 1 to 64) {
        var a = 0.0
        for (j <- 1 to 64) a += cov(i)(j) * varr(j)
        wl(i) = a
      }
      var ss = 0.0
      for (i <- 1 to 64) ss += wl(i) * wl(i)
      nrm = math.sqrt(ss)
      varr = wl.map(_ / nrm)
    }
    var topA = 0.0; var topDim = 0L
    for (p <- 1 to 64) {
      val a = math.abs(varr(p))
      if (a > topA || (a == topA && p > topDim)) { topA = a; topDim = p }
    }
    s.range(1).select(lit(nv).as("n_vecs"), lit(64L).as("d"),
      round(lit(nrm / 1e12), 6).as("lambda_scaled"),
      lit(topDim).as("top_dim"),
      round(lit(topA), 6).as("top_abs"))
  }
  val embedPcaPowerSql: String = {
    val base =
      """WITH x AS (
        |  SELECT vec_id, ii.i AS dim,
        |    CAST(floor(CAST(embedding[ii.i] AS DOUBLE) * 1000000 + 0.5)
        |      AS BIGINT) AS fx
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) ii),
        |nn AS (SELECT count(*) AS n FROM embeddings),
        |sm AS (SELECT dim, CAST(sum(fx) AS BIGINT) AS sv FROM x GROUP BY 1),
        |g AS (
        |  SELECT a.dim AS i, b.dim AS j,
        |    sum(CAST(a.fx AS DECIMAL(19,0)) * CAST(b.fx AS DECIMAL(19,0)))
        |      AS sxy
        |  FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
        |c AS (
        |  SELECT g.i, g.j,
        |    CAST(g.sxy AS DOUBLE) / nn.n
        |      - (CAST(si.sv AS DOUBLE) / nn.n) * (CAST(sj.sv AS DOUBLE) / nn.n)
        |      AS cv
        |  FROM g CROSS JOIN nn
        |    JOIN sm si ON si.dim = g.i JOIN sm sj ON sj.dim = g.j),
        |m AS (SELECT i, list(struct_pack(j := j, cv := cv) ORDER BY j) AS row
        |      FROM c GROUP BY 1),
        |v0 AS (SELECT list_transform(generate_series(1, 64), x -> 1.0)
        |       AS varr)""".stripMargin
    val iters = (1 to 8).map { k =>
      s"""w$k AS (
         |  SELECT m.i, list_reduce(list_prepend(0.0, list_transform(m.row,
         |    t -> t.cv * v${k - 1}.varr[t.j])), (a, b) -> a + b) AS w
         |  FROM m, v${k - 1}),
         |l$k AS (
         |  SELECT list_transform(list(struct_pack(i := i, w := w) ORDER BY i),
         |    t -> t.w) AS wl
         |  FROM w$k),
         |v$k AS (
         |  SELECT list_transform(wl, x -> x / sqrt(list_reduce(
         |      list_prepend(0.0, list_transform(wl, y -> y * y)),
         |      (a, b) -> a + b))) AS varr,
         |    sqrt(list_reduce(list_prepend(0.0, list_transform(wl,
         |      y -> y * y)), (a, b) -> a + b)) AS nrm
         |  FROM l$k)""".stripMargin
    }.mkString(",\n", ",\n", "")
    val fin =
      """,
        |top AS (
        |  SELECT max(struct_pack(a := abs(v8.varr[dd.i]), dim := dd.i)) AS mx
        |  FROM v8, (SELECT unnest(generate_series(1, 64)) AS i) dd)
        |SELECT nn.n AS n_vecs, CAST(64 AS BIGINT) AS d,
        |  round(v8.nrm / 1000000000000.0, 6) AS lambda_scaled,
        |  CAST(top.mx.dim AS BIGINT) AS top_dim,
        |  round(top.mx.a, 6) AS top_abs
        |FROM v8, top, nn""".stripMargin
    base + iters + fin
  }

  /** agg_log2_histogram — the HDR-style log2-bucketed histogram of
    * purchase amounts (latency/value histograms at scale are always
    * log-bucketed): the bucket is floor(log2(cents)) computed EXACTLY
    * as length(bin(cents))−1 — integer string length, no libm log
    * whose last-bit rounding could differ between engines. One
    * partial-agg pass; output bounded by 64 buckets per stream.
    */
  def aggLog2Histogram(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        (col("value").cast("decimal(14,2)") * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .withColumn("bucket", (length(expr("bin(cents)")) - 1).cast("long"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"), min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .orderBy("event_type", "bucket")
  val aggLog2HistogramSql: String =
    """SELECT event_type,
      |  CAST(length(bin(cents)) - 1 AS BIGINT) AS bucket,
      |  count(*) AS n, min(cents) AS min_cents, max(cents) AS max_cents
      |FROM (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
      |  FROM events)
      |WHERE cents > 0
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** ref_monthly_climatology — the month-of-year climatology endpoint (the
    * reference reports seasonal cycles: mean per calendar month across
    * all years, plus the anomaly vs the stream's overall mean): both
    * means derive from EXACT decimal sums; the anomaly is one IEEE
    * subtraction of two IEEE divisions on identical operands. One
    * keyed aggregate + one broadcast of the O(streams) overall frame.
    */
  def refMonthlyClimatology(s: SparkSession, d: String): DataFrame = {
    val overall = events(s, d).groupBy("event_type")
      .agg(sum(col("value").cast("decimal(14,2)")).as("st"),
        count(lit(1)).as("nt"))
    events(s, d)
      .groupBy(col("event_type"), month(col("ts")).cast("long").as("month"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).as("sm"))
      .join(broadcast(overall), "event_type")
      .select(col("event_type"), col("month"), col("n"),
        round(col("sm").cast("double") / col("n"), 6).as("mean_val"),
        round(col("sm").cast("double") / col("n")
          - col("st").cast("double") / col("nt"), 6).as("anomaly"))
      .orderBy("event_type", "month")
  }
  val refMonthlyClimatologySql: String =
    """WITH o AS (
      |  SELECT event_type, CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE)
      |      AS st, count(*) AS nt
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT event_type, CAST(month(ts) AS BIGINT) AS month,
      |    count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sm
      |  FROM events GROUP BY 1, 2)
      |SELECT m.event_type, m.month, m.n,
      |  round(m.sm / m.n, 6) AS mean_val,
      |  round(m.sm / m.n - o.st / o.nt, 6) AS anomaly
      |FROM m JOIN o USING (event_type)
      |ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_pca_power" -> (embedPcaPower _),
    "agg_log2_histogram" -> (aggLog2Histogram _),
    "ref_monthly_climatology" -> (refMonthlyClimatology _))

  val oracle: Map[String, String] = Map(
    "embed_pca_power" -> embedPcaPowerSql,
    "agg_log2_histogram" -> aggLog2HistogramSql,
    "ref_monthly_climatology" -> refMonthlyClimatologySql)
}
