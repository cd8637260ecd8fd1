package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 62 (C652–C655): Kendall's W, informative-Dirichlet log-odds,
  * Youden optimal cutpoint, alignment/uniformity.
  */
object Extras162 {

  /** C652 stat_kendall_w — Kendall's coefficient of concordance (do
    * the four quarters agree on the ranking of the seven years?):
    * within-quarter ranks over the BOUNDED 28-cell frame (exact cents,
    * year tie-break), S = Σ(R_j − m(k+1)/2)² exact integers,
    * W = 12S/(m²(k³−k)) and its χ² = m(k−1)W as final doubles.
    */
  def statKendallW(s: SparkSession, d: String): DataFrame = {
    val cells = lineitem(s, d)
      .groupBy(year(col("l_shipdate")).as("y"), quarter(col("l_shipdate")).as("q"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val wr = Window.partitionBy("q").orderBy(col("c").asc, col("y").asc)
    val ranked = cells.withColumn("r", rank().over(wr).cast("long"))
    val rj = ranked.groupBy("y")
      .agg(sum(col("r")).cast("long").as("rsum"), count(lit(1)).cast("long").as("m"))
    rj.agg(count(lit(1)).cast("long").as("k"),
        max(col("m")).as("m"),
        sum(expr("rsum * rsum")).cast("long").as("r2"),
        sum(col("rsum")).cast("long").as("rt"))
      .selectExpr("k", "m",
        "CAST(r2 AS DOUBLE) - CAST(rt AS DOUBLE) * rt / k AS ss")
      .selectExpr("k", "m",
        "round(12 * ss / (CAST(m AS DOUBLE) * m * (CAST(k AS DOUBLE) * k * k - k)), 6) AS kendall_w",
        "round(CAST(m AS DOUBLE) * (k - 1) * (12 * ss / (CAST(m AS DOUBLE) * m * (CAST(k AS DOUBLE) * k * k - k))), 4) AS chi2")
  }
  val statKendallWSql: String =
    """WITH cells AS (
      |  SELECT EXTRACT(year FROM l_shipdate) AS y,
      |    EXTRACT(quarter FROM l_shipdate) AS q,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |ranked AS (
      |  SELECT y, q, CAST(rank() OVER (PARTITION BY q ORDER BY c, y) AS BIGINT) AS r
      |  FROM cells),
      |rj AS (
      |  SELECT y, CAST(sum(r) AS BIGINT) AS rsum, CAST(count(*) AS BIGINT) AS m
      |  FROM ranked GROUP BY 1),
      |t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, max(m) AS m,
      |    CAST(sum(rsum * rsum) AS BIGINT) AS r2,
      |    CAST(sum(rsum) AS BIGINT) AS rt
      |  FROM rj),
      |ss AS (
      |  SELECT k, m, CAST(r2 AS DOUBLE) - CAST(rt AS DOUBLE) * rt / k AS ss
      |  FROM t)
      |SELECT k, m,
      |  round(12 * ss / (CAST(m AS DOUBLE) * m * (CAST(k AS DOUBLE) * k * k - k)), 6)
      |    AS kendall_w,
      |  round(CAST(m AS DOUBLE) * (k - 1)
      |    * (12 * ss / (CAST(m AS DOUBLE) * m * (CAST(k AS DOUBLE) * k * k - k))), 4)
      |    AS chi2
      |FROM ss""".stripMargin

  /** C653 text_log_odds_dirichlet — Monroe/Colaresi/Quinn's "fighting
    * words": informative-Dirichlet-prior log-odds of token use between
    * EN and DE documents (the distinctive-vocabulary extractor of
    * corpus comparison): token counts are exact one-pass integers, the
    * prior α_w = α₀·f_all(w) comes from the pooled corpus, each
    * token's δ and z are per-row closed-form doubles (no float-ordered
    * aggregation), top-8 by |z| with the token tie-break via the
    * top-N heap (no global sort).
    */
  def textLogOddsDirichlet(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .filter(col("lang").isin("en", "de"))
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val counts = toks.groupBy("tok")
      .agg(sum(expr("CASE WHEN lang = 'en' THEN 1L ELSE 0L END")).cast("long").as("ye"),
        sum(expr("CASE WHEN lang = 'de' THEN 1L ELSE 0L END")).cast("long").as("yd"))
    val tot = counts.agg(sum(col("ye")).cast("long").as("ne"),
      sum(col("yd")).cast("long").as("nd"),
      sum(expr("ye + yd")).cast("long").as("na"))
    counts.crossJoin(broadcast(tot))
      .withColumn("aw", expr("500.0D * (ye + yd) / na"))
      .withColumn("de_", expr(
        """ln((ye + aw) / (ne + 500.0D - ye - aw))
          | - ln((yd + aw) / (nd + 500.0D - yd - aw))""".stripMargin))
      .withColumn("z", expr(
        "de_ / sqrt(1.0D / (ye + aw) + 1.0D / (yd + aw))"))
      .orderBy(abs(col("z")).desc, col("tok").asc)
      .limit(8)
      .selectExpr("tok", "ye AS n_en", "yd AS n_de",
        "round(de_, 4) AS log_odds", "round(z, 4) AS z_score")
  }
  val textLogOddsDirichletSql: String =
    """WITH toks AS (
      |  SELECT lang, t.tok FROM documents,
      |    LATERAL (SELECT unnest(string_split(lower(text), ' ')) AS tok) t
      |  WHERE lang IN ('en', 'de') AND strlen(t.tok) > 0),
      |counts AS (
      |  SELECT tok,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ye,
      |    CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS yd
      |  FROM toks GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(ye) AS BIGINT) AS ne, CAST(sum(yd) AS BIGINT) AS nd,
      |    CAST(sum(ye + yd) AS BIGINT) AS na
      |  FROM counts),
      |z AS (
      |  SELECT tok, ye, yd,
      |    ln((ye + aw) / (ne + 500.0 - ye - aw))
      |      - ln((yd + aw) / (nd + 500.0 - yd - aw)) AS de_,
      |    (ln((ye + aw) / (ne + 500.0 - ye - aw))
      |      - ln((yd + aw) / (nd + 500.0 - yd - aw)))
      |      / sqrt(1.0 / (ye + aw) + 1.0 / (yd + aw)) AS z
      |  FROM (SELECT c.*, tot.*, 500.0 * (ye + yd) / na AS aw FROM counts c, tot))
      |SELECT tok, ye AS n_en, yd AS n_de,
      |  round(de_, 4) AS log_odds, round(z, 4) AS z_score
      |FROM z ORDER BY abs(z) DESC, tok LIMIT 8""".stripMargin

  /** C654 stat_youden_optimal_cutpoint — the optimal classification
    * threshold by Youden's J (TPR−FPR) for "price predicts returns":
    * every distinct price is a candidate via the SAME packed GlobalRank
    * prefix sum as the Gini row (cnt·2³²+pos, one two-pass range sort,
    * never a single-task window), J per candidate in deterministic
    * doubles from exact prefix integers, argmax via struct with
    * lowest-threshold tie-break.
    */
  def statYoudenOptimalCutpoint(s: SparkSession, d: String): DataFrame = {
    val rows = lineitem(s, d).select(
      expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("v"),
      expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END").as("y"))
    val byV = rows.groupBy("v")
      .agg(count(lit(1)).cast("long").as("cnt"), sum(col("y")).cast("long").as("pos"))
      .withColumn("packed", expr("cnt * 4294967296L + pos"))
    val pre = graft.plans.GlobalRank.withExclusivePrefixSum(
      byV, "pfx", col("packed"), Seq(col("v").asc))
      .selectExpr("v", "cnt", "pos",
        "CAST((pfx + packed) div 4294967296L AS BIGINT) AS cl",
        "CAST((pfx + packed) % 4294967296L AS BIGINT) AS pl")
    // r14: totals roll up exactly from the pinned spine — not a second
    // lineitem scan + aggregation
    val tot = pre.agg(sum(col("cnt")).cast("long").as("n"),
      sum(col("pos")).cast("long").as("p"))
    val cand = pre.drop("cnt", "pos").crossJoin(broadcast(tot))
      .filter(col("cl") < col("n"))
      // predict positive when v > threshold: TPR = (p-pl)/p, FPR = (n-cl-p+pl)/(n-p)
      .withColumn("j", expr(
        """CAST(p - pl AS DOUBLE) / p
          |- CAST(n - cl - (p - pl) AS DOUBLE) / (n - p)""".stripMargin))
    cand.agg(max(col("p")).as("p"), max(col("n")).as("n"),
        max(struct(col("j"), (col("v") * -1).as("nv"))).as("best"))
      .selectExpr(
        "round(CAST(best.nv * -1 AS DOUBLE) / 100, 2) AS best_threshold",
        "round(best.j, 6) AS youden_j")
  }
  val statYoudenOptimalCutpointSql: String =
    """WITH rows_ AS (
      |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem),
      |byv AS (
      |  SELECT v, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(y) AS BIGINT) AS pos
      |  FROM rows_ GROUP BY 1),
      |pre AS (
      |  SELECT v,
      |    CAST(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cl,
      |    CAST(sum(pos) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pl
      |  FROM byv),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS p
      |  FROM rows_),
      |cand AS (
      |  SELECT v,
      |    CAST(p - pl AS DOUBLE) / p
      |      - CAST(n - cl - (p - pl) AS DOUBLE) / (n - p) AS j
      |  FROM pre, tot WHERE cl < n)
      |SELECT
      |  round(CAST((max(struct_pack(j := j, nv := -v))).nv * -1 AS DOUBLE) / 100, 2)
      |    AS best_threshold,
      |  round((max(struct_pack(j := j, nv := -v))).j, 6) AS youden_j
      |FROM cand""".stripMargin

  /** C655 embed_alignment_uniformity — Wang & Isola's two embedding-
    * quality scalars: ALIGNMENT (mean within-label pairwise squared
    * distance) in CLOSED FORM — E‖x−y‖² = 2W_label/(n_label−1) from the
    * same exact per-(label,dim) Huygens moments as the CH row, NO
    * pairs; UNIFORMITY (ln mean exp(−2‖x−y‖²)) over the FIXED 500-
    * vector probe sample (O(1) in the corpus — whitelisted like every
    * probe row), exp terms pico-quantized so the pair sum is an exact
    * integer.
    */
  def embedAlignmentUniformity(s: SparkSession, d: String): DataFrame = {
    val comp = embeddings(s, d)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("label"), col("pos"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1e9 + 0.5) AS BIGINT)").as("f"))
    val g = comp.groupBy("label", "pos")
      .agg(count(lit(1)).cast("long").as("nj"),
        sum(col("f")).cast("decimal(38,0)").as("sf"),
        sum(expr("CAST(f AS DECIMAL(38,0)) * f")).cast("decimal(38,0)").as("qf"))
    val align = g.groupBy("label")
      .agg(max(col("nj")).as("nj"),
        // nj is constant per label, so the EXACT decimal sum divides once
        sum(expr("CAST(CAST(nj AS DECIMAL(38,0)) * qf - sf * sf AS DECIMAL(38,0))"))
          .cast("decimal(38,0)").as("wnum"))
      .withColumn("w", expr("CAST(wnum AS DOUBLE) / nj / 1e18"))
      .filter(col("nj") > 1)
      .agg(sum(expr("CAST(floor(2 * w / (nj - 1) * 1e9 + 0.5) AS BIGINT)"))
        .cast("long").as("aq"),
        count(lit(1)).cast("long").as("nl"))
      .selectExpr("CAST(aq AS DOUBLE) / nl / 1e9 AS alignment")
    val probe = comp.filter(col("vec_id") < 500)
      .select(col("vec_id"), col("pos"), col("f"))
    val pairs = probe.as("a")
      .join(probe.selectExpr("vec_id AS vid2", "pos", "f AS f2").as("b"), Seq("pos"))
      .filter(expr("vec_id < vid2"))
      .groupBy("vec_id", "vid2")
      .agg(sum(expr("CAST(f - f2 AS DECIMAL(38,0)) * (f - f2)"))
        .cast("decimal(38,0)").as("d2"))
      .selectExpr(
        "CAST(floor(exp(-2 * CAST(d2 AS DOUBLE) / 1e18) * 1e12 + 0.5) AS BIGINT) AS eq")
    val unif = pairs.agg(count(lit(1)).cast("long").as("np"),
        sum(col("eq")).cast("long").as("es"))
      .selectExpr("np", "ln(CAST(es AS DOUBLE) / np / 1e12) AS uniformity")
    align.crossJoin(broadcast(unif))
      .selectExpr("round(alignment, 6) AS alignment", "np AS n_probe_pairs",
        "round(uniformity, 6) AS uniformity")
  }
  val embedAlignmentUniformitySql: String =
    """WITH comp AS (
      |  SELECT e.vec_id, e.label, i.i AS pos,
      |    CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS f
      |  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i),
      |g AS (
      |  SELECT label, pos, CAST(count(*) AS BIGINT) AS nj,
      |    CAST(sum(f) AS DECIMAL(38,0)) AS sf,
      |    CAST(sum(CAST(f AS DECIMAL(38,0)) * f) AS DECIMAL(38,0)) AS qf
      |  FROM comp GROUP BY 1, 2),
      |wl AS (
      |  SELECT label, max(nj) AS nj,
      |    CAST(CAST(sum(CAST(CAST(nj AS DECIMAL(38,0)) * qf - sf * sf AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE)
      |      / max(nj) / 1e18 AS w
      |  FROM g GROUP BY 1),
      |align AS (
      |  SELECT CAST(CAST(sum(CAST(floor(2 * w / (nj - 1) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
      |    / count(*) / 1e9 AS alignment
      |  FROM wl WHERE nj > 1),
      |probe AS (SELECT vec_id, pos, f FROM comp WHERE vec_id < 500),
      |pairs AS (
      |  SELECT a.vec_id, b.vec_id AS vid2,
      |    CAST(floor(exp(-2 * CAST(CAST(sum(CAST(a.f - b.f AS DECIMAL(38,0)) * (a.f - b.f)) AS DECIMAL(38,0)) AS DOUBLE) / 1e18) * 1e12 + 0.5) AS BIGINT) AS eq
      |  FROM probe a JOIN probe b ON a.pos = b.pos AND a.vec_id < b.vec_id
      |  GROUP BY 1, 2),
      |unif AS (
      |  SELECT CAST(count(*) AS BIGINT) AS np,
      |    ln(CAST(CAST(sum(eq) AS BIGINT) AS DOUBLE) / count(*) / 1e12) AS uniformity
      |  FROM pairs)
      |SELECT round(align.alignment, 6) AS alignment, unif.np AS n_probe_pairs,
      |  round(unif.uniformity, 6) AS uniformity
      |FROM align, unif""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_kendall_w" -> (statKendallW _),
    "text_log_odds_dirichlet" -> (textLogOddsDirichlet _),
    "stat_youden_optimal_cutpoint" -> (statYoudenOptimalCutpoint _),
    "embed_alignment_uniformity" -> (embedAlignmentUniformity _),
  )

  val oracle: Map[String, String] = Map(
    "stat_kendall_w" -> statKendallWSql,
    "text_log_odds_dirichlet" -> textLogOddsDirichletSql,
    "stat_youden_optimal_cutpoint" -> statYoudenOptimalCutpointSql,
    "embed_alignment_uniformity" -> embedAlignmentUniformitySql,
  )
}
