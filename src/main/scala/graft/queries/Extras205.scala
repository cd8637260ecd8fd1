package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 105 (C824–C827): paired-margin inference + econometrics +
  * stylometry + dedup structure — the Stuart–Maxwell marginal-
  * homogeneity test, cross-price elasticity, Burrows' Zeta, and the
  * duplicate-cluster size-spectrum entropy.
  *
  * Shared discipline: the Stuart–Maxwell system is solved by the same
  * shared-text 4×4 Cramer used for RESET (identical doubles in both
  * engines) over exact paired counts; elasticities quantize monthly
  * logs once; Zeta document-frequency fractions are exact rationals
  * quantized ·10⁹; the cluster-size spectrum is pure integer
  * histogram algebra.
  */
object Extras205 {

  /** Shared 4×4 Cramer determinant (same text both engines). */
  private def det4(m: Array[Array[String]]): String = {
    def det3(a: Array[Array[String]]): String =
      s"""(${a(0)(0)} * (${a(1)(1)} * ${a(2)(2)} - ${a(1)(2)} * ${a(2)(1)})
        | - ${a(0)(1)} * (${a(1)(0)} * ${a(2)(2)} - ${a(1)(2)} * ${a(2)(0)})
        | + ${a(0)(2)} * (${a(1)(0)} * ${a(2)(1)} - ${a(1)(1)} * ${a(2)(0)}))""".stripMargin
    def minor(r: Int, c: Int): Array[Array[String]] =
      (0 until 4).filter(_ != r).map(i =>
        (0 until 4).filter(_ != c).map(j => m(i)(j)).toArray).toArray
    s"""(${m(0)(0)} * ${det3(minor(0, 0))}
      | - ${m(0)(1)} * ${det3(minor(0, 1))}
      | + ${m(0)(2)} * ${det3(minor(0, 2))}
      | - ${m(0)(3)} * ${det3(minor(0, 3))})""".stripMargin
  }

  /** C824 stat_stuart_maxwell — the Stuart–Maxwell test of marginal
    * homogeneity on the 5×5 priority×price-band paired table (the κ_w
    * table of C762): d_i = row_i − col_i for the first 4 categories,
    * S_ii = r_i + c_i − 2n_ii, S_ij = −(n_ij + n_ji), χ²₄ = d′S⁻¹d via
    * Cramer-solved linear systems in shared-text double arithmetic.
    * κ measures agreement; THIS measures whether the two margins even
    * share a distribution — the bias check before any agreement claim.
    */
  def statStuartMaxwell(s: SparkSession, d: String): DataFrame = {
    val cells = orders(s, d)
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS INT)").as("x"),
        expr(
          """CASE WHEN o_totalprice < 60000 THEN 1 WHEN o_totalprice < 120000 THEN 2
            |WHEN o_totalprice < 180000 THEN 3 WHEN o_totalprice < 240000 THEN 4
            |ELSE 5 END""".stripMargin).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).cast("long").as("m"))
    // pivot all 25 cells + margins into ONE row of named doubles
    val cellCols = (for (i <- 1 to 5; j <- 1 to 5) yield
      sum(expr(s"CASE WHEN x = $i AND y = $j THEN m ELSE 0L END")).cast("long").as(s"n$i$j"))
    val wide = cells.agg(cellCols.head, cellCols.tail: _*)
      .selectExpr((for (i <- 1 to 5; j <- 1 to 5) yield s"CAST(n$i$j AS DOUBLE) AS n$i$j") ++
        (1 to 4).map(i => s"CAST(${(1 to 5).map(j => s"n$i$j").mkString(" + ")} AS DOUBLE) - (${(1 to 5).map(j => s"n$j$i").mkString(" + ")}) AS d$i") ++
        (1 to 4).map(i => s"(${(1 to 5).map(j => s"n$i$j").mkString(" + ")}) + (${(1 to 5).map(j => s"n$j$i").mkString(" + ")}) - 2 * n$i$i AS s$i$i") ++
        (for (i <- 1 to 4; j <- 1 to 4 if i != j) yield s"-(n$i$j + n$j$i) AS s$i$j"): _*)
    val sM = Array.tabulate(4, 4)((i, j) => s"s${i + 1}${j + 1}")
    val d0 = det4(sM)
    def dCol(c: Int): String =
      det4(Array.tabulate(4, 4)((i, j) => if (j == c) s"d${i + 1}" else s"s${i + 1}${j + 1}"))
    val chi = (0 until 4).map(c => s"(${dCol(c)}) * d${c + 1}").mkString(" + ")
    wide.selectExpr(
      s"CAST(${(for (i <- 1 to 5; j <- 1 to 5) yield s"n$i$j").mkString(" + ")} AS BIGINT) AS n",
      s"round(($chi) / ($d0), 4) AS stuart_maxwell_chi2",
      "CAST(4 AS BIGINT) AS dof")
  }
  val statStuartMaxwellSql: String = {
    val sM = Array.tabulate(4, 4)((i, j) => s"s${i + 1}${j + 1}")
    val d0 = det4(sM)
    def dCol(c: Int): String =
      det4(Array.tabulate(4, 4)((i, j) => if (j == c) s"d${i + 1}" else s"s${i + 1}${j + 1}"))
    val chi = (0 until 4).map(c => s"(${dCol(c)}) * d${c + 1}").mkString(" + ")
    val cellCols = (for (i <- 1 to 5; j <- 1 to 5) yield
      s"CAST(sum(CASE WHEN x = $i AND y = $j THEN m ELSE 0 END) AS BIGINT) AS n$i$j")
      .mkString(",\n      |    ")
    val wideCols = ((for (i <- 1 to 5; j <- 1 to 5) yield s"CAST(n$i$j AS DOUBLE) AS n$i$j") ++
      (1 to 4).map(i => s"CAST(${(1 to 5).map(j => s"n$i$j").mkString(" + ")} AS DOUBLE) - (${(1 to 5).map(j => s"n$j$i").mkString(" + ")}) AS d$i") ++
      (1 to 4).map(i => s"(${(1 to 5).map(j => s"n$i$j").mkString(" + ")}) + (${(1 to 5).map(j => s"n$j$i").mkString(" + ")}) - 2 * n$i$i AS s$i$i") ++
      (for (i <- 1 to 4; j <- 1 to 4 if i != j) yield s"-(n$i$j + n$j$i) AS s$i$j"))
      .mkString(",\n      |    ")
    s"""WITH cells AS (
      |  SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS x,
      |    CASE WHEN o_totalprice < 60000 THEN 1 WHEN o_totalprice < 120000 THEN 2
      |      WHEN o_totalprice < 180000 THEN 3 WHEN o_totalprice < 240000 THEN 4
      |      ELSE 5 END AS y,
      |    CAST(count(*) AS BIGINT) AS m
      |  FROM orders GROUP BY 1, 2),
      |pv AS (
      |  SELECT $cellCols
      |  FROM cells),
      |wide AS (
      |  SELECT $wideCols
      |  FROM pv)
      |SELECT CAST(${(for (i <- 1 to 5; j <- 1 to 5) yield s"n$i$j").mkString(" + ")} AS BIGINT) AS n,
      |  round(($chi) / ($d0), 4) AS stuart_maxwell_chi2,
      |  CAST(4 AS BIGINT) AS dof
      |FROM wide""".stripMargin
  }

  /** C825 analytics_cross_elasticity — own- and cross-price
    * elasticities from monthly class aggregates: ln(PROMO unit value)
    * as the price signal, regressed against ln(PROMO qty) [own] and
    * ln(STANDARD qty) [cross], logs quantized ·10⁹ once, exact moment
    * OLS. Positive cross-elasticity = substitutes; the pricing-lever
    * readout beyond the single-class elasticity row.
    */
  def analyticsCrossElasticity(s: SparkSession, d: String): DataFrame = {
    val monthly = lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy(expr("date_trunc('month', l_shipdate)").as("mon"))
      .agg(
        sum(expr(
          """CASE WHEN split_part(p_type, ' ', 1) = 'PROMO'
            |THEN CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0L END""".stripMargin))
          .cast("long").as("prev"),
        sum(expr("CASE WHEN split_part(p_type, ' ', 1) = 'PROMO' THEN CAST(l_quantity AS BIGINT) ELSE 0L END"))
          .cast("long").as("pqty"),
        sum(expr("CASE WHEN split_part(p_type, ' ', 1) = 'STANDARD' THEN CAST(l_quantity AS BIGINT) ELSE 0L END"))
          .cast("long").as("sqty"))
      .filter(expr("prev > 0 AND pqty > 0 AND sqty > 0"))
      .select(
        expr("CAST(floor(ln(CAST(prev AS DOUBLE) / pqty / 100) * 1e9 + 0.5) AS BIGINT)").as("lp"),
        expr("CAST(floor(ln(CAST(pqty AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)").as("lqo"),
        expr("CAST(floor(ln(CAST(sqty AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)").as("lqc"))
    def slope(yc: String): String =
      s"""(CAST(n AS DOUBLE) * CAST(s_lp_$yc AS DOUBLE) - CAST(s_lp AS DOUBLE) * CAST(s_$yc AS DOUBLE))
        |/ (CAST(n AS DOUBLE) * CAST(s_lp2 AS DOUBLE) - CAST(s_lp AS DOUBLE) * CAST(s_lp AS DOUBLE))""".stripMargin
    monthly.agg(count(lit(1)).cast("long").as("n"),
        sum(col("lp")).cast("decimal(38,0)").as("s_lp"),
        sum(expr("CAST(lp AS DECIMAL(38,0)) * lp")).cast("decimal(38,0)").as("s_lp2"),
        sum(col("lqo")).cast("decimal(38,0)").as("s_lqo"),
        sum(col("lqc")).cast("decimal(38,0)").as("s_lqc"),
        sum(expr("CAST(lp AS DECIMAL(38,0)) * lqo")).cast("decimal(38,0)").as("s_lp_lqo"),
        sum(expr("CAST(lp AS DECIMAL(38,0)) * lqc")).cast("decimal(38,0)").as("s_lp_lqc"))
      .selectExpr("n",
        s"round(${slope("lqo")}, 6) AS own_elasticity",
        s"round(${slope("lqc")}, 6) AS cross_elasticity")
  }
  val analyticsCrossElasticitySql: String = {
    def slope(yc: String): String =
      s"""(CAST(n AS DOUBLE) * CAST(s_lp_$yc AS DOUBLE) - CAST(s_lp AS DOUBLE) * CAST(s_$yc AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(s_lp2 AS DOUBLE) - CAST(s_lp AS DOUBLE) * CAST(s_lp AS DOUBLE))""".stripMargin
    s"""WITH monthly AS (
      |  SELECT date_trunc('month', l.l_shipdate) AS mon,
      |    CAST(sum(CASE WHEN split_part(p.p_type, ' ', 1) = 'PROMO'
      |      THEN CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS prev,
      |    CAST(sum(CASE WHEN split_part(p.p_type, ' ', 1) = 'PROMO'
      |      THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS pqty,
      |    CAST(sum(CASE WHEN split_part(p.p_type, ' ', 1) = 'STANDARD'
      |      THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS sqty
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1),
      |logs AS (
      |  SELECT
      |    CAST(floor(ln(CAST(prev AS DOUBLE) / pqty / 100) * 1e9 + 0.5) AS BIGINT) AS lp,
      |    CAST(floor(ln(CAST(pqty AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS lqo,
      |    CAST(floor(ln(CAST(sqty AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS lqc
      |  FROM monthly WHERE prev > 0 AND pqty > 0 AND sqty > 0),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(lp) AS DECIMAL(38,0)) AS s_lp,
      |    CAST(sum(CAST(lp AS DECIMAL(38,0)) * lp) AS DECIMAL(38,0)) AS s_lp2,
      |    CAST(sum(lqo) AS DECIMAL(38,0)) AS s_lqo,
      |    CAST(sum(lqc) AS DECIMAL(38,0)) AS s_lqc,
      |    CAST(sum(CAST(lp AS DECIMAL(38,0)) * lqo) AS DECIMAL(38,0)) AS s_lp_lqo,
      |    CAST(sum(CAST(lp AS DECIMAL(38,0)) * lqc) AS DECIMAL(38,0)) AS s_lp_lqc
      |  FROM logs)
      |SELECT n,
      |  round(${slope("lqo")}, 6) AS own_elasticity,
      |  round(${slope("lqc")}, 6) AS cross_elasticity
      |FROM m""".stripMargin
  }

  /** C826 text_burrows_zeta — Craig's Zeta for the 'en' slice against
    * the rest of the corpus: per shared word, zeta = DF_A/|A| − DF_B/|B|
    * (document-frequency fractions, exact rationals quantized ·10⁹);
    * reports the shared-vocabulary size, mean |zeta|, marker counts at
    * |zeta| > 0.1, and the strongest marker (deterministic tie-break).
    * The distinctive-vocabulary complement to Burrows' Delta (C-line):
    * Delta compares frequency profiles, Zeta document PRESENCE.
    */
  def textBurrowsZeta(s: SparkSession, d: String): DataFrame = {
    val docTok = documents(s, d)
      .select(col("doc_id"), expr("lang = 'en'").as("isA"),
        explode(expr("array_distinct(split(text, ' '))")).as("w"))
    val sizes = documents(s, d).agg(
      sum(expr("CASE WHEN lang = 'en' THEN 1L ELSE 0L END")).cast("long").as("na"),
      sum(expr("CASE WHEN lang = 'en' THEN 0L ELSE 1L END")).cast("long").as("nb"))
    val df = docTok.groupBy("w")
      .agg(sum(expr("CASE WHEN isA THEN 1L ELSE 0L END")).cast("long").as("dfa"),
        sum(expr("CASE WHEN isA THEN 0L ELSE 1L END")).cast("long").as("dfb"))
      .filter(expr("dfa > 0 AND dfb > 0")) // shared vocabulary only
    val z = df.crossJoin(broadcast(sizes))
      .select(col("w"),
        expr("CAST(floor((CAST(dfa AS DOUBLE) / na - CAST(dfb AS DOUBLE) / nb) * 1e9 + 0.5) AS BIGINT)").as("zq"))
    val top = z.orderBy(abs(col("zq")).desc, col("w").asc).limit(1)
      .select(col("w").as("top_marker"), col("zq").as("top_zq"))
    z.agg(count(lit(1)).cast("long").as("n_shared_vocab"),
        sum(abs(col("zq"))).cast("decimal(38,0)").as("sabs"),
        sum(expr("CASE WHEN zq > CAST(0.1 * 1e9 AS BIGINT) THEN 1L ELSE 0L END")).cast("long").as("markers_en"),
        sum(expr("CASE WHEN zq < CAST(-0.1 * 1e9 AS BIGINT) THEN 1L ELSE 0L END")).cast("long").as("markers_rest"))
      .crossJoin(broadcast(top))
      .selectExpr("n_shared_vocab",
        "round(CAST(sabs AS DOUBLE) / 1e9 / n_shared_vocab, 6) AS mean_abs_zeta",
        "markers_en", "markers_rest", "top_marker",
        "round(CAST(top_zq AS DOUBLE) / 1e9, 6) AS top_zeta")
  }
  val textBurrowsZetaSql: String =
    """WITH doctok AS (
      |  SELECT doc_id, lang = 'en' AS isa,
      |    unnest(list_distinct(string_split(text, ' '))) AS w
      |  FROM documents),
      |sizes AS (
      |  SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS nb
      |  FROM documents),
      |df AS (
      |  SELECT w,
      |    CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS dfa,
      |    CAST(sum(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS dfb
      |  FROM doctok GROUP BY 1),
      |shared AS (SELECT * FROM df WHERE dfa > 0 AND dfb > 0),
      |z AS (
      |  SELECT w,
      |    CAST(floor((CAST(dfa AS DOUBLE) / s.na - CAST(dfb AS DOUBLE) / s.nb) * 1e9 + 0.5) AS BIGINT) AS zq
      |  FROM shared, sizes s),
      |top AS (
      |  SELECT w AS top_marker, zq AS top_zq FROM z
      |  ORDER BY abs(zq) DESC, w LIMIT 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_shared_vocab,
      |  round(CAST(CAST(sum(abs(zq)) AS DECIMAL(38,0)) AS DOUBLE) / 1e9 / count(*), 6) AS mean_abs_zeta,
      |  CAST(sum(CASE WHEN zq > CAST(0.1 * 1e9 AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT) AS markers_en,
      |  CAST(sum(CASE WHEN zq < CAST(-0.1 * 1e9 AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT) AS markers_rest,
      |  max(t.top_marker) AS top_marker,
      |  round(CAST(max(t.top_zq) AS DOUBLE) / 1e9, 6) AS top_zeta
      |FROM z, top t""".stripMargin

  /** C827 dedup_cluster_size_entropy — the size spectrum of 3-token
    * template-prefix clusters: cluster sizes from one grouped count,
    * the size histogram, Shannon entropy of the cluster-size
    * distribution (·10⁹-quantized terms), the effective number of
    * clusters e^H, and the non-singleton doc share. A LOW entropy with
    * a high non-singleton share = a few templates dominating — the
    * shape question the dup-COUNT rows don't answer.
    */
  def dedupClusterSizeEntropy(s: SparkSession, d: String): DataFrame = {
    val clusters = documents(s, d)
      .groupBy(expr("concat_ws(' ', slice(split(text, ' '), 1, 3))").as("pref"))
      .agg(count(lit(1)).cast("long").as("sz"))
    val tot = clusters.agg(count(lit(1)).cast("long").as("k"),
      sum(col("sz")).cast("long").as("n"))
    clusters.crossJoin(broadcast(tot))
      .agg(max(col("k")).as("n_clusters"), max(col("n")).as("n_docs"),
        sum(expr(
          "CAST(floor(CAST(sz AS DOUBLE) * ln(CAST(n AS DOUBLE) / sz) * 1e9 + 0.5) AS BIGINT)"))
          .cast("long").as("hq"),
        sum(expr("CASE WHEN sz >= 2 THEN sz ELSE 0L END")).cast("long").as("nsdocs"))
      .selectExpr("n_clusters", "n_docs",
        "round(CAST(hq AS DOUBLE) / 1e9 / n_docs, 6) AS cluster_entropy_nats",
        "round(exp(CAST(hq AS DOUBLE) / 1e9 / n_docs), 4) AS effective_clusters",
        "round(CAST(nsdocs AS DOUBLE) / n_docs, 6) AS non_singleton_doc_share")
  }
  val dedupClusterSizeEntropySql: String =
    """WITH clusters AS (
      |  SELECT array_to_string(string_split(text, ' ')[1:3], ' ') AS pref,
      |    CAST(count(*) AS BIGINT) AS sz
      |  FROM documents GROUP BY 1),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(sz) AS BIGINT) AS n FROM clusters)
      |SELECT max(t.k) AS n_clusters, max(t.n) AS n_docs,
      |  round(CAST(CAST(sum(CAST(floor(CAST(c.sz AS DOUBLE) * ln(CAST(t.n AS DOUBLE) / c.sz) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
      |    / 1e9 / max(t.n), 6) AS cluster_entropy_nats,
      |  round(exp(CAST(CAST(sum(CAST(floor(CAST(c.sz AS DOUBLE) * ln(CAST(t.n AS DOUBLE) / c.sz) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
      |    / 1e9 / max(t.n)), 4) AS effective_clusters,
      |  round(CAST(sum(CASE WHEN c.sz >= 2 THEN c.sz ELSE 0 END) AS DOUBLE) / max(t.n), 6) AS non_singleton_doc_share
      |FROM clusters c, tot t""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_stuart_maxwell" -> (statStuartMaxwell _),
    "analytics_cross_elasticity" -> (analyticsCrossElasticity _),
    "text_burrows_zeta" -> (textBurrowsZeta _),
    "dedup_cluster_size_entropy" -> (dedupClusterSizeEntropy _),
  )

  val oracle: Map[String, String] = Map(
    "stat_stuart_maxwell" -> statStuartMaxwellSql,
    "analytics_cross_elasticity" -> analyticsCrossElasticitySql,
    "text_burrows_zeta" -> textBurrowsZetaSql,
    "dedup_cluster_size_entropy" -> dedupClusterSizeEntropySql,
  )
}
