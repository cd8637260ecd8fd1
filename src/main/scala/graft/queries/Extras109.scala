package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 109th wave — per-community conductance, the LOCAL counterpart of
  * C438's global modularity: which individual communities are
  * well-separated, and which leak?
  */
object Extras109 {

  /** graph_community_conductance — for each LPA community (C432):
    * volume (Σ degrees), cut (directed edges leaving the community),
    * and conductance φ = cut / min(vol, 2m − vol) — the standard
    * cluster-quality score (low φ = well-separated). All counts are
    * exact integers from two label-broadcast joins over the edge
    * stream; φ is ONE IEEE division per community row (no float
    * summation anywhere). Top-20 communities by size (then label) keep
    * the output bounded at any corpus size; the oracle reuses C432's
    * unrolled label CTEs verbatim, so both engines score the same
    * partition — the C438 discipline.
    */
  def graphCommunityConductance(s: SparkSession, d: String): DataFrame = {
    val edges = Extras101.lpaEdges(s, d)
    val labels = Extras101.lpaLabels(s, d) // staged parquet: cheap re-read
    val lsrc = labels.select(col("user_id").as("src"), col("lbl").as("cs"))
    val ldst = labels.select(col("user_id").as("dst"), col("lbl").as("cd"))
    val tagged = edges.join(broadcast(lsrc), "src")
      .join(broadcast(ldst), "dst")
      .localCheckpoint(true) // 2 consumers: per-community stats + total m
    // m2 (= 2m, every undirected edge counted twice) as a ONE-ROW
    // AGGREGATE crossJoined into the plan — the same shape as the
    // oracle's m2 CTE. A driver-side count() baked in as a literal
    // would both trigger a job at DataFrame-construction time and go
    // silently stale if the staged edge artifact were rebuilt between
    // plan construction and execution.
    val m2df = tagged.agg(count(lit(1)).as("m2"))
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
    val stats = tagged.groupBy(col("cs").as("lbl"))
      .agg(count(lit(1)).as("volume"),
        sum(when(col("cs") =!= col("cd"), 1L).otherwise(0L)).as("cut"))
    stats.join(broadcast(sizes), "lbl")
      .crossJoin(broadcast(m2df))
      .select(col("lbl").as("community"), col("n_members"),
        col("volume"), col("cut"),
        // nullif: when ONE community holds the whole graph (the dense
        // sf0.001 case) min(vol, 2m-vol) = 0 and 0/0 would be NaN with
        // engine-specific hash behavior; NULL is the honest "undefined"
        round(col("cut").cast("double")
          / expr("nullif(least(volume, m2 - volume), 0)")
            .cast("double"), 6)
          .as("conductance"))
      .orderBy(col("n_members").desc, col("community").asc)
      .limit(20)
  }
  val graphCommunityConductanceSql: String =
    s"""${Extras101.lpaCtePrefix},
       |lab AS (SELECT user_id, lbl FROM l${Extras101.LpaRounds}),
       |tagged AS (
       |  SELECT ls.lbl AS cs, ld.lbl AS cd
       |  FROM edges e
       |  JOIN lab ls ON ls.user_id = e.src
       |  JOIN lab ld ON ld.user_id = e.dst),
       |m2 AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM tagged),
       |sizes AS (
       |  SELECT lbl, CAST(count(*) AS BIGINT) AS n_members
       |  FROM lab GROUP BY 1),
       |stats AS (
       |  SELECT cs AS lbl, CAST(count(*) AS BIGINT) AS volume,
       |    CAST(sum(CASE WHEN cs <> cd THEN 1 ELSE 0 END) AS BIGINT) AS cut
       |  FROM tagged GROUP BY 1)
       |SELECT s.lbl AS community, z.n_members, s.volume, s.cut,
       |  round(CAST(s.cut AS DOUBLE)
       |    / CAST(nullif(least(s.volume, m2.m2 - s.volume), 0) AS DOUBLE), 6)
       |    AS conductance
       |FROM stats s JOIN sizes z ON z.lbl = s.lbl CROSS JOIN m2
       |ORDER BY z.n_members DESC, community ASC LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_community_conductance" -> (graphCommunityConductance _))

  val oracle: Map[String, String] = Map(
    "graph_community_conductance" -> graphCommunityConductanceSql)
}
