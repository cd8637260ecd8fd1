package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.execution.{BaseSubqueryExec, CollectLimitExec, GlobalLimitExec, LocalLimitExec, TakeOrderedAndProjectExec}

/** Fleet-wide plan-invariant gate (r8 verdict task #1): every
  * registered query's PHYSICAL plan is machine-checked for
  * the three patterns that sink a 100 TB run —
  *
  *  1. `CartesianProductExec` — a true cartesian product. Never
  *     allowed; the audited crossJoins in this repo are all broadcasts
  *     and plan as BroadcastNestedLoopJoin instead.
  *  2. `BroadcastNestedLoopJoinExec` — allowed when the BROADCAST side
  *     is provably bounded by its own subtree: an aggregate with empty
  *     grouping (exactly 1 row — the `crossJoin(broadcast(totals))`
  *     idiom used by the stat/agg batteries) or an explicit limit.
  *     Otherwise only the whitelist below, each entry carrying the
  *     bound that keeps the broadcast side driver-trivial (≤64-row
  *     centroid/dictionary frames selected by key predicates the plan
  *     can't prove). Anything else is an accidental corpus-scale
  *     nested loop.
  *  3. `WindowExec` / `WindowGroupLimitExec` with an EMPTY partition
  *     spec whose input subtree contains NO aggregation and NO limit —
  *     i.e. a single-task global window over a corpus-scale frame.
  *     An aggregate or limit below the window bounds its input (the
  *     bounded-frame shapes rounds 3–8 hand-audited: GlobalRank's
  *     ≤N_partitions offset window over per-partition aggregates,
  *     per-lang 5-row frames over group-bys); those stay legal without
  *     listing. The whitelist is only for justified exceptions with no
  *     such node.
  *
  * This converts the 173 benign-but-hand-audited `WindowExec: No
  * Partition Defined` warnings from "audited in rounds 3–8" into a
  * regression gate: the 508th row cannot silently introduce a global
  * sort-the-corpus window or an n² join.
  */
class PlanInvariantSpec extends SparkSpec {

  /** query name -> one-line bound justification for a
    * BroadcastNestedLoopJoinExec in its plan.
    */
  private val bnljWhitelist: Map[String, String] = PlanInvariantSpec.bnljWhitelist

  /** query name -> one-line bound justification for an
    * empty-partition window with no aggregate/limit below it.
    */
  private val globalWindowWhitelist: Map[String, String] =
    PlanInvariantSpec.globalWindowWhitelist

  private def hasBoundingNodeBelow(p: SparkPlan): Boolean =
    p.exists {
      case _: BaseAggregateExec => true
      case _: GlobalLimitExec | _: LocalLimitExec => true
      case _: CollectLimitExec | _: TakeOrderedAndProjectExec => true
      case _ => false
    }

  /** Every physical node in the plan, descending through AQE wrappers
    * and planned subquery expressions (both of which plain
    * TreeNode.collect skips).
    */
  private def allNodes(root: SparkPlan): Seq[SparkPlan] = {
    val direct = root.collect { case p => p }
    direct ++ direct.flatMap { node =>
      val aqe = node match {
        case a: AdaptiveSparkPlanExec => allNodes(a.inputPlan)
        case _ => Seq.empty
      }
      val subq = node.expressions.flatMap(_.collect {
        case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
          pe.plan match {
            case sp: BaseSubqueryExec => allNodes(sp.child)
            case sp: SparkPlan => allNodes(sp)
            case _ => Seq.empty // unplanned logical subquery: nothing physical to check yet
          }
      }).flatten
      aqe ++ subq
    }
  }

  test("all registered query plans: no cartesian product, no unlisted nested-loop join, no unbounded global window") {
    val violations = collection.mutable.ArrayBuffer[String]()
    val usedBnlj = collection.mutable.Set[String]()
    val usedGw = collection.mutable.Set[String]()
    var checked = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.executedPlan
        catch {
          case e: Throwable =>
            violations += s"$name: plan construction failed: ${e.getMessage}"
            null
        }
      if (plan != null) {
        checked += 1
        allNodes(plan).foreach {
          case _: CartesianProductExec =>
            violations += s"$name: CartesianProductExec (never allowed)"
          case j: BroadcastNestedLoopJoinExec =>
            val broadcastSide = j.buildSide match {
              case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
              case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
            }
            val scalarBroadcast = broadcastSide.exists {
              case a: BaseAggregateExec => a.groupingExpressions.isEmpty // exactly 1 row
              case _: GlobalLimitExec | _: LocalLimitExec => true
              case _: CollectLimitExec | _: TakeOrderedAndProjectExec => true
              case _ => false
            }
            if (!scalarBroadcast) {
              if (bnljWhitelist.contains(name)) usedBnlj += name
              else violations += s"$name: unlisted BroadcastNestedLoopJoinExec (${j.joinType}) with non-scalar broadcast side"
            }
          case w: WindowExec if w.partitionSpec.isEmpty =>
            if (!hasBoundingNodeBelow(w.child)) {
              if (globalWindowWhitelist.contains(name)) usedGw += name
              else violations += s"$name: empty-partition WindowExec over non-aggregated input"
            }
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
            if (!hasBoundingNodeBelow(w.child)) {
              if (globalWindowWhitelist.contains(name)) usedGw += name
              else violations += s"$name: empty-partition WindowGroupLimitExec over non-aggregated input"
            }
          case _ => ()
        }
      }
    }
    info(s"checked $checked plans; BNLJ whitelist used: ${usedBnlj.size}/${bnljWhitelist.size}; " +
      s"global-window whitelist used: ${usedGw.size}/${globalWindowWhitelist.size}")
    // the whitelist must not rot: every entry must still be needed
    val staleBnlj = bnljWhitelist.keySet -- usedBnlj
    val staleGw = globalWindowWhitelist.keySet -- usedGw
    assert(staleBnlj.isEmpty, s"stale BNLJ whitelist entries (no longer in plan): $staleBnlj")
    assert(staleGw.isEmpty, s"stale global-window whitelist entries: $staleGw")
    assert(violations.isEmpty,
      s"${violations.size} plan-invariant violations:\n  ${violations.mkString("\n  ")}")
  }
}

object PlanInvariantSpec {
  // filled from the audited findings of the first gate run (r9); every
  // entry cites the bound that makes the pattern safe at any corpus
  // scale. The scalar-broadcast rule auto-clears the other ~42 rows
  // (crossJoin of a 1-row empty-grouping aggregate).
  val bnljWhitelist: Map[String, String] = Map(
    "dedup_embed_cosine" -> "broadcast side = <=64-row centroid dictionary (vec_id < 64, DedupExtras.scala)",
    "embed_pq_quantize" -> "broadcast side = 16-row PQ codebook (vec_id < 16, Extras27.scala:158)",
    "join_cross_product" -> "the graded cross-join row itself: 5x25 static dim x dim grid (Extras29.scala:20)",
    "join_range_theta" -> "B10 theta join: 4-row inline band table broadcast (Relational.scala:368)",
    "sim_index_probe" -> "broadcast side = <=NCells centroid dictionary (vec_id < NCells, Extras24.scala:48,99)",
    "sim_knn_join" -> "broadcast probe set is a declared corpus fraction (eval row; BASELINE sf1 exponent +0.81, linear by design)",
    "sim_topk_cosine" -> "broadcast side = 10 probe vectors (vec_id < 10, LlmOps.scala)",
    "sim_topk_ivf" -> "broadcast side = 16-row coarse quantizer (vec_id < 16, DedupExtras.scala)",
    "dedup_band_width_sweep" -> "both sides = the FIXED 500-doc probe sample (doc_id < 500, Extras118.scala) - O(1) in the corpus",
    "dedup_simhash_hamming_profile" -> "both sides = the FIXED 500-doc probe sample (doc_id < 500, Extras117.scala) - O(1) in the corpus",
    "embed_cosine_histogram" -> "both sides = the FIXED 500-vector probe sample (vec_id < 500, Extras123.scala) - O(1) in the corpus",
    "embed_triplet_mining" -> "broadcast side = 100 anchor vectors (vec_id < 100, Extras124.scala)",
    "embed_knn_graph_degree" -> "both sides = the FIXED 500-vector probe sample (vec_id < 500, Extras126.scala) - O(1) in the corpus",
    "embed_energy_distance" -> "both sides = the FIXED 500-vector probe sample (vec_id < 500, Extras133.scala) - O(1) in the corpus",
    "multimodal_ahash_near_dup" -> "both sides = the FIXED 500-doc probe sample (doc_id < 500, Extras139.scala) - O(1) in the corpus",
    "sim_topk_margin" -> "broadcast side = 10 probe vectors (vec_id < 10, Extras118.scala)",
    "sort_cluster_minmax" -> "per-parquet-file min/max frame, rows = file count of the layout exhibit (Extras33.scala:70)",
    "stat_qq_deciles" -> "1x1 join of the two per-half decile-array rows (2-group agg then half filter, Extras76.scala:99-101)",
    "stat_welch_ttest" -> "1x1 join of the en/de per-lang moment rows (lang-grouped agg then filter, Extras55.scala:85-89)",
    "stat_cohens_d" -> "1x1 join of the click/purchase moment rows (type-grouped agg then filter, Extras126.scala)",
    "stat_tost_equivalence" -> "1x1 join of the en/de per-lang moment rows (lang-grouped agg then filter, Extras144.scala)",
    "embed_intrinsic_dim" -> "both sides = the FIXED 500-vector probe sample (vec_id < 500, Extras147.scala) - O(1) in the corpus",
    "stat_tukey_hsd_matrix" -> "5x5 self-join of the 5-row priority-group aggregate (grp < grp pairs, Extras155.scala) - O(1) in the corpus",
    "embed_hopkins_statistic" -> "broadcast side = the 64-row per-dim [min,max] box frame crossed with the 50 fixed probes (Extras154.scala) - O(1) in the corpus",
    "embed_lof_probes" -> "both sides = the FIXED 500-vector probe sample (vec_id < 500, Extras170.scala) - O(1) in the corpus (r11 HOF-distance rewrite)",
  )

  // empty as of r9: every one of the 173 empty-partition windows in the
  // fleet sits above an aggregate/limit (the bounded-frame shapes the
  // rule recognizes) — nothing needed a justified exception
  val globalWindowWhitelist: Map[String, String] = Map.empty
}
