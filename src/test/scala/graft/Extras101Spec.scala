package graft

import org.apache.spark.sql.functions._

/** Properties of the round-8 additions that the DuckDB oracle cannot
  * express: LPA's partition invariant and bit-stability, and the
  * Matryoshka evaluation's self-consistency + broadcast plan shape.
  */
class Extras101Spec extends SparkSpec {

  test("graph_label_propagation labels form a partition of the user set") {
    val users = Tables.events(spark, sf).select(col("user_id")).distinct()
    val nUsers = users.count()
    val out = queries.Extras101.graphLabelPropagation(spark, sf)
    val sumMembers = out.agg(sum(col("n_members"))).head().getLong(0)
    assert(sumMembers == nUsers,
      s"community sizes sum to $sumMembers, expected $nUsers")
    // every community label is a real user id (labels only ever move
    // along edges of the user graph, so no synthetic ids can appear)
    val alien = out.join(users.withColumnRenamed("user_id", "community"),
      Seq("community"), "left_anti").count()
    assert(alien == 0, s"$alien community labels are not user ids")
    // propagation actually merged something: fewer communities than users
    assert(out.count() < nUsers, "no labels propagated at all")
  }

  test("graph_label_propagation is bit-stable across runs") {
    val a = queries.Extras101.graphLabelPropagation(spark, sf)
      .collect().map(_.toString).toSeq
    val b = queries.Extras101.graphLabelPropagation(spark, sf)
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("embed_matryoshka_eval: full-dimension row agrees with itself 100%") {
    val out = queries.Extras101.embedMatryoshkaEval(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == queries.Extras101.MatDims.map(_.toLong).toSet)
    val (n64, agree64) = out(64L)
    assert(n64 == queries.Extras101.MatProbeBudget.toLong,
      s"probe budget not honored: $n64")
    assert(agree64 == n64, s"k=64 must agree with itself: $agree64 of $n64")
    // every k evaluates the same probe set
    assert(out.values.map(_._1).toSet == Set(n64))
  }

  test("embed_matryoshka_eval broadcasts the probe side; corpus never shuffles") {
    val plan = queries.Extras101.embedMatryoshkaTop(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "probe side must join as a broadcast nested loop")
    assert(!plan.contains("CartesianProduct"),
      "corpus must not enter a cartesian product")
    assert(!plan.contains("SortMergeJoin"),
      "corpus must not shuffle into a sort-merge join")
  }
}
