package graft

/** Ad-hoc physical-plan audit: per query, count exchanges and flag the
  * operators that matter for the 100 TB story. Run with
  * `sbt 'Test/runMain graft.PlanAudit [queryName ...]'`; with a name
  * argument it prints the full executed plan.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = TestSpark.sf
    if (args.nonEmpty) {
      args.foreach { name =>
        println(s"===== $name =====")
        println(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString)
      }
    } else {
      println(f"${"query"}%-26s ex cart wgl bhj smj bnlj")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (!name.startsWith("stream_")) {
          val p = fn(spark, sf).queryExecution.executedPlan.toString
          val nEx = "Exchange".r.findAllIn(p).size
          def b(f: Boolean) = if (f) "Y" else "."
          println(f"$name%-26s $nEx%2d  ${b(p.contains("CartesianProduct"))}   " +
            f"${b(p.contains("WindowGroupLimit"))}   ${b(p.contains("BroadcastHashJoin"))}   " +
            f"${b(p.contains("SortMergeJoin"))}   ${b(p.contains("BroadcastNestedLoop"))}")
        }
      }
    }
    spark.stop()
  }
}
