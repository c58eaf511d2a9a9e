package graft

/** Physical-plan audit tool: prints `explain("formatted")` for the named
  * driver queries (all of them when none are named) so scan pruning,
  * pushed filters, broadcast vs shuffle joins, and WholeStageCodegen spans
  * can be reviewed against BASELINE.md's plan-quality claims.
  *
  * Usage: runMain graft.PlanAudit <sfDir> [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local()
    names.foreach { n =>
      spark.catalog.clearCache()
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
