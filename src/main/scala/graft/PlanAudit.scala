package graft

/** Ad-hoc plan audit: prints the formatted physical plan of named queries
  * so scan pruning / broadcast / codegen spans can be eyeballed per round.
  * Not part of the driver contract. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("dd_embed_cosine", "dd_simhash_pairs", "q21_approx", "q1_agg")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
