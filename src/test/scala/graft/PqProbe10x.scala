package graft

import graft.operators.SimilarityOps

/** One-off: full recall report on the ScaleSmoke-derived 10x corpus. */
object PqProbe10x {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    val dir = args.headOption.getOrElse("/tmp/graft_scale_x10")
    val rep = SimilarityOps.pqRecallCheck(spark, dir, floor = 1.01)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    println(s"[pq10x] recalls=${rep.toSeq.sortBy(_._1)}")
    spark.stop()
  }
}
