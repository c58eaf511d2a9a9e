package graft

import graft.operators.SimilarityOps

/** Per-SF PQ recall report (floor>1 turns the violation filter into a full
  * report) — the measurement tool behind the sim_pq_recall design notes:
  * whole-vector codebooks measured chance-level at sf0.1 (ADC ties across
  * clusters), residual encoding fixed sf≤0.01 but not sf0.1 (0.2-0.7),
  * and the two-level corpus + m=16 reached 1.0 at every SF. Run with
  * `Test/runMain graft.PqProbe` after touching the IVF-PQ path. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val t0 = System.nanoTime()
      val rep = SimilarityOps.pqRecallCheck(spark, dir, floor = 1.01)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[pq] $sf recalls=${rep.toSeq.sortBy(_._1)} (${dt}%.1f s)")
    }
    spark.stop()
  }
}
