package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** One-off: phase-level timing of the IVF recall certification on a
  * ScaleSmoke-derived corpus — which side of the cert carries the 100×
  * cost (truth brute-force, approx probe, or the derived-corpus
  * transform itself). */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = args.headOption.getOrElse("/tmp/graft_scale_x30")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfprobe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("ve"))
      .withColumn("nrm", graft.functions.VectorFunctions.norm(col("ve")))
    val corpus = SimilarityOps.clusteredFrom(e)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("derive+persist")(corpus.count())
    val truth = time("truth brute topk")(
      SimilarityOps.bruteTopKFrom(corpus, 5, 10)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint())
    val approx = time("approx ivf probe")(
      SimilarityOps.annIvfFrom(corpus, 5, 10, cells = 32, nprobe = 8)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint())
    time("second truth pass")(
      SimilarityOps.bruteTopKFrom(corpus, 5, 10).count())
    println(s"[ivfprobe] truth=${truth.count()} approx=${approx.count()}")
    spark.stop()
  }
}
