package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** One-off: sub-phase timing inside the IVF probe side. */
object IvfProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = args.headOption.getOrElse("/tmp/graft_scale_x30")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfprobe2] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("ve"))
      .withColumn("nrm", graft.functions.VectorFunctions.norm(col("ve")))
    val corpus = SimilarityOps.clusteredFrom(e)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("derive+persist")(corpus.count())
    // cell assignment alone (the 32-dot sort_array per corpus row)
    val assigned = time("cell assign count")(
      SimilarityOps.annIvfCellAssign(corpus).count())
    println(s"[ivfprobe2] assigned=$assigned")
    time("cell assign again")(
      SimilarityOps.annIvfCellAssign(corpus).count())
    time("full annIvfFrom count")(
      SimilarityOps.annIvfFrom(corpus, 5, 10, 32, 8).count())
    time("full annIvfFrom again")(
      SimilarityOps.annIvfFrom(corpus, 5, 10, 32, 8).count())
    SimilarityOps.annIvfFrom(corpus, 5, 10, 32, 8).explain("formatted")
    // bisect: join+score only, no window/sort
    val assignedC = SimilarityOps.annIvfCellAssign(corpus)
    val queries = assignedC.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("ve").as("qv"),
        col("nrm").as("qnrm"), col("cell").as("probe_cell"))
    val n = time("join+score only")(
      assignedC.join(broadcast(queries),
          col("cell") === col("probe_cell") &&
            col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (graft.functions.VectorFunctions.dot(col("qv"), col("ve")) /
            (col("qnrm") * col("nrm"))).as("cos_raw"))
        .count())
    println(s"[ivfprobe2] scored rows = $n")
    // force cell materialization without the join: max(cell)
    time("cell assign max() forced")(
      assignedC.agg(max(col("cell"))).head())
    // join WITHOUT the cos_raw dot
    time("join, no dot")(
      assignedC.join(broadcast(queries),
          col("cell") === col("probe_cell") &&
            col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id")).count())
    spark.stop()
  }
}
