package graft

import org.apache.spark.sql.functions._

/** Stage-isolation probe for dd_semdedup_ann on a derived perturb corpus
  * (run ScaleSmoke first to materialize /tmp/graft_scale_pN) — times the
  * candidate layer, the distinct, and BOTH exact-verify strategies
  * separately so a superlinear rung can be attributed to a stage instead
  * of guessed at. Every stage is the operator's own `private[graft]`
  * helper (finiteNormGuard / annBitsFor / annRawCandidates /
  * verifyCandidatesJoin / verifyCandidatesBlocked), so the probe cannot
  * drift from the configuration dd_semdedup_ann actually runs.
  * Builder-side tool, not part of any gate. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_p30")
    val spark = GraftSession.local()
    import graft.functions.{VectorFunctions => VF}
    import graft.operators.DedupOps

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val emb = Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    println(s"[probe] corpus $dir n=$n")

    val repOf = emb.filter(DedupOps.finiteNormGuard(col("embedding")))
      .groupBy(col("embedding")).agg(min(col("vec_id")).as("rep"))
    val nDistinct = timed("contraction count")(repOf.count())
    val bits = DedupOps.annBitsFor(nDistinct)
    val tables = 8
    println(s"[probe] nDistinct=$nDistinct bits=$bits " +
      s"probes=${DedupOps.probeOrbit(bits)}")

    val base = repOf
      .select(col("rep").as("vec_id"), VF.asDouble(col("embedding")).as("ve"))
      .select(col("vec_id"), col("ve"), sqrt(VF.dot(col("ve"), col("ve"))).as("nrm"))
      .localCheckpoint()

    val candsRaw = DedupOps.annRawCandidates(base, bits, tables)
    val nRaw = timed("candidates (pre-distinct)")(candsRaw.count())
    val cands = candsRaw.distinct().localCheckpoint()
    val nCand = timed("distinct candidates")(cands.count())
    println(s"[probe] raw=$nRaw distinct=$nCand")

    val nJoin = timed("exact verify (two joins)")(
      DedupOps.verifyCandidatesJoin(base, cands, 0.4).count())
    val nBlocked = timed("exact verify (blocked)")(
      DedupOps.verifyCandidatesBlocked(base, cands, 0.4).count())
    println(s"[probe] verified pairs join=$nJoin blocked=$nBlocked" +
      (if (nJoin != nBlocked) "  ** STRATEGY DISAGREEMENT **" else ""))
    spark.stop()
  }
}
