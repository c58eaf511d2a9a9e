package graft

import org.apache.spark.sql.functions._

/** Stage-isolation probe for dd_semdedup_ann on a derived perturb corpus
  * (run ScaleSmoke first to materialize /tmp/graft_scale_pN) — times the
  * candidate layer, the distinct, and the exact verify separately so a
  * superlinear rung can be attributed to a stage instead of guessed at.
  * Builder-side tool, not part of any gate. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_p30")
    val spark = GraftSession.local()
    import graft.functions.{VectorFunctions => VF}

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val emb = Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    println(s"[probe] corpus $dir n=$n")

    // same degenerate-vector guard as the operator (NaN sorts above every
    // double, so `> 0` alone would pass it); keep in sync with
    // ddSemDedupAnn or the probe sizes bits differently than the operator
    val repOf = emb.filter {
      val nrm = VF.norm(VF.asDouble(col("embedding")))
      nrm > 0.0 && nrm < lit(Double.PositiveInfinity)
    }.groupBy(col("embedding")).agg(min(col("vec_id")).as("rep"))
    val nDistinct = timed("contraction count")(repOf.count())
    def probeOrbit(b: Int): Long = 1L + b + b.toLong * (b - 1) / 2
    var bits = 6
    while (bits < 24 && probeOrbit(bits) * nDistinct.toDouble / (1L << bits) > 512.0)
      bits += 1
    val tables = 8
    println(s"[probe] nDistinct=$nDistinct bits=$bits probes=${probeOrbit(bits)}")

    val base = repOf
      .select(col("rep").as("vec_id"), VF.asDouble(col("embedding")).as("ve"))
      .select(col("vec_id"), col("ve"), sqrt(VF.dot(col("ve"), col("ve"))).as("nrm"))
      .localCheckpoint()

    val tableCodes = (0 until tables).map(t =>
      struct(lit(t).as("tab"), VF.srpCode(col("ve"), bits, t).as("code")))
    val coded = base
      .select(col("vec_id"), explode(array(tableCodes: _*)).as("tc"))
      .select(col("vec_id"), col("tc.tab").as("tab"), col("tc.code").as("code"))
      .localCheckpoint()
    val probeMasks: Seq[Long] = 0L +:
      (0 until bits).map(b => 1L << b) ++:
      (for { i <- 0 until bits; j <- i + 1 until bits } yield (1L << i) | (1L << j))
    val probed = coded.select(col("vec_id").as("id_a"), col("tab").as("ptab"),
      explode(array(probeMasks.map(m =>
        col("code").bitwiseXOR(lit(m))): _*)).as("pcode"))
    val candsRaw = probed.join(coded,
        col("ptab") === col("tab") && col("pcode") === col("code") &&
          col("id_a") < col("vec_id"))
      .select(col("id_a"), col("vec_id").as("id_b"))
    val nRaw = timed("candidates (pre-distinct)")(candsRaw.count())
    val cands = candsRaw.distinct().localCheckpoint()
    val nCand = timed("distinct candidates")(cands.count())
    println(s"[probe] raw=$nRaw distinct=$nCand")

    val verified = cands
      .join(base.select(col("vec_id").as("id_a"), col("ve").as("va"),
        col("nrm").as("na")), Seq("id_a"))
      .join(base.select(col("vec_id").as("id_b"), col("ve").as("vb"),
        col("nrm").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VF.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= 0.4)
    val nVer = timed("exact verify (two joins)")(verified.count())
    println(s"[probe] verified pairs=$nVer")
    spark.stop()
  }
}
