package graft

import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the probe-only bloom decontamination screen ([[DedupOps
  * .ddBloomFlag]]). The production operator is probabilistic by design, so
  * there is no exact SQL oracle; what IS provable:
  *
  *  1. No false negatives: every doc the exact semi-join flags, the bloom
  *     screen flags too, with at least the same hit count — a
  *     benchmark-tainted doc can never slip through the screen.
  *  2. Bounded over-flagging: at ~16 bits/item the per-probe FPR is
  *     ≈0.05%, so spurious docs (flagged by bloom, clean by exact join)
  *     must be a vanishing fraction of the train corpus.
  */
class BloomDecontaminationSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local("4")

  private def flags(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bloom flag set is a superset of the exact-join flag set") {
    val exact = flags(DedupOps.bloomFlagExact(spark, dir))
    val bloom = flags(DedupOps.ddBloomFlag(spark, dir))
    assert(exact.nonEmpty, "testdata should contain cross-source shingle overlap")
    val missed = exact.filter { case (doc, nExact) =>
      bloom.get(doc).forall(_ < nExact)
    }
    assert(missed.isEmpty,
      s"bloom screen under-flagged (false negatives are impossible): $missed")
  }

  test("over-flagging stays within the FPR budget") {
    val exact = flags(DedupOps.bloomFlagExact(spark, dir)).keySet
    val bloom = flags(DedupOps.ddBloomFlag(spark, dir)).keySet
    val spurious = bloom -- exact
    // The budget is RELATIVE to the train corpus, derived from the sketch's
    // sizing rather than hard-coded for sf0.001: at 16 bits/item
    // (numBits 2^24 / expectedItems 2^20) the optimal-k per-probe FPR is
    // ~5e-4; a doc is spuriously flagged only when >= minHits=3 of its
    // probes all false-positive, so the per-doc rate is bounded by
    // C(S,3)·p^3 ~ 4e-4 at S~300 shingles/doc. 1% of the train count
    // (+2 absolute slack for tiny corpora) sits >20x above that — loose
    // enough to survive a testdata regen, tight enough that a mis-sized
    // sketch or broken probe (rates of 10-100%) still fails.
    val trainN = graft.Tables.load(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("source") =!= "src0")
      .count()
    val budget = 2L + (trainN * 0.01).toLong
    assert(spurious.size <= budget,
      s"${spurious.size} spuriously flagged of $trainN train docs " +
        s"(budget $budget) — sketch mis-sized or probe broken")
  }
}
