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
    // 16M-bit sketch vs a few thousand shingles: a single spurious doc at
    // minHits=3 already implies 3 independent ~1e-4 events lining up in one
    // doc — allow a couple as slack, fail on anything systematic
    assert(spurious.size <= 2,
      s"${spurious.size} spuriously flagged docs — sketch mis-sized or probe broken")
  }
}
