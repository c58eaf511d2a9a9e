package graft

import graft.operators.Ranking
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the shared two-phase global rank (`operators/Ranking`) — the
  * helper now under txt_zipf, txt_vocab_coverage, txt_collocations and
  * txt_novelty_curve's NTILE replacement, so its equivalence to the
  * single-reducer window deserves its own direct certificate (the
  * dsShuffle spec pins the in-line pattern; this pins the extraction). */
class RankingSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = GraftSession.local("4")

  /** Adversarial frame: heavy ties on the primary key (forces the
    * secondary tie-break), skewed value distribution (range partitioner
    * must handle repeated boundaries), deterministic. */
  private def frame(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map { i =>
      (i.toLong, (i % 7).toLong, f"k${i % 13}%03d")
    }.toDF("id", "v", "s")
  }

  test("twoPhaseRank == unpartitioned row_number at every parts setting") {
    val df = frame(2000)
    val expected = df.withColumn("r",
        row_number().over(Window.orderBy(col("v").desc, col("s"), col("id")))
          .cast("long"))
      .select(col("id"), col("r")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 3, 32, 64)) {
      val got = Ranking
        .twoPhaseRank(df, "r", parts, col("v").desc, col("s"), col("id"))
        .select(col("id"), col("r")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts must replay the global rank")
    }
  }

  test("twoPhaseRank is a bijection onto 1..n (no gaps, no dupes)") {
    val ranks = Ranking.twoPhaseRank(frame(777), "r", 13, col("s"), col("id"))
      .select(col("r")).collect().map(_.getLong(0)).sorted.toSeq
    assert(ranks == (1L to 777L))
  }

  test("more partitions than rows degrades to the same answer") {
    val df = frame(5)
    val got = Ranking.twoPhaseRank(df, "r", 32, col("id"))
      .select(col("id"), col("r")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1 to 5).map(i => i.toLong -> i.toLong).toMap)
  }

  test("closed-form NTILE from the two-phase rank == NTILE window") {
    // the txtNoveltyCurve bucketing: first n mod k buckets get ceil(n/k)
    for (n <- Seq(95, 100, 103, 9)) {
      val df = frame(n)
      val expected = df.select(col("id"),
          ntile(10).over(Window.orderBy(col("id"))).cast("long").as("d"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ranked = Ranking.twoPhaseRank(df.select(col("id")), "r", 8, col("id"))
      val per = n.toLong / 10
      val rem = n.toLong % 10
      val decile =
        if (per == 0L) col("r")
        else when(col("r") <= lit(rem * (per + 1)),
            floor((col("r") - 1) / lit(per + 1)) + 1)
          .otherwise(lit(rem) +
            floor((col("r") - 1 - rem * (per + 1)) / lit(per)) + 1)
      val got = ranked.select(col("id"), decile.cast("long").as("d"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"n=$n closed-form NTILE must match the window")
    }
  }

  test("order laws under generated frames: rank order ≡ key order, bijection, parts-invariance") {
    // property-grade (PropertySpec's fixed-seed Gen idiom): for ANY frame
    // shape — size, duplicate density, partition count — the two-phase
    // rank must (a) be a bijection onto 1..n, (b) order-agree with the
    // total order key (rank(a) < rank(b) ⇔ key(a) < key(b) lexicographic),
    // and (c) not depend on the physical parts setting
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(271L + i)))
    val gen = for {
      n <- Gen.choose(1, 900)
      vMod <- Gen.choose(1, 20) // duplicate density of the primary key
      sMod <- Gen.choose(1, 9)
      parts <- Gen.oneOf(1, 2, 7, 32)
    } yield (n, vMod, sMod, parts)
    import spark.implicits._
    for ((n, vMod, sMod, parts) <- samples(gen, 6)) {
      val df = (1 to n).map { i =>
        (i.toLong, (i * 31 % vMod).toLong, f"s${i * 17 % sMod}%02d")
      }.toDF("id", "v", "s")
      val got = Ranking.twoPhaseRank(df, "r", parts,
          col("v").desc, col("s"), col("id"))
        .select(col("id"), col("v"), col("s"), col("r")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      val label = s"n=$n vMod=$vMod sMod=$sMod parts=$parts"
      // (a) bijection
      assert(got.map(_._4).sorted.toSeq == (1L to n.toLong), label)
      // (b) order law: sorting by the total order key yields ranks 1..n
      implicit val ord: Ordering[(Long, String, Long)] =
        Ordering.Tuple3(Ordering[Long].reverse, Ordering[String], Ordering[Long])
      val byKey = got.sortBy(t => (t._2, t._3, t._1))
      assert(byKey.map(_._4).toSeq == (1L to n.toLong),
        s"$label: rank order must equal key order")
    }
  }

  test("bridge stats reset keeps data identical and strips origin stats") {
    import org.apache.spark.sql.graftbridge.Bridge
    val df = frame(500)
    val ck = df.localCheckpoint()
    val reset = Bridge.resetInheritedStats(ck)
    assert(reset.collect().toSeq == ck.collect().toSeq)
    // the checkpointed plan inherits the optimized plan's stats; the reset
    // plan must re-derive (scan-shaped) stats instead of carrying them
    def size(d: DataFrame) = d.queryExecution.optimizedPlan.stats.sizeInBytes
    val joined = ck.as("a").join(ck.as("b"), "id")
    val joinedReset = reset.as("a").join(reset.as("b"), "id")
    // both joins must PLAN (the compounding bug showed up as planning-time
    // BigInteger blowups, not wrong answers) and agree on the data
    assert(joinedReset.count() == joined.count())
    assert(size(reset) > 0)
  }
}
