package graft

import graft.operators.{CurationOps, MultimodalOps, SamplingOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hostile-content semantics, pinned (VERDICT r14 #5): the registry-wide
  * degenerate sweep (`ScaleSmoke 1 all degenerate`) runs every operator
  * over ~20 pathological rows — empty text, single tokens, all-whitespace,
  * 4-byte unicode, an 8 MB document, a 1 MB single token — and its first
  * run found two real defects: samp_weighted divided by a zero weight
  * (ANSI runtime error), and the CDC chunk fold copied its accumulator
  * array per token (O(tokens × chunks) — one 8 MB doc pinned a core for
  * 30+ minutes). This spec pins the semantics those fixes chose, at unit
  * scale, so they cannot silently regress between sweeps.
  */
class DegenerateContentSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private def degenDocs = Seq(
    (1L, "", "en", "src_degen", 0L),
    (2L, "   \t  \n  ", "en", "src_degen", 9L),
    (3L, "solo", "en", "src_degen", 4L),
    (4L, "😀 🚀🚀 你好", "zh", "src_degen", 10L),
    (5L, (0 until 50000).map(i => "w" + (i % 997)).mkString(" "), "en", "src_degen", 250000L),
    (6L, "a" * 100000, "en", "src_degen", 100000L),
    (7L, "normal text with several plain tokens here", "en", "src_degen", 43L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("CDC chunking: empty/whitespace docs yield no chunks; huge docs chunk linearly") {
    val chunks = CurationOps.cdcChunksFrom(degenDocs).collect()
    val byDoc = chunks.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(!byDoc.contains(1L) && !byDoc.contains(2L),
      "empty-after-trim docs must yield zero chunks")
    assert(byDoc(3L) == 1 && byDoc(6L) == 1,
      "a single-token doc is exactly one chunk (the flushed tail)")
    // boundary p = 1/16 => ~3,125 chunks for 50k tokens; the linear
    // sentinel construction must produce them (the quadratic fold would
    // still be running); wide bounds: binomial is tight around the mean
    val huge = byDoc(5L)
    assert(huge > 2000 && huge < 4500, s"50k-token doc chunked into $huge")
    // chunk token counts must cover the corpus exactly: no token lost or
    // duplicated by the join/split construction
    val nTokSum = chunks.filter(_.getLong(0) == 5L).map(_.getLong(2)).sum
    assert(nTokSum == 50000L, s"chunk n_tok sums to $nTokSum, not 50000")
  }

  test("CDC chunking: U+0001 in input is a token separator, never a forged cut") {
    // the sentinel byte is reserved by the construction: a document
    // carrying it must chunk as if it were whitespace
    val tricky = Seq((1L, "alphabeta gamma"), (2L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val c = CurationOps.cdcChunksFrom(tricky).collect()
      .map(r => (r.getLong(0), r.getString(3))).groupBy(_._1)
    assert(c(1L).map(_._2).toSet == c(2L).map(_._2).toSet,
      "U+0001 must normalize to a separator (identical chunks)")
  }

  test("samp_weighted: zero-weight docs are unsampleable, never an error") {
    degenDocs.createOrReplaceTempView("unused") // doc frame goes via dir loader normally
    val dir = java.nio.file.Files.createTempDirectory("degen").toString
    degenDocs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SamplingOps.sampWeighted(spark, dir).collect()
    val picked = out.map(_.getLong(1)).toSet
    assert(!picked.contains(1L), "n_chars=0 doc must be excluded (P proportional to w = 0)")
    assert(picked.contains(3L) || picked.contains(7L), "positive-weight docs sample")
  }

  test("mm_phash/mm_phash64: empty-text docs are absent; multibyte text hashes") {
    val dir = java.nio.file.Files.createTempDirectory("degen2").toString
    degenDocs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq(
      MultimodalOps.mmPhash(spark, dir),
      MultimodalOps.mmPhash64(spark, dir)
    ).foreach { df =>
      val ids = df.collect().map(_.getLong(0)).toSet
      assert(!ids.contains(1L),
        "a zero-length payload has no stripe profile")
      // whitespace IS payload at the media layer: the stripe stat is a
      // byte-level statistic of an opaque payload (the stub hashes text
      // bytes), so an all-whitespace doc hashes like any other bytes
      assert(ids.contains(2L), "whitespace bytes are still payload bytes")
      assert(ids.contains(4L), "4-byte unicode must hash, not crash")
      assert(ids.contains(5L) && ids.contains(6L), "huge docs must hash")
    }
  }
}
