package graft

import graft.operators.MultimodalOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local("4")

  private def binaries = MultimodalOps.withBinary(Tables.load(spark, dir, "documents"))

  test("binary schema: content is BinaryType with typed metadata struct") {
    val schema = binaries.schema
    assert(schema("content").dataType == org.apache.spark.sql.types.BinaryType)
    assert(schema("meta").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
  }

  test("feature extraction is deterministic, fixed-width, composes with SimilarityOps shapes") {
    val f1 = MultimodalOps.extractFeatures(binaries).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = MultimodalOps.extractFeatures(binaries).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.length == 16))
    assert(f1.values.exists(_.exists(_ != 0f)))
  }

  test("resize fits the 224 box, preserves aspect ratio, never upscales") {
    val rows = MultimodalOps.resize(MultimodalOps.decode(binaries)).collect()
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(ow <= 224 && oh <= 224)
      assert(ow <= w && oh <= h, "resize must never upscale")
      // aspect preserved within the floor's rounding
      assert(math.abs(ow.toDouble / w - oh.toDouble / h) < 0.02)
    }
  }

  test("frame sampling round-trips: concatenated frames rebuild the payload") {
    val doc = binaries.filter(col("doc_id") === 0).collect()(0)
    val original = doc.getAs[Array[Byte]]("content")
    val frames = MultimodalOps.sampleFrames(binaries)
      .filter(col("doc_id") === 0).orderBy(col("frame_idx")).collect()
      .map(_.getAs[Array[Byte]]("frame"))
    assert(frames.flatten.sameElements(original))
    assert(frames.init.forall(_.length == 64), "all but the last frame are full")
  }

  test("mm_phash codes match a plain-Scala replay; block join is Hamming-complete") {
    val corpus = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def phash(text: String): Long = {
      val ss = new Array[Long](16)
      text.zipWithIndex.foreach { case (c, i) => ss(i % 16) += c.toInt }
      val tot = ss.sum
      (0 until 16).map(j => if (ss(j) * 16 > tot) 1L << j else 0L).sum
    }
    val want = corpus.map { case (id, t) => id -> phash(t) }.toMap
    val got = MultimodalOps.mmPhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(r => r._1 -> r._2).toMap == want, "phash codes diverge")
    // completeness: n_near must equal the BRUTE-FORCE Hamming<=1 partner
    // count — the pigeonhole argument for the 2-block union, verified
    val ids = want.keys.toSeq.sorted
    val brute = ids.map { a =>
      a -> ids.count(b =>
        b != a && java.lang.Long.bitCount(want(a) ^ want(b)) <= 1).toLong
    }.toMap
    got.foreach { case (id, _, n) =>
      assert(n == brute(id), s"doc $id n_near $n != brute ${brute(id)}")
    }
    assert(got.exists(_._3 > 0), "testdata's dup pairs should collide")
  }
}
