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

  test("mm_phash64: codes match a plain-Scala replay; 28-combo banding is Hamming<=6-complete") {
    // the production-width path: 64-bit codes, near = Hamming <= 6 via
    // HmSearch block-pair banding at CODE grain. Brute-force replay of
    // both the signature and the full O(n^2) partner count.
    val corpus = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def phash64(text: String): Long = {
      val ss = new Array[Long](64)
      text.zipWithIndex.foreach { case (c, i) => ss(i % 64) += c.toInt }
      val tot = ss.sum
      (0 until 64).map(j => if (ss(j) * 64 > tot) 1L << j else 0L).sum
    }
    val want = corpus.map { case (id, t) => id -> phash64(t) }.toMap
    val got = MultimodalOps.mmPhash64(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(r => r._1 -> r._2).toMap == want, "64-bit phash codes diverge")
    val ids = want.keys.toSeq.sorted
    val brute = ids.map { a =>
      a -> ids.count(b =>
        b != a && java.lang.Long.bitCount(want(a) ^ want(b)) <= 6).toLong
    }.toMap
    got.foreach { case (id, _, n) =>
      assert(n == brute(id), s"doc $id n_near $n != brute ${brute(id)}")
    }
    assert(got.exists(_._3 > 0), "testdata's dup pairs should collide at Ham<=6")
    // the sign-bit slot participates: at 64 slots some doc should set bit 63
    // (stripe 63 above mean happens for ~half the long docs) — if the corpus
    // never exercises it this assertion documents that gap instead of hiding it
    info(s"docs with sign bit set: ${want.values.count(_ < 0)}/${want.size}")
  }

  test("mm_phash64: forced-shuffle code join (cap 0) == broadcast default") {
    // the driverCodeCap dial switches only the PLAN (broadcast vs shuffle
    // of the code->n_near table), never the relation
    val a = MultimodalOps.mmPhash64(spark, dir).collect().toSeq
    val b = MultimodalOps.mmPhash64(spark, dir, driverCodeCap = 0L).collect().toSeq
    assert(a == b, "cap-forced shuffle path diverged from broadcast path")
  }

  test("mm_dedup_groups: components consistent with mm_phash partner counts") {
    val groups = MultimodalOps.mmDedupGroups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val near = MultimodalOps.mmPhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(groups.length == near.size, "every item must emit")
    val bySize = groups.groupBy(_._3).map { case (g, xs) => g -> xs.length }
    groups.foreach { case (id, _, rep, canon) =>
      assert(canon == (id == rep), s"doc $id canonical flag")
      assert(rep <= id, s"doc $id rep $rep must be the component min")
      // partner count zero <-> singleton component (edges are Ham<=1 pairs)
      assert((near(id) > 0) == (bySize(rep) > 1),
        s"doc $id n_near=${near(id)} but component size ${bySize(rep)}")
    }
    // transitivity: two docs sharing a rep via a chain stay together under
    // a plain-Scala union-find over the brute Ham<=1 pair graph
    val codes = groups.map(g => g._1 -> g._2).toMap
    val parent = scala.collection.mutable.Map(codes.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- codes.keys; b <- codes.keys if a < b
         if java.lang.Long.bitCount(codes(a) ^ codes(b)) <= 1)
      parent(find(a)) = find(b)
    val wantComps = codes.keys.groupBy(find).values
      .map(_.toSet).toSet
    val gotComps = groups.groupBy(_._3).values.map(_.map(_._1).toSet).toSet
    assert(gotComps == wantComps, "components must equal brute union-find")
  }

  test("mm_dedup_groups distributed-CC fallback == driver union-find path") {
    // the width switch: driverCodeCap=0 forces every code past the driver
    // bound, so CC runs through the distributed pointer-jumping loop and
    // the code/rep joins drop their broadcast hints — same Ham<=1 code
    // graph, so the report must be row-identical to the default
    val want = MultimodalOps.mmDedupGroups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val got = MultimodalOps.mmDedupGroupsWidth(spark, dir, driverCodeCap = 0L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} spurious=${(got -- want).take(3)}")
  }

  test("mm_dedup_groups width=64 emits well-formed groups (wide-hash path)") {
    // the 64-slot variant exists for real perceptual hashes; on this
    // corpus it must still satisfy the structural group laws even though
    // the oracle only certifies width=16
    val rows = MultimodalOps.mmDedupGroupsWidth(spark, dir, width = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val n = Tables.load(spark, dir, "documents").count()
    assert(rows.length == n, "every item must emit")
    val codes = rows.map(g => g._1 -> g._2).toMap
    rows.foreach { case (id, _, rep, canon) =>
      assert(canon == (id == rep), s"doc $id canonical flag")
      assert(rep <= id, s"doc $id rep must be component min")
    }
    // brute union-find over the 64-bit Ham<=1 graph agrees
    val parent = scala.collection.mutable.Map(codes.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- codes.keys; b <- codes.keys if a < b
         if java.lang.Long.bitCount(codes(a) ^ codes(b)) <= 1)
      parent(find(a)) = find(b)
    val wantComps = codes.keys.groupBy(find).values.map(_.toSet).toSet
    val gotComps = rows.groupBy(_._3).values.map(_.map(_._1).toSet).toSet
    assert(gotComps == wantComps, "width-64 components must equal brute union-find")
  }

  test("mm_audio_windows == plain-Scala grid replay; tiling laws hold") {
    val texts = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val (win, stride) = (256, 192)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = texts.flatMap { case (id, t) =>
      val len = t.getBytes("UTF-8").length
      val nFull = if (len >= win) (len - win) / stride + 1 else 0
      val hasTail = if (len == 0) 0
        else if (nFull == 0 || len - ((nFull - 1) * stride + win) > 0) 1 else 0
      (0 until nFull + hasTail).map { k =>
        val off = k * stride
        val wl = math.min(win, len - off)
        (id, k.toLong, off.toLong + 1, wl.toLong, md5hex(t.substring(off, off + wl)))
      }.filter(_._4 > 0)
    }.toSet
    val got = MultimodalOps.mmAudioWindows(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} spurious=${(got -- want).take(3)}")
    // tiling: consecutive full windows overlap by win - stride bytes and
    // the final window reaches exactly the end of the stream
    got.groupBy(_._1).foreach { case (id, g) =>
      val len = texts.toMap.apply(id).getBytes("UTF-8").length.toLong
      val last = g.maxBy(_._2)
      assert(last._3 + last._4 - 1 == len, s"doc $id last window must end at len")
      val sorted = g.toSeq.sortBy(_._2)
      sorted.sliding(2).withFilter(_.length == 2).foreach { p =>
        assert(p(1)._3 - p(0)._3 == stride, s"doc $id stride") }
    }
  }
}
