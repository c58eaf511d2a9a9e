package graft

import graft.engine.{FlinkDdl, ResultStore, TableSpec}
import graft.sources.Datagen
import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5): result-store pagination invariants and
  * datagen range/sequence guarantees under generated parameters.
  * (scalatestplus bridge isn't in the offline cache — samples are drawn
  * directly from scalacheck Gens with a fixed seed.)
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("result store: pages concatenate to exactly the appended rows; refetch idempotent") {
    val cases = samples(Gen.zip(Gen.choose(1, 30), Gen.choose(0, 120)), 40)
    for ((pageSize, n) <- cases) {
      val rs = new ResultStore(Seq("v"), pageSize = pageSize, maxRows = 1000)
      (0 until n).foreach(i => rs.append(Seq(i)))
      rs.markEos()
      var token = 0L
      val out = Seq.newBuilder[Any]
      var done = false
      while (!done) {
        val page = rs.fetch(token)
        assert(rs.fetch(token).rows == page.rows, s"refetch pageSize=$pageSize n=$n")
        out ++= page.rows.map(_.fields.head)
        page.resultType match {
          case "EOS" => done = true
          case "PAYLOAD" =>
            assert(page.rows.size <= pageSize)
            token = page.nextToken.get
          case other => fail(s"unexpected $other after EOS marked")
        }
      }
      assert(out.result() == (0 until n).toList, s"pageSize=$pageSize n=$n")
    }
  }

  test("datagen: min/max ranges, sequence bounds, determinism for generated params") {
    val gen = for {
      min <- Gen.choose(-1000L, 1000L)
      span <- Gen.choose(1L, 2000L)
      nRows <- Gen.choose(1L, 50L)
      strLen <- Gen.choose(5, 40)
    } yield (min, min + span, nRows, strLen)
    for ((min, max, nRows, strLen) <- samples(gen, 8)) {
      val ddl =
        s"""CREATE TABLE t (a INT, b BIGINT, s STRING, d DOUBLE) WITH (
           |'connector'='datagen','number-of-rows'='$nRows',
           |'fields.a.kind'='sequence','fields.a.start'='$min',
           |'fields.b.min'='$min','fields.b.max'='$max',
           |'fields.s.length'='$strLen',
           |'fields.d.min'='0','fields.d.max'='1')""".stripMargin
      val spec = FlinkDdl.parse(ddl)
      val rows = Datagen.bounded(spark, spec).collect()
      assert(rows.length == nRows)
      assert(rows.map(_.getInt(0)).sorted.toSeq ==
        (min.toInt until (min + nRows).toInt), s"sequence min=$min n=$nRows")
      assert(rows.forall(r => r.getLong(1) >= min && r.getLong(1) <= max))
      assert(rows.forall(_.getString(2).length == strLen))
      assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0))
      val again = Datagen.bounded(spark, spec).collect()
      assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "determinism")
    }
  }

  test("scrub: order-preserving survivor stream, blocklist-free (production op)") {
    import graft.operators.TextQueries
    import TextQueries.Blocklist
    // generated docs mixing blocklisted and clean tokens, with repeats —
    // the invariants a set-difference implementation would violate. Runs
    // the PRODUCTION projection (txtScrubOf), and checks its fingerprint
    // against a JVM-side reference scrub, so an order-corrupting or
    // deduping rewrite of the operator fails here even if the SQL oracle
    // were rewritten to match it.
    val word = Gen.oneOf(Blocklist ++ Seq("alpha", "beta", "alpha", "gamma", "x1"))
    val doc = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val docsSeq = samples(doc, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    import spark.implicits._
    val out = TextQueries.txtScrubOf(docsSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((id, text) <- docsSeq) {
      val toks = text.toLowerCase.trim.split("\\s+").toSeq
      val expectKept = toks.filterNot(Blocklist.contains)
      val expectFp = md.digest(expectKept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val (nRemoved, nKept, fp) = out(id)
      assert(nRemoved == toks.size - expectKept.size, s"doc $id: n_removed")
      assert(nKept == expectKept.size, s"doc $id: n_kept")
      assert(fp == expectFp, s"doc $id: survivor stream must preserve order/repeats")
    }
  }
}
