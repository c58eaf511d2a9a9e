package graft

import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Independent ground truth for the exact-substring span detector: the
  * duplicated-window set is recomputed in plain Scala over the collected
  * sf0.001 corpus (500 docs — in-test scale), then compared against the
  * operator's merged spans both ways (soundness: every span token is
  * covered by a duplicated window; completeness: every duplicated window
  * is inside a span).
  */
class SubstringSpanSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private val k = 8
  lazy val spark: SparkSession = GraftSession.local("4")

  /** doc_id -> token array, tokenized the way TextFunctions.tokens does. */
  private lazy val corpus: Map[Long, Array[String]] =
    Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+"))
      .toMap

  /** Sites (doc_id, 1-based pos) whose k-window occurs ≥2 times corpus-wide. */
  private lazy val dupSites: Set[(Long, Long)] = {
    val sites = corpus.toSeq.flatMap { case (id, t) =>
      (0 to t.length - k).map(p => (id, p + 1L, t.slice(p, p + k).mkString(" ")))
    }
    val counts = sites.groupBy(_._3).view.mapValues(_.size).toMap
    sites.collect { case (id, p, g) if counts(g) >= 2 => (id, p) }.toSet
  }

  private lazy val spans: Seq[(Long, Long, Long, Long)] =
    DedupOps.ddSubstringSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("spans exist, are well-formed, in-bounds, and non-overlapping") {
    assert(spans.nonEmpty, "testdata's planted near-dups must produce spans")
    spans.foreach { case (id, s0, e0, n) =>
      assert(n == e0 - s0 + 1 && n >= k, s"span ($id,$s0,$e0,$n) malformed")
      assert(s0 >= 1 && e0 <= corpus(id).length, s"span ($id,$s0,$e0) out of bounds")
    }
    spans.groupBy(_._1).values.foreach { ss =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1, "spans within a doc must not overlap")
        case _ =>
      }
    }
  }

  test("soundness + completeness vs plain-Scala duplicated-window ground truth") {
    // completeness: every duplicated window [p, p+k-1] lies inside a span
    val spanByDoc = spans.groupBy(_._1)
    dupSites.foreach { case (id, p) =>
      val covered = spanByDoc.getOrElse(id, Nil)
        .exists { case (_, s0, e0, _) => s0 <= p && p + k - 1 <= e0 }
      assert(covered, s"duplicated window ($id,$p) not covered by any span")
    }
    // soundness: every span token is covered by some duplicated window,
    // and span boundaries are exactly the extremes of a merged run
    spans.foreach { case (id, s0, e0, _) =>
      val ps = dupSites.collect { case (i, p) if i == id && p >= s0 && p + k - 1 <= e0 => p }
      assert(ps.nonEmpty && ps.min == s0 && ps.max == e0 - k + 1,
        s"span ($id,$s0,$e0) boundaries don't match its duplicated windows")
      (s0 to e0).foreach { tok =>
        assert(ps.exists(p => p <= tok && tok <= p + k - 1),
          s"token $tok of span ($id,$s0,$e0) not covered by a duplicated window")
      }
    }
  }

  test("contamination spans cover exactly the train windows present in eval") {
    val srcOf = Tables.load(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val evalGrams = corpus.collect { case (id, t) if srcOf(id) == "src0" =>
      (0 to t.length - k).map(p => t.slice(p, p + k).mkString(" "))
    }.flatten.toSet
    val contamSites: Set[(Long, Long)] = corpus.toSeq.flatMap { case (id, t) =>
      if (srcOf(id) == "src0") Nil
      else (0 to t.length - k).collect {
        case p if evalGrams(t.slice(p, p + k).mkString(" ")) => (id, p + 1L)
      }
    }.toSet
    val spans = DedupOps.ddSubstringContamination(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(spans.nonEmpty, "testdata plants eval near-dups in train sources")
    assert(spans.forall { case (id, _, _, _) => srcOf(id) != "src0" })
    // completeness: every eval-matching train window sits inside a span
    val byDoc = spans.groupBy(_._1)
    contamSites.foreach { case (id, p) =>
      assert(byDoc.getOrElse(id, Nil)
        .exists { case (_, s0, e0, _) => s0 <= p && p + k - 1 <= e0 },
        s"contaminated window ($id,$p) not covered")
    }
    // soundness: span boundaries are extremes of eval-matching windows
    spans.foreach { case (id, s0, e0, _) =>
      val ps = contamSites.collect { case (i, p) if i == id && p >= s0 && p + k - 1 <= e0 => p }
      assert(ps.nonEmpty && ps.min == s0 && ps.max == e0 - k + 1,
        s"span ($id,$s0,$e0) does not match its contaminated windows")
    }
  }

  test("cut query removes exactly the span tokens and keeps the rest in order") {
    val cut = DedupOps.ddSubstringCut(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val spanByDoc = spans.groupBy(_._1)
    corpus.foreach { case (id, t) =>
      val (nTok, nRemoved, clean) = cut(id)
      assert(nTok == t.length, s"doc $id n_tokens")
      val ss = spanByDoc.getOrElse(id, Nil)
      assert(nRemoved == ss.map(_._4).sum, s"doc $id n_removed != span_tokens sum")
      val expected = t.zipWithIndex.collect {
        case (tok, i0) if !ss.exists { case (_, s0, e0, _) => s0 <= i0 + 1 && i0 + 1 <= e0 } => tok
      }.mkString(" ")
      assert(clean == expected, s"doc $id clean_text mismatch")
    }
  }

  test("rate query reconciles with the span table and raw token counts") {
    val rate = DedupOps.ddSubstringRate(spark, dir).collect()
    val srcOf = Tables.load(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val dupByDoc = spans.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    rate.foreach { r =>
      val src = r.getString(0)
      val docs = srcOf.collect { case (id, s) if s == src => id }.toSeq
      assert(r.getLong(1) == docs.size, s"$src n_docs")
      assert(r.getLong(2) == docs.count(dupByDoc.contains), s"$src n_dup_docs")
      assert(r.getLong(3) == docs.flatMap(dupByDoc.get).sum, s"$src dup_tokens")
      assert(r.getLong(4) == docs.map(corpus(_).length.toLong).sum, s"$src total_tokens")
      assert(math.abs(r.getDouble(5) -
        r.getLong(3).toDouble / r.getLong(4)) < 1e-6, s"$src dup_frac")
    }
  }
}
