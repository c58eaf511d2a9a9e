package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself, pinned: every query has an oracle (a
  * missing entry silently downgrades that operator to a weaker rows-only
  * check at the gate), no oracle is orphaned, and the flagship entry
  * returns rows (the driver's smoke check). Catches the easy-to-miss
  * wiring mistake when a new operator lands in one map but not the other.
  */
class ContractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  test("every driver query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${(o -- q).toSeq.sorted}")
    assert(q.nonEmpty)
  }

  test("oracle SQL is non-blank") {
    // (a single-statement check needs real SQL parsing — a ';' can sit
    // legitimately inside a string/regex literal, e.g. txt_quality's
    // punctuation class — so only blankness is asserted here; the gate
    // itself rejects multi-statement SQL at run time)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: blank oracle")
    }
  }

  test("flagship entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
