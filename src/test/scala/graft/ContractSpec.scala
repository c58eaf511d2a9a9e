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

  test("no query emits ARRAY/MAP/STRUCT output columns (harness shape)") {
    // The driver's oracle comparator loads both sides into pandas and
    // hash-sorts every column; a numpy array cell is unhashable, so an
    // ARRAY (or MAP/STRUCT) output column fails the gate with
    // `TypeError: unhashable type` REGARDLESS of value correctness —
    // how emb_quantize shipped red in r6 and sim_pq_codes/sim_pq_train
    // in r8. Nested outputs must be reshaped long (posexplode) before
    // emission. Schema-only: resolves each query's plan (cheap at
    // sf0.001) without executing it.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, dir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"nested-typed output columns (pandas comparator cannot hash them):\n" +
        offenders.mkString("\n"))
  }

  test("oracle SQL shingle df-caps all interpolate GraftTuning.ShingleDfCap") {
    // GraftTuning's contract is that Scala defaults and DuckDB twins can
    // never drift; that only holds if no oracle string hardcodes the cap.
    // Scans every registered oracle for the df-cap idiom (the `rare`/`dfc`
    // CTEs over sh0) and asserts the literal equals the constant, so a
    // future literal-valued copy of the idiom fails here, not in the
    // driver's hash compare.
    val dfCapIdiom = raw"HAVING COUNT\(\*\) <= (\d+)".r
    val dfColIdiom = raw"WHERE df <= (\d+)".r
    val drifted = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        (dfCapIdiom.findAllMatchIn(sql) ++ dfColIdiom.findAllMatchIn(sql))
          .collect {
            case m if sql.substring(math.max(0, m.start - 400), m.start)
              .contains("sh0") && m.group(1).toInt != GraftTuning.ShingleDfCap =>
              s"$name: '${m.matched}' != ShingleDfCap=${GraftTuning.ShingleDfCap}"
          }
    }
    assert(drifted.isEmpty, s"drifted df-cap literals:\n${drifted.mkString("\n")}")
  }
}
