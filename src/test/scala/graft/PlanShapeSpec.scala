package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards — the optimizer-level properties the
  * value oracle cannot see: filters and column pruning reaching the
  * parquet scan, broadcast joins where a dim side is small, and no
  * accidental cartesian/nested-loop blow-ups. A green oracle with a
  * silently regressed plan is exactly the failure mode that only shows
  * at 1000× the gate data, so plans get their own certificates.
  */
class PlanShapeSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local("4")

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q2_filter pushes its predicates and pruned schema into the parquet scan") {
    val plan = planOf("q2_filter")
    assert(plan.contains("PushedFilters: ["),
      s"expected parquet PushedFilters in:\n$plan")
    assert(!plan.matches("(?s).*PushedFilters: \\[\\].*"),
      "pushed-filter list must not be empty for a filtered scan")
  }

  test("q1_agg scan reads only the columns the aggregation needs") {
    val plan = planOf("q1_agg")
    // lineitem is 16 columns wide; the flagship agg touches a handful —
    // a ReadSchema carrying l_comment means pruning regressed
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("l_comment"),
      "column pruning regressed: q1_agg scan reads l_comment")
  }

  test("q3_join broadcasts its small build side") {
    val plan = planOf("q3_join")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast join for the dim side in:\n$plan")
  }

  test("no registry query plans a cartesian product (non-equi scans allowlisted)") {
    // ops whose SEMANTICS are non-equi pair scans: theta join, brute-force
    // top-k / hard negatives (=!= against a ≤nQueries broadcast — a
    // bounded nested loop by design, not an accident). w_interval_join
    // (equi-keyed on user, time bounds as post-filters) and w_asof_join
    // (union+window, no join at all) are deliberately NOT here: a
    // regression TO a cartesian in either must fail this guard.
    val nonEqui = Set(
      "q12_theta_join", "sim_topk_brute", "emb_hard_negatives")
    // structural pair ops run the =!= scan against a broadcast QUERY side;
    // anything else planning CartesianProduct is a regression
    val names = SparkEntry.queries.keySet -- nonEqui
    // plan-only pass: building the frame runs model-state collects for
    // some ops, but never the full query job
    val offenders = names.toSeq.sorted.flatMap { n =>
      val plan = try planOf(n) catch {
        case e: Throwable => fail(s"$n failed to plan: ${e.getMessage}")
      }
      if (plan.contains("CartesianProduct")) Some(n) else None
    }
    assert(offenders.isEmpty,
      s"unexpected cartesian product in: ${offenders.mkString(", ")}")
  }

  test("evt_pattern pushes stage predicates into scans and joins on the banded equi-key") {
    // formatted mode: the simple tree string TRUNCATES long PushedFilters
    // lists, which would make the value-predicate assertion flaky
    val plan = SparkEntry.queries("evt_pattern")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // each stage's predicate must reach its own parquet scan — the value
    // predicate included (GreaterThanOrEqual on click value), not just the
    // type equalities
    assert(plan.contains("EqualTo(event_type,view)") &&
      plan.contains("EqualTo(event_type,click)") &&
      plan.contains("EqualTo(event_type,purchase)"),
      s"stage type predicates not pushed in:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(value,50.0)"),
      s"stage value predicate not pushed in:\n$plan")
    // the stage joins must be HASH joins on the banded equi-key, never a
    // nested-loop over a user's events (the pre-banding interval-join
    // cliff class)
    assert(plan.contains("HashJoin"),
      s"expected hash joins on (user, band) in:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"evt_pattern must never plan a nested loop:\n$plan")
  }

  test("evt_pattern_plus keeps the banded-join discipline across all three rounds") {
    // the quantified form adds a third join round (the B-run MEASURES
    // aggregation) — it must ride the same (user, time-band) equi-key as
    // the anchor rounds, with the value predicate pushed, and never relax
    // to a nested loop
    val plan = SparkEntry.queries("evt_pattern_plus")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("EqualTo(event_type,view)") &&
      plan.contains("EqualTo(event_type,click)") &&
      plan.contains("EqualTo(event_type,purchase)"),
      s"stage type predicates not pushed in:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(value,50.0)"),
      s"quantified-stage value predicate not pushed in:\n$plan")
    assert(plan.contains("HashJoin"),
      s"expected hash joins on (user, band) in:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"evt_pattern_plus must never plan a nested loop:\n$plan")
  }

  test("alternation/optional/star patterns keep the banded-join discipline") {
    // the r18 quantifier envelope (alt / opt / star) adds completion
    // rounds and a provenance dimension — every round must stay a hash
    // join on the (user, time-band) equi-key with stage predicates
    // pushed to the scans, never a nested loop
    // evt_pattern_combo (r19): the compiler-composed A (B|C)+ D must
    // inherit the same plan discipline the generator emits for the
    // bespoke forms — its alternation OR-filter pushed, all rounds
    // banded hash joins
    Seq("evt_pattern_alt", "evt_pattern_opt", "evt_pattern_star",
        "evt_pattern_combo").foreach { n =>
      val plan = SparkEntry.queries(n)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("EqualTo(event_type,view)") &&
        plan.contains("EqualTo(event_type,purchase)"),
        s"$n: anchor/completion type predicates not pushed in:\n$plan")
      assert(plan.contains("GreaterThanOrEqual(value,50.0)"),
        s"$n: click-branch value predicate not pushed in:\n$plan")
      assert(plan.contains("HashJoin"),
        s"$n: expected hash joins on (user, band) in:\n$plan")
      assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
        s"$n must never plan a nested loop:\n$plan")
    }
  }

  test("w_asof_join plans ZERO joins — its scalable shape is union+window") {
    // the as-of join is implemented as a union of both sides + a
    // last-value window over event time, never a per-row probe join; any
    // join node appearing here means the scalable form regressed
    val plan = planOf("w_asof_join")
    assert(!plan.contains("Join"),
      s"w_asof_join must stay join-free (union+window), got:\n$plan")
  }
}
