package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Cache-release contract: no driver-facing operator may leave a
  * corpus-scale cache behind after its report materializes. Operators that
  * need an intermediate cached (a subtree feeding multiple join branches,
  * an iterative loop's state) must follow the localCheckpoint-the-report /
  * unpersist-the-cache discipline — on a shared 100 TB cluster a leaked
  * MEMORY_AND_DISK corpus cache evicts everyone else's working set and
  * survives until session end.
  *
  * Mechanics: `Dataset.persist` registers blocks that show up in
  * `sparkContext.getPersistentRDDs` once computed and stay there until an
  * explicit `unpersist` (Verify/Bench's `clearCache()` would mask the leak;
  * this spec never calls it). `localCheckpoint` ALSO persists its RDD — but
  * those are the materialized report/loop-state blocks, bounded by the
  * report size and released by the ContextCleaner when the result is
  * dropped — so the assertion is: after running and fully materializing
  * every `SparkEntry` query, every surviving persistent RDD is a
  * checkpointed one (`isCheckpointed`), never a raw operator cache.
  */
class CacheHygieneSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local("4")

  test("no SparkEntry query leaves an un-released operator cache behind") {
    val leaked = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, dir).count() // materialize — caches register on compute
      val raw = spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.isCheckpointed)
      if (raw.nonEmpty) {
        leaked += s"$name: ${raw.map(r => s"rdd#${r.id}(${r.getStorageLevel.description})").mkString(", ")}"
        raw.foreach(_.unpersist(blocking = false)) // isolate later queries
      }
    }
    assert(leaked.isEmpty,
      s"operator caches left persistent after materialization:\n  ${leaked.mkString("\n  ")}")
  }
}
