package graft

/** Scratch per-query timer: warm once, then min of 3 — the Bench
  * discipline for a single operator during iteration.
  * Usage: runMain graft.TimeQuery <sfDir> <queryName> */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq // comma list: one JVM, many ops
    // fail fast on typo'd names BEFORE paying session startup (same guard
    // discipline as Verify's --only filter)
    names.foreach(name => require(SparkEntry.queries.contains(name),
      s"unknown query name: $name — valid: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    val spark = GraftSession.local()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      fn(spark, dir).count() // warm
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name min=${times.min}%.3f samples=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
