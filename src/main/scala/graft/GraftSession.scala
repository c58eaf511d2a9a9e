package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session defaults so Verify, Bench, and tests agree.
  *
  * Settings are scale-oriented: AQE on (runtime coalescing + skew-join
  * splitting stand in for hand-tuned partition counts on a real cluster),
  * shuffle partitions sized to local cores (on a 1000-executor cluster this
  * would be a multiple of total cores — AQE coalesces the excess either way).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // testdata's events.ts is parquet TIMESTAMP(NANOS); read as Long nanos
      // (Tables.load converts to TimestampType).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // native expressions as SQL functions (simhash64/srp_code/vec_dot)
      .config("spark.sql.extensions", "graft.GraftExtensions")
    // deployment-specific overrides without a recompile (r19): semicolon-
    // separated k=v list, e.g. cluster memory/shuffle sizing per guide §9.
    // Later wins over the defaults above; empty/unset is a no-op, so the
    // driver's bench environment is untouched unless it opts in.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";").toSeq).filter(_.contains("="))
      .foldLeft(b) { (bb, kv) =>
        val Array(k, v) = kv.split("=", 2)
        bb.config(k.trim, v.trim)
      }
  }

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
