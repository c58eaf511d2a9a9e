package graft

/** Scratch A/B timer for the pattern forms on a derived rung dir:
  * compiled (registry) vs bespoke — adjudication instrument for the r19
  * compiler swap. Usage: runMain graft.TimePattern <dir> <name> */
object TimePattern {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = if (args.length > 1) args(1) else "evt_pattern"
    val spark = GraftSession.local()
    val forms: Map[String, Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame]] = Map(
      "evt_pattern" -> Map(
        "bespoke" -> (graft.operators.EventPattern.evtPattern _),
        "compiled" -> (graft.operators.EventPattern.evtPatternCompiled _)),
      "evt_pattern_alt" -> Map(
        "bespoke" -> (graft.operators.EventPattern.evtPatternAlt _),
        "compiled" -> (graft.operators.EventPattern.evtPatternAltCompiled _)),
      "evt_pattern_plus" -> Map(
        "bespoke" -> (graft.operators.EventPattern.evtPatternPlus _),
        "compiled" -> (graft.operators.EventPattern.evtPatternPlusCompiled _)))
    forms(which).foreach { case (tag, fn) =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[timepat] $which $tag%-9s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    spark.stop()
  }
}
