package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warm what we time: one untimed pass of EVERY query against sfDir
    // itself. A cold n=1 run otherwise charges the first queries for parquet
    // first-touch + whole-stage-codegen compilation of the entire operator
    // library (round 1: dd_exact billed 25 s cold vs 1.7 s warm), which
    // measures the harness, not the plan.
    SparkEntry.entry(spark).count()
    qs.foreach { case (name, fn) =>
      spark.catalog.clearCache() // operators persist intermediates; isolate runs
      try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
    }
    // Timed: min of 3 samples, taken as 3 FULL PASSES over the query list
    // (not back-to-back repeats) — single-run noise on a shared VM is up to
    // 3x and a contention burst lasts seconds, so back-to-back samples of
    // one query are correlated; pass-separated samples ~30 s apart are not.
    val samples = (1 to 3).flatMap { _ =>
      qs.map { case (name, fn) =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val results = qs.map { case (name, _) =>
      name -> samples.collect { case (n, t) if n == name => t }.min
    }
    // Emission discipline: the driver captures a bounded stdout tail, and
    // rounds 1-6 proved a full-precision line (~4 KB) outgrows it — every
    // BENCH_r*.json shipped "parsed": null. So (a) round to ms (3 decimals,
    // ~40% smaller → the whole line fits the window) and (b) order the
    // queries map by descending cost so if truncation ever recurs it eats
    // the cheap tail, never the heavy dd_* head.
    def ms(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qjson = results.sortBy(-_._2)
      .map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
