package graft

import org.apache.spark.scheduler._

import scala.collection.mutable

/** Empirical per-job profile of one driver query (guide §1.1): after a warm
  * pass, times one cold-cache run and prints every Spark job it launched —
  * duration, task count, input / shuffle bytes, summed executor run time —
  * plus the DRIVER GAP since the previous job ended (planning, collects,
  * eigensolves, literal construction all hide there). The gap column is the
  * point: at bench scale most operators are overhead-bound, and this is the
  * one table that says whether a second goes to executors or to the driver.
  *
  * Usage: runMain graft.ProfileQuery <sfDir> <queryName> [reps]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val (dir, name) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 1
    require(SparkEntry.queries.contains(name),
      s"unknown query name: $name")
    val spark = GraftSession.local()
    val fn = SparkEntry.queries(name)
    fn(spark, dir).count() // warm: codegen + page cache, the Bench discipline
    for (_ <- 1 to reps) {
      spark.catalog.clearCache()
      case class Job(start: Long, var end: Long = -1L,
        var desc: String = "", stages: mutable.Set[Int] = mutable.Set())
      case class Stage(var tasks: Int = 0, var input: Long = 0,
        var shRead: Long = 0, var shWrite: Long = 0, var execMs: Long = 0)
      val jobs = mutable.LinkedHashMap[Int, Job]()
      val stages = mutable.Map[Int, Stage]()
      val listener = new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit = {
          val j = Job(e.time)
          j.desc = Option(e.properties).flatMap(p =>
            Option(p.getProperty("spark.job.description"))
              .orElse(Option(p.getProperty("callSite.short")))).getOrElse("")
          j.stages ++= e.stageIds
          jobs.synchronized { jobs(e.jobId) = j }
        }
        override def onJobEnd(e: SparkListenerJobEnd): Unit =
          jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val m = si.taskMetrics
          stages.synchronized {
            stages(si.stageId) = Stage(si.numTasks, m.inputMetrics.bytesRead,
              m.shuffleReadMetrics.totalBytesRead,
              m.shuffleWriteMetrics.bytesWritten, m.executorRunTime)
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.currentTimeMillis()
      fn(spark, dir).count()
      val wall = System.currentTimeMillis() - t0
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      def mb(b: Long): String = f"${b / 1048576.0}%8.2f"
      println(f"\n[profile] $name wall=${wall / 1000.0}%.3f s — jobs: ${jobs.size}")
      println("  job   gap_ms   dur_ms  stg tasks  input_MB shRead_MB shWrite_MB exec_ms  desc")
      var prevEnd = t0
      var (sumGap, sumDur) = (0L, 0L)
      jobs.toSeq.sortBy(_._2.start).foreach { case (id, j) =>
        val gap = j.start - prevEnd
        val dur = (if (j.end > 0) j.end else j.start) - j.start
        prevEnd = math.max(prevEnd, if (j.end > 0) j.end else j.start)
        sumGap += math.max(0, gap); sumDur += dur
        val st = j.stages.toSeq.flatMap(stages.get)
        println(f"  $id%4d $gap%8d $dur%8d ${st.size}%4d ${st.map(_.tasks).sum}%5d " +
          f"${mb(st.map(_.input).sum)} ${mb(st.map(_.shRead).sum)}  ${mb(st.map(_.shWrite).sum)} " +
          f"${st.map(_.execMs).sum}%7d  ${j.desc.take(60)}")
      }
      println(f"[profile] $name wall=${wall}ms driver_gaps=${sumGap}ms job_time=${sumDur}ms")
    }
    spark.stop()
  }
}
