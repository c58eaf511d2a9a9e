package graft.engine

import scala.collection.concurrent.TrieMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Job monitoring parity (SURVEY.md §3.3): overview / per-job metrics /
  * cancel, fed by SparkListener (batch) + StreamingQueryListener
  * (streaming), replacing the reference's JobManager REST polling
  * (flinkJobClient.ts:107-146, metrics numRecordsIn/Out ≈ numInputRows).
  */
final case class JobInfo(
    id: String,
    name: String,
    state: String, // RUNNING | FINISHED | FAILED | CANCELED — flinkJobClient.ts:7-17 subset
    numRecordsIn: Long,
    numRecordsOut: Long,
    numBytesIn: Long)

final class JobRegistry(spark: SparkSession) {

  private val batchJobs = TrieMap.empty[Int, JobInfo]
  private val streamJobs = TrieMap.empty[java.util.UUID, JobInfo]
  private val jobGroups = TrieMap.empty[Int, String]
  // stage ids and job ids are independent counters — metrics arrive keyed
  // by stage, so record each job's stages at start
  private val stageToJob = TrieMap.empty[Int, Int]
  private val canceledStreams = TrieMap.empty[String, Boolean]

  private val sparkListener = new SparkListener {
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val group = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).getOrElse("")
      jobGroups.put(e.jobId, group)
      e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      batchJobs.put(e.jobId,
        JobInfo(e.jobId.toString, group, "RUNNING", 0, 0, 0))
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) stageToJob.get(e.stageId).foreach { jobId =>
        batchJobs.updateWith(jobId) {
          case Some(j) => Some(j.copy(
            numRecordsIn = j.numRecordsIn + m.inputMetrics.recordsRead,
            numBytesIn = j.numBytesIn + m.inputMetrics.bytesRead,
            numRecordsOut = j.numRecordsOut + m.outputMetrics.recordsWritten))
          case None => None
        }
      }
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      batchJobs.updateWith(e.jobId) {
        case Some(j) => Some(j.copy(state =
          if (e.jobResult.toString.contains("Succeeded")) "FINISHED" else "FAILED"))
        case None => None
      }
  }

  private val streamListener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      streamJobs.put(e.id, JobInfo(e.id.toString,
        Option(e.name).getOrElse(""), "RUNNING", 0, 0, 0))
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      streamJobs.updateWith(e.progress.id) {
        case Some(j) => Some(j.copy(
          numRecordsIn = j.numRecordsIn + e.progress.numInputRows,
          numRecordsOut = j.numRecordsOut +
            Option(e.progress.sink).map(_.numOutputRows).filter(_ > 0).getOrElse(0L)))
        case None => None
      }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      streamJobs.updateWith(e.id) {
        case Some(j) => Some(j.copy(state =
          if (e.exception.isDefined) "FAILED"
          else if (canceledStreams.contains(e.id.toString)) "CANCELED"
          else "FINISHED"))
        case None => None
      }
  }

  spark.sparkContext.addSparkListener(sparkListener)
  spark.streams.addListener(streamListener)

  /** Overview grouped by state (jobMonitorProvider.ts:112,146-157). */
  def overview(): Map[String, Seq[JobInfo]] =
    (batchJobs.values ++ streamJobs.values).toSeq.groupBy(_.state)

  def streaming(): Seq[JobInfo] = streamJobs.values.toSeq

  /** Cancel by id: streaming query stop or batch job-group cancel
    * (flinkJobClient.ts:164-175 analogue). */
  def cancel(id: String): Boolean = {
    spark.streams.active.find(_.id.toString == id) match {
      case Some(q) => canceledStreams.put(id, true); q.stop(); true
      case None =>
        jobGroups.collectFirst { case (jid, g) if jid.toString == id && g.nonEmpty => g }
          .exists { g => spark.sparkContext.cancelJobGroup(g); true }
    }
  }

  def close(): Unit = {
    spark.sparkContext.removeSparkListener(sparkListener)
    spark.streams.removeListener(streamListener)
  }
}
