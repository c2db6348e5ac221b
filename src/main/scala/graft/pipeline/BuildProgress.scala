package graft.pipeline

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Build-progress events (reference SSE surface: `app/core/sse.py` event
  * bus + `app/ingest/pipeline.py:46-66` publishing "Reading file" /
  * "Chunking" / "Embedding …" / "Building index […]" / "DONE" / "ERROR: …"
  * per job id).
  *
  * Spark-first shape: the named stage markers come from the pipeline code
  * (it knows what it is about to declare), and the "is it actually moving"
  * signal comes from the scheduler — a [[SparkListener]] scoped to a job
  * group emits one event per Spark job start and stage completion that the
  * build runs, so a 1000-executor build streams real progress without the
  * pipeline instrumenting its operators. The callback is the transport
  * seam: hand it a logger, a queue, an SSE bridge — the reporter doesn't
  * care.
  *
  * Listener-bus note: Spark delivers listener events asynchronously;
  * stage events can arrive after `withProgress` returns. Consumers that
  * need a final "nothing more coming" barrier should treat DONE/ERROR as
  * the terminal marker, as the reference's stream does.
  */
final class BuildProgress(jobGroup: String, onEvent: String => Unit)
    extends SparkListener {

  private val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val group = Option(js.properties).map(_.getProperty("spark.jobGroup.id")).orNull
    if (group == jobGroup) {
      js.stageIds.foreach(stages.add(_))
      onEvent(s"spark job ${js.jobId} started (${js.stageIds.size} stages)")
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
    if (stages.remove(e.stageInfo.stageId))
      onEvent(s"stage ${e.stageInfo.stageId} done (${e.stageInfo.numTasks} tasks)")
}

object BuildProgress {

  /** Run `body` with its Spark jobs tagged under `jobId` and scheduler
    * progress streamed to `onEvent`; the listener is removed on exit.
    */
  def withProgress[T](spark: SparkSession, jobId: String,
                      onEvent: String => Unit)(body: => T): T = {
    val sc = spark.sparkContext
    val listener = new BuildProgress(jobId, onEvent)
    sc.addSparkListener(listener)
    sc.setJobGroup(jobId, s"graft index build: $jobId", interruptOnCancel = false)
    try body
    finally {
      sc.clearJobGroup()
      sc.removeSparkListener(listener)
    }
  }
}
