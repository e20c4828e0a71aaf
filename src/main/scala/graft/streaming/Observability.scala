package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** O1 parity (SURVEY §2.1): the reference taps its flow with 4× NiFi
  * `LogAttribute` processors + failure/retry routing; the Spark-native
  * equivalent is a `StreamingQueryListener` capturing per-batch progress
  * (rows/sec, batch duration, state) plus `df.observe()` metrics on the
  * frame itself. */
final class ProgressRecorder extends StreamingQueryListener {
  val progress = new ConcurrentLinkedQueue[QueryProgressEvent]()
  @volatile var started: Option[QueryStartedEvent] = None
  @volatile var terminated: Option[QueryTerminatedEvent] = None

  override def onQueryStarted(e: QueryStartedEvent): Unit = started = Some(e)
  override def onQueryProgress(e: QueryProgressEvent): Unit = progress.add(e)
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = terminated = Some(e)

  def totalInputRows: Long = {
    val it = progress.iterator(); var n = 0L
    while (it.hasNext) n += it.next().progress.numInputRows
    n
  }
}

object Observability {
  /** Attach a fresh recorder to the session. Caller detaches via
    * `spark.streams.removeListener`. */
  def attach(spark: SparkSession): ProgressRecorder = {
    val r = new ProgressRecorder
    spark.streams.addListener(r)
    r
  }
}
