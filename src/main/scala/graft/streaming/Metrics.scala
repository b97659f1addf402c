package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Monitor/sensors (`/root/reference/faust/sensors/monitor.py:89-620`)
  * re-expressed as a `StreamingQueryListener`: rows/sec, batch
  * durations, state-store sizes per query — the metrics faust tracked
  * per-event, sourced from Spark's per-batch progress instead.
  * Export to statsd/prometheus by bridging [[snapshot]].
  */
final class QueryMonitor extends StreamingQueryListener {

  final case class QueryStats(name: String, batches: Long, inputRows: Long,
                              lastInputRowsPerSec: Double,
                              lastProcessedRowsPerSec: Double,
                              lastBatchDurationMs: Long,
                              stateRows: Long)

  private val stats = TrieMap.empty[java.util.UUID, QueryStats]

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    stats.put(event.id, QueryStats(event.name, 0, 0, 0, 0, 0, 0))

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val prev = stats.getOrElse(p.id, QueryStats(p.name, 0, 0, 0, 0, 0, 0))
    val stateRows = Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L)
    val duration = Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)
    stats.put(p.id, prev.copy(
      batches = prev.batches + 1,
      inputRows = prev.inputRows + p.numInputRows,
      lastInputRowsPerSec = p.inputRowsPerSecond,
      lastProcessedRowsPerSec = p.processedRowsPerSecond,
      lastBatchDurationMs = duration,
      stateRows = stateRows))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  def snapshot: Map[String, QueryStats] =
    stats.values.map(s => s.name -> s).toMap
}
