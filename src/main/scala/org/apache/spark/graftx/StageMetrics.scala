package org.apache.spark.graftx

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-query IO accounting (input bytes, shuffle read/write bytes) via
  * a task-metrics listener. The accumulator never evicts (unlike the
  * UI status store, whose retained-stage cap would silently corrupt
  * cumulative deltas over a long bench); the only `private[spark]`
  * surface touched is the listener-bus drain, which is why this file
  * lives under `org.apache.spark` — same technique as the `sql.graftx`
  * expressions, public APIs otherwise.
  *
  * Usage: `install` once, snapshot `totals` before and after a query
  * (each snapshot drains the bus so async task-end events land); the
  * delta is that query's IO. This turns "is there a shuffle here that
  * becomes the bottleneck at scale" from a guess into a measurement.
  */
object StageMetrics {

  final case class Totals(inputRows: Long, shuffleRead: Long,
      shuffleWrite: Long, spillMem: Long = 0L, spillDisk: Long = 0L) {
    def -(o: Totals): Totals =
      Totals(inputRows - o.inputRows, shuffleRead - o.shuffleRead,
        shuffleWrite - o.shuffleWrite, spillMem - o.spillMem,
        spillDisk - o.spillDisk)
  }

  final class IoAccumulator extends SparkListener {
    private[StageMetrics] val input = new AtomicLong
    private[StageMetrics] val shuffleRead = new AtomicLong
    private[StageMetrics] val shuffleWrite = new AtomicLong
    private[StageMetrics] val spillMem = new AtomicLong
    private[StageMetrics] val spillDisk = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        // rows, not bytes: the local-file vectorized parquet path
        // bypasses the FS byte statistics (reads report ~0), while
        // recordsRead is exact — and scan width is the comparable
        // quantity across plans anyway
        input.addAndGet(m.inputMetrics.recordsRead)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        // spill accounting for the constrained-memory evidence
        // (graft.MemStress): spill-not-OOM is the proof that no
        // operator hides an executor-sized materialization
        spillMem.addAndGet(m.memoryBytesSpilled)
        spillDisk.addAndGet(m.diskBytesSpilled)
      }
    }
  }

  def install(sc: SparkContext): IoAccumulator = {
    val acc = new IoAccumulator
    sc.addSparkListener(acc)
    acc
  }

  /** Snapshot after draining the listener bus, so every completed
    * task's metrics are counted. */
  def totals(sc: SparkContext, acc: IoAccumulator): Totals = {
    sc.listenerBus.waitUntilEmpty(10000)
    Totals(acc.input.get(), acc.shuffleRead.get(), acc.shuffleWrite.get(),
      acc.spillMem.get(), acc.spillDisk.get())
  }
}
