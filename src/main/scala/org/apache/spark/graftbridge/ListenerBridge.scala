package org.apache.spark.graftbridge

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Bridge into the private[spark] listener bus (drain pending events
  * before reading counters — no sleep-and-hope polling) plus the shuffle
  * accounting listener Bench and the plan-budget specs share. Shuffle
  * WRITE volume is the plan-shape signal: wall-clock is machine-noisy,
  * but bytes crossing an exchange only change when the plan changes.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

/** Accumulates input records read across all tasks (file scans and
  * cached-block reads both land in inputMetrics). The re-execution
  * signal: a plan that re-runs a fact join per subtree reference reads
  * the fact table's rows once per reference, so total recordsRead
  * exposes duplicate executions that wall-clock noise hides.
  */
final class InputAccounting extends SparkListener {
  val records = new AtomicLong(0)

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
    if (t.taskMetrics != null) records.addAndGet(t.taskMetrics.inputMetrics.recordsRead)

  /** Run `f`, return the input records attributed to it. */
  def measure[A](sc: SparkContext)(f: => A): Long = {
    ListenerBridge.waitUntilEmpty(sc)
    val r0 = records.get
    f
    ListenerBridge.waitUntilEmpty(sc)
    records.get - r0
  }
}

/** Accumulates shuffle-write bytes+records across all tasks. Attribute a
  * region of work by snapshotting around it and draining the bus first.
  */
final class ShuffleAccounting extends SparkListener {
  val bytes = new AtomicLong(0)
  val records = new AtomicLong(0)

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
    if (t.taskMetrics != null) {
      bytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
      records.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }

  /** Run `f`, return (bytesWritten, recordsWritten) attributed to it. */
  def measure[A](sc: SparkContext)(f: => A): (Long, Long) = {
    ListenerBridge.waitUntilEmpty(sc)
    val (b0, r0) = (bytes.get, records.get)
    f
    ListenerBridge.waitUntilEmpty(sc)
    (bytes.get - b0, records.get - r0)
  }
}
