package graft.ops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Progress reporting (C5 — the reference's tqdm + structured logging,
  * movie.py:86-95,176) in Spark's idiom: a `SparkListener` counting
  * completed stages/tasks and bytes read while a body runs. At cluster
  * scale the same listener feeds whatever metrics sink the deployment
  * uses; here it returns a snapshot for logs and tests.
  */
object Progress {

  final case class Snapshot(stages: Long, tasks: Long, recordsRead: Long)

  private final class Counter extends SparkListener {
    val stages = new AtomicLong
    val tasks = new AtomicLong
    val records = new AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = te.taskMetrics
      if (m != null) records.addAndGet(m.inputMetrics.recordsRead)
    }
  }

  /** Run `body` with a progress listener attached; returns the result and
    * the counted work. The listener is always detached afterwards.
    */
  def track[A](spark: SparkSession)(body: => A): (A, Snapshot) = {
    val c = new Counter
    spark.sparkContext.addSparkListener(c)
    try {
      val r = body
      // listener events are delivered asynchronously (the bus-drain API
      // is private[spark]); a bounded settle loop is close enough for
      // progress reporting
      var last = -1L
      var settled = 0
      while (settled < 3) {
        Thread.sleep(50)
        val now = c.stages.get() + c.tasks.get()
        if (now == last) settled += 1 else { settled = 0; last = now }
      }
      (r, Snapshot(c.stages.get(), c.tasks.get(), c.records.get()))
    } finally spark.sparkContext.removeSparkListener(c)
  }
}
