package graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-window Spark stage telemetry (VERDICT r15 next #3): accumulates
  * task-metric totals from every stage completed while attached, so a
  * bench pass publishes WHAT its window did — shuffle bytes
  * written/read, spill, executor run/GC time — alongside how long it
  * took. The graph-slope adjudication reads it to separate "the same
  * work ran slower" (environmental: bytes unchanged, run/GC inflated)
  * from "the work grew" (code: bytes or stage counts changed).
  *
  * Usage: [[BenchTelemetry.measure]] attaches a fresh listener, runs
  * the body, drains the async listener bus, detaches, and returns the
  * window's JSON. Totals are whole-window sums over all stages that
  * COMPLETED inside it (a stage spanning the window boundary lands in
  * the window where it finished — passes are serial, so the only
  * boundary work is the tail of the previous pass's last job, already
  * awaited by its own collect()).
  */
final class BenchTelemetry extends SparkListener {
  private var stages = 0
  private var tasks = 0
  private var shuffleWriteBytes = 0L
  private var shuffleReadBytes = 0L
  private var memorySpilled = 0L
  private var diskSpilled = 0L
  private var executorRunMs = 0L
  private var executorCpuMs = 0L
  private var gcMs = 0L

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
    val info = sc.stageInfo
    val m = info.taskMetrics
    if (m != null) {
      stages += 1
      tasks += info.numTasks
      shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
      shuffleReadBytes += m.shuffleReadMetrics.totalBytesRead
      memorySpilled += m.memoryBytesSpilled
      diskSpilled += m.diskBytesSpilled
      executorRunMs += m.executorRunTime
      executorCpuMs += m.executorCpuTime / 1000000L // ns → ms
      gcMs += m.jvmGCTime
    }
  }

  /** The window's totals as one JSON object. `executor_run_ms` is the
    * sum over tasks (32 slots ⇒ up to 32× wall); `gc_ms` likewise.
    * `executor_cpu_ms` vs `executor_run_ms` is the window's
    * on-CPU fraction — a run that grew while cpu didn't is stall
    * (page supply, IO wait), not work. */
  def json: String = synchronized {
    def mb(b: Long): Long = b / 1048576L
    s"""{"stages":$stages,"tasks":$tasks,"shuffle_write_mb":${mb(shuffleWriteBytes)},""" +
      s""""shuffle_read_mb":${mb(shuffleReadBytes)},"spill_mem_mb":${mb(memorySpilled)},""" +
      s""""spill_disk_mb":${mb(diskSpilled)},"executor_run_ms":$executorRunMs,""" +
      s""""executor_cpu_ms":$executorCpuMs,"gc_ms":$gcMs}"""
  }
}

object BenchTelemetry {
  /** Run `body` with a fresh listener attached; returns (result,
    * telemetry JSON for exactly that window). */
  def measure[T](sc: SparkContext)(body: => T): (T, String) = {
    val tel = new BenchTelemetry
    sc.addSparkListener(tel)
    try {
      val r = body
      org.apache.spark.GraftSparkInternal.waitListenerBusEmpty(sc)
      (r, tel.json)
    } finally sc.removeSparkListener(tel)
  }
}
