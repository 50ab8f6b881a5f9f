package graft.tools

import java.nio.file.{Files, Paths}

import graft.GraftSession
import graft.operators.Ann

/** Child-JVM side of the CROSS-JVM writer-lease race spec (VERDICT r13
  * next #3): the lease's create-exclusive acquisition and TTL takeover
  * were only ever exercised in-JVM, where a process-wide monitor
  * serializes racers — the filesystem-level race path (two REAL JVMs,
  * kernel-atomic O_EXCL arbitration) had no test. Two of these children
  * race `Ann.withWriterLease` on a shared sequence of artifact paths,
  * gated round-by-round by `go_<i>` marker files the parent spec drops;
  * each prints one `LEASERACE_RESULT <i> WIN|HELD` line per round. The
  * parent asserts exactly one winner per round — across both the plain
  * create race (no prior lock) and the stale-lease takeover race (the
  * parent pre-plants a backdated lock).
  *
  * Args: `<dir> <iters> <ttlMs>`. The hold inside the lease (600 ms) is
  * what turns near-simultaneous attempts into a real mutual-exclusion
  * test: the loser's attempt lands while the winner still holds.
  */
object LeaseRace {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val iters = args(1).toInt
    val ttlMs = args(2)
    val spark = GraftSession.build("2")
    spark.conf.set(Ann.WriterLeaseTtlConf, ttlMs)
    // warm the whole lease code path (JIT + Hadoop FS init) on a private
    // artifact BEFORE signalling ready, so round 0's two attempts land
    // microseconds apart instead of a JIT-pause apart
    Ann.withWriterLease(spark, s"$dir/warm_${ProcessHandle.current().pid()}") { () }
    println("LEASERACE_READY")
    (0 until iters).foreach { i =>
      val go = Paths.get(dir, s"go_$i")
      while (!Files.exists(go)) Thread.sleep(2)
      val outcome =
        try Ann.withWriterLease(spark, s"$dir/art_$i") { Thread.sleep(600); "WIN" }
        catch { case _: Ann.WriterLeaseHeldException => "HELD" }
      println(s"LEASERACE_RESULT $i $outcome")
    }
    println("LEASERACE_DONE")
    spark.stop()
  }
}
