package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.GraftSession
import graft.operators.Ann

/** Child-JVM side of the CROSS-JVM writer-lease race spec (VERDICT r13
  * next #3): the lease's create-exclusive acquisition and TTL takeover
  * were only ever exercised in-JVM, where a process-wide monitor
  * serializes racers — the filesystem-level race path (two REAL JVMs,
  * kernel-atomic O_EXCL arbitration) had no test. Two of these children
  * race `Ann.withWriterLease` on a shared sequence of artifact paths,
  * gated round-by-round by `go_<i>` marker files the parent spec drops;
  * each writes one `res_<i>_<id>` file (`WIN` or `HELD`) per round. The
  * parent asserts exactly one winner per round — across both the plain
  * create race (no prior lock) and the stale-lease takeover race (the
  * parent pre-plants a backdated lock).
  *
  * Mutual exclusion is made STRUCTURAL rather than timing-dependent
  * (r14 review #5): the winner HOLDS the lease until the peer's `HELD`
  * result file exists (up to a 10 s safety timeout), so the loser's
  * attempt always lands while the winner still holds — no scheduling
  * hiccup can turn the round into two sequential wins.
  *
  * Args: `<dir> <iters> <ttlMs> <myId> <peerId>`.
  */
object LeaseRace {
  def main(args: Array[String]): Unit = {
    val Array(dir, itersS, ttlMs, myId, peerId) = args.take(5)
    val iters = itersS.toInt
    val spark = GraftSession.build("2")
    spark.conf.set(Ann.WriterLeaseTtlConf, ttlMs)
    // warm the whole lease code path (JIT + Hadoop FS init) on a private
    // artifact BEFORE signalling ready, so round 0's two attempts land
    // microseconds apart instead of a JIT-pause apart
    Ann.withWriterLease(spark, s"$dir/warm_$myId") { () }
    Files.writeString(Paths.get(dir, s"ready_$myId"), "1",
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    (0 until iters).foreach { i =>
      val go = Paths.get(dir, s"go_$i")
      while (!Files.exists(go)) Thread.sleep(2)
      val peerRes = Paths.get(dir, s"res_${i}_$peerId")
      val outcome =
        try Ann.withWriterLease(spark, s"$dir/art_$i") {
          // a peer result ALREADY on disk saying WIN means the peer won,
          // released, and we acquired afterwards — the round was
          // sequential, not contended. Recording it as WIN would fail
          // the exactly-one-winner assert on a round where mutual
          // exclusion was never violated (r14 second review #4: the 10 s
          // safety timeout below re-introduced exactly that flake).
          if (Files.exists(peerRes) &&
              Files.readString(peerRes).trim == "WIN") "LATE"
          else {
            // structural hold: stay the single writer until the peer's
            // refusal is on record (or it died — the parent will see
            // the missing result)
            val t0 = System.currentTimeMillis()
            while (!Files.exists(peerRes) && System.currentTimeMillis() - t0 < 10000)
              Thread.sleep(5)
            "WIN"
          }
        } catch { case _: Ann.WriterLeaseHeldException => "HELD" }
      Files.writeString(Paths.get(dir, s"res_${i}_$myId"), outcome,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    }
    spark.stop()
  }
}
