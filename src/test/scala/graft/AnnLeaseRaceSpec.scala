package graft

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

/** CROSS-JVM writer-lease race (VERDICT r13 next #3): the in-process
  * monitor serializes same-JVM racers, so every prior lease test
  * exercised the FS-level protocol alone never — two real JVMs racing
  * `fs`-level create-exclusive and TTL takeover had no coverage, and
  * the local filesystem's non-atomic check-then-create (hidden by the
  * monitor in-JVM) is exactly where a double-acquire would hide. The
  * acquire path now uses kernel-atomic NIO `createFile` (O_EXCL) for
  * local paths; this spec forks two REAL JVMs ([[tools.LeaseRace]])
  * and races them round-by-round:
  *
  *  - even rounds: plain acquire race (no prior lock) — the atomic
  *    create is the arbiter;
  *  - odd rounds: stale-lease TAKEOVER race (a backdated lock is
  *    planted) — rename-aside arbitration plus the r14 loser-refusal
  *    rule (a lost takeover rename REFUSES instead of falling through
  *    to create against a momentarily-absent lock).
  *
  * Exactly one JVM must win each round; the loser gets
  * WriterLeaseHeldException (printed as HELD). A 600 ms in-lease hold
  * makes near-simultaneous attempts a true mutual-exclusion test.
  */
class AnnLeaseRaceSpec extends AnyFunSuite {

  private val Iters = 6

  private def fork(dir: String, out: java.io.File): Process = {
    import scala.jdk.CollectionConverters._
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    // inherit the test JVM's flags (--add-opens etc.) but cap the heap:
    // two tiny local[2] children run beside the 8g test JVM
    val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
      .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms")).toSeq :+ "-Xmx3g"
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"),
        "graft.tools.LeaseRace", dir, Iters.toString, "60000")
    val pb = new ProcessBuilder(cmd.asJava)
    pb.redirectOutput(out)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    pb.start()
  }

  private def await(cond: => Boolean, timeoutMs: Long, what: String): Unit = {
    val t0 = System.currentTimeMillis()
    while (!cond) {
      assert(System.currentTimeMillis() - t0 < timeoutMs, s"timed out waiting for $what")
      Thread.sleep(20)
    }
  }

  test("two real JVMs racing acquire and TTL takeover: exactly one winner per round") {
    val dir = Files.createTempDirectory("graft_lease_race").toString
    // odd rounds race the TAKEOVER path: plant a stale (backdated) lock
    // under the children's 60 s TTL — backdating to epoch+1s makes it
    // stale under any TTL
    (1 until Iters by 2).foreach { i =>
      val lock = Paths.get(dir, s"art_${i}_writer_lock")
      Files.write(lock, "fence=1\npid=0\nts=0\n".getBytes("UTF-8"))
      Files.setLastModifiedTime(lock, FileTime.fromMillis(1000L))
      ()
    }
    val outA = new java.io.File(dir, "a.out")
    val outB = new java.io.File(dir, "b.out")
    val pa = fork(dir, outA)
    val pb = fork(dir, outB)
    try {
      def ready(f: java.io.File) =
        f.exists() && Files.readString(f.toPath).contains("LEASERACE_READY")
      await(ready(outA) && ready(outB), 180000, "both children READY")
      (0 until Iters).foreach { i =>
        Files.createFile(Paths.get(dir, s"go_$i"))
        // hold is 600 ms; give the round time to fully settle before the
        // next one so releases never bleed across rounds
        Thread.sleep(900)
      }
      assert(pa.waitFor(120, TimeUnit.SECONDS), "child A did not exit")
      assert(pb.waitFor(120, TimeUnit.SECONDS), "child B did not exit")
      assert(pa.exitValue() == 0, s"child A exited ${pa.exitValue()}")
      assert(pb.exitValue() == 0, s"child B exited ${pb.exitValue()}")
      def results(f: java.io.File): Map[Int, String] =
        Files.readString(f.toPath).linesIterator.collect {
          case l if l.startsWith("LEASERACE_RESULT ") =>
            val parts = l.split(" ")
            parts(1).toInt -> parts(2)
        }.toMap
      val ra = results(outA)
      val rb = results(outB)
      (0 until Iters).foreach { i =>
        val pair = Seq(ra.get(i), rb.get(i)).flatten
        assert(pair.length == 2, s"round $i: missing result ($ra / $rb)")
        val kind = if (i % 2 == 1) "takeover" else "acquire"
        assert(pair.count(_ == "WIN") == 1,
          s"round $i ($kind): expected exactly one winner, got A=${ra(i)} B=${rb(i)}")
        assert(pair.count(_ == "HELD") == 1,
          s"round $i ($kind): expected exactly one refusal, got A=${ra(i)} B=${rb(i)}")
        // after the round settles, the winner has released: no lock left
        assert(!Files.exists(Paths.get(dir, s"art_${i}_writer_lock")),
          s"round $i: winner did not release its lease")
      }
    } finally {
      pa.destroyForcibly()
      pb.destroyForcibly()
    }
  }
}
