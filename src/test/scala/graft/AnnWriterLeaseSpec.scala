package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Artifact writer lease (VERDICT r12 next #3): the crash-recovery
  * machinery (staged upsert replay, compaction roll-forward, merge
  * resume) assumes each artifact's rename choreography is SERIAL — one
  * writer at a time. The `_writer_lock` lease makes that documented
  * assumption mechanical: a second writer is refused mid-verb, a dead
  * writer's stale lease is fenced out and taken over, and composed
  * verbs (upsert → compact → add) share the outermost lease.
  */
class AnnWriterLeaseSpec extends SparkSpec {

  import spark.implicits._

  private lazy val s2 = {
    val s = spark.newSession()
    Functions.register(s)
    s.conf.set(Ann.IndexRootConf,
      java.nio.file.Files.createTempDirectory("graft_lease_root").toString)
    s
  }

  private def fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
  private def lockOf(root: String) = new org.apache.hadoop.fs.Path(s"${root}_writer_lock")
  private def fenceOf(root: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"${root}_writer_fence")
    if (!fs.exists(p)) 0L
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  private def delta = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .filter($"vec_id" % Ann.IncrMod === Ann.IncrRem)
    .select($"vec_id", $"embedding", $"label")
    .as[(Long, Array[Float], Int)]

  test("a second writer is refused mid-verb; the holder's lease survives the refusal") {
    val root = s"/tmp/graft_lease_refuse_${System.nanoTime()}"
    try {
      Ann.seedBaseIndex(s2, sf0001, root)
      val entered = new CountDownLatch(1)
      val release = new CountDownLatch(1)
      @volatile var holderFailed: Throwable = null
      val holder = new Thread(() =>
        try Ann.withWriterLease(s2, root) {
          entered.countDown()
          assert(release.await(30, TimeUnit.SECONDS), "test latch timed out")
        } catch { case t: Throwable => holderFailed = t; entered.countDown() })
      holder.start()
      assert(entered.await(30, TimeUnit.SECONDS))
      assert(holderFailed == null, s"holder thread failed: $holderFailed")
      // a DIFFERENT thread attempting any mutator verb mid-hold is
      // refused loudly — never queued, never interleaved
      val e = intercept[Ann.WriterLeaseHeldException] {
        Ann.addVectors(s2, root, delta)
      }
      assert(e.getMessage.contains("_writer_lock"))
      assert(fs.exists(lockOf(root)), "refusal must not delete the holder's lease")
      release.countDown()
      holder.join(30000)
      assert(!fs.exists(lockOf(root)), "lease must release at verb exit")
      // with the holder gone the same verb succeeds
      Ann.addVectors(s2, root, delta)
    } finally fs.delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("a crashed writer's stale lease is fenced out and taken over") {
    val root = s"/tmp/graft_lease_stale_${System.nanoTime()}"
    try {
      Ann.seedBaseIndex(s2, sf0001, root)
      // simulate the dead writer: a lease nobody will ever release
      val out = fs.create(lockOf(root), false)
      out.write("fence=7\npid=0\nts=0\n".getBytes("UTF-8"))
      out.close()
      // fresh lease: refused (the holder may be alive)
      intercept[Ann.WriterLeaseHeldException] { Ann.addVectors(s2, root, delta) }
      // backdate it past the TTL: the next writer takes over
      fs.setTimes(lockOf(root), 1000L, 1000L)
      val fenceBefore = fenceOf(root)
      Ann.addVectors(s2, root, delta)
      assert(!fs.exists(lockOf(root)), "takeover verb must release its own lease")
      assert(fenceOf(root) > fenceBefore, "takeover must advance the fencing counter")
    } finally fs.delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("composed verbs share the outermost lease (re-entrant per thread)") {
    val root = s"/tmp/graft_lease_reent_${System.nanoTime()}"
    try {
      Ann.seedBaseIndex(s2, sf0001, root)
      // upsert composes tombstone + compact + add on the same artifact —
      // with a non-re-entrant lease this would deadlock or self-refuse
      Ann.upsertVectors(s2, root, delta)
      assert(!fs.exists(lockOf(root)))
      // explicit nesting: the inner scope reuses the outer lease (one
      // fence issued), and release happens only at the outermost exit
      val f0 = fenceOf(root)
      val v = Ann.withWriterLease(s2, root) {
        Ann.withWriterLease(s2, root) {
          assert(fs.exists(lockOf(root)))
          41
        } + 1
      }
      assert(v == 42)
      assert(fenceOf(root) == f0 + 1, "nested scopes must not issue a second fence")
      assert(!fs.exists(lockOf(root)))
    } finally fs.delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("heartbeat: a verb running past the TTL is NOT taken over while its holder is alive") {
    // VERDICT r13 wrong #2: without heartbeats, any verb longer than the
    // TTL (at 100 TB: every compaction/merge/rebalance) was
    // indistinguishable from a crashed writer and got taken over WHILE
    // ALIVE. The beater refreshes the lock mtime every ttl/3, so
    // takeover now keys off heartbeats STOPPING, not verb duration.
    val root = s"/tmp/graft_lease_beat_${System.nanoTime()}"
    val s3 = spark.newSession()
    s3.conf.set(Ann.WriterLeaseTtlConf, "300") // beat period = max(100, 50)
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var holderFailed: Throwable = null
    val holder = new Thread(() =>
      try Ann.withWriterLease(s3, root) {
        entered.countDown()
        assert(release.await(30, TimeUnit.SECONDS), "test latch timed out")
      } catch { case t: Throwable => holderFailed = t; entered.countDown() })
    holder.start()
    try {
      assert(entered.await(30, TimeUnit.SECONDS))
      assert(holderFailed == null, s"holder thread failed: $holderFailed")
      // run the verb 4 TTLs long: every acquisition attempt inside that
      // window must be REFUSED (pre-heartbeat, any attempt after 300 ms
      // would have fenced the live holder out)
      (1 to 4).foreach { _ =>
        Thread.sleep(310)
        intercept[Ann.WriterLeaseHeldException] {
          Ann.withWriterLease(s3, root) { () }
        }
      }
      assert(fs.exists(lockOf(root)), "live holder's lease must survive the attempts")
    } finally {
      release.countDown()
      holder.join(30000)
    }
    assert(holderFailed == null, s"holder thread failed: $holderFailed")
    assert(!fs.exists(lockOf(root)), "lease must release at verb exit")
    // ...while a DEAD writer's lease (same tiny TTL, nobody heartbeats
    // it) is still taken over once its beats have stopped for a TTL
    val f0 = fenceOf(root)
    val out = fs.create(lockOf(root), false)
    out.write(s"fence=$f0\npid=0\nts=0\n".getBytes("UTF-8")); out.close()
    intercept[Ann.WriterLeaseHeldException] { Ann.withWriterLease(s3, root) { () } }
    Thread.sleep(400)
    Ann.withWriterLease(s3, root) { () } // takeover succeeds
    assert(fenceOf(root) > f0, "takeover must advance the fencing counter")
    fs.delete(new org.apache.hadoop.fs.Path(s"${root}_writer_fence"), false)
  }

  test("a fenced-out zombie aborts at its next destructive boundary") {
    // the heartbeat's OTHER half: when takeover happens anyway (TTL
    // misconfigured, FS partition healed late), the zombie must not keep
    // renaming/deleting — leaseCheckpoint, wired into Faults.point (every
    // destructive boundary), aborts it within one FS operation
    val root = s"/tmp/graft_lease_zombie_${System.nanoTime()}"
    val s3 = spark.newSession()
    s3.conf.set(Ann.WriterLeaseTtlConf, "200") // beat period ~66 ms
    val entered = new CountDownLatch(1)
    val fenced = new CountDownLatch(1)
    @volatile var zombieOutcome: Throwable = null
    val holder = new Thread(() =>
      try Ann.withWriterLease(s3, root) {
        entered.countDown()
        assert(fenced.await(30, TimeUnit.SECONDS), "test latch timed out")
        graft.operators.Faults.point() // first destructive boundary after the loss
      } catch { case t: Throwable => zombieOutcome = t; entered.countDown() })
    holder.start()
    try {
      assert(entered.await(30, TimeUnit.SECONDS))
      // simulate a takeover while the holder is wedged: replace its lock
      // with another writer's (different fence)
      fs.delete(lockOf(root), false)
      val out = fs.create(lockOf(root), false)
      out.write("fence=999999\npid=0\nts=0\n".getBytes("UTF-8")); out.close()
      Thread.sleep(300) // ≥ 2 beat periods: the heartbeat sees the foreign fence
    } finally {
      fenced.countDown()
      holder.join(30000)
    }
    assert(zombieOutcome != null &&
      zombieOutcome.isInstanceOf[Ann.WriterLeaseLostException],
      s"zombie should abort with WriterLeaseLostException, got: $zombieOutcome")
    // the zombie's release must NOT delete the new writer's lease
    assert(fs.exists(lockOf(root)), "zombie release deleted the usurper's lease")
    fs.delete(lockOf(root), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"${root}_writer_fence"), false)
  }

  test("every mutator verb acquires the lease: a foreign lock refuses them all") {
    val root = s"/tmp/graft_lease_verbs_${System.nanoTime()}"
    val alias = s"/tmp/graft_lease_alias_${System.nanoTime()}"
    try {
      Ann.seedBaseIndex(s2, sf0001, root)
      Seq(root, alias).foreach { p =>
        val out = fs.create(lockOf(p), false)
        out.write("fence=1\npid=0\nts=0\n".getBytes("UTF-8")); out.close()
      }
      intercept[Ann.WriterLeaseHeldException] { Ann.addVectors(s2, root, delta) }
      intercept[Ann.WriterLeaseHeldException] { Ann.upsertVectors(s2, root, delta) }
      intercept[Ann.WriterLeaseHeldException] {
        Ann.deleteFromIndexAt(s2, root, col("doc_id") === 1L)
      }
      intercept[Ann.WriterLeaseHeldException] { Ann.compactIndexAt(s2, root) }
      intercept[Ann.WriterLeaseHeldException] { Ann.compactSmallFilesAt(s2, root) }
      intercept[Ann.WriterLeaseHeldException] { Ann.rebalanceIndex(s2, root) }
      intercept[Ann.WriterLeaseHeldException] { Ann.repairDrifted(s2, root) }
      intercept[Ann.WriterLeaseHeldException] {
        Ann.mergeIndexArtifacts(s2, root, Seq("/tmp/nonexistent_shard"))
      }
      intercept[Ann.WriterLeaseHeldException] { Ann.setAlias(s2, alias, root) }
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.delete(lockOf(root), false)
      fs.delete(new org.apache.hadoop.fs.Path(alias), true)
      fs.delete(lockOf(alias), false)
    }
  }
}
