package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** [[Ann.fsck]] (VERDICT r12 next #4): the one verb a consumer runs
  * before trusting an artifact after a crash. Green across the full
  * lifecycle fixture (every verb leaves every invariant intact); each
  * hand-crafted corruption flips exactly its own check red.
  */
class AnnFsckSpec extends SparkSpec {

  import spark.implicits._

  private lazy val s2 = {
    val s = spark.newSession()
    Functions.register(s)
    s.conf.set(Ann.IndexRootConf,
      java.nio.file.Files.createTempDirectory("graft_fsck_root").toString)
    s
  }

  private def fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select($"vec_id", $"embedding", $"label")
    .as[(Long, Array[Float], Int)]

  private def failing(root: String): Map[String, String] =
    Ann.fsck(s2, root).filterNot(_.ok).map(c => c.check -> c.detail).toMap

  test("fsck is green after every lifecycle verb") {
    val root = s"/tmp/graft_fsck_green_${System.nanoTime()}"
    try {
      Ann.seedBaseIndex(s2, sf0001, root)
      assert(failing(root).isEmpty, s"fresh artifact: ${failing(root)}")

      Ann.addVectors(s2, root, corpus.filter($"vec_id" % Ann.IncrMod === Ann.IncrRem))
      Ann.snapshotIndex(s2, root)
      Ann.deleteFromIndexAt(s2, root, col("doc_id") % 50 === 3)
      Ann.compactIndexAt(s2, root)
      Ann.buildGraphAt(s2, root)
      Ann.compactGraphAt(s2, root)
      Ann.upsertVectors(s2, root,
        s2.createDataset(corpus.filter($"vec_id" % 50 === 7).collect()
          .map { case (id, v, l) => (id, v.reverse, l) }.toSeq))
      Ann.compactSmallFilesAt(s2, root)
      Ann.snapshotIndex(s2, root)
      val bad = failing(root)
      assert(bad.isEmpty, s"post-lifecycle artifact: $bad")
      val checks = Ann.fsck(s2, root).map(_.check)
      // the graph check must have actually run on this fixture
      assert(checks.contains("graph_endpoints_resolve"), s"checks ran: $checks")
    } finally fs.delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("alias fsck: green on a served alias, red per pointer corruption") {
    val alias = s"/tmp/graft_fsck_alias_${System.nanoTime()}"
    val target = s"/tmp/graft_fsck_aliastarget_${System.nanoTime()}"
    def failingA(): Map[String, String] =
      Ann.fsckAlias(s2, alias).filterNot(_.ok).map(c => c.check -> c.detail).toMap
    try {
      Ann.seedBaseIndex(s2, sf0001, target)
      // a missing alias dir is one loud check, not a crash
      val ghost = Ann.fsckAlias(s2, alias)
      assert(ghost.map(c => (c.check, c.ok)) == Seq(("alias_present", false)))

      Ann.setAlias(s2, alias, target)
      Ann.setAlias(s2, alias, target) // a second cutover extends the trail
      assert(failingA().isEmpty, s"served alias: ${failingA()}")

      // crashed-cutover tmp leftover
      fs.create(new org.apache.hadoop.fs.Path(s"$alias/_ALIAS_tmp_123"), false).close()
      assert(failingA().keySet == Set("no_tmp_debris"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$alias/_ALIAS_tmp_123"), false)

      // current pointer naming a missing artifact
      Ann.setAlias(s2, alias, s"$target-gone")
      assert(failingA().keySet == Set("pointer_target_exists"))
      Ann.setAlias(s2, alias, target) // cutover back heals
      assert(failingA().isEmpty)

      // an empty pointer file is unreadable, not silently resolved
      val v = Ann.aliasVersions(s2, alias).last + 1
      fs.create(new org.apache.hadoop.fs.Path(s"$alias/_ALIAS_v$v"), false).close()
      assert(failingA().keySet == Set("pointers_readable"))
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(alias), true)
      fs.delete(new org.apache.hadoop.fs.Path(target), true)
    }
  }

  test("r14 gates: hwm monotonicity, recall-log parse, fence/lease coherence") {
    // VERDICT r13 next #7 — the three cross-component invariants fsck
    // did not yet read: version numbering's high-water mark, the recall
    // time series the serving loop replays, and the fencing counter the
    // release-only-my-fence rule trusts
    val root = s"/tmp/graft_fsck_r14_${System.nanoTime()}"
    def p(rel: String) = new org.apache.hadoop.fs.Path(rel)
    def write(rel: String, content: String): Unit = {
      val out = fs.create(p(rel), true)
      out.write(content.getBytes("UTF-8")); out.close()
    }
    try {
      Ann.seedBaseIndex(s2, sf0001, root)
      // never-snapshotted, never-probed artifact: the hwm / recall-log
      // checks don't apply (no false reds on a minimal artifact); the
      // fence check always runs (fence absent = counter 0, coherent)
      val checks0 = Ann.fsck(s2, root).map(_.check)
      assert(!checks0.contains("hwm_monotone") && !checks0.contains("recall_log_parses"),
        s"checks on a bare artifact: $checks0")
      assert(checks0.contains("fence_coherent"))
      assert(failing(root).isEmpty)

      // real lifecycle state: snapshot (writes _hwm), probe log, a verb
      // (advances the fence) — all three checks run and come back green
      val v = Ann.snapshotIndex(s2, root)
      Ann.writeRecallLogAt(s2, root, 1L,
        Ann.RecallProbe(10, 5, 4, 45L, 0.9, 0.8, 0.95, 4, Seq(2 -> 40L, 4 -> 45L)))
      val checks1 = Ann.fsck(s2, root).map(_.check)
      assert(checks1.contains("hwm_monotone") && checks1.contains("recall_log_parses"),
        s"checks after lifecycle: $checks1")
      assert(failing(root).isEmpty, s"${failing(root)}")

      // hwm rolled back below a live manifest version
      write(s"$root/_snapshots/_hwm", "0")
      assert(failing(root).keySet == Set("hwm_monotone"), s"${failing(root)}")
      // unparseable hwm
      write(s"$root/_snapshots/_hwm", "not-a-number")
      assert(failing(root).keySet == Set("hwm_monotone"), s"${failing(root)}")
      write(s"$root/_snapshots/_hwm", v.toString) // heal

      // recall log that does not parse as parquet
      write(s"$root/_recall_log/part-corrupt.parquet", "garbage bytes")
      assert(failing(root).keySet == Set("recall_log_parses"), s"${failing(root)}")
      fs.delete(p(s"$root/_recall_log"), true)
      // recall log parquet missing the columns consumers key on
      import spark.implicits._
      Seq((1L, "x")).toDF("batch_id", "wrong")
        .write.mode("overwrite").parquet(s"$root/_recall_log")
      assert(failing(root).keySet == Set("recall_log_parses"), s"${failing(root)}")
      fs.delete(p(s"$root/_recall_log"), true)

      // unparseable fence counter (would be read as 0 → fence aliasing)
      val fenceBak = {
        val in = fs.open(p(s"${root}_writer_fence"))
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      }
      write(s"${root}_writer_fence", "garbage")
      assert(failing(root).keySet == Set("fence_coherent"), s"${failing(root)}")
      write(s"${root}_writer_fence", fenceBak)
      assert(failing(root).isEmpty, s"${failing(root)}")
      // a lease (fresh, so not stale-flagged) carrying a fence ABOVE the
      // counter: the counter was rolled back or clobbered
      write(s"${root}_writer_lock", "fence=999999\npid=0\nts=0\n")
      assert(failing(root).keySet == Set("fence_coherent"), s"${failing(root)}")
      fs.delete(p(s"${root}_writer_lock"), false)
      // same signal from renamed-aside takeover debris — but debris is
      // ALSO flagged by no_recovery_debris, and a stale-mtime aside is
      // exactly what a crashed takeover leaves
      write(s"${root}_writer_lock_expired_1", "fence=999999\npid=0\nts=0\n")
      assert(failing(root).keySet == Set("fence_coherent", "no_recovery_debris"),
        s"${failing(root)}")
      fs.delete(p(s"${root}_writer_lock_expired_1"), false)
      assert(failing(root).isEmpty, s"${failing(root)}")
    } finally fs.delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("each crafted corruption flips exactly its own check") {
    val root = s"/tmp/graft_fsck_red_${System.nanoTime()}"
    def p(rel: String) = new org.apache.hadoop.fs.Path(rel)
    try {
      Ann.seedBaseIndex(s2, sf0001, root)

      // 1. recovery debris: a staged upsert nobody replayed
      fs.mkdirs(p(s"$root/_upsert_pending"))
      assert(failing(root).keySet == Set("no_recovery_debris"), s"${failing(root)}")
      fs.delete(p(s"$root/_upsert_pending"), true)

      // 2. stale writer lease = crashed writer
      val lock = p(s"${root}_writer_lock")
      fs.create(lock, false).close()
      assert(failing(root).isEmpty, "a FRESH lease is a live writer, not corruption")
      fs.setTimes(lock, 1000L, 1000L)
      assert(failing(root).keySet == Set("no_stale_writer_lease"))
      fs.delete(lock, false)

      // 3. manifest pinning a missing file
      val v = Ann.snapshotIndex(s2, root)
      val pinned = Ann.manifestFiles(s2, root, v).head
      val aside = p(pinned + ".aside")
      assert(fs.rename(p(pinned), aside))
      assert(failing(root).keySet == Set("manifests_resolve"))
      assert(fs.rename(aside, p(pinned)))

      // 4. duplicate live doc_id (a crashed merge / misused add)
      val dupId = s2.read.parquet(root).select($"doc_id").as[Long].head()
      Ann.addVectors(s2, root, corpus.filter($"vec_id" === dupId))
      assert(failing(root).keySet == Set("doc_id_unique"))
      Ann.deleteFromIndexAt(s2, root, col("doc_id") === dupId)
      Ann.compactIndexAt(s2, root) // reclaims both copies, clears tombstones
      // compaction rewrote pinned files and re-manifested: still green
      assert(failing(root).isEmpty, s"${failing(root)}")

      // 5. tombstone referencing an absent row
      Seq((999999999L, 0L)).toDF("doc_id", "centroid_id")
        .write.mode("append").parquet(s"$root/_tombstones")
      assert(failing(root).keySet == Set("tombstones_reference_live_rows"))
      fs.delete(p(s"$root/_tombstones"), true)

      // 6. graph edge to an absent doc
      Ann.buildGraphAt(s2, root)
      assert(failing(root).isEmpty, s"${failing(root)}")
      val src = s2.read.parquet(root).select($"doc_id").as[Long].head()
      Seq((src, 888888888L, 99.0)).toDF("src", "dst", "score")
        .write.mode("append").parquet(s"$root/_graph")
      assert(failing(root).keySet == Set("graph_endpoints_resolve"))

      // 7. a missing artifact is one loud check, not a crash
      val ghost = Ann.fsck(s2, s"$root-nonexistent")
      assert(ghost.map(c => (c.check, c.ok)) == Seq(("artifact_present", false)))
    } finally fs.delete(new org.apache.hadoop.fs.Path(root), true)
  }
}
