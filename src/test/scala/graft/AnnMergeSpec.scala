package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.operators.Ann

/** [[Ann.mergeIndexArtifacts]] failure-mode contract (ADVICE r10 + r11):
  * the merge is pure file-metadata motion, so its failure modes are all
  * about what a RETRY may and may not do.
  *
  *  - misuse retry (already-merged dest, fully drained shards): refuse
  *    loudly with dest untouched — clearing it would destroy the only
  *    copy of the data;
  *  - crashed mid-drain (some files renamed into dest, `_MERGE_STARTED`
  *    present, no `_SUCCESS`): RESUME — finish the remaining renames
  *    idempotently (deterministic `s<i>_` dest names; the glob only
  *    sees files still in the shards) and lose nothing, the partial
  *    state the full-drain precondition alone could not distinguish
  *    from a fresh merge;
  *  - missing quantizer sidecar on the head shard: refuse up front.
  */
class AnnMergeSpec extends SparkSpec {

  private val dim = 8

  private def unit(axis: Int): Array[Float] =
    Array.tabulate(dim)(i => if (i == axis) 1.0f else 0.0f)

  private def dvec(id: Long): Array[Float] = {
    val v = unit((id % 2).toInt)
    v(2 + (id % 3).toInt) = 0.2f + 0.01f * (id % 5)
    val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
    v.map(_ / n)
  }

  private val cents = Array(0L -> unit(0), 1L -> unit(1))

  private def mkShard(path: String, ids: Range): Unit = {
    import spark.implicits._
    Ann.writeIndexArtifact(spark, path,
      spark.createDataset(ids.map(i => (i.toLong, dvec(i.toLong), 0))), cents)
  }

  private def docIds(path: String): Seq[Long] = {
    import spark.implicits._
    spark.read.parquet(path).select(col("doc_id")).as[Long].collect().sorted.toSeq
  }

  test("crashed mid-drain merge RESUMES: remaining files move, nothing lost, shards drain") {
    val root = Files.createTempDirectory("graft_merge_resume").toString
    val (shardA, shardB, dest) = (s"$root/a", s"$root/b", s"$root/merged")
    mkShard(shardA, 0 until 50)
    mkShard(shardB, 50 until 100)

    // simulate the crash: dest created, marker written, HALF of shard
    // A's part files already renamed in under their deterministic names,
    // then the JVM died — no _SUCCESS
    new java.io.File(dest).mkdirs()
    new java.io.File(s"$dest/_MERGE_STARTED").createNewFile()
    val aParts = new java.io.File(shardA).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("centroid_id="))
      .flatMap(d => d.listFiles().filter(_.getName.startsWith("part-")).map(d.getName -> _))
    assert(aParts.length >= 2, s"fixture needs >=2 part files, got ${aParts.length}")
    val moved = aParts.take(aParts.length / 2)
    moved.foreach { case (cidDir, f) =>
      val destDir = new java.io.File(s"$dest/$cidDir")
      destDir.mkdirs()
      assert(f.renameTo(new java.io.File(destDir, s"s0_${f.getName}")))
    }

    // the retry must finish the drain, not clear dest (that would
    // destroy the already-moved half)
    Ann.mergeIndexArtifacts(spark, dest, Seq(shardA, shardB))

    assert(new java.io.File(s"$dest/_SUCCESS").exists())
    assert(!new java.io.File(s"$dest/_MERGE_STARTED").exists(), "marker must clear on success")
    assert(docIds(dest) == (0L until 100L).toSeq, "resumed merge lost or duplicated docs")
    assert(new java.io.File(s"$dest/_centroids").exists())
    Seq(shardA, shardB).foreach { sh =>
      val left = new java.io.File(sh).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("centroid_id="))
        .flatMap(d => d.listFiles().filter(_.getName.startsWith("part-")))
      assert(left.isEmpty, s"shard $sh not drained after resume: ${left.length} files left")
    }
  }

  test("misuse retry on drained shards refuses loudly with dest untouched") {
    val root = Files.createTempDirectory("graft_merge_misuse").toString
    val (shardA, shardB, dest) = (s"$root/a", s"$root/b", s"$root/merged")
    mkShard(shardA, 0 until 50)
    mkShard(shardB, 50 until 100)
    Ann.mergeIndexArtifacts(spark, dest, Seq(shardA, shardB))
    val before = docIds(dest)
    assert(before == (0L until 100L).toSeq)
    val e = intercept[IllegalArgumentException] {
      Ann.mergeIndexArtifacts(spark, dest, Seq(shardA, shardB))
    }
    assert(e.getMessage.contains("drained"), s"wrong refusal: ${e.getMessage}")
    assert(new java.io.File(s"$dest/_SUCCESS").exists())
    assert(docIds(dest) == before, "refused merge must leave dest untouched")
  }

  test("stale completed marker: drained inputs clean up, fresh shards refuse loudly") {
    val root = Files.createTempDirectory("graft_merge_stalemark").toString
    val (shardA, shardB, dest) = (s"$root/a", s"$root/b", s"$root/merged")
    mkShard(shardA, 0 until 50)
    mkShard(shardB, 50 until 100)
    Ann.mergeIndexArtifacts(spark, dest, Seq(shardA, shardB))
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$dest/_MERGE_STARTED")
    // recreate the crash: the merge COMPLETED (_SUCCESS exists) but the
    // JVM died between creating _SUCCESS and deleting its marker
    fs.create(marker, true).close()

    // a retry with the same (now drained) inputs is the completed
    // merge's own cleanup: delete the marker, change nothing
    val before = docIds(dest)
    Ann.mergeIndexArtifacts(spark, dest, Seq(shardA, shardB))
    assert(!fs.exists(marker), "stale marker must be cleaned")
    assert(docIds(dest) == before, "cleanup retry must not touch dest")

    // but a NEW merge request (fresh shards still holding data) under
    // the same stale marker must not silently no-op (ADVICE r12): the
    // caller would be told success with nothing merged
    fs.create(marker, true).close()
    val shardC = s"$root/c"
    mkShard(shardC, 100 until 150)
    val e = intercept[IllegalArgumentException] {
      Ann.mergeIndexArtifacts(spark, dest, Seq(shardC))
    }
    assert(e.getMessage.contains("still hold data"), s"wrong refusal: ${e.getMessage}")
    assert(docIds(shardC) == (100L until 150L).toSeq, "refusal must leave the shard untouched")
    assert(docIds(dest) == before, "refusal must leave dest untouched")
  }

  test("missing head-shard quantizer sidecar refuses up front") {
    val root = Files.createTempDirectory("graft_merge_nocents").toString
    val (shardA, shardB, dest) = (s"$root/a", s"$root/b", s"$root/merged")
    mkShard(shardA, 0 until 50)
    mkShard(shardB, 50 until 100)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(s"$shardA/_centroids"))
    val e = intercept[IllegalArgumentException] {
      Ann.mergeIndexArtifacts(spark, dest, Seq(shardA, shardB))
    }
    assert(e.getMessage.contains("_centroids"))
    assert(docIds(shardA) == (0L until 50L).toSeq, "refusal must leave the shard untouched")
  }
}
