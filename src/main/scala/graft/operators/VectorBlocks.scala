package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Columnar block layout for the vector-search THROUGHPUT path.
  *
  * [[BruteForce.topK]] streams `Dataset[(Long, Array[Float])]` rows: every
  * timed pass over a cached corpus re-decodes 1M Tungsten rows into boxed
  * tuples and allocates 1M fresh Array[Float]s (~1.5 GB of churn at
  * 1M × 384) before a single FLOP runs. This module packs the corpus ONCE
  * into a handful of flat primitive blocks per partition and caches the
  * RDD deserialized (MEMORY_ONLY keeps live JVM objects), so a search pass
  * touches plain `Array[Float]`/`Array[Long]` with zero per-row decode —
  * the same trick Tungsten's columnar cache plays, applied to the custom
  * kernel.
  *
  * The dot-product loop also runs FOUR independent accumulators: the
  * single-accumulator form is a loop-carried dependency chain limited to
  * one FP add per ~4-cycle latency; 4-way unrolling keeps the FPU pipeline
  * full. The summation order is deterministic but differs from the
  * array-order HOF/DuckDB form, so this kernel is the THROUGHPUT path
  * ([[graft.KernelBench]]); registry queries that must hash-match the
  * DuckDB oracle keep [[BruteForce.topK]]'s array-order accumulation.
  * (On unit-norm float inputs the two differ by ≲1e-13 relative — the
  * test suite asserts the retrieved sets agree on the fixtures.)
  *
  * 100 TB design: blocks stay partition-local (narrow map from the source
  * scan — no shuffle to build), each task emits at most q×k candidate rows
  * exactly like the row kernel, and block size bounds task memory at
  * `BlockRows × dim` floats regardless of partition size.
  */
object VectorBlocks {

  /** Rows per packed block: 4096 × 384 dims × 4 B ≈ 6 MB — large enough to
    * amortize block overhead, small enough to bound packing memory for
    * skinny partitions. */
  val BlockRows = 4096

  /** One packed block: ids/centroid-ids parallel to `dim`-strided rows of
    * `data` (row i occupies data[i*dim, (i+1)*dim)). `cids` is empty for
    * non-indexed corpora. */
  final case class Block(ids: Array[Long], cids: Array[Int], dim: Int, data: Array[Float])

  /** Pack (id, vec) rows into blocks — one narrow pass, no shuffle. */
  def pack(corpus: Dataset[(Long, Array[Float])], dim: Int): RDD[Block] =
    corpus.rdd.mapPartitions(rows => packIter(rows.map { case (id, v) => (id, -1, v) }, dim, withCids = false))

  /** Pack (id, centroidId, vec) rows — the IVF-indexed corpus. */
  def packIndexed(corpus: Dataset[(Long, Int, Array[Float])], dim: Int): RDD[Block] =
    corpus.rdd.mapPartitions(rows => packIter(rows, dim, withCids = true))

  private def packIter(
      rows: Iterator[(Long, Int, Array[Float])],
      dim: Int,
      withCids: Boolean): Iterator[Block] = new Iterator[Block] {
    override def hasNext: Boolean = rows.hasNext
    override def next(): Block = {
      val ids = new Array[Long](BlockRows)
      val cids = if (withCids) new Array[Int](BlockRows) else null
      val data = new Array[Float](BlockRows * dim)
      var n = 0
      while (n < BlockRows && rows.hasNext) {
        val (id, cid, v) = rows.next()
        require(v.length == dim, s"vector $id has dim ${v.length}, expected $dim")
        ids(n) = id
        if (withCids) cids(n) = cid
        System.arraycopy(v, 0, data, n * dim, dim)
        n += 1
      }
      if (n == BlockRows) Block(ids, if (withCids) cids else Array.emptyIntArray, dim, data)
      else Block(
        java.util.Arrays.copyOf(ids, n),
        if (withCids) java.util.Arrays.copyOf(cids, n) else Array.emptyIntArray,
        dim,
        java.util.Arrays.copyOf(data, n * dim))
    }
  }

  /** Nearest-centroid assignment over packed blocks (the IVF build step
    * at throughput scale): one narrow pass filling `cids`, no shuffle —
    * the block analog of [[BruteForce.assign]]. Ties to the smallest
    * centroid index. */
  def assign(blocks: RDD[Block], centroids: Array[Array[Float]]): RDD[Block] = {
    val bc = blocks.sparkContext.broadcast(centroids)
    blocks.map { b =>
      val cents = bc.value
      val n = b.ids.length
      val dim = b.dim
      val cids = new Array[Int](n)
      var r = 0
      while (r < n) {
        val off = r * dim
        var best = 0
        var bestS = Double.NegativeInfinity
        var c = 0
        while (c < cents.length) {
          val s = dotRow(cents(c), b.data, off, dim)
          if (s > bestS) { bestS = s; best = c }
          c += 1
        }
        cids(r) = best
        r += 1
      }
      Block(b.ids, cids, dim, b.data)
    }
  }

  /** 4-way-unrolled dot of query `q` against row `r` of `data`.
    * `private[operators]` so [[ColdScan]] scores with the IDENTICAL
    * summation order — its float-tier equality gate vs [[bfSearch]]
    * needs bit-equal doubles, not just mathematically-equal ones. */
  @inline private[operators] def dotRow(q: Array[Float], data: Array[Float], off: Int, dim: Int): Double = {
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var i = 0
    val lim = dim - 3
    while (i < lim) {
      s0 += q(i).toDouble * data(off + i).toDouble
      s1 += q(i + 1).toDouble * data(off + i + 1).toDouble
      s2 += q(i + 2).toDouble * data(off + i + 2).toDouble
      s3 += q(i + 3).toDouble * data(off + i + 3).toDouble
      i += 4
    }
    while (i < dim) { s0 += q(i).toDouble * data(off + i).toDouble; i += 1 }
    s0 + s1 + s2 + s3
  }

  /** Brute-force top-k over packed blocks. Same contract as
    * [[BruteForce.topK]]: (query_id, doc_id, score, rnk), ties id-asc. */
  def topK(
      spark: SparkSession,
      blocks: RDD[Block],
      queries: Array[(Long, Array[Float])],
      k: Int,
      excludeSelf: Boolean): DataFrame = {
    val bc = spark.sparkContext.broadcast(queries)
    val candidates = blocks.mapPartitions { bs =>
      val qs = bc.value
      val nq = qs.length
      val qids = new Array[Long](nq)
      val qvecs = new Array[Array[Float]](nq)
      var t = 0
      while (t < nq) { qids(t) = qs(t)._1; qvecs(t) = qs(t)._2; t += 1 }
      val heaps = Array.fill(nq)(new graft.functions.TopKAgg.Heap(k))
      bs.foreach { b =>
        val n = b.ids.length
        val dim = b.dim
        var r = 0
        while (r < n) {
          val off = r * dim
          val docId = b.ids(r)
          var qi = 0
          while (qi < nq) {
            if (!(excludeSelf && qids(qi) == docId)) {
              heaps(qi).offer(dotRow(qvecs(qi), b.data, off, dim), docId)
            }
            qi += 1
          }
          r += 1
        }
      }
      emit(qids, heaps)
    }
    rerank(spark, candidates, k)
  }

  /** IVF-probed top-k over packed indexed blocks: per centroid, only the
    * queries probing it are scored (precomputed query lists — no per-pair
    * mask test), ~nProbe/C of all pairs. */
  def topKProbed(
      spark: SparkSession,
      blocks: RDD[Block],
      queries: Array[(Long, Array[Float])],
      probes: Array[Array[Boolean]],
      k: Int): DataFrame = {
    val nCentroids = if (probes.isEmpty) 0 else probes(0).length
    // invert the mask: centroid -> array of probing query indices
    val byCid: Array[Array[Int]] = Array.tabulate(nCentroids) { c =>
      (0 until probes.length).filter(qi => probes(qi)(c)).toArray
    }
    val bcQ = spark.sparkContext.broadcast(queries)
    val bcByCid = spark.sparkContext.broadcast(byCid)
    val candidates = blocks.mapPartitions { bs =>
      val qs = bcQ.value
      val cidQ = bcByCid.value
      val nq = qs.length
      val qids = new Array[Long](nq)
      val qvecs = new Array[Array[Float]](nq)
      var t = 0
      while (t < nq) { qids(t) = qs(t)._1; qvecs(t) = qs(t)._2; t += 1 }
      val heaps = Array.fill(nq)(new graft.functions.TopKAgg.Heap(k))
      bs.foreach { b =>
        val n = b.ids.length
        val dim = b.dim
        var r = 0
        while (r < n) {
          val off = r * dim
          val docId = b.ids(r)
          val qlist = cidQ(b.cids(r))
          var j = 0
          while (j < qlist.length) {
            val qi = qlist(j)
            heaps(qi).offer(dotRow(qvecs(qi), b.data, off, dim), docId)
            j += 1
          }
          r += 1
        }
      }
      emit(qids, heaps)
    }
    rerank(spark, candidates, k)
  }

  /** FUSED single-job exact search over the float blocks: the same
    * per-partition bounded heaps as [[topK]] but finished with a
    * [[QRun]] treeAggregate merge instead of the DataFrame rerank — one
    * job, zero shuffle, the driver receives q × k rows.
    *
    * Why it exists: the timed bench passes measured that at q = 100 the
    * DataFrame tail (candidate RDD → groupBy TopKAgg → posexplode →
    * collect, a second job with a q·k·P-row shuffle) costs a FIXED
    * ~0.5 s/pass regardless of scan cost — it dominated the IVF leg
    * (whose probed scan is ~8× cheaper than brute force but whose
    * published speedup sat at 1.6–2.9×) and inflated brute force
    * itself. The compressed kernels ([[ivfpqSearch]]/[[ivfsqSearch]])
    * never had this tail; this gives the two float legs the same
    * single-job contract so the published ladder compares scans, not
    * harness overhead. Row-for-row equal to [[topK]] (same dots, same
    * (score desc, id asc) order) — pinned in VectorBlocksSpec.
    *
    * @return per query (input order): exact top-k doc ids, rank order
    */
  def bfSearch(
      blocks: RDD[Block],
      queries: Array[(Long, Array[Float])],
      k: Int,
      excludeSelf: Boolean): Array[Array[Long]] =
    fusedFloatSearch(blocks, queries, None, k, excludeSelf)

  /** FUSED single-job IVF-probed exact search (IVFFlat): [[topKProbed]]'s
    * per-centroid query lists over the assigned float blocks, finished
    * with the [[QRun]] merge — see [[bfSearch]] for why the DataFrame
    * tail is bypassed. Row-for-row equal to [[topKProbed]]. */
  def ivfFlatSearch(
      indexed: RDD[Block],
      queries: Array[(Long, Array[Float])],
      probes: Array[Array[Boolean]],
      k: Int): Array[Array[Long]] =
    fusedFloatSearch(indexed, queries, Some(probes), k, excludeSelf = false)

  private def fusedFloatSearch(
      blocks: RDD[Block],
      queries: Array[(Long, Array[Float])],
      probes: Option[Array[Array[Boolean]]],
      k: Int,
      excludeSelf: Boolean): Array[Array[Long]] = {
    val byCid: Array[Array[Int]] = probes match {
      case Some(p) =>
        val nCentroids = if (p.isEmpty) 0 else p(0).length
        Array.tabulate(nCentroids)(c => (0 until p.length).filter(qi => p(qi)(c)).toArray)
      case None => null
    }
    val sc = blocks.sparkContext
    val bcQ = sc.broadcast(queries)
    val bcByCid = sc.broadcast(byCid)
    val perPartition: RDD[Array[QRun]] = blocks.mapPartitions { bs =>
      val qs = bcQ.value
      val cidQ = bcByCid.value
      val nq = qs.length
      val qids = new Array[Long](nq)
      val qvecs = new Array[Array[Float]](nq)
      var t = 0
      while (t < nq) { qids(t) = qs(t)._1; qvecs(t) = qs(t)._2; t += 1 }
      val all = Array.range(0, nq)
      val heaps = Array.fill(nq)(new graft.functions.TopKAgg.Heap(k))
      bs.foreach { b =>
        val n = b.ids.length
        val dim = b.dim
        var r = 0
        while (r < n) {
          val off = r * dim
          val docId = b.ids(r)
          val qlist = if (cidQ == null) all else cidQ(b.cids(r))
          var j = 0
          while (j < qlist.length) {
            val qi = qlist(j)
            if (!(excludeSelf && qids(qi) == docId)) {
              heaps(qi).offer(dotRow(qvecs(qi), b.data, off, dim), docId)
            }
            j += 1
          }
          r += 1
        }
      }
      Iterator.single(Array.tabulate(nq) { qi =>
        val sorted = heaps(qi).sortedDesc()
        QRun(sorted.map(_._1), sorted.map(_._2))
      })
    }
    val zero = Array.fill(queries.length)(QRun(Array.emptyDoubleArray, Array.emptyLongArray))
    val mergeRuns = (a: Array[QRun], b: Array[QRun]) =>
      Array.tabulate(a.length)(qi => QRun.merge(a(qi), b(qi), k))
    perPartition.treeAggregate(zero)(mergeRuns, mergeRuns).map(_.ids)
  }

  /** PQ code block: row i's M subspace code indices occupy
    * `codes[i*m, (i+1)*m)` (unsigned bytes — codebooks cap at 256). At
    * 384 dims this is 48 B/row vs 1536 B raw: the ADC scan reads a corpus
    * 32× smaller than the float blocks. `cids` (empty for non-indexed
    * corpora) carries the IVF assignment so ADC can compose with probe
    * pruning — the FAISS IVF+PQ layout. */
  final case class CodeBlock(ids: Array[Long], cids: Array[Int], m: Int, codes: Array[Byte])

  /** PQ encode over packed blocks: per row and subspace, the index of the
    * nearest codebook entry by L2² (ties → lowest index). One narrow
    * broadcast pass, no shuffle — the block analog of
    * [[Pq.encode]]. Codebook entries are FULL vectors; subspace mi of
    * entry j is its `[mi*subDim, (mi+1)*subDim)` slice. */
  def encodePq(
      blocks: RDD[Block],
      codebook: Array[Array[Float]],
      subDim: Int): RDD[CodeBlock] = {
    require(codebook.length <= 256, s"PQ codebook capped at 256 entries, got ${codebook.length}")
    val bc = blocks.sparkContext.broadcast(codebook)
    blocks.map { b =>
      val cb = bc.value
      val dim = b.dim
      val m = dim / subDim
      val n = b.ids.length
      val codes = new Array[Byte](n * m)
      var r = 0
      while (r < n) {
        val off = r * dim
        var mi = 0
        while (mi < m) {
          val soff = mi * subDim
          var best = 0
          var bestD = Double.MaxValue
          var j = 0
          while (j < cb.length) {
            val cv = cb(j)
            var dd = 0.0
            var i = 0
            while (i < subDim) {
              val diff = b.data(off + soff + i).toDouble - cv(soff + i).toDouble
              dd += diff * diff
              i += 1
            }
            if (dd < bestD) { bestD = dd; best = j }
            j += 1
          }
          codes(r * m + mi) = (best & 0xFF).toByte
          mi += 1
        }
        r += 1
      }
      CodeBlock(b.ids, b.cids, m, codes)
    }
  }

  /** ADC top-r candidate pass over code blocks. The lookup table is
    * TRANSPOSED — `lut((mi*|cb| + code) * nq + q)` — so the inner loop
    * accumulates one (subspace, code) row across ALL queries with
    * stride-1 access instead of scattering per query. Scores are
    * approximate (dot of query with the PQ reconstruction); callers
    * rescore exactly. Emits ≤ p×q×r rows. */
  def adcCandidates(
      spark: SparkSession,
      codeBlocks: RDD[CodeBlock],
      codebook: Array[Array[Float]],
      subDim: Int,
      queries: Array[(Long, Array[Float])],
      r: Int): RDD[(Long, Long, Double)] = {
    val bcC = spark.sparkContext.broadcast(codebook)
    val bcQ = spark.sparkContext.broadcast(queries)
    codeBlocks.mapPartitions { bs =>
      val cb = bcC.value
      val qs = bcQ.value
      val nq = qs.length
      if (nq == 0) Iterator.empty
      else {
        val dim = qs(0)._2.length
        val m = dim / subDim
        val nCb = cb.length
        // transposed LUT: entry ((mi*nCb + j)*nq + q) = dot(q_sub, cb_j_sub)
        val lut = new Array[Double](m * nCb * nq)
        var mi = 0
        while (mi < m) {
          var j = 0
          while (j < nCb) {
            val cv = cb(j)
            var q = 0
            while (q < nq) {
              val qv = qs(q)._2
              var s = 0.0
              var i = 0
              while (i < subDim) {
                s += qv(mi * subDim + i).toDouble * cv(mi * subDim + i).toDouble
                i += 1
              }
              lut((mi * nCb + j) * nq + q) = s
              q += 1
            }
            j += 1
          }
          mi += 1
        }
        val heaps = Array.fill(nq)(new graft.functions.TopKAgg.Heap(r))
        val acc = new Array[Double](nq)
        bs.foreach { b =>
          val n = b.ids.length
          var row = 0
          while (row < n) {
            java.util.Arrays.fill(acc, 0.0)
            var s = 0
            while (s < m) {
              val code = b.codes(row * m + s) & 0xFF
              val base = (s * nCb + code) * nq
              var q = 0
              while (q < nq) { acc(q) += lut(base + q); q += 1 }
              s += 1
            }
            val docId = b.ids(row)
            var q = 0
            while (q < nq) {
              if (qs(q)._1 != docId) heaps(q).offer(acc(q), docId)
              q += 1
            }
            row += 1
          }
        }
        Iterator.range(0, nq).flatMap { q =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          heaps(q).foreach((s, id) => out += ((qs(q)._1, id, s)))
          out.iterator
        }
      }
    }
  }

  /** RESIDUAL PQ encode over packed INDEXED blocks — the FAISS IVFPQ
    * layout: each row quantizes `v − centroid(cid)`, not `v` itself, so
    * the whole codebook's resolution is spent on the within-list residual
    * (the part that actually ranks candidates inside a probed list)
    * instead of being spread across the coarse structure the IVF
    * assignment already captured. Decode side: `v ≈ centroid(cid) + r̂`,
    * so `dot(q,v) ≈ dot(q,centroid) + dot(q,r̂)` — the first term is a
    * tiny per-(query,centroid) table, the second is the usual ADC LUT
    * sum. One narrow broadcast pass, no shuffle. */
  def encodePqResidual(
      blocks: RDD[Block],
      centroids: Array[Array[Float]],
      codebook: Array[Array[Float]],
      subDim: Int): RDD[CodeBlock] = {
    require(codebook.length <= 256, s"PQ codebook capped at 256 entries, got ${codebook.length}")
    val bcCent = blocks.sparkContext.broadcast(centroids)
    val bc = blocks.sparkContext.broadcast(codebook)
    blocks.map { b =>
      val cents = bcCent.value
      val cb = bc.value
      val dim = b.dim
      val m = dim / subDim
      val n = b.ids.length
      val codes = new Array[Byte](n * m)
      val resid = new Array[Float](dim)
      var r = 0
      while (r < n) {
        val off = r * dim
        val cent = cents(b.cids(r))
        var i = 0
        while (i < dim) { resid(i) = b.data(off + i) - cent(i); i += 1 }
        var mi = 0
        while (mi < m) {
          val soff = mi * subDim
          var best = 0
          var bestD = Double.MaxValue
          var j = 0
          while (j < cb.length) {
            val cv = cb(j)
            var dd = 0.0
            var i2 = 0
            while (i2 < subDim) {
              val diff = resid(soff + i2).toDouble - cv(soff + i2).toDouble
              dd += diff * diff
              i2 += 1
            }
            if (dd < bestD) { bestD = dd; best = j }
            j += 1
          }
          codes(r * m + mi) = (best & 0xFF).toByte
          mi += 1
        }
        r += 1
      }
      CodeBlock(b.ids, b.cids, m, codes)
    }
  }


  /** One partition's IVFPQ index: rows bucketed by centroid — RAW code
    * bytes (`cidCodes`, row-major `m` per row) plus a locator back into
    * the partition's float blocks for the exact rescore. Built ONCE and
    * cached — search passes do pure scoring. `fblocks` holds REFERENCES
    * to the cached float Block objects, not copies.
    *
    * r7 stored precomputed 4-byte INT LUT offsets per code (`s*nCb +
    * code`), inflating the scan payload to 384 B/row at m=96 — 4× the
    * raw codes and only 4× under the 1536 B float rows it is supposed to
    * beat; the ADC pass was memory-bound and IVFPQ ran no faster than
    * exact scan (VERDICT r7 wrong #1). Raw bytes keep the scan at
    * `m` B/row; the `s*nCb + code` add is free next to the gather it
    * feeds. */
  final case class PqPartIndex(
      fblocks: Array[Block],
      cidLoc: Array[Array[Long]], // blk<<32 | row
      cidCodes: Array[Array[Byte]], // row-major m raw codes per centroid
      m: Int,
      nCb: Int)

  /** Build the partition-local IVFPQ index over `indexed.zip(encoded)`
    * (1:1 by construction — encode is a narrow map — so zip is
    * partition-local, no shuffle). Caller caches the result. */
  def buildPqIndex(
      indexed: RDD[Block],
      encoded: RDD[CodeBlock],
      nCid: Int,
      nCb: Int,
      subDim: Int): RDD[PqPartIndex] =
    indexed.zip(encoded).mapPartitions { pairs =>
      val fblocks = scala.collection.mutable.ArrayBuffer.empty[Block]
      val cblocks = scala.collection.mutable.ArrayBuffer.empty[CodeBlock]
      pairs.foreach { case (f, c) => fblocks += f; cblocks += c }
      if (cblocks.isEmpty) Iterator.empty
      else {
        val m = cblocks.head.m
        val cnt = new Array[Int](nCid)
        cblocks.foreach { cb2 =>
          var row = 0
          while (row < cb2.ids.length) { cnt(cb2.cids(row)) += 1; row += 1 }
        }
        val cidLoc = Array.tabulate(nCid)(c => new Array[Long](cnt(c)))
        val cidCodes = Array.tabulate(nCid)(c => new Array[Byte](cnt(c) * m))
        val fill = new Array[Int](nCid)
        var blk = 0
        cblocks.foreach { cb2 =>
          val n = cb2.ids.length
          var row = 0
          while (row < n) {
            val cid = cb2.cids(row)
            val at = fill(cid)
            cidLoc(cid)(at) = (blk.toLong << 32) | row.toLong
            System.arraycopy(cb2.codes, row * m, cidCodes(cid), at * m, m)
            fill(cid) = at + 1
            row += 1
          }
          blk += 1
        }
        Iterator.single(PqPartIndex(fblocks.toArray, cidLoc, cidCodes, m, nCb))
      }
    }

  /** FUSED single-job IVFPQ search over a prebuilt [[PqPartIndex]] RDD.
    * Per partition: CENTROID-outer ADC — each probed centroid's raw code
    * bytes are streamed ONCE while its probing queries (precomputed
    * inverted lists, in groups of 4 sharing every code load) accumulate
    * LUT sums into per-query top-`rCand` heaps; candidates are then
    * rescored with exact dots against the partition's OWN float blocks,
    * and only the exact top-`k` per query leaves the partition; a
    * treeAggregate merge yields the global answer. One job, zero
    * shuffle, driver receives q × k rows.
    *
    * r7's query-outer loop re-streamed each code row once PER PROBING
    * QUERY (~nProbe·q/C ≈ 12.5× at bench scale) over the 4-byte offset
    * layout — ~4.8 GB of traffic per pass vs the 1.5 GB float corpus
    * the compressed path exists to undercut. Centroid-outer over raw
    * bytes reads m B/row once: ~96 MB/pass at 1M×384, a 16× traffic
    * advantage that finally shows up as throughput.
    *
    * The per-query LUTs are computed ONCE on the driver as FLOATS
    * (m × nCb = 96 KB/query — L2-resident; selection-only precision,
    * every surviving candidate is rescored with exact double dots) and
    * broadcast — one copy per executor JVM.
    *
    * vs a two-job form (global ADC trim → broadcast → rescore pass):
    * no second scan of the float cache, no driver roundtrip between
    * stages, and the per-PARTITION rCand trim rescores a SUPERSET of the
    * global ADC top-rCand — recall can only improve.
    *
    * @return per query (input order): exact-scored top-k doc ids
    */
  def ivfpqSearch(
      index: RDD[PqPartIndex],
      centroids: Array[Array[Float]],
      codebook: Array[Array[Float]],
      subDim: Int,
      queries: Array[(Long, Array[Float])],
      probes: Array[Array[Boolean]],
      rCand: Int,
      k: Int): Array[Array[Long]] = {
    val qcDot: Array[Array[Double]] = Array.tabulate(queries.length) { qi =>
      val qv = queries(qi)._2
      Array.tabulate(centroids.length) { c =>
        val cv = centroids(c)
        var s = 0.0
        var i = 0
        while (i < qv.length) { s += qv(i).toDouble * cv(i).toDouble; i += 1 }
        s
      }
    }
    val dim = if (queries.isEmpty) 0 else queries(0)._2.length
    val m = dim / subDim
    val nCb = codebook.length
    // driver-side float LUTs: lut(q)(mi*nCb + j) = dot(q subspace mi, cw j)
    val lut = Array.ofDim[Float](queries.length, m * nCb)
    var q = 0
    while (q < queries.length) {
      val qv = queries(q)._2
      var mi = 0
      while (mi < m) {
        var j = 0
        while (j < nCb) {
          val cv = codebook(j)
          var s = 0.0
          var i = 0
          while (i < subDim) {
            s += qv(mi * subDim + i).toDouble * cv(mi * subDim + i).toDouble
            i += 1
          }
          lut(q)(mi * nCb + j) = s.toFloat
          j += 1
        }
        mi += 1
      }
      q += 1
    }
    // inverted probe lists: centroid -> the query indices probing it —
    // the structure that makes the centroid-outer scan possible
    val nCid = centroids.length
    val byCid: Array[Array[Int]] = Array.tabulate(nCid) { c =>
      (0 until probes.length).filter(qi => probes(qi)(c)).toArray
    }
    val sc = index.sparkContext
    val bcQ = sc.broadcast(queries)
    val bcByCid = sc.broadcast(byCid)
    val bcQc = sc.broadcast(qcDot)
    val bcLut = sc.broadcast(lut)
    val perPartition: RDD[Array[QRun]] = index.mapPartitions { parts =>
      val qs = bcQ.value
      val cidQ = bcByCid.value
      val qc = bcQc.value
      val luts = bcLut.value
      val nq = qs.length
      parts.map { px =>
        val mm = px.m
        val adc = Array.fill(nq)(new graft.functions.TopKAgg.Heap(rCand))
        var cid = 0
        while (cid < cidQ.length) {
          val qlist = cidQ(cid)
          val locs = px.cidLoc(cid)
          val nRows = locs.length
          if (qlist.length > 0 && nRows > 0) {
            val codes = px.cidCodes(cid)
            // groups of 4 queries share every code load + index compute;
            // 4 independent accumulator chains keep the FPU pipeline full
            var g = 0
            val glim = qlist.length - 3
            while (g < glim) {
              val q0 = qlist(g); val q1 = qlist(g + 1)
              val q2 = qlist(g + 2); val q3 = qlist(g + 3)
              val l0 = luts(q0); val l1 = luts(q1)
              val l2 = luts(q2); val l3 = luts(q3)
              val h0 = adc(q0); val h1 = adc(q1)
              val h2 = adc(q2); val h3 = adc(q3)
              val b0 = qc(q0)(cid); val b1 = qc(q1)(cid)
              val b2 = qc(q2)(cid); val b3 = qc(q3)(cid)
              var row = 0
              while (row < nRows) {
                val ro = row * mm
                var a0 = 0f; var a1 = 0f; var a2 = 0f; var a3 = 0f
                var t = 0
                while (t < mm) {
                  val idx = t * nCb + (codes(ro + t) & 0xFF)
                  a0 += l0(idx); a1 += l1(idx); a2 += l2(idx); a3 += l3(idx)
                  t += 1
                }
                val loc = locs(row)
                h0.offer(b0 + a0, loc); h1.offer(b1 + a1, loc)
                h2.offer(b2 + a2, loc); h3.offer(b3 + a3, loc)
                row += 1
              }
              g += 4
            }
            while (g < qlist.length) {
              val qi = qlist(g)
              val lq = luts(qi)
              val h = adc(qi)
              val base = qc(qi)(cid)
              var row = 0
              while (row < nRows) {
                val ro = row * mm
                var a = 0f
                var t = 0
                while (t < mm) { a += lq(t * nCb + (codes(ro + t) & 0xFF)); t += 1 }
                h.offer(base + a, locs(row))
                row += 1
              }
              g += 1
            }
          }
          cid += 1
        }
        Array.tabulate(nq) { qi =>
          val qv = qs(qi)._2
          val exact = new graft.functions.TopKAgg.Heap(k)
          adc(qi).foreach { (_, loc) =>
            val b = px.fblocks((loc >>> 32).toInt)
            val row = (loc & 0xFFFFFFFFL).toInt
            exact.offer(dotRow(qv, b.data, row * b.dim, b.dim), b.ids(row))
          }
          val sorted = exact.sortedDesc()
          QRun(sorted.map(_._1), sorted.map(_._2))
        }
      }
    }
    // treeAggregate with a neutral zero, not treeReduce — an index RDD
    // whose partitions are ALL empty would make treeReduce throw
    val zero = Array.fill(queries.length)(QRun(Array.emptyDoubleArray, Array.emptyLongArray))
    val mergeRuns = (a: Array[QRun], b: Array[QRun]) =>
      Array.tabulate(a.length)(qi => QRun.merge(a(qi), b(qi), k))
    val merged = perPartition.treeAggregate(zero)(mergeRuns, mergeRuns)
    merged.map(_.ids)
  }

  // ------------------------------------------------------------- SQ8
  /** Per-dimension [lo, hi] bounds over packed blocks — the SQ8 train
    * step ([[Sq]]) at throughput scale: per-partition partial arrays,
    * driver-combined. One narrow pass, exact on any partitioning. */
  def trainSqBounds(blocks: RDD[Block]): (Array[Double], Array[Double]) = {
    val partials = blocks.mapPartitions { bs =>
      var lo: Array[Double] = null
      var hi: Array[Double] = null
      bs.foreach { b =>
        val dim = b.dim
        if (lo == null) {
          lo = Array.fill(dim)(Double.PositiveInfinity)
          hi = Array.fill(dim)(Double.NegativeInfinity)
        }
        val total = b.ids.length * dim
        var p = 0
        while (p < total) {
          val x = b.data(p).toDouble
          val i = p % dim
          if (x < lo(i)) lo(i) = x
          if (x > hi(i)) hi(i) = x
          p += 1
        }
      }
      if (lo == null) Iterator.empty else Iterator.single((lo, hi))
    }.collect()
    require(partials.nonEmpty, "SQ8 bounds require a non-empty corpus")
    val dim = partials(0)._1.length
    val lo = Array.fill(dim)(Double.PositiveInfinity)
    val hi = Array.fill(dim)(Double.NegativeInfinity)
    partials.foreach { case (plo, phi) =>
      var i = 0
      while (i < dim) {
        if (plo(i) < lo(i)) lo(i) = plo(i)
        if (phi(i) > hi(i)) hi(i) = phi(i)
        i += 1
      }
    }
    (lo, hi)
  }

  /** SQ8 encode over packed (indexed) blocks: one byte per dimension
    * against the trained bounds — 4× compression (384 B/doc at 384 dims
    * vs 1536 raw, vs PQ's 96). Emits [[CodeBlock]]s with m = dim; cids
    * ride along so the scan composes with IVF probe pruning. One narrow
    * broadcast pass, no shuffle. */
  def encodeSq(blocks: RDD[Block], lo: Array[Double], hi: Array[Double]): RDD[CodeBlock] = {
    val bcLo = blocks.sparkContext.broadcast(lo)
    val bcStep = blocks.sparkContext.broadcast(Sq.steps(lo, hi))
    blocks.map { b =>
      val l = bcLo.value
      val st = bcStep.value
      val dim = b.dim
      val n = b.ids.length
      val codes = new Array[Byte](n * dim)
      var p = 0
      val total = n * dim
      while (p < total) {
        codes(p) = Sq.encodeComponent(b.data(p).toDouble, l(p % dim), st(p % dim)).toByte
        p += 1
      }
      CodeBlock(b.ids, b.cids, dim, codes)
    }
  }

  /** FUSED single-job IVF+SQ8 search over a prebuilt [[PqPartIndex]]
    * built from [[encodeSq]] code blocks (m = dim, nCb unused): the
    * [[ivfpqSearch]] centroid-outer shape with the ADC gather replaced
    * by a dense byte multiply-accumulate — per query the decode folds to
    * `qlo + Σ wᵢ·codeᵢ` with `wᵢ = qᵢ·stepᵢ` and `qlo = Σ qᵢ·loᵢ`
    * precomputed driver-side, so the scan reads dim B/row (4× less
    * traffic than the float corpus) with zero per-row allocation.
    * Candidates rescore exactly against the partition's own float
    * blocks; only q × k rows leave each partition.
    *
    * @return per query (input order): exact-scored top-k doc ids
    */
  def ivfsqSearch(
      index: RDD[PqPartIndex],
      lo: Array[Double],
      hi: Array[Double],
      queries: Array[(Long, Array[Float])],
      probes: Array[Array[Boolean]],
      rCand: Int,
      k: Int): Array[Array[Long]] = {
    val dim = if (queries.isEmpty) 0 else queries(0)._2.length
    val st = Sq.steps(lo, hi)
    // per-query decode folded into (weights, offset): selection-only
    // float precision, every survivor is rescored with exact doubles
    val w = Array.ofDim[Float](queries.length, dim)
    val qlo = new Array[Float](queries.length)
    var q = 0
    while (q < queries.length) {
      val qv = queries(q)._2
      var s = 0.0
      var i = 0
      while (i < dim) {
        w(q)(i) = (qv(i).toDouble * st(i)).toFloat
        s += qv(i).toDouble * lo(i)
        i += 1
      }
      qlo(q) = s.toFloat
      q += 1
    }
    val nCid = if (probes.isEmpty) 0 else probes(0).length
    val byCid: Array[Array[Int]] = Array.tabulate(nCid) { c =>
      (0 until probes.length).filter(qi => probes(qi)(c)).toArray
    }
    val sc = index.sparkContext
    val bcQ = sc.broadcast(queries)
    val bcByCid = sc.broadcast(byCid)
    val bcW = sc.broadcast(w)
    val bcQlo = sc.broadcast(qlo)
    val perPartition: RDD[Array[QRun]] = index.mapPartitions { parts =>
      val qs = bcQ.value
      val cidQ = bcByCid.value
      val ws = bcW.value
      val qlos = bcQlo.value
      val nq = qs.length
      parts.map { px =>
        val d = px.m // m == dim for SQ code blocks
        val adc = Array.fill(nq)(new graft.functions.TopKAgg.Heap(rCand))
        var cid = 0
        while (cid < cidQ.length) {
          val qlist = cidQ(cid)
          val locs = px.cidLoc(cid)
          val nRows = locs.length
          if (qlist.length > 0 && nRows > 0) {
            val codes = px.cidCodes(cid)
            var g = 0
            val glim = qlist.length - 3
            while (g < glim) {
              val q0 = qlist(g); val q1 = qlist(g + 1)
              val q2 = qlist(g + 2); val q3 = qlist(g + 3)
              val w0 = ws(q0); val w1 = ws(q1); val w2 = ws(q2); val w3 = ws(q3)
              val h0 = adc(q0); val h1 = adc(q1); val h2 = adc(q2); val h3 = adc(q3)
              val b0 = qlos(q0); val b1 = qlos(q1); val b2 = qlos(q2); val b3 = qlos(q3)
              var row = 0
              while (row < nRows) {
                val ro = row * d
                var a0 = 0f; var a1 = 0f; var a2 = 0f; var a3 = 0f
                var t = 0
                while (t < d) {
                  val cf = (codes(ro + t) & 0xFF).toFloat
                  a0 += w0(t) * cf; a1 += w1(t) * cf
                  a2 += w2(t) * cf; a3 += w3(t) * cf
                  t += 1
                }
                val loc = locs(row)
                h0.offer(b0 + a0, loc); h1.offer(b1 + a1, loc)
                h2.offer(b2 + a2, loc); h3.offer(b3 + a3, loc)
                row += 1
              }
              g += 4
            }
            while (g < qlist.length) {
              val qi = qlist(g)
              val wq = ws(qi)
              val h = adc(qi)
              val base = qlos(qi)
              var row = 0
              while (row < nRows) {
                val ro = row * d
                var a = 0f
                var t = 0
                while (t < d) { a += wq(t) * (codes(ro + t) & 0xFF).toFloat; t += 1 }
                h.offer(base + a, locs(row))
                row += 1
              }
              g += 1
            }
          }
          cid += 1
        }
        Array.tabulate(nq) { qi =>
          val qv = qs(qi)._2
          val exact = new graft.functions.TopKAgg.Heap(k)
          adc(qi).foreach { (_, loc) =>
            val b = px.fblocks((loc >>> 32).toInt)
            val row = (loc & 0xFFFFFFFFL).toInt
            exact.offer(dotRow(qv, b.data, row * b.dim, b.dim), b.ids(row))
          }
          val sorted = exact.sortedDesc()
          QRun(sorted.map(_._1), sorted.map(_._2))
        }
      }
    }
    val zero = Array.fill(queries.length)(QRun(Array.emptyDoubleArray, Array.emptyLongArray))
    val mergeRuns = (a: Array[QRun], b: Array[QRun]) =>
      Array.tabulate(a.length)(qi => QRun.merge(a(qi), b(qi), k))
    perPartition.treeAggregate(zero)(mergeRuns, mergeRuns).map(_.ids)
  }

  /** One query's sorted-desc candidate run as parallel PRIMITIVE arrays —
    * the treeReduce element for the global ADC trim (boxed tuple arrays
    * made the merge the bottleneck at p × q × r scale). */
  final case class QRun(scores: Array[Double], ids: Array[Long])

  object QRun {
    /** Two-pointer merge of two sorted-desc runs, keeping the top `r`;
      * ties break id-asc — the same total order as the heaps. */
    def merge(a: QRun, b: QRun, r: Int): QRun = {
      val n = math.min(r, a.ids.length + b.ids.length)
      val s = new Array[Double](n)
      val d = new Array[Long](n)
      var ia = 0
      var ib = 0
      var o = 0
      while (o < n) {
        val takeA =
          if (ia >= a.ids.length) false
          else if (ib >= b.ids.length) true
          else a.scores(ia) > b.scores(ib) ||
            (a.scores(ia) == b.scores(ib) && a.ids(ia) < b.ids(ib))
        if (takeA) { s(o) = a.scores(ia); d(o) = a.ids(ia); ia += 1 }
        else { s(o) = b.scores(ib); d(o) = b.ids(ib); ib += 1 }
        o += 1
      }
      QRun(s, d)
    }
  }

  /** Exact rescore of an ADC candidate set: one pass over the FLOAT
    * blocks probing a broadcast doc→queries map (one hash lookup per
    * row; full dots only for the ~q×r candidate hits), then the usual
    * bounded re-rank. The expensive full-precision data is touched for
    * a bounded candidate set — never scanned per query. */
  def rescore(
      spark: SparkSession,
      blocks: RDD[Block],
      queries: Array[(Long, Array[Float])],
      candidates: Array[(Long, Long)], // (query_id, doc_id)
      k: Int): DataFrame = {
    // candidate set as CSR over sorted distinct doc ids: the scan probes
    // with a primitive binary search (no boxed map lookups — at 1M rows
    // the boxed HashMap probe dominated the pass)
    val qIdx = queries.iterator.map(_._1).zipWithIndex.toMap
    val grouped = candidates.groupBy(_._2).toArray.sortBy(_._1)
    val docIds = grouped.map(_._1)
    val qStart = new Array[Int](docIds.length + 1)
    val qFlat = new Array[Int](candidates.length)
    var at = 0
    var g = 0
    while (g < grouped.length) {
      qStart(g) = at
      grouped(g)._2.foreach { case (qid, _) => qFlat(at) = qIdx(qid); at += 1 }
      g += 1
    }
    qStart(grouped.length) = at
    val bcQ = spark.sparkContext.broadcast(queries)
    val bcDocs = spark.sparkContext.broadcast(docIds)
    val bcStart = spark.sparkContext.broadcast(qStart)
    val bcFlat = spark.sparkContext.broadcast(qFlat)
    val scored = blocks.mapPartitions { bs =>
      val qs = bcQ.value
      val docs = bcDocs.value
      val starts = bcStart.value
      val flat = bcFlat.value
      bs.flatMap { b =>
        val n = b.ids.length
        val dim = b.dim
        Iterator.range(0, n).flatMap { row =>
          val g2 = java.util.Arrays.binarySearch(docs, b.ids(row))
          if (g2 < 0) Iterator.empty
          else {
            val off = row * dim
            Iterator.range(starts(g2), starts(g2 + 1)).map { j =>
              val qi = flat(j)
              (qs(qi)._1, b.ids(row), dotRow(qs(qi)._2, b.data, off, dim))
            }
          }
        }
      }
    }
    rerank(spark, scored, k)
  }

  private def emit(
      qids: Array[Long],
      heaps: Array[graft.functions.TopKAgg.Heap]): Iterator[(Long, Long, Double)] =
    Iterator.range(0, qids.length).flatMap { qi =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      heaps(qi).foreach((s, id) => out += ((qids(qi), id, s)))
      out.iterator
    }

  private def rerank(spark: SparkSession, cands: RDD[(Long, Long, Double)], k: Int): DataFrame = {
    import spark.implicits._
    BruteForce.rerank(cands.toDF("query_id", "doc_id", "score"), k)
  }

  /** Distributed kNN-graph build at block scale — the bulk-corpus analog
    * of [[graft.operators.VectorSearch]]'s registry-scale graph (v30),
    * feeding one-hop graph-refined search (VERDICT r8 next #3). v30's
    * architecture, re-expressed over the packed block kernels: each doc
    * emits `gp` PROBE rows to its best-scoring centroids (so edges CROSS
    * inverted lists — a within-list graph could never rescue a neighbor
    * from an unprobed list, which is the entire point of refinement);
    * probe rows cogroup with each list's raw residual code rows; per
    * (prober, member) the reducer Hamming-scans packed residual SIGN
    * bits (wpv ≈ dim/64 XOR+popcount words — the member packs are
    * assembled once per list from a broadcast per-(segment, code)
    * codeword sign table, never reconstructed) to nominate a top-`hpool`
    * pool, then exact-ADC-rescores only the pool — per pooled member
    * `Σ_t dot(v_seg_t, cw_seg_t)` in the SAME float-accumulation order
    * the former full-scan LUT used, so pooled members score
    * bit-identically; ranking stays `dot(v, cent_c) + Σ_t seg-dot` —
    * the cross-list-comparable ADC estimate of the true dot, with `v`
    * the prober's SQ8-dequantized vector (see the probe-row note below
    * — quantizing the shuffled prober costs ~0.4% per-component error
    * on a selection-only estimate and buys a 3.3× smaller shuffle,
    * measured, with the recall sweep identical at every dial); a
    * final per-doc top-`g` merge joins the prober's `gp` partial heaps.
    *
    * Why this two-stage shape (round 12, VERDICT r11 "cut the cost"):
    * the former per-(prober, list) m × nCb LUT build was
    * dim × nCb ≈ 98k flops per probe row — HALF the total build cost,
    * all of it selection-only — and the full member scan gathered m
    * bytes per pair through per-member pointer chases. Hamming
    * nomination replaces both with a cache-linear flat-array scan at
    * 1/16 the per-pair work; the sign pairing (raw prober signs vs
    * residual member signs) is the measured-best symmetric variant from
    * [[binaryResidualCandidates]]'s study (0.39 vs 0.24/0.15 at 1M), and
    * nomination only has to keep the true ADC-top-(g/gp) inside a
    * 32-of-|list| pool, not rank it. Lists with ≤ `hpool` members skip
    * nomination and exact-score everything — bit-identical to the old
    * full scan there.
    *
    * Edges are ADC-RANKED deliberately: they only nominate refinement
    * candidates, every nominated candidate is exact-rescored at query
    * time, and a float rescore per edge here would re-read the float
    * corpus `gp` times for selection-only precision. Cost is
    * Σ_c probers_c · (n_c · dim/64 word-ops + hpool · dim flops) — the
    * same cluster-scoped (gp/C)·n² bound as the probed search itself
    * with a ~16× smaller constant, never a global n²·dim; the only
    * corpus-sized shuffle carries the probe rows (gp SQ8-quantized
    * vectors per doc, ~430 B each vs 1,544 B float — 3,178 → 972 MB
    * measured at 1M×384) and the m-byte code rows.
    */
  def pqKnnGraph(
      indexed: RDD[Block],
      index: RDD[PqPartIndex],
      centroids: Array[Array[Float]],
      codebook: Array[Array[Float]],
      subDim: Int,
      g: Int,
      gp: Int,
      hpool: Int = 32): RDD[(Long, Array[Long])] = {
    require(g > 0 && gp > 0, s"graph degree/probe must be positive, got g=$g gp=$gp")
    require(codebook.nonEmpty, "pqKnnGraph needs a PQ codebook (nCb > 0)")
    require(hpool >= g, s"hamming pool must cover the degree: hpool=$hpool < g=$g")
    require(subDim <= 63, s"sign-chunk packing needs subDim <= 63, got $subDim")
    val sc = indexed.sparkContext
    val bcC = sc.broadcast(centroids)
    // per-(code, segment) sign chunk of the codeword segment — a member's
    // residual-reconstruction sign pack is m chunk lookups, no float math
    val bcSign = sc.broadcast {
      val nCb = codebook.length
      val mT = codebook(0).length / subDim
      val tbl = new Array[Long](nCb * mT)
      var j = 0
      while (j < nCb) {
        val cw = codebook(j)
        var t = 0
        while (t < mT) {
          var chunk = 0L
          var x = 0
          while (x < subDim) {
            if (cw(t * subDim + x) >= 0f) chunk |= 1L << x
            x += 1
          }
          tbl(j * mT + t) = chunk
          t += 1
        }
        j += 1
      }
      tbl
    }
    val bcCb = sc.broadcast(codebook)
    val nCid = centroids.length
    // Probe rows are SQ8-QUANTIZED for the shuffle (round 16): the gp
    // float vectors per doc were the kernel's only corpus-sized shuffle
    // — 3,178 MB measured at 1M×384 vs ~104 MB for the code rows — and
    // the probe vector is selection-only input (stage-1 signs, the
    // bias dot, and the stage-2 ADC estimate; every nominated edge is
    // exact-rescored at query time anyway). Per-vector symmetric SQ8
    // (scale = max|v|/127; a correctly-rounded scale division bounds
    // round(v/scale) at ±127, so the byte can't wrap) shrinks the row
    // 1,544 → ~430 B; the reducer dequantizes once per probe row into
    // a per-list scratch, so everything downstream runs the identical
    // float code. Measured at 1M×384 (same host-day A/B, matched 32
    // cores and identical 4-stage/192-task profiles): shuffle 3,178 →
    // 972 MB (3.3×), wall and task-CPU at parity within window noise
    // (147.7 vs 134.0 s on a window whose start shuffle canary read
    // 2.81× vs 2.12×), graph_recall_sweep IDENTICAL at every dial
    // ({1:.846, 2:.942, 4:.998, 8+:1.0}) and pq/sq/ivf headlines
    // untouched. At 1M on one box the build is CPU-bound, so the win
    // is the WIRE cost: at cluster scale the probe shuffle crosses the
    // network, and it is the build's dominant movement; determinism
    // preserved (quantization is a pure function of the input).
    val probes: RDD[(Int, (Long, Float, Array[Byte]))] = indexed.flatMap { b =>
      val cents = bcC.value
      val n = b.ids.length
      val dim = b.dim
      Iterator.range(0, n).flatMap { r =>
        val off = r * dim
        val scores = Array.tabulate(cents.length)(c => dotRow(cents(c), b.data, off, dim))
        val top = Array.range(0, cents.length)
          .sortBy(c => (-scores(c), c))
          .take(gp)
        val (scale, q) = sq8Quantize(b.data, off, dim)
        top.iterator.map(c => (c, (b.ids(r), scale, q)))
      }
    }
    val members: RDD[(Int, (Long, Array[Byte]))] = index.flatMap { px =>
      val m = px.m
      Iterator.range(0, px.cidLoc.length).flatMap { cid =>
        val locs = px.cidLoc(cid)
        val codes = px.cidCodes(cid)
        Iterator.range(0, locs.length).map { i =>
          val li = locs(i)
          val id = px.fblocks((li >>> 32).toInt).ids(li.toInt)
          (cid, (id, java.util.Arrays.copyOfRange(codes, i * m, i * m + m)))
        }
      }
    }
    val part = new org.apache.spark.HashPartitioner(nCid)
    probes.cogroup(members, part)
      .flatMap { case (cid, (ps, ms)) =>
        val mArr = ms.toArray
        if (mArr.isEmpty) Iterator.empty
        else {
          val cb = bcCb.value
          val cent = bcC.value(cid)
          val m = mArr(0)._2.length
          val dim = m * subDim
          val wpv = (dim + 63) >>> 6
          // id-sorted so Hamming ties at the pool boundary break by id
          // (member ARRAY ORDER is shuffle-arrival order — not stable)
          mArr.sortInPlaceBy(_._1)
          // member residual sign packs, one flat array for the list —
          // assembled from the broadcast chunk table, shared by every
          // prober that lands here
          val signs = bcSign.value
          val packs = new Array[Long](mArr.length * wpv)
          var pmi = 0
          while (pmi < mArr.length) {
            val codes = mArr(pmi)._2
            val base = pmi * wpv
            var t = 0
            while (t < m) {
              val chunk = signs((codes(t) & 0xFF) * m + t)
              val pos = t * subDim
              val off = pos & 63
              packs(base + (pos >>> 6)) |= chunk << off
              if (off + subDim > 64) packs(base + (pos >>> 6) + 1) |= chunk >>> (64 - off)
              t += 1
            }
            pmi += 1
          }
          // exact ADC contribution of one member: same per-segment
          // double-sum-to-float accumulation the full-scan LUT used, so
          // rescored members score bit-identically to the former path
          def exactAdc(pv: Array[Float], codes: Array[Byte]): Float = {
            var acc = 0f
            var t = 0
            while (t < m) {
              val cw = cb(codes(t) & 0xFF)
              val o = t * subDim
              var s = 0.0
              var x = 0
              while (x < subDim) { s += pv(o + x).toDouble * cw(o + x).toDouble; x += 1 }
              acc += s.toFloat
              t += 1
            }
            acc
          }
          // reusable per-prober scratch (probers run sequentially within
          // a list): Hamming distances are small ints (0..dim), so pool
          // selection is a counting-select — two linear passes, zero
          // allocation, no per-member heap calls (at 1M×C=64 a heap pool
          // paid ~31G offer calls; this is the stage-1 hot loop)
          val hds = new Array[Int](mArr.length)
          val hist = new Array[Int](dim + 2)
          val qp = new Array[Long](wpv)
          // per-list dequantization scratch: probers run sequentially,
          // so one float buffer serves every probe row that lands here
          val pv = new Array[Float](dim)
          ps.iterator.map { case (pid, scale, qb) =>
            var di = 0
            while (di < dim) { pv(di) = qb(di) * scale; di += 1 }
            var bias = 0.0
            var bi = 0
            while (bi < pv.length) { bias += pv(bi).toDouble * cent(bi).toDouble; bi += 1 }
            val heap = new graft.functions.TopKAgg.Heap(math.max(1, g / gp))
            if (mArr.length <= hpool) {
              // small list: exact-score everything (old behavior)
              var mi = 0
              while (mi < mArr.length) {
                val (mid, codes) = mArr(mi)
                if (mid != pid) heap.offer(bias + exactAdc(pv, codes), mid)
                mi += 1
              }
            } else {
              // stage 1: raw prober signs vs residual member signs
              java.util.Arrays.fill(qp, 0L)
              var j = 0
              while (j < dim) {
                if (pv(j) >= 0f) qp(j >>> 6) |= 1L << (j & 63)
                j += 1
              }
              java.util.Arrays.fill(hist, 0)
              var mi = 0
              while (mi < mArr.length) {
                if (mArr(mi)._1 != pid) {
                  var hd = 0
                  var w = 0
                  val mb = mi * wpv
                  while (w < wpv) {
                    hd += java.lang.Long.bitCount(qp(w) ^ packs(mb + w))
                    w += 1
                  }
                  hds(mi) = hd
                  hist(hd) += 1
                } else hds(mi) = Int.MaxValue
                mi += 1
              }
              // threshold + quota: identical selection to a (-hd, idx)-
              // ordered bounded heap (GraphPoolProps pins the equality)
              val (tThresh, q0) = poolThreshold(hist, hpool, dim)
              val T = tThresh
              var quota = q0
              // stage 2: exact ADC over the pool only
              mi = 0
              while (mi < mArr.length) {
                val hd = hds(mi)
                if (hd < T || (hd == T && quota > 0)) {
                  if (hd == T) quota -= 1
                  val (mid, codes) = mArr(mi)
                  heap.offer(bias + exactAdc(pv, codes), mid)
                }
                mi += 1
              }
            }
            (pid, heap.sortedDesc())
          }
        }
      }
      // DIVERSIFIED merge (the HNSW select-neighbors heuristic, Malkov &
      // Yashunin 2018 §4 Alg. 4, re-expressed as a per-list quota): keep
      // the top g/gp FROM EACH probed list rather than the global top-g.
      // On a clustered corpus the global top-g is entirely intra-cluster
      // — a graph whose edges never leave a list can never rescue a
      // neighbor from an unprobed list, making refinement a no-op. The
      // quota guarantees every doc keeps edges INTO its second-choice
      // list, which is exactly the bridge a narrow-probe query needs.
      .reduceByKey { (a, b) =>
        (a ++ b).sortBy { case (s, i) => (-s, i) }
      }
      .mapValues(_.map(_._2))
  }

  /** Counting-select cut for the graph-build Hamming pool: given a
    * histogram of small-int distances, the smallest threshold `T` whose
    * strictly-below count leaves room in the pool, plus the number of
    * `== T` slots still open (taken in member/id order by the caller).
    * Selecting `{hd < T} ∪ first-quota{hd == T}` is EXACTLY the content
    * of a (-hd, idx)-ordered bounded heap of capacity `hpool` —
    * GraphPoolProps pins the equality on arbitrary inputs. Assumes
    * Σ hist ≥ hpool (the caller only nominates when the list exceeds
    * the pool). */
  /** Per-vector symmetric SQ8 for the probe-row shuffle: `scale =
    * max|v|/127`, bytes `round(v/scale)`; dequantization is
    * `q(i) * scale`. A correctly-rounded scale division (error ≤ ½ ulp)
    * cannot push `|v/scale|` past `127·(1+2⁻²³) < 127.5`, so the
    * rounded byte stays in [-127, 127] and never wraps to -128 —
    * GraphPoolProps pins the bound, the ≤ scale/2 round-trip error,
    * and determinism on adversarial floats (denormals, huge/tiny
    * magnitudes, all-zero vectors). */
  private[graft] def sq8Quantize(
      data: Array[Float], off: Int, dim: Int): (Float, Array[Byte]) = {
    var mx = 0f
    var j = 0
    while (j < dim) {
      val a = math.abs(data(off + j))
      if (a > mx) mx = a
      j += 1
    }
    val scale =
      if (mx == 0f) 1f
      else {
        val s = mx / 127f
        // subnormal-only vector: mx/127 underflows to 0 and v/0 would
        // wrap through Inf; mx < ~63.5·MIN there, so MIN keeps |q| < 127
        if (s == 0f) java.lang.Float.MIN_VALUE else s
      }
    val q = new Array[Byte](dim)
    j = 0
    while (j < dim) {
      q(j) = math.round(data(off + j) / scale).toByte
      j += 1
    }
    (scale, q)
  }

  private[graft] def poolThreshold(
      hist: Array[Int], hpool: Int, maxHd: Int): (Int, Int) = {
    var t = 0
    var cum = 0
    while (t <= maxHd && cum + hist(t) < hpool) { cum += hist(t); t += 1 }
    (t, hpool - cum)
  }

  // ------------------------------------------------------- binary (1-bit)

  /** Packed sign-bit block: `wpv` longs per vector (dim/64 rounded up),
    * row i occupies words[i*wpv, (i+1)*wpv); `cids` parallel to `ids`
    * and always VALID (≥ 0) — residual packing and the asymmetric
    * scorer both index the centroid table by cid, so an unindexed
    * corpus must be assigned first ([[assign]]); [[packBinaryResidual]]
    * enforces this. 384 dims → 6 longs = 48 B — the 32× rung of the
    * compression ladder at kernel-bench scale (the registry-scale form
    * is v34 in [[Compact]]). */
  final case class BinBlock(ids: Array[Long], cids: Array[Int], wpv: Int, words: Array[Long])

  /** Sign-bit pack of the RESIDUALS (v − its list's centroid) — the
    * faiss IVF+binary layout: within a probed list every member shares
    * the centroid term, so raw-sign Hamming spends its 384 bits
    * re-encoding the base the whole list has in common and cannot rank
    * neighbors (measured recall@10 0.15 at 1M even probed); residual
    * signs encode exactly the part that ranks candidates within a list
    * (same argument as the PQ by_residual encode). One narrow pass. */
  def packBinaryResidual(blocks: RDD[Block], centroids: Array[Array[Float]]): RDD[BinBlock] = {
    val bc = blocks.sparkContext.broadcast(centroids)
    blocks.map { b =>
      val cents = bc.value
      val n = b.ids.length
      var g = 0
      while (g < n) {
        require(b.cids(g) >= 0 && b.cids(g) < cents.length,
          s"packBinaryResidual needs an ASSIGNED corpus: cid ${b.cids(g)} for id ${b.ids(g)} " +
            s"is outside [0, ${cents.length}) — run VectorBlocks.assign first")
        g += 1
      }
      val dim = b.dim
      val wpv = (dim + 63) >>> 6
      val words = new Array[Long](n * wpv)
      var r = 0
      while (r < n) {
        val off = r * dim
        val cv = cents(b.cids(r))
        var j = 0
        while (j < dim) {
          if (b.data(off + j) - cv(j) >= 0f)
            words(r * wpv + (j >>> 6)) |= 1L << (j & 63)
          j += 1
        }
        r += 1
      }
      BinBlock(b.ids.clone(), b.cids.clone(), wpv, words)
    }
  }

  /** ASYMMETRIC binary candidate generation over RESIDUAL doc signs,
    * restricted to probed lists — the faiss binary-ADC layout: the query
    * keeps full float precision and each doc contributes
    * `Σ_j sign(r_j)·q_j`, evaluated as 48 per-byte LUT lookups per
    * (query, doc) instead of 384 FMAs. The per-query LUT
    * (bytePos × 256 → partial sum of ±q_j) is built driver-side —
    * nq × (dim/8) × 256 floats ≈ 5 MB at bench scale — and broadcast.
    * Fixed byte-order summation keeps scores deterministic; heap ties
    * break id-asc as everywhere.
    *
    * Why asymmetric: symmetric sign-Hamming quantizes BOTH sides to one
    * bit — measured recall@10 at 1M: 0.15 raw signs, 0.24 residual signs
    * with sign(q−c), 0.39 residual signs with sign(q) — while the
    * asymmetric form only pays the doc-side quantization. Same fused
    * heap + QRun merge as every kernel; the caller exact-rescores the
    * bounded pool. With every list probed and r ≥ n the pool is the
    * whole corpus and rescore reproduces exact search — the spec gate. */
  def binaryResidualCandidates(
      bin: RDD[BinBlock],
      queries: Array[(Long, Array[Float])],
      probes: Array[Array[Boolean]],
      r: Int): Array[Array[Long]] = {
    val nQueries = queries.length
    val nCent = if (probes.isEmpty) 0 else probes(0).length
    val byCid: Array[Array[Int]] =
      Array.tabulate(nCent)(c => (0 until nQueries).filter(qi => probes(qi)(c)).toArray)
    val dim = queries.headOption.map(_._2.length).getOrElse(0)
    val wpv = (dim + 63) >>> 6
    val nBytes = wpv * 8
    // lut((q·nBytes + p)·256 + byteVal) = Σ_{bit b set in byteVal, j = p·8+b < dim} ±q_j:
    // +q_j when the doc's sign bit is set, −q_j when clear — fold the
    // constant −Σq part in so one lookup covers both: contribution =
    // Σ_{set} q_j − Σ_{clear} q_j over the byte's dims
    val lut = new Array[Float](nQueries * nBytes * 256)
    var qi = 0
    while (qi < nQueries) {
      val qv = queries(qi)._2
      var p = 0
      while (p < nBytes) {
        val base = (qi * nBytes + p) * 256
        var v = 0
        while (v < 256) {
          var acc = 0.0f
          var b = 0
          while (b < 8) {
            val j = p * 8 + b
            if (j < dim) {
              if (((v >>> b) & 1) == 1) acc += qv(j) else acc -= qv(j)
            }
            b += 1
          }
          lut(base + v) = acc
          v += 1
        }
        p += 1
      }
      qi += 1
    }
    val sc = bin.sparkContext
    val bcLut = sc.broadcast(lut)
    val bcByCid = sc.broadcast(byCid)
    val perPartition: RDD[Array[QRun]] = bin.mapPartitions { bs =>
      val lt = bcLut.value
      val cidQ = bcByCid.value
      val heaps = Array.fill(nQueries)(new graft.functions.TopKAgg.Heap(r))
      // per-row byte values, extracted ONCE and shared by every probing
      // query (the inner loop previously re-derived each byte from the
      // packed words per query — nBytes × |qlist| shifts instead of
      // nBytes; scores are unchanged, the lookups read the same cells
      // in the same order)
      val rowBytes = new Array[Int](nBytes)
      bs.foreach { b =>
        require(b.wpv == wpv, s"binary block wpv ${b.wpv} != query wpv $wpv")
        val n = b.ids.length
        var row = 0
        while (row < n) {
          val off = row * wpv
          val id = b.ids(row)
          val cid = b.cids(row)
          val qlist = cidQ(cid)
          if (qlist.length > 0) {
            var p0 = 0
            while (p0 < nBytes) {
              val word = b.words(off + (p0 >>> 3))
              rowBytes(p0) = ((word >>> ((p0 & 7) << 3)) & 0xFFL).toInt
              p0 += 1
            }
            var t = 0
            while (t < qlist.length) {
              val q = qlist(t)
              val lbase = q * nBytes * 256
              var score = 0.0
              var p = 0
              while (p < nBytes) {
                score += lt(lbase + (p << 8) + rowBytes(p))
                p += 1
              }
              heaps(q).offer(score, id)
              t += 1
            }
          }
          row += 1
        }
      }
      Iterator.single(Array.tabulate(nQueries) { i =>
        val sorted = heaps(i).sortedDesc()
        QRun(sorted.map(_._1), sorted.map(_._2))
      })
    }
    val zero = Array.fill(nQueries)(QRun(Array.emptyDoubleArray, Array.emptyLongArray))
    val mergeRuns = (a: Array[QRun], b: Array[QRun]) =>
      Array.tabulate(a.length)(i => QRun.merge(a(i), b(i), r))
    perPartition.treeAggregate(zero)(mergeRuns, mergeRuns).map(_.ids)
  }
}
