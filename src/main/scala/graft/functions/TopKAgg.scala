package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `collect_top_k(score, id, k)` — bounded-heap top-k as a first-class
  * Catalyst aggregate (SURVEY §4.3.1: "the single most valuable custom
  * piece"). Where `Window.partitionBy(key).orderBy(score)` sorts EVERY
  * row of each partition group, this aggregate keeps an O(k) heap per
  * group with map-side partial aggregation: each task emits at most k
  * candidates per group into the shuffle, exactly like Spark's own
  * `TakeOrderedAndProject` but keyed.
  *
  * Ordering: score DESC, then id ASC (the engine-wide deterministic
  * tie-break). Output: ARRAY<STRUCT<score: DOUBLE, id: LONG>> in final
  * rank order — `posexplode` it to get (rank-1, struct) rows.
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    dedupIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {

  require(k > 0, s"collect_top_k: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k, dedupIds)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKAgg.Heap, other: TopKAgg.Heap): TopKAgg.Heap = {
    other.foreach((s, i) => buf.offer(s, i))
    buf
  }

  override def eval(buf: TopKAgg.Heap): Any = {
    val sorted = buf.sortedDesc()
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buf.sortedDesc()
    out.writeInt(items.length)
    items.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = new TopKAgg.Heap(k, dedupIds)
    var j = 0
    while (j < n) { heap.offer(in.readDouble(), in.readLong()); j += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {

  /** Bounded worst-first heap: head = eviction candidate (lowest score,
    * then HIGHEST id). Same ordering contract as the BruteForce kernel.
    *
    * `dedupIds` (r14): each id appears AT MOST ONCE in the heap, kept at
    * its best score — the serving-path variant for candidate sets that
    * can carry the same doc twice with identical vectors (a crash-window
    * reader's debris-union mid-split; see Ann.indexFrame). OFF by
    * default: the SQL-surfaced `collect_top_k` ranks duplicate ids as
    * distinct rows, and the DuckDB oracles replay exactly that. */
  final class Heap(k: Int, dedupIds: Boolean = false) {
    require(k > 0, s"Heap capacity must be positive, got $k")
    private val ord: Ordering[(Double, Long)] =
      Ordering.by { case (s, i) => (-s, i) }
    private val pq = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)
    // id -> its score in the heap (dedupIds mode only)
    private val members =
      if (dedupIds) scala.collection.mutable.HashMap.empty[Long, Double] else null

    def offer(score: Double, id: Long): Unit =
      if (dedupIds && members.contains(id)) {
        val prev = members(id)
        if (score > prev) {
          // upgrade in place: O(k) rebuild, and only on the rare
          // duplicate-with-better-score path
          val keep = pq.toArray.filterNot { case (_, i) => i == id }
          pq.clear()
          keep.foreach(pq.enqueue(_))
          pq.enqueue((score, id))
          members(id) = score
        }
      } else if (pq.size < k) {
        pq.enqueue((score, id))
        if (dedupIds) members(id) = score
      } else {
        val (ws, wi) = pq.head
        if (score > ws || (score == ws && id < wi)) {
          pq.dequeue()
          pq.enqueue((score, id))
          if (dedupIds) { members.remove(wi); members(id) = score; () }
        }
      }

    def foreach(f: (Double, Long) => Unit): Unit = pq.foreach { case (s, i) => f(s, i) }

    /** Final rank order: score desc, id asc. */
    def sortedDesc(): Array[(Double, Long)] =
      pq.toArray.sortBy { case (s, i) => (-s, i) }
  }

  /** SQL builder shared by the function-registry and extension
    * registrations: validates arity and that k is a foldable integer
    * literal BEFORE eval'ing it, so `collect_top_k(s, i, some_col)` fails
    * with a clear message instead of a confusing eval error. */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    require(
      exprs.length == 3,
      s"collect_top_k expects 3 arguments (score, id, k), got ${exprs.length}")
    require(
      exprs(2).foldable,
      "collect_top_k: k must be a literal integer, not a column or non-foldable expression")
    val kVal = exprs(2).eval() match {
      case n: Number => n.intValue()
      case other =>
        throw new IllegalArgumentException(
          s"collect_top_k: k must be an integer literal, got $other")
    }
    TopKAgg(exprs(0), exprs(1), kVal).toAggregateExpression()
  }

  /** Column API: `collect_top_k(score, id, k)`. */
  def collectTopK(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftInternal
    val e = TopKAgg(GraftInternal.expression(score), GraftInternal.expression(id), k)
    GraftInternal.column(e.toAggregateExpression())
  }

  /** [[collectTopK]] with per-id dedup (best score wins): the serving
    * variant — a doc is ranked once however many identical candidate
    * rows a crash-window union produced. */
  def collectTopKDistinct(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftInternal
    val e = TopKAgg(
      GraftInternal.expression(score), GraftInternal.expression(id), k, dedupIds = true)
    GraftInternal.column(e.toAggregateExpression())
  }
}
