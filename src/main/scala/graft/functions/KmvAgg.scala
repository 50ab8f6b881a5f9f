package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `kmv_distinct(hash, k)` — K-Minimum-Values distinct-count sketch as a
  * first-class Catalyst aggregate (Bar-Yossef et al. 2002, the estimator
  * behind `approx_count_distinct`'s ancestors).
  *
  * Keeps the k smallest DISTINCT hash values seen; if the stream holds
  * fewer than k distinct hashes the count is exact, otherwise the k-th
  * minimum h₍ₖ₎ of hashes uniform on [0, P) estimates the distinct count
  * as (k−1)·P / h₍ₖ₎.
  *
  * Why this instead of `count(DISTINCT x)` at 100 TB: exact distinct
  * shuffles every distinct value (a full repartition of the key space);
  * this aggregate carries O(k) state per group with map-side partial
  * aggregation — each task contributes at most k longs to the shuffle —
  * and merges are a bounded set-union. Same execution shape as Spark's
  * HLL-based `approx_count_distinct`, but built on [[PortableHash]]
  * arithmetic, so DuckDB replays the identical estimate for the oracle
  * (HLL sketches are engine-specific and can't be cross-checked).
  *
  * Input hashes must already be uniform on [0, P) — produce them with
  * [[PortableHash.hash]] (P = 2^31−1). Nulls are ignored.
  */
case class KmvAgg(
    hashExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.MinSet] {

  require(k > 0, s"kmv_distinct: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): KmvAgg.MinSet = new KmvAgg.MinSet(k)

  override def update(buf: KmvAgg.MinSet, input: InternalRow): KmvAgg.MinSet = {
    val h = hashExpr.eval(input)
    if (h != null) buf.offer(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvAgg.MinSet, other: KmvAgg.MinSet): KmvAgg.MinSet = {
    other.foreach(buf.offer)
    buf
  }

  /** Exact size when under-filled, else the KMV estimate. The arithmetic
    * ((k−1)·P as one exact double constant, then a single division) is
    * mirrored verbatim in the DuckDB oracle SQL. */
  override def eval(buf: KmvAgg.MinSet): Any =
    if (buf.size < k) buf.size.toDouble
    else ((k - 1).toDouble * PortableHash.P.toDouble) / buf.kthMin.toDouble

  override def serialize(buf: KmvAgg.MinSet): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvAgg.MinSet = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new KmvAgg.MinSet(k)
    var j = 0
    while (j < n) { s.offer(in.readLong()); j += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(hashExpr = newChildren(0))
}

object KmvAgg {

  /** Bounded set of the k smallest distinct longs: a TreeSet capped at k
    * (insert, then evict the largest). O(log k) per offer, O(k) state. */
  final class MinSet(k: Int) {
    require(k > 0, s"MinSet capacity must be positive, got $k")
    private val set = new java.util.TreeSet[java.lang.Long]()

    def offer(v: Long): Unit =
      if (set.size < k) { set.add(v); () }
      else if (v < set.last() && set.add(v)) { set.pollLast(); () }

    def size: Int = set.size

    /** Largest kept value = the k-th minimum once the set is full. */
    def kthMin: Long = set.last()

    def foreach(f: Long => Unit): Unit = set.forEach(v => f(v))
  }

  /** SQL builder for the function registry: validates arity and that k is
    * a foldable integer literal before eval'ing it. */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    require(
      exprs.length == 2,
      s"kmv_distinct expects 2 arguments (hash, k), got ${exprs.length}")
    require(
      exprs(1).foldable,
      "kmv_distinct: k must be a literal integer, not a column or non-foldable expression")
    val kVal = exprs(1).eval() match {
      case n: Number => n.intValue()
      case other =>
        throw new IllegalArgumentException(
          s"kmv_distinct: k must be an integer literal, got $other")
    }
    KmvAgg(exprs(0), kVal).toAggregateExpression()
  }

  /** Column API: `kmvDistinct(hash, k)`. */
  def kmvDistinct(hash: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftInternal
    GraftInternal.column(KmvAgg(GraftInternal.expression(hash), k).toAggregateExpression())
  }
}
