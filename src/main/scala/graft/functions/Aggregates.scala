package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native bounded sorted-set collector: keeps at most `maxSize` SMALLEST
  * distinct long values per group, in one aggregation pass with
  * constant-size state everywhere (update, map-side partial, merge).
  *
  * This is the single-pass form of the LSH stop-bucket guard. With
  * `maxSize = cap + 1`:
  *
  *   - a bucket with ≤ cap distinct ids never overflows the buffer, so
  *     the result is EXACTLY its sorted id list (`array_sort(collect_list)`
  *     semantics — bucket members are distinct by construction);
  *   - a bucket with > cap ids saturates at cap + 1 elements, so
  *     `size(ids) > cap` identifies precisely the over-cap buckets the
  *     two-phase count-then-anti-join guard would blacklist.
  *
  * The saturated contents are still deterministic (the globally smallest
  * cap + 1 ids: every one of them is among the smallest cap + 1 of its own
  * partition, so no partial ever evicts it), but consumers drop saturated
  * buckets anyway. Versus the two-phase guard this removes one full
  * aggregation pass over the kernel-exploded frame (the signature kernel
  * ran once per consumer) and one broadcast anti-join, and it is
  * skew-proof by construction: a degenerate bucket contributes at most
  * (cap + 1) longs per map partition to the shuffle, never its row list.
  */
case class BoundedSortedCollect(
    child: Expression,
    maxSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(maxSize > 0, s"maxSize must be positive, got $maxSize")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT child, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_sorted_collect"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > maxSize) buf.pollLast()
    }
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      a.add(it.next())
      if (a.size > maxSize) a.pollLast()
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSortedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSortedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedSortedCollect =
    copy(child = newChild)
}

object BoundedSortedCollect {
  /** `bounded_sorted_collect(c, maxSize)` as a Column aggregate. */
  def column(c: Column, maxSize: Int): Column =
    Bridge.column(
      BoundedSortedCollect(Bridge.expression(c), maxSize).toAggregateExpression())
}
