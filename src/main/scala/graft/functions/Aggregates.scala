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

/** [[BoundedSortedCollect]] for STRUCT rows carrying a payload next to the
  * id: keeps the `maxSize` rows with the smallest leading BIGINT field,
  * emitting them id-ascending. The leading field must be unique within a
  * group (true for every LSH bucket: one row per doc per band), making
  * the order identical to `array_sort(collect_list(struct(...)))`.
  *
  * This is the single-pass stop-bucket guard for bucket stages whose
  * pairing needs the signature IN the bucket row (simhash chunk arrays,
  * phash fingerprints — hamming is scored in-bucket with no join back to
  * the corpus). Replacing the two-pass count + anti-join also removes the
  * eager signature checkpoint those stages needed to avoid running the
  * kernel once per consumer — at 100 TB that checkpoint pins a
  * corpus-sized signature table in executor block storage; this form
  * streams it through one aggregation.
  */
case class BoundedSortedCollectRows(
    child: Expression,
    maxSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, InternalRow]]
  with UnaryLike[Expression] {

  require(maxSize > 0, s"maxSize must be positive, got $maxSize")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.nonEmpty && s.head.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a struct child with a leading BIGINT field, " +
        s"got ${other.catalogString}")
  }

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(structType)

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_sorted_collect_rows"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, InternalRow] =
    new java.util.TreeMap[java.lang.Long, InternalRow]()

  override def update(
      buf: java.util.TreeMap[java.lang.Long, InternalRow],
      input: InternalRow): java.util.TreeMap[java.lang.Long, InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      buf.put(row.getLong(0), row.copy())
      if (buf.size > maxSize) buf.pollLastEntry()
    }
    buf
  }

  override def merge(
      a: java.util.TreeMap[java.lang.Long, InternalRow],
      b: java.util.TreeMap[java.lang.Long, InternalRow]): java.util.TreeMap[java.lang.Long, InternalRow] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.put(e.getKey, e.getValue)
      if (a.size > maxSize) a.pollLastEntry()
    }
    a
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, InternalRow]): Any =
    new GenericArrayData(buf.values().toArray(new Array[AnyRef](buf.size)))

  override def serialize(buf: java.util.TreeMap[java.lang.Long, InternalRow]): Array[Byte] = {
    val rows = new Array[Array[Byte]](buf.size)
    var total = 4
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) {
      // copy() before getBytes: the projection reuses its output buffer,
      // and getBytes returns the BACKING array uncopied when exact-sized —
      // without the copy every serialized row aliases the last one.
      val bytes = toUnsafe(it.next()).copy().getBytes
      rows(i) = bytes
      total += 4 + bytes.length
      i += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, InternalRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.TreeMap[java.lang.Long, InternalRow]()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(structType.length)
      row.pointTo(arr, len)
      m.put(row.getLong(0), row)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSortedCollectRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSortedCollectRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedSortedCollectRows =
    copy(child = newChild)
}

object BoundedSortedCollectRows {
  /** `bounded_sorted_collect_rows(structCol, maxSize)` as a Column aggregate. */
  def column(c: Column, maxSize: Int): Column =
    Bridge.column(
      BoundedSortedCollectRows(Bridge.expression(c), maxSize).toAggregateExpression())
}
