package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Session-scoped cache of eagerly-checkpointed derived frames, keyed by
  * the FULL canonicalized analyzed plan (SHA-256 of its string form), not
  * the 32-bit `Dataset.semanticHash` — two semantically different inputs
  * (e.g. a corpus and a filtered view of it) must never share an entry,
  * and a 1-in-2³² silent collision serving the wrong checkpointed frame
  * to every downstream consumer is not an acceptable failure mode for a
  * correctness-gated cache. The canonicalized plan normalizes expression
  * ids and cosmetic aliases, so two `spark.read.parquet(sameDir)` frames
  * still share one entry.
  *
  * Lifecycle (the "compute once per corpus snapshot" shape):
  * - Entries are per-session (identity), so suite-local sessions never
  *   cross-pollinate and a stopped session's entries can be dropped.
  * - At most [[FrameCache.MaxPerSession]] entries per session: inserting
  *   beyond the cap drops the oldest entry from the map WITHOUT
  *   unpersisting it. Dropping the reference is the safe eviction for a
  *   `localCheckpoint` frame (whose lineage is truncated — an eager
  *   unpersist would make any still-live consumer unrecoverable): once no
  *   caller references the frame either, its RDD becomes unreachable and
  *   Spark's ContextCleaner reclaims the checkpoint blocks. So a
  *   long-lived session iterating over corpus snapshots is bounded, not
  *   leaking.
  * - [[FrameCache.invalidate]] is the explicit hook for "this snapshot is
  *   gone": removes the session's entries AND eagerly unpersists their
  *   checkpoint RDDs (caller asserts no consumer still needs them).
  */
private[graft] final class FrameCache {

  private val map = TrieMap[(Int, String), DataFrame]()
  // insertion order per session, for the bounded-entries eviction
  private val order = TrieMap[(Int, String), Long]()
  private val tick = new java.util.concurrent.atomic.AtomicLong()

  private def key(df: DataFrame): (Int, String) = {
    val plan = df.queryExecution.analyzed.canonicalized
    val digest = MessageDigest.getInstance("SHA-256")
    digest.update(plan.toString.getBytes(StandardCharsets.UTF_8))
    // The string form of an IN-MEMORY leaf carries its schema but not its
    // rows (`LocalRelation [doc_id#0L, text#1]`), so two literal frames of
    // the same shape would collide and every consumer would be served the
    // first frame's checkpoint. Fold the leaf contents (row count + every
    // row's content hash) or, for RDD-backed leaves, the RDD identity into
    // the digest. FILE-backed leaves carry no path in the analyzed plan's
    // string either — `Relation [cols] parquet` — so two same-schema
    // corpora in different directories collided and one was served the
    // other's checkpoint (found r11: an sf1 suite's frames surfacing in an
    // sf0.001 query; Bench's warmup-dir entries shadowing the timed dir).
    // Fold the relation's root paths explicitly.
    plan.collectLeaves().foreach {
      case rel: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        val loc = rel.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.mkString(",")
          case other => other.toString
        }
        digest.update(loc.getBytes(StandardCharsets.UTF_8))
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        // Full row CONTENT, not the 32-bit hashCode — a hashCode fold
        // reopens exactly the collision window the class doc rejects.
        // UnsafeRow exposes its backing bytes; other InternalRows are
        // folded FIELD-WISE with null markers and length prefixes
        // (InternalRow.toString comma-joins unescaped, so (null) vs
        // ("null") or ("a,b","c") vs ("a","b,c") would alias).
        val types = lr.output.map(_.dataType)
        digest.update(java.nio.ByteBuffer.allocate(4).putInt(lr.data.length).array())
        lr.data.foreach {
          case ur: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
            val bytes = ur.getBytes
            digest.update(java.nio.ByteBuffer.allocate(4).putInt(bytes.length).array())
            digest.update(bytes)
          case other =>
            var i = 0
            while (i < types.length) {
              FrameCache.foldValue(digest, types(i), other.get(i, types(i)))
              i += 1
            }
        }
      case lrd: LogicalRDD =>
        digest.update(java.nio.ByteBuffer.allocate(4).putInt(lrd.rdd.id).array())
      case _ => ()
    }
    (System.identityHashCode(df.sparkSession),
      digest.digest().map(b => f"$b%02x").mkString)
  }

  /** Cached checkpointed frame for `input`'s canonicalized plan, building
    * (and checkpointing) via `build` on miss.
    */
  def getOrElseUpdate(input: DataFrame)(build: => DataFrame): DataFrame = {
    val k = key(input)
    map.get(k) match {
      case Some(df) => df
      case None =>
        val df = map.getOrElseUpdate(k, build)
        order.putIfAbsent(k, tick.incrementAndGet())
        evictBeyondCap(k._1)
        df
    }
  }

  private def evictBeyondCap(sessionId: Int): Unit = {
    val mine = order.keys.filter(_._1 == sessionId).toSeq
    if (mine.size > FrameCache.MaxPerSession) {
      mine.sortBy(order(_)).dropRight(FrameCache.MaxPerSession).foreach { k =>
        map.remove(k) // reference-drop only; ContextCleaner reclaims blocks
        order.remove(k)
      }
    }
  }

  /** Drop every entry of `session` and eagerly unpersist the checkpoint
    * blocks. Only call when no consumer still holds a derived lazy frame —
    * a localCheckpoint cannot be recomputed after unpersist.
    */
  def invalidate(session: SparkSession): Unit = {
    val id = System.identityHashCode(session)
    map.keys.filter(_._1 == id).foreach { k =>
      map.remove(k).foreach(FrameCache.unpersistCheckpoint)
      order.remove(k)
    }
  }

  /** Number of live entries for `session` (spec hook). */
  def size(session: SparkSession): Int = {
    val id = System.identityHashCode(session)
    map.keys.count(_._1 == id)
  }
}

private[graft] object FrameCache {

  /** Entries retained per session before oldest-first reference-drop. A
    * production pipeline runs the dedup family over ONE corpus snapshot
    * at a time; 4 leaves headroom for a snapshot + filtered views without
    * letting a snapshot-per-query caller grow unboundedly.
    */
  val MaxPerSession = 4

  /** Injective fold of one field value into the digest: a null marker
    * byte, then a length-prefixed payload; collections recurse with
    * element counts so nested values can't alias across boundaries
    * either. Scalars go through String.valueOf, which is injective per
    * concrete scalar type (numbers, booleans, UTF8String, Decimal).
    */
  private def foldValue(digest: MessageDigest,
      dt: org.apache.spark.sql.types.DataType, v: Any): Unit = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    if (v == null) { digest.update(0.toByte); return }
    digest.update(1.toByte)
    dt match {
      case st: StructType =>
        val r = v.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        var i = 0
        while (i < st.length) { foldValue(digest, st(i).dataType, r.get(i, st(i).dataType)); i += 1 }
      case at: ArrayType =>
        val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        digest.update(java.nio.ByteBuffer.allocate(4).putInt(a.numElements()).array())
        var i = 0
        while (i < a.numElements()) { foldValue(digest, at.elementType, a.get(i, at.elementType)); i += 1 }
      case mt: MapType =>
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        digest.update(java.nio.ByteBuffer.allocate(4).putInt(m.numElements()).array())
        foldValue(digest, ArrayType(mt.keyType), m.keyArray())
        foldValue(digest, ArrayType(mt.valueType), m.valueArray())
      case _ =>
        val bytes = v match {
          case b: Array[Byte] => b // BinaryType: valueOf would print identity
          case other => String.valueOf(other).getBytes(StandardCharsets.UTF_8)
        }
        digest.update(java.nio.ByteBuffer.allocate(4).putInt(bytes.length).array())
        digest.update(bytes)
    }
  }

  /** Best-effort eager unpersist of an eagerly-checkpointed frame: find
    * the `LogicalRDD` leaves the checkpoint planted and unpersist their
    * RDDs (non-blocking). Frames without one (never the case for our
    * localCheckpoint results) are left to the ContextCleaner.
    */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
