package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.DocStream

case class TimedDoc(doc_id: Long, ts: Timestamp, text: String)

/** Streaming MinHash LSH near-dup candidates: batch parity on the pair
  * set, window eviction, and the stop-bucket poison guard.
  */
class NearDupStreamSpec extends SparkSpec {

  // Base time well past epoch 0 (stateful ops drop watermark-0 events).
  private val T0 = 1700000000000L
  private def t(minutes: Long) = new Timestamp(T0 + minutes * 60000L)

  private val base = "the quick brown fox jumps over the lazy dog " +
    "and keeps running through the quiet green forest all day long"

  private def run(docs: Seq[TimedDoc], name: String,
                  withinMinutes: Int = 60, maxBucket: Int = 100): Seq[(Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[TimedDoc]
    mem.addData(docs: _*)
    val q = DocStream.nearDupCandidates(mem.toDF(), withinMinutes, maxBucket)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).distinct.toSeq.sorted
  }

  test("near-identical docs pair up; unrelated docs do not") {
    val docs = Seq(
      TimedDoc(1L, t(0), base),
      TimedDoc(2L, t(1), base + " with one extra tail"),
      TimedDoc(3L, t(2), "completely different content about spark " +
        "catalyst optimizer rules and whole stage code generation paths"))
    val pairs = run(docs, "neardup_basic")
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("pair set matches the batch LSH candidates on the same docs") {
    val s = spark
    import s.implicits._
    val variants = Seq(
      base,
      base + " extra",
      base.replace("quick", "swift"),
      "some wholly unrelated text about parquet row groups and column " +
        "chunk compression codecs inside the storage layer")
    val docs = variants.zipWithIndex.map { case (txt, i) =>
      TimedDoc(i.toLong, t(i.toLong), txt)
    }
    val got = run(docs, "neardup_parity")

    // batch LSH on the same frame: shared-band pairs, same kernel
    import org.apache.spark.sql.functions._
    val banded = docs.toDF().select(col("doc_id"),
      posexplode(graft.functions.MinHashConf.column(col("text"))).as(Seq("band", "key")))
    val want = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === want)
    assert(want.nonEmpty, "fixture should produce at least one candidate")
  }

  test("documents outside the time window do not pair") {
    val docs = Seq(
      TimedDoc(1L, t(0), base),
      TimedDoc(2L, t(120), base)) // 2h later, 60-minute window
    val pairs = run(docs, "neardup_window", withinMinutes = 60)
    assert(pairs.isEmpty)
  }

  test("quality filter composes upstream of near-dup state in one query") {
    // the always-on ingest chain: score (stateless narrow map) → filter →
    // LSH near-dup state, all in a single streaming query
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val junk = "!!! ??? ### $$$ %%%"
    val good = "the quick brown fox jumps over the lazy dog and the fox " +
      "keeps running through the green forest to find the hidden path " * 2
    val mem = MemoryStream[TimedDoc]
    mem.addData(
      TimedDoc(1L, t(0), good),
      TimedDoc(2L, t(1), junk),          // filtered out before state
      TimedDoc(3L, t(2), good + " tail"))
    val filtered = DocStream.qualityFilter(mem.toDF())
      .select("doc_id", "ts", "text")
    val q = DocStream.nearDupCandidates(filtered, 60)
      .writeStream.format("memory").queryName("neardup_composed")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("neardup_composed").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).distinct.toSeq
    assert(pairs === Seq((1L, 3L)))
  }

  test("an over-cap bucket poisons itself and stops emitting") {
    // maxBucket=2: docs 1,2 pair; doc 3 overflows the bucket (3 residents
    // > 2) -> poisoned; doc 4 in the same bucket emits nothing new.
    val docs = Seq(
      TimedDoc(1L, t(0), base),
      TimedDoc(2L, t(1), base),
      TimedDoc(3L, t(2), base),
      TimedDoc(4L, t(3), base))
    val pairs = run(docs, "neardup_poison", maxBucket = 2)
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 4L), s"poisoned bucket emitted: $pairs")
  }
}
