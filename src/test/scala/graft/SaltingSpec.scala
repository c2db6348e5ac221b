package graft

import org.apache.spark.sql.functions._

import graft.functions.Salting
import graft.sources.Tables

class SaltingSpec extends SparkSpec {

  test("salted count equals the direct groupBy on a skewed frame") {
    val s = spark
    import s.implicits._
    // heavily skewed: 10k rows on one key, a few on others
    val skewed = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 7).map(i => (s"cold$i", i.toLong))).toDF("k", "row_id")
    val direct = skewed.groupBy(col("k")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedCount(skewed, col("k"), col("row_id"), buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salted sum equals the direct sum on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), col("value").cast("decimal(25,10)").as("v"))
    val direct = ev.groupBy(col("user_id")).agg(sum(col("v")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val salted = Salting.saltedSum(ev, col("user_id"), col("v"), col("event_id"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(salted == direct)
  }

  test("salting actually spreads a hot key across buckets") {
    val s = spark
    import s.implicits._
    val skewed = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "row_id")
    val nBuckets = skewed
      .select(Salting.salt(col("row_id"), 8).as("b")).distinct().count()
    assert(nBuckets > 4, s"expected the hot key spread over >4 of 8 buckets, got $nBuckets")
  }

  test("salted stop-bucket pre-filter equals the direct size cap (simhash path)") {
    val s = spark
    import s.implicits._
    // one structurally hot bucket (5000 rows) + small legitimate buckets —
    // the dedup_simhash shape: blacklist-then-collect must equal cap-after
    val rows = ((1 to 5000).map(i => (i.toLong, 0, 7L)) ++
      Seq((9001L, 1, 1L), (9002L, 1, 1L), (9003L, 2, 2L), (9004L, 2, 2L),
        (9005L, 3, 3L))).toDF("doc_id", "j", "chunk")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Long](2))).toMap
    val direct = canon(rows.groupBy(col("j"), col("chunk"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= 100)
      .select(col("j"), col("chunk"), col("ids")))
    val hot = Salting.saltedCount(rows, struct(col("j"), col("chunk")), col("doc_id"))
      .filter(col("n") > 100)
      .select(col("key.j").as("j"), col("key.chunk").as("chunk"))
    val pre = canon(rows.join(broadcast(hot), Seq("j", "chunk"), "left_anti")
      .groupBy(col("j"), col("chunk"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(col("j"), col("chunk"), col("ids")))
    assert(pre == direct)
    assert(!pre.contains((0, 7L)) && pre.contains((1, 1L)) && pre.contains((2, 2L)))
  }

}
