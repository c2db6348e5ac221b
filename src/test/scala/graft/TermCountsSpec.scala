package graft

import org.apache.spark.sql.functions._

import graft.functions.{MinHashConf, TermCounts}

class TermCountsSpec extends SparkSpec {

  test("kernel counts lowercased ws tokens with multiplicity") {
    val m = TermCounts.counts("The the  cat\tsat")
    assert(m.get("the") == 2L && m.get("cat") == 1L && m.get("sat") == 1L)
    assert(TermCounts.counts("   ").isEmpty)
  }

  test("expression map sums to the token count and explodes correctly") {
    val s = spark
    import s.implicits._
    val df = Seq("a b a c b a", "").toDF("t")
    val rows = df.select(TermCounts.column(col("t")).as("tc"))
      .select(aggregate(map_values(col("tc")), lit(0L), (a, v) => a + v).as("n"))
      .collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(6L, 0L))
    val exploded = df.filter(length(col("t")) > 0)
      .select(explode(TermCounts.column(col("t"))).as(Seq("term", "f")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exploded == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("minhash band keys are deterministic and empty for shingle-less text") {
    val k1 = MinHashConf.bandKeys("the quick brown fox jumps over")
    val k2 = MinHashConf.bandKeys("the quick brown fox jumps over")
    assert(k1.toSeq == k2.toSeq && k1.length == MinHashConf.Bands)
    assert(MinHashConf.bandKeys("one two").isEmpty)
    // identical text -> identical keys; different text -> different keys
    val other = MinHashConf.bandKeys("a completely different set of words here")
    assert(k1.toSeq != other.toSeq)
  }

  test("SQL surface exposes the new kernels") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_term_counts('a b a')['a'] AS fa,
        |       size(graft_minhash_bands('w1 w2 w3 w4 w5')) AS nb""".stripMargin)
      .collect()(0)
    assert(r.getAs[Long]("fa") == 2L)
    assert(r.getAs[Int]("nb") == MinHashConf.Bands)
  }
}
