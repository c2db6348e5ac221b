package graft

import org.apache.spark.sql.functions._

import graft.functions.DotF32

class DotF32Spec extends SparkSpec {

  test("dot product accumulates floats in f64 left-to-right") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val got = df.select(DotF32.column(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(got == 1.0 * 4.0 + 2.0 * 5.0 + 3.0 * 6.0)
  }

  test("mismatched lengths and null inputs yield null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f))),
      (None: Option[Array[Float]], Some(Array(1.0f)))).toDF("a", "b")
    val rows = df.select(DotF32.column(col("a"), col("b"))).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("matches the previous HOF formulation bit-for-bit on real embeddings") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(50).select(col("vec_id"), col("embedding"))
    val pairs = e.as("a").crossJoin(e.as("b")).limit(200)
    val hof = aggregate(
      zip_with(col("a.embedding"), col("b.embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val diff = pairs
      .select((DotF32.column(col("a.embedding"), col("b.embedding")) - hof).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diff == 0.0)
  }
}
