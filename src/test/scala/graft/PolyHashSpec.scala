package graft

import org.apache.spark.sql.functions._

import graft.functions.PolyHash

class PolyHashSpec extends SparkSpec {

  test("kernel matches the hand-computed fold") {
    // 'a'=97,'b'=98,'c'=99: ((97*31+98)*31+99) % 1e9+7 = 96354
    assert(PolyHash.hash("abc", 31, 1000000007L) == 96354L)
    assert(PolyHash.hash("", 31, 1000000007L) == 0L)
  }

  test("supplementary-plane characters hash as ONE code point (oracle ord() parity)") {
    // U+1F600 😀 is two UTF-16 code units but one code point (128512).
    // DuckDB's ord(substr(s, i, 1)) folds per code point; the JVM kernel
    // must match or every polyhash-family oracle diverges on astral text.
    val mod = 1000000007L
    assert(PolyHash.hash("😀", 31, mod) == 128512L % mod)
    // a, 😀, b  →  ((97*31 + 128512)*31 + 98) % mod
    assert(PolyHash.hash("a😀b", 31, mod) ==
      ((97L * 31 + 128512L) * 31 + 98L) % mod)
  }

  test("expression evaluates in both codegen and interpreted paths") {
    val s = spark
    import s.implicits._
    val df = Seq("abc", "", "key agg row").toDF("t")
    val got = df.select(PolyHash.column(col("t")).as("h")).collect().map(_.getLong(0))
    assert(got(0) == 96354L && got(1) == 0L)
    assert(got(2) == PolyHash.hash("key agg row", 31, 1000000007L))
    // null propagates
    val n = Seq[Option[String]](None).toDF("t")
      .select(PolyHash.column(col("t"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("array-parameterized kernels compare equal by value (canonicalization)") {
    // Two independently-built identical kernels must be == so Catalyst
    // canonicalization / subexpression elimination can merge them — the
    // reason VecSignChunks/PcaProject take Seq params, not Arrays.
    // one shared child Column so the comparison isolates the kernel params
    // (fresh col("x") calls differ by capture Origin, a test artifact)
    val x = col("x")
    def planes() = Array(Array(1.0, -2.0), Array(0.5, 3.0))
    val v1 = org.apache.spark.sql.graft.Bridge.expression(
      graft.functions.VecSignChunks.column(x, planes(), 8))
    val v2 = org.apache.spark.sql.graft.Bridge.expression(
      graft.functions.VecSignChunks.column(x, planes(), 8))
    assert(v1 == v2)
    val p1 = org.apache.spark.sql.graft.Bridge.expression(
      graft.functions.PcaProject.column(x, Array(0.1, 0.2), planes()))
    val p2 = org.apache.spark.sql.graft.Bridge.expression(
      graft.functions.PcaProject.column(x, Array(0.1, 0.2), planes()))
    assert(p1 == p2)
  }

  test("works inside higher-order-function lambdas (minhash path)") {
    val s = spark
    import s.implicits._
    val df = Seq(Seq("ab", "cd")).toDF("xs")
    val got = df.select(transform(col("xs"), x => PolyHash.column(x)).as("hs"))
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(PolyHash.hash("ab", 31, 1000000007L),
      PolyHash.hash("cd", 31, 1000000007L)))
  }
}
