package graft

import graft.operators.IvfModel

class IvfModelSpec extends SparkSpec {

  private def sample(n: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(n)(i => Array.tabulate(dim)(d => math.sin(i * 31 + d) * 10))

  test("fit is a pure function: identical centroids on every call") {
    val s = sample(200, 8)
    val a = IvfModel.fit(s, 4)
    val b = IvfModel.fit(s.map(_.clone()), 4)
    assert(a.length == 4 && a.head.length == 8)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // 6dp-canonical: every coordinate is its own 6dp rounding
    a.flatten.foreach(v =>
      assert(v == BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("fit handles k larger than the sample by cycling init") {
    val s = sample(3, 4)
    val c = IvfModel.fit(s, 8)
    assert(c.length == 8)
    assert(c.forall(_.length == 4))
  }

  test("centroids reduce within-cluster distance vs the init") {
    val s = sample(500, 8)
    val init = Array.tabulate(4)(i => s(i))
    val fitted = IvfModel.fit(s, 4)
    def cost(cents: Array[Array[Double]]): Double =
      s.map { x =>
        cents.map(c => c.zip(x).map { case (a, b) => (a - b) * (a - b) }.sum).min
      }.sum
    assert(cost(fitted) <= cost(init))
  }

  test("centsCte emits one literal row per centroid") {
    val cte = IvfModel.centsCte(Array(Array(0.5, -1.25), Array(3.0, 0.000001)))
    assert(cte.contains("(CAST(0 AS BIGINT), [0.5, -1.25]::DOUBLE[])"))
    assert(cte.contains("CAST(1 AS BIGINT)"))
    assert(cte.startsWith("cents(cell, centroid) AS"))
  }
}
