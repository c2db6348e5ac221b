package graft

import graft.operators.{PcaModel, VectorOps}
import graft.sources.Tables

class PcaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fit is deterministic and components are orthonormal") {
    val (m1, c1) = PcaModel.fitFromDf(Tables.embeddings(spark, dir), "vec_id", "embedding")
    val (m2, c2) = PcaModel.fitFromDf(Tables.embeddings(spark, dir), "vec_id", "embedding")
    assert(m1.toSeq == m2.toSeq)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    // rounded to 6dp, so norms are 1 within literal-rounding noise
    assert(math.abs(math.sqrt(dot(c1(0), c1(0))) - 1.0) < 1e-4)
    assert(math.abs(math.sqrt(dot(c1(1), c1(1))) - 1.0) < 1e-4)
    assert(math.abs(dot(c1(0), c1(1))) < 1e-3, "components must be orthogonal")
    // sign convention: largest-|coordinate| entry is positive
    c1.foreach { c => assert(c.maxBy(math.abs) > 0) }
  }

  test("vec_pca matches an exact scala fold replica") {
    val (mean, comps) = PcaModel.model(spark, dir)
    val dim = mean.length
    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val want = vecs.map { case (id, x) =>
      def xc(j: Int) = x(j).toDouble - mean(j)
      def proj(c: Array[Double]) = {
        var acc = 0.0; var j = 0
        while (j < dim) { acc = acc + xc(j) * c(j); j += 1 }
        r6(acc)
      }
      val p1 = proj(comps(0)); val p2 = proj(comps(1))
      var e = 0.0; var j = 0
      while (j < dim) {
        val d = xc(j) - p1 * comps(0)(j) - p2 * comps(1)(j)
        e = e + d * d; j += 1
      }
      (id, p1, p2, r6(math.sqrt(e)))
    }.toSet
    val got = VectorOps.vecPca(spark, dir).collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Double]("pc1"), r.getAs[Double]("pc2"),
        r.getAs[Double]("err_l2"))).toSet
    assert(got == want)
  }

  test("rank-2 reconstruction never beats the centered norm it approximates") {
    val (mean, _) = PcaModel.model(spark, dir)
    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val xcNorm = vecs.map { case (id, x) =>
      id -> math.sqrt(x.indices.map(j => math.pow(x(j).toDouble - mean(j), 2)).sum)
    }.toMap
    VectorOps.vecPca(spark, dir).collect().foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Double]("err_l2") <= xcNorm(id) + 1e-3,
        s"vec $id: projecting onto components must not increase the residual")
    }
  }
}
