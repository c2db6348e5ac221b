package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.index.IndexStore
import graft.operators.VectorOps
import graft.sources.Tables
import graft.streaming.VectorStream

case class QueryVec(id: Long, vec: Array[Float])

/** Streaming ANN serving: a query stream ADC-scored against a persisted
  * ivfpq index matches the batch serving path exactly.
  */
class VectorStreamSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("streamed adc top-k equals the batch adcSearch over the same artifact") {
    val root = java.nio.file.Files.createTempDirectory("graft_vstream").toString
    val vectors = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    IndexStore.build(vectors, root, "serve", "ivfpq")
    val index = IndexStore.load(spark, root, "serve")
    val cents = IndexStore.loadCentroids(spark, root, "serve")
    val cb = IndexStore.loadCodebooks(spark, root, "serve")

    val queries = vectors.filter(col("id") < 10).collect()
      .map(r => QueryVec(r.getLong(0), r.getSeq[Float](1).toArray))

    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[QueryVec]
    mem.addData(queries.toIndexedSeq: _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val q = VectorStream
      .adcCandidates(mem.toDF(), index, cents, cb)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized {
          out ++= VectorStream.rankTopK(batch, VectorOps.DefaultK).collect()
            .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rk"),
              r.getAs[Long]("neighbor_id"), r.getAs[Double]("score")))
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val want = IndexStore.adcSearch(spark, root, "serve",
        vectors.filter(col("id") < 10), VectorOps.DefaultK)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("score")))
    assert(out.sorted.toSeq == want.sorted.toSeq)
    assert(out.map(_._1).distinct.size == queries.length)
  }
}
