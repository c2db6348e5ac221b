package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time individual `SparkEntry.queries` entries in isolation
  * (same session config as [[Bench]]) — `runMain graft.Timeit q1_agg ...`
  * with `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` / `SPARK_GRAFT_PASSES`.
  * Bench methodology applies (noop sink, warmup pass, min-of-N), but this
  * prints per-pass times so convergence/variance is visible while tuning.
  */
object Timeit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    args.foreach { name =>
      runOnce(name, Bench.WarmupDir)
      val ts = (1 to passes).map(_ => runOnce(name, sfDir))
      println(f"[timeit] $name min=${ts.min}%.3f passes=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
