package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: row-count named queries — `runMain graft.DevCount <sfDir>
  * <name>...` (profiling aid: distinguishes output-size growth from
  * plan regressions when a scale sweep flags a query).
  */
object DevCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"$name rows=${SparkEntry.queries(name)(spark, args(0)).count()}")
    }
  }
}
