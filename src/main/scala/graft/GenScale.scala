package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic scale amplifier for the testdata star schema: replicates
  * each table `factor`× with key strides that keep every foreign-key
  * relationship intact WITHIN a replica (replica i's orders reference
  * replica i's customers, and so on), so join selectivities and group
  * cardinalities scale linearly the way a bigger generated dataset would.
  * Dimension tables (region, nation) stay fixed — their keys are bounded
  * domains, not scale-out entities. Document text and embedding vectors are
  * replicated VERBATIM: cross-replica exact duplicates are the realistic
  * crawl shape the dedup family exists for (and its stop-bucket caps are
  * exercised by exactly this).
  *
  * Embeddings get their own factor (default 4) mirroring the driver's own
  * sf0.01→sf0.1 step (×4 while fact tables grew ×10).
  *
  * Output files are written with small parquet row groups so a single-file
  * table still scans in parallel — the sf0.1 testdata's one-row-group
  * decode floor (see Bench) is exactly what this avoids.
  *
  * Usage: `runMain graft.GenScale <srcDir> <outDir> [factor] [embFactor]`
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val embFactor = if (args.length > 3) args(3).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    /** Replicate `df` n×, shifting each (column -> stride) pair by
      * `rep * stride` so per-replica key spaces are disjoint but internally
      * consistent. One crossJoin with the replica range — no n-way union.
      */
    def amplify(df: DataFrame, n: Int, shifts: (String, Long)*): DataFrame = {
      val rep = spark.range(n).select(col("id").as("_rep"))
      shifts.foldLeft(df.crossJoin(rep)) { case (d, (c, s)) =>
        d.withColumn(c, col(c) + col("_rep") * s)
      }.drop("_rep")
    }

    /** Write as a single `name.parquet` FILE (both Spark and DuckDB read it
      * directly) with 4 MiB row groups for parallel scans.
      */
    def write(df: DataFrame, name: String): Unit = {
      val tmp = s"$outDir/_tmp_$name"
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (4 * 1024 * 1024).toString)
        .parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet")).head
      Files.move(Paths.get(part), Paths.get(s"$outDir/$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      // drop the now-empty staging dir (best-effort)
      Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .foreach(p => Files.deleteIfExists(Paths.get(p)))
      Files.deleteIfExists(Paths.get(tmp))
      println(s"[genscale] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }

    // fixed dimensions: straight copies
    write(Tables.region(spark, srcDir), "region")
    write(Tables.nation(spark, srcDir), "nation")

    val cust = Tables.customer(spark, srcDir)
    val supp = Tables.supplier(spark, srcDir)
    val part = Tables.part(spark, srcDir)
    val ords = Tables.orders(spark, srcDir)
    val li = Tables.lineitem(spark, srcDir)
    val ev = Tables.events(spark, srcDir)
    val docs = Tables.documents(spark, srcDir)
    val emb = Tables.embeddings(spark, srcDir)

    val cS = stride(cust, "c_custkey")
    val sS = stride(supp, "s_suppkey")
    val pS = stride(part, "p_partkey")
    val oS = stride(ords, "o_orderkey")
    val uS = stride(ev, "user_id")
    val eS = stride(ev, "event_id")
    val dS = stride(docs, "doc_id")
    val vS = stride(emb, "vec_id")

    write(amplify(cust, factor, "c_custkey" -> cS), "customer")
    write(amplify(supp, factor, "s_suppkey" -> sS), "supplier")
    write(amplify(part, factor, "p_partkey" -> pS), "part")
    write(amplify(ords, factor, "o_orderkey" -> oS, "o_custkey" -> cS), "orders")
    write(amplify(li, factor,
      "l_orderkey" -> oS, "l_partkey" -> pS, "l_suppkey" -> sS), "lineitem")
    write(amplify(ev, factor, "event_id" -> eS, "user_id" -> uS), "events")
    write(amplify(docs, factor, "doc_id" -> dS), "documents")
    write(amplify(emb, embFactor, "vec_id" -> vS), "embeddings")
    spark.stop()
  }
}
