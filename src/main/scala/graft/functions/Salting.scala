package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase (salted) aggregation for skewed keys (SURVEY §4).
  *
  * A hot key sends all its rows to one reducer; salting splits each key
  * into `buckets` deterministic sub-keys, aggregates partials in parallel,
  * then merges the partials — the classic fix when AQE's skew handling
  * isn't available for an agg (it only splits skewed JOIN partitions).
  * Works for any algebraic aggregate (count/sum/min/max); the salt
  * derives from a row-identity column so results are deterministic.
  */
object Salting {

  def salt(saltSource: Column, buckets: Int): Column =
    pmod(xxhash64(saltSource), lit(buckets))

  /** count(*) per key, salted. Equivalent to `groupBy(key).count()`. */
  def saltedCount(df: DataFrame, key: Column, saltSource: Column,
                  buckets: Int = 16): DataFrame =
    df.groupBy(key.as("key"), salt(saltSource, buckets).as("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("key")).agg(sum(col("_partial")).as("n"))

  /** sum(value) per key, salted. Equivalent to `groupBy(key).sum(value)`. */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltSource: Column,
                buckets: Int = 16): DataFrame =
    df.groupBy(key.as("key"), salt(saltSource, buckets).as("_salt"))
      .agg(sum(value).as("_partial"))
      .groupBy(col("key")).agg(sum(col("_partial")).as("total"))
}
