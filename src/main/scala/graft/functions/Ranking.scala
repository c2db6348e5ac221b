package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global top-k with dense 1..k ranks.
  *
  * `row_number() OVER (ORDER BY …)` forces the WHOLE frame through one
  * task; `orderBy(...).limit(k)` plans as TakeOrdered (per-partition heaps
  * merged at the driver), after which ranking the k survivors is trivial.
  * With a deterministic total order the two produce identical rows — this
  * is the only form that survives a corpus-sized input.
  */
object Ranking {
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)
      .withColumn("rk", row_number().over(Window.orderBy(order: _*)).cast("long"))
}
