package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.{Curation, TextOps}

/** Continuous curation over a documents STREAM: the batch quality scorer
  * ([[TextOps.withQuality]], TextStats kernel) is a stateless narrow map,
  * so it composes directly with streaming sources — filter low-quality
  * docs as they arrive, then hand survivors to the bounded stream dedup
  * ([[EventStream.dedupStream]]) and the index append
  * ([[IndexIngest]]). Together these are the always-on ingest path of a
  * training-data pipeline; at 100 TB/day the quality filter drops data
  * BEFORE it ever reaches stateful operators or storage.
  */
object DocStream {

  /** Keep streamed docs whose quality clears `bar` (append mode, no
    * state, no watermark needed — pure filter).
    */
  def qualityFilter(docs: DataFrame,
                    bar: Double = Curation.QualityBar): DataFrame =
    TextOps.withQuality(docs).filter(org.apache.spark.sql.functions.col("quality") >= bar)
}
