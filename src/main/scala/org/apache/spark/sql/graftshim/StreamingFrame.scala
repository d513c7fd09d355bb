package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Construction-only seam #2 (same discipline as [[BucketedRelation]]):
  * re-tag a BATCH plan's rows as a STREAMING micro-batch frame.
  *
  * Why it must exist: a v1 streaming `Source.getBatch` must return a
  * DataFrame whose logical plan is `isStreaming = true` — the engine
  * splices it in place of the `StreamingExecutionRelation` inside a
  * streaming plan — and the only constructor that builds such a frame
  * from an arbitrary computed plan is `SparkSession
  * .internalCreateDataFrame(rdd, schema, isStreaming = true)`, which is
  * `private[sql]`. Spark's own file stream source does exactly this
  * re-tag (its `getBatch` loads a batch relation and re-creates it as a
  * streaming frame); this object is that one call, nothing more — the
  * wrapped `rdd` is the batch plan's compiled output, so all of
  * Catalyst's optimization of the inner plan still applies, executed
  * lazily when the micro-batch runs. */
object StreamingFrame {

  def asStreaming(spark: SparkSession, batch: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = batch.queryExecution
    classic.internalCreateDataFrame(qe.toRdd, batch.schema, isStreaming = true)
  }
}
