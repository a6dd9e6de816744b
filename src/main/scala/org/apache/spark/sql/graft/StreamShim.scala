package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Lives under org.apache.spark.sql to reach private[sql] internals — the
  * same integration technique the reference uses (its Spark module is rooted
  * at org/apache/spark/sql/lakesoul). Only used by the streaming source:
  * DSv1 Source.getBatch must return a DataFrame flagged isStreaming. */
object StreamShim {
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** Re-plan a streaming micro-batch DF as a batch DF (Sink.addBatch). */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
