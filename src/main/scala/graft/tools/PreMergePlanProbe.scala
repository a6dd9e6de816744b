package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.GraftTable

/** r16: which aggregate operator does preMerge plan? String-valued max_by
  * buffers are not HashAggregate-mutable, so the intra-batch dedup may be
  * silently running as ObjectHashAggregate (or worse, SortAggregate).
  */
object PreMergePlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val t = GraftTable.create(spark, orders.limit(100),
      ProbeTmp.dir("graft-pmp-"), hashColumns = Seq("o_orderkey"), bucketNum = 8)
    val batch = orders.filter(col("o_orderkey") % 5 === 0)
    val merged = graft.write.TransactionalWrite.preMerge(t.info, batch)
    merged.explain("formatted")
  }
}
