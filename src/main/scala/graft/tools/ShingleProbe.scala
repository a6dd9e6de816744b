package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val doc = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    doc.cache().count()
    def toks = filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0)
    def shSlice(k: Int) = {
      val ts = toks
      when(size(ts) < k, array(concat_ws(" ", ts)))
        .otherwise(transform(sequence(lit(0), size(ts) - k),
          i => concat_ws(" ", slice(ts, i + 1, lit(k)))))
    }
    def shElem(k: Int) = {
      val ts = toks
      when(size(ts) < k, array(concat_ws(" ", ts)))
        .otherwise(transform(sequence(lit(0), size(ts) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(ts, i + j + 1)): _*)))
    }
    def time(tag: String)(b: => Unit): Unit = {
      val t0 = System.nanoTime(); b
      println(f"[shingle] $tag: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    def run(c: org.apache.spark.sql.Column): Unit =
      doc.select(explode(c).as("g")).groupBy("g").count().orderBy(desc("count")).limit(50).count()
    def shSliceCol(ts: org.apache.spark.sql.Column, k: Int) =
      when(size(ts) < k, array(concat_ws(" ", ts)))
        .otherwise(transform(sequence(lit(0), size(ts) - k),
          i => concat_ws(" ", slice(ts, i + 1, lit(k)))))
    def shElemCol(ts: org.apache.spark.sql.Column, k: Int) =
      when(size(ts) < k, array(concat_ws(" ", ts)))
        .otherwise(transform(sequence(lit(0), size(ts) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(ts, i + j + 1)): _*)))
    def runCol(f: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column): Unit =
      doc.select(toks.as("ts")).select(explode(f(col("ts"), 2)).as("g"))
        .groupBy("g").count().orderBy(desc("count")).limit(50).count()
    for (r <- 1 to 3) {
      time(s"slice-text r$r")(run(shSlice(2)))
      time(s"elem-text  r$r")(run(shElem(2)))
      time(s"slice-col  r$r")(runCol(shSliceCol))
      time(s"elem-col   r$r")(runCol(shElemCol))
    }
    spark.stop()
  }
}
