package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.meta.{CommitOp, DataCommitInfo, DataFileInfo, FileMetaStore, MetaStore, SnapshotResolver}
import graft.tables.GraftTable

/** Partition-scale probe: how fast is an equal-value partition prune on a
  * table with 100k range partitions? The reference claims ~50 ms equal-value
  * partition queries at 1M partitions against its indexed PG catalog (3.0.0
  * release notes); this measures the embedded FS store's analog:
  *
  *  - META point lookup: resolve the file set of ONE partition by desc
  *    (cold = fresh store instance, first touch pays the log read;
  *    warm = cached, stat-only).
  *  - META full listing: all partition heads (cold/warm).
  *  - E2E SQL read: count of one partition through the DSv2 scan with the
  *    partition filter pushed down (cold store cache / warm).
  *
  * Setup synthesizes N-4 partitions directly through MetaStore.commit
  * (batched) on top of 4 real data partitions — the data path is real for
  * the measured partition; the synthetic ones only need heads + commit JSONs,
  * which is exactly what the prune path touches.
  *
  * args: [nPartitions=100000]
  */
object PartitionScaleProbe {
  private def timeMs[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-partition-scale-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val path = ProbeTmp.dir("graft-pscale-")
    println(s"[pscale] table at $path, target $n partitions")

    // 4 real partitions with data through the normal write path
    val df = (0 until 400).map(i => (i.toLong, s"v$i", s"p${i % 4}")).toDF("id", "v", "p")
    val t = GraftTable.create(spark, df, path, rangeColumns = Seq("p"))
    val realFile = t.liveFiles.head.file // donor file entry for synthetic commits

    // synthesize the remaining partitions: one commit each, batched appends
    val store = MetaStore.default
    val batch = 5000
    var made = 4
    val (_, synthMs) = timeMs {
      while (made < n) {
        val m = math.min(batch, n - made)
        val commits = (made until made + m).map { i =>
          DataCommitInfo(MetaStore.newCommitId(), f"p=s$i%06d",
            Seq(DataFileInfo(realFile.path, "add", realFile.size, -1)),
            CommitOp.Append, 0L)
        }
        store.commit(t.info.tablePath, commits, Map.empty)
        made += m
      }
    }
    println(f"[pscale] synthesized ${n - 4} partitions in ${synthMs / 1000}%.1f s")

    val tp = t.info.tablePath
    val target = "p=p1"

    def coldStore(): (Double, Double) = {
      val s = new FileMetaStore
      val r = new SnapshotResolver(s)
      val (files, pointMs) = timeMs(r.currentFilesForDescs(tp, Seq(target)))
      require(files.nonEmpty, "point lookup found no files")
      val (heads, listMs) = timeMs(s.listPartitionHeads(tp))
      require(heads.size == n, s"expected $n heads, got ${heads.size}")
      (pointMs, listMs)
    }
    // cold: 3 fresh stores; the listing after the point lookup still pays
    // the full log parse (the point path deliberately avoids warming it)
    val colds = (1 to 3).map(_ => coldStore())
    println(f"[pscale] COLD point lookup: ${colds.map(_._1).min}%.1f ms (3 runs: ${colds.map(_._1).map(v => f"$v%.1f").mkString(", ")})")
    println(f"[pscale] COLD full listing: ${colds.map(_._2).min}%.1f ms (3 runs: ${colds.map(_._2).map(v => f"$v%.1f").mkString(", ")})")

    val warmStore = new FileMetaStore
    val warmResolver = new SnapshotResolver(warmStore)
    warmStore.listPartitionHeads(tp) // prime the log cache
    val warmPoint = (1 to 5).map(_ => timeMs(warmResolver.currentFilesForDescs(tp, Seq(target)))._2)
    val warmList = (1 to 5).map(_ => timeMs(warmStore.listPartitionHeads(tp))._2)
    println(f"[pscale] WARM point lookup: median ${warmPoint.sorted.apply(2)}%.2f ms")
    println(f"[pscale] WARM full listing: median ${warmList.sorted.apply(2)}%.2f ms")

    // e2e: partition-pruned count through the DSv2 read path
    def e2e(): Double = {
      val (c, ms) = timeMs(
        spark.read.format("graft").load(path).filter(col("p") === "p1").count())
      require(c == 100, s"expected 100 rows, got $c")
      ms
    }
    e2e() // JIT/codegen prime
    val warmE2e = (1 to 5).map(_ => e2e())
    println(f"[pscale] WARM e2e pruned count: median ${warmE2e.sorted.apply(2)}%.1f ms")
    store.invalidateCache(tp)
    val (coldE2e) = e2e()
    println(f"[pscale] COLD e2e pruned count (cache invalidated): $coldE2e%.1f ms")

    spark.stop()
  }
}
