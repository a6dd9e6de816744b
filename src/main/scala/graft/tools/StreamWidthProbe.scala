package graft.tools

import graft.meta.{CommitOp, DataCommitInfo, DataFileInfo, JdbcMetaStore, MetaStore, SnapshotResolver}

/** WIDE-table streaming-planning probe (JDBC catalog): a micro-batch
  * trigger on a table with N partitions performs
  *   (1) latestOffset  -> maxCommitTs,
  *   (2) planInputPartitions -> incrementalFilesAll over the offset window.
  * Both must cost O(changed partitions), not O(all partitions) — at the
  * reference's quoted 1M-partition scale an O(all) poll per 1-second
  * trigger IS the driver bottleneck. Measures the indexed paths
  * ([[graft.meta.MetaStore.maxCommitTs]],
  * [[graft.meta.MetaStore.partitionsChangedBetween]]) against the naive
  * every-head shapes they replaced.
  *
  * Pure metadata probe — no SparkSession; the window resolution is the
  * driver-side cost being measured. args: [nPartitions=100000]
  */
object StreamWidthProbe {
  private def timeMs[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val store = new JdbcMetaStore("jdbc:derby:memory:streamwidth;create=true")
    val resolver = new SnapshotResolver(store)
    val tp = "/tmp/streamwidth_t"
    store.createTable(graft.meta.TableInfo(
      tableId = java.util.UUID.randomUUID().toString, tablePath = tp,
      schemaJson = """{"type":"struct","fields":[]}""",
      rangeColumns = Seq("p"), hashColumns = Nil, bucketNum = 0,
      properties = Map.empty))

    def commitOne(desc: String): Unit =
      store.commit(tp, Seq(DataCommitInfo(MetaStore.newCommitId(), desc,
        Seq(DataFileInfo(s"/f/$desc-d.parquet", "add", 1000L, -1)),
        CommitOp.Append, 0L)),
        store.partitionHead(tp, desc).map(h => desc -> h.version).toMap)

    // synthesize the wide table: batched appends, one commit per partition
    val batch = 5000
    var made = 0
    val (_, synthMs) = timeMs {
      while (made < n) {
        val m = math.min(batch, n - made)
        store.commit(tp, (made until made + m).map { i =>
          DataCommitInfo(MetaStore.newCommitId(), f"p=s$i%07d",
            Seq(DataFileInfo(s"/f/p$i.parquet", "add", 1000L, -1)),
            CommitOp.Append, 0L)
        }, Map.empty)
        made += m
      }
    }
    println(f"[streamwidth] $n partitions synthesized in ${synthMs / 1000}%.1f s")

    val ts1 = store.maxCommitTs(tp)
    commitOne("p=s0000007") // the trigger's delta: ONE changed partition
    val ts2 = store.maxCommitTs(tp)

    def bench(what: String, reps: Int, warm: Boolean = true)(body: => Any): Unit = {
      if (warm) body
      val ms = (1 to reps).map(_ => timeMs(body)._2).min
      println(f"[streamwidth] $what: $ms%.1f ms")
    }

    // trigger poll: newest commit ts
    bench("maxCommitTs (indexed aggregate)", 5)(store.maxCommitTs(tp))
    bench("naive head-max (ships every head)", 3) {
      store.listPartitionHeads(tp).map(_.timestamp).max
    }
    // micro-batch planning: resolve the (ts1, ts2] window
    bench("incrementalFilesAll over 1-commit window (changed-only)", 5) {
      val fs = resolver.incrementalFilesAll(tp, ts1, ts2)
      require(fs.size == 1, s"expected the 1 delta file, got ${fs.size}")
    }
    bench("naive window resolution (per-head version reads)", 3) {
      store.listPartitionHeads(tp).flatMap(pi =>
        resolver.incrementalFiles(tp, pi.partitionDesc, ts1, ts2))
    }
    bench("commitBatches over 1-commit window", 5) {
      resolver.commitBatches(tp, ts1, ts2)
    }
    if (args.lift(1).contains("debug")) {
      val descs = store.listPartitionHeads(tp).map(_.partitionDesc)
      bench("debug: listPartitionHeads", 1, warm = false) { descs.size }
      var lineages: Map[String, Seq[graft.meta.PartitionInfo]] = Map.empty
      bench("debug: partitionVersionsBulk(all)", 1, warm = false) {
        lineages = store.partitionVersionsBulk(tp, descs)
      }
      val pis = descs.flatMap(d => lineages.getOrElse(d, Nil)
        .filter(_.timestamp <= ts2).lastOption)
      val ids = pis.iterator.flatMap(_.snapshot).toSeq.distinct
      bench(s"debug: getCommits(${ids.size} ids)", 1, warm = false) {
        store.getCommits(tp, ids).size
      }
      bench("debug: assembly (cached commits)", 1, warm = false) {
        resolver.filesAtMany(tp, pis).size
      }
    }
    // full-table time travel: bulk lineage + ONE chunked commit fetch vs a
    // point query per desc (plus a commit fetch per partition via filesAt)
    bench("filesUptoTime over ALL partitions (bulk lineage)", 2) {
      val fs = resolver.filesUptoTime(tp, ts2)
      require(fs.size >= n, s"expected >= $n files, got ${fs.size}")
    }
    bench("naive time travel (per-desc lineage point reads)", 1, warm = false) {
      store.listPartitionHeads(tp)
        .flatMap(pi => resolver.versionUptoTime(tp, pi.partitionDesc, ts2))
        .size
    }
    store.dropTable(tp)
  }
}
