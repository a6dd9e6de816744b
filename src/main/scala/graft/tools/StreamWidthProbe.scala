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
    // args(1): jdbc (default) | file | both — the file store must hold the
    // same O(changed) shapes (its one-pass cached-log overrides), so the
    // probe runs on either backend
    val which = args.lift(1).filterNot(_ == "debug").getOrElse("jdbc")
    val debug = args.contains("debug")
    if (which == "jdbc" || which == "both")
      run(new JdbcMetaStore("jdbc:derby:memory:streamwidth;create=true"),
        "/tmp/streamwidth_t", n, debug, "jdbc")
    if (which == "file" || which == "both") {
      val dir = java.nio.file.Files.createTempDirectory("streamwidth-file-")
      run(new graft.meta.FileMetaStore, dir.toString, n, debug, "file")
    }
  }

  private def run(store: MetaStore, tp: String, n: Int,
      debugFlag: Boolean, label: String): Unit = {
    val resolver = new SnapshotResolver(store)
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
    println(f"[streamwidth:$label] $n partitions synthesized in ${synthMs / 1000}%.1f s")

    val ts1 = store.maxCommitTs(tp)
    commitOne("p=s0000007") // the trigger's delta: ONE changed partition
    val ts2 = store.maxCommitTs(tp)

    def bench(what: String, reps: Int, warm: Boolean = true)(body: => Any): Unit = {
      if (warm) body
      val ms = (1 to reps).map(_ => timeMs(body)._2).min
      println(f"[streamwidth:$label] $what: $ms%.1f ms")
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
    if (debugFlag) {
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
    // CATCH-UP batch: a brand-new stream's first window spans full history
    // — every partition is "changed", so this is the worst-case planning
    // shape (bulk lineage + ONE chunked commit fetch; a getCommits round
    // per desc here was O(all partitions) store trips)
    bench("incrementalFilesAll catch-up over FULL history", 2) {
      val fs = resolver.incrementalFilesAll(tp, 0L, ts2)
      require(fs.size >= n, s"expected >= $n files, got ${fs.size}")
    }
    // mview / secondary-index refresh guard: which ops landed in-window?
    // (GraftTable.commitOpsBetween shape — changed descs, bulk lineages)
    bench("commitOpsBetween over 1-commit window (refresh guard)", 5) {
      store.partitionVersionsBulk(tp,
          store.partitionsChangedBetween(tp, ts1, ts2))
        .valuesIterator.flatten
        .filter(v => v.timestamp > ts1 && v.timestamp <= ts2)
        .map(_.commitOp).toSet
    }
    // strict-stream drop gate: one indexed range scan, empty here
    bench("droppedBetween over open window (strict gate)", 5) {
      require(store.droppedBetween(tp, ts1, Long.MaxValue).isEmpty)
    }
    // vacuum liveness set: retained versions + ONE chunked commit fetch
    // (GraftTable.vacuum shape; a getCommits round per retained line before)
    bench("vacuum liveness set (retainedVersions + filesAtMany)", 2) {
      val live = resolver.filesAtMany(tp, store.retainedVersions(tp, 0L))
      require(live.size >= n, s"expected >= $n live files, got ${live.size}")
    }
    // DESCRIBE HISTORY metadata half: every lineage in one bulk round
    bench("history lineages (partitionVersionsBulk over all descs)", 2) {
      store.partitionVersionsBulk(tp,
        store.listPartitionHeads(tp).map(_.partitionDesc)).size
    }
    // r12: DESCRIBE HISTORY numbers from the RAW log in one seq-ordered
    // scan (rawVersionLines) — no per-desc probes at all
    bench("history raw boundaries (rawVersionLines, one scan)", 2) {
      require(store.rawVersionLines(tp).size >= n)
    }
    store.dropTable(tp)
  }
}
