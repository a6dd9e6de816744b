package graft.tools

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.meta._

/** JDBC-catalog scale probe (no Spark needed — the catalog is the subject):
  *
  *  - single-writer commit latency (sequential commits to one partition)
  *  - concurrent multi-writer throughput: T threads × M commits against
  *    DISJOINT partitions of one table — the cross-host cadence a
  *    1000-executor streaming ingest puts on the catalog (each thread its
  *    own store instance = own connections, as on distinct hosts)
  *  - contended CAS: T threads racing on the SAME partition with stale
  *    expected versions + retry, verifying every commit lands exactly once
  *  - point head lookup + full head listing at `nPartitions` heads
  *
  * Reference comparison: the PG catalog's claim is ~50 ms equal-value
  * partition queries at 1M partitions (3.0.0 notes) and per-commit
  * round-trips in the low milliseconds (`DBManager.commitData`).
  *
  * args: [nPartitions=100000] [threads=8] [commitsPerThread=50]
  */
object JdbcCatalogProbe {
  private def timeMs[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val threads = args.lift(1).map(_.toInt).getOrElse(8)
    val perThread = args.lift(2).map(_.toInt).getOrElse(50)
    val url = "jdbc:derby:memory:graftprobe;create=true"
    val dir = java.nio.file.Files.createTempDirectory("graft-jdbcprobe-")
      .toFile.getAbsolutePath

    val store = new JdbcMetaStore(url)
    store.createTable(TableInfo(MetaStore.newCommitId(), dir,
      """{"type":"struct","fields":[]}""", Seq("p"), Seq("id"), 4, Map.empty))

    def commitOf(desc: String) = DataCommitInfo(MetaStore.newCommitId(), desc,
      Seq(DataFileInfo(s"/f/${MetaStore.newCommitId()}.parquet", "add", 1L, 0)),
      CommitOp.Append, 0L)

    // ---- single-writer latency
    val (_, warm) = timeMs(store.commit(dir, Seq(commitOf("p=warm")), Map.empty))
    val lat = (1 to 50).map { i =>
      val desc = s"p=lat$i"
      timeMs(store.commit(dir, Seq(commitOf(desc)), Map.empty))._2
    }.sorted
    println(f"[jdbccat] single-writer commit: first=$warm%.1f ms " +
      f"p50=${lat(lat.size / 2)}%.2f ms p99=${lat(lat.size - 1)}%.2f ms")

    // ---- concurrent disjoint-partition throughput (own store per thread)
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until threads).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          val own = new JdbcMetaStore(url)
          (0 until perThread).foreach { i =>
            try own.commit(dir, Seq(commitOf(s"p=t$t-$i")), Map.empty)
            catch { case e: Throwable => errs.add(e) }
          }
        }
      })
    }
    val t0 = System.nanoTime()
    start.countDown()
    pool.shutdown()
    require(pool.awaitTermination(300, TimeUnit.SECONDS))
    val wallS = (System.nanoTime() - t0) / 1e9
    require(errs.isEmpty, s"concurrent commits failed: ${errs.peek()}")
    val total = threads * perThread
    println(f"[jdbccat] $threads writers x $perThread disjoint commits: " +
      f"$wallS%.2f s = ${total / wallS}%.0f commits/s")

    // ---- contended CAS on ONE partition: everyone retries to success
    val pool2 = Executors.newFixedThreadPool(threads)
    val start2 = new CountDownLatch(1)
    (0 until threads).foreach { _ =>
      pool2.submit(new Runnable {
        def run(): Unit = {
          start2.await()
          val own = new JdbcMetaStore(url)
          (0 until 10).foreach { _ =>
            var done = false
            while (!done) {
              val exp = own.partitionHead(dir, "p=hot").map(_.version).getOrElse(-1)
              try { own.commit(dir, Seq(commitOf("p=hot")),
                Map("p=hot" -> exp)); done = true }
              catch { case _: MetaRerunException => () }
            }
          }
        }
      })
    }
    val t1 = System.nanoTime()
    start2.countDown()
    pool2.shutdown()
    require(pool2.awaitTermination(300, TimeUnit.SECONDS))
    val hotS = (System.nanoTime() - t1) / 1e9
    val hotHead = store.partitionHead(dir, "p=hot").get
    require(hotHead.version == threads * 10 - 1,
      s"lost commits: head v${hotHead.version}, expected v${threads * 10 - 1}")
    println(f"[jdbccat] $threads writers x 10 CAS-contended commits on one " +
      f"partition: $hotS%.2f s, head v${hotHead.version} (exactly once each)")

    // ---- head scale: fill to n partitions (batched commits), then lookups
    val already = store.listPartitionHeads(dir).size
    val (_, fillMs) = timeMs {
      (already until n).grouped(2000).foreach { chunk =>
        store.commit(dir, chunk.map(i => commitOf(s"p=bulk$i")).toSeq, Map.empty)
      }
    }
    println(f"[jdbccat] filled to $n heads in ${fillMs / 1000}%.1f s " +
      f"(${(n - already) / (fillMs / 1000)}%.0f partition-commits/s batched)")
    val cold = new JdbcMetaStore(url) // fresh store: no warm caches
    val (h1, pointCold) = timeMs(cold.partitionHead(dir, s"p=bulk${n / 2}"))
    val (_, pointWarm) = timeMs(cold.partitionHead(dir, s"p=bulk${n / 2 + 1}"))
    require(h1.isDefined)
    val (all, listMs) = timeMs(cold.listPartitionHeads(dir))
    println(f"[jdbccat] at ${all.size} heads: point lookup " +
      f"cold=$pointCold%.2f ms warm=$pointWarm%.2f ms full listing=$listMs%.0f ms")
  }
}
