package graft

import java.nio.file.{Files, Paths}

import graft.meta._

/** The hash-bucketed partition-head index (FileMetaStore `heads_idx/`):
  * cold point lookups must answer from one bucket + the uncovered log tail
  * and agree exactly with a full-parse listing, across history, rollback,
  * tombstones, tail lag, and log compaction. */
class MetaIndexSuite extends SparkFixture {

  private def mkTable(store: MetaStore, path: String): Unit =
    store.createTable(TableInfo(MetaStore.newCommitId(),
      new java.io.File(path).getCanonicalPath, "{}", Seq("p"), Nil, 1, Map.empty))

  private def commitOne(store: MetaStore, path: String, desc: String,
      op: String, expected: Int): Unit =
    store.commit(path, Seq(DataCommitInfo(MetaStore.newCommitId(), desc,
      Seq(DataFileInfo(s"/f/${MetaStore.newCommitId()}", "add", 10L, -1)),
      op, 0L)), Map(desc -> expected))

  /** Enough partitions to push versions.jsonl past the index-creation
    * threshold (1 MB ≈ 6k lines). */
  private def bigSetup(store: FileMetaStore, path: String, n: Int = 8000): Unit = {
    mkTable(store, path)
    (0 until n by 1000).foreach { base =>
      val commits = (base until math.min(base + 1000, n)).map(i =>
        DataCommitInfo(MetaStore.newCommitId(), f"p=k$i%05d",
          Seq(DataFileInfo(s"/f/$i", "add", 10L, -1)), CommitOp.Append, 0L))
      store.commit(path, commits, Map.empty)
    }
    assert(Files.exists(Paths.get(path, "_graft_meta", "heads_idx", "_watermark")),
      "index not created past the threshold")
  }

  test("index point lookups agree with a full-parse listing") {
    withTempPath { path =>
      val w = new FileMetaStore
      bigSetup(w, path)
      // history on one partition + a rollback, and a tombstone on another
      commitOne(w, path, "p=k00007", CommitOp.Merge, expected = 0)
      commitOne(w, path, "p=k00007", CommitOp.Merge, expected = 1)
      w.rollbackPartition(path, "p=k00007", 1)
      w.dropPartition(path, "p=k00042")

      // oracle: full-parse listing from an independent cold store
      val oracle = new FileMetaStore().listPartitionHeads(path)
        .map(pi => pi.partitionDesc -> pi).toMap
      assert(oracle.size == 7999) // 8000 - dropped

      // probe: ANOTHER cold store, point lookups only (index path)
      val r = new FileMetaStore
      Seq("p=k00000", "p=k00007", "p=k03999", "p=k07999").foreach { d =>
        assert(r.partitionHead(path, d) == oracle.get(d), s"mismatch for $d")
      }
      assert(r.partitionHead(path, "p=k00042").isEmpty, "tombstone must hide")
      assert(r.partitionHead(path, "p=missing").isEmpty)
      // point version history (cold): rollback collapsed, head back at v1
      val vs = new FileMetaStore().partitionVersions(path, "p=k00007")
      assert(vs.map(_.version) == Seq(0, 1), vs)
    }
  }

  test("reader overlays commits past the index watermark (fold lag)") {
    withTempPath { path =>
      val w = new FileMetaStore
      bigSetup(w, path)
      // these land in the log but (being < lag bytes) are NOT folded yet
      commitOne(w, path, "p=tail1", CommitOp.Append, expected = -1)
      commitOne(w, path, "p=k00003", CommitOp.Merge, expected = 0)
      val r = new FileMetaStore
      assert(r.partitionHead(path, "p=tail1").map(_.version) == Some(0))
      assert(r.partitionHead(path, "p=k00003").map(_.version) == Some(1))
      assert(new FileMetaStore().partitionVersions(path, "p=k00003")
        .map(_.version) == Seq(0, 1))
    }
  }

  test("compactVersionLog rebuilds the index consistently") {
    withTempPath { path =>
      val w = new FileMetaStore
      bigSetup(w, path)
      commitOne(w, path, "p=k00005", CommitOp.Merge, expected = 0)
      val dropped = w.compactVersionLog(path, Long.MaxValue) // heads only
      assert(dropped == 1) // k00005's superseded v0 line
      val oracle = new FileMetaStore().listPartitionHeads(path)
        .map(pi => pi.partitionDesc -> pi).toMap
      val r = new FileMetaStore
      Seq("p=k00000", "p=k00005", "p=k07999").foreach { d =>
        assert(r.partitionHead(path, d) == oracle.get(d), s"mismatch for $d")
      }
      assert(new FileMetaStore().partitionVersions(path, "p=k00005")
        .map(_.version) == Seq(1))
    }
  }
}
