package graft.meta

/** One commit-timestamp boundary of a table's history with the data files
  * and bytes that boundary adds — the streaming admission-control unit. */
case class CommitBatch(ts: Long, files: Long, bytes: Long)

/** A STRICT incremental read crossed a non-delta commit (RESTORE /
  * overwrite / UPDATE-rewrite). Streaming sources read in strict mode so
  * a running stream whose checkpointed offset precedes such a boundary
  * fails LOUDLY with re-pin guidance instead of silently skipping the
  * partition's window (batch incremental reads keep the reference's
  * abort-to-empty semantics, DataOperation.scala:209-254 — the stream is
  * different: its offset would advance past the boundary and the gap
  * would be unrecoverable without anyone noticing). */
class NonIncrementalWindowException(
    val tablePath: String, val partitionDesc: String, val boundaryTs: Long)
  extends IllegalStateException(
    s"incremental window crosses a non-delta commit (RESTORE/overwrite) at " +
    s"ts=$boundaryTs in partition '$partitionDesc' of $tablePath: delta " +
    "delivery cannot continue without skipping or re-emitting rows. " +
    "Restart the stream with a fresh checkpoint to re-read the restored " +
    s"state, or set readStartTime >= $boundaryTs to continue past the boundary.")

/** Pure version/visibility algebra over the meta store — the heart of the
  * format (SURVEY.md §1.3; reference: DataOperation.scala:101-254).
  */
class SnapshotResolver(store: MetaStore) {

  /** Files visible at one partition version: fold the snapshot's commits
    * newest -> oldest, dropping paths seen with a `del` op
    * (DataOperation.scala:101-149). Returned oldest-commit-first with the
    * commit ordinal (the MOR merge order). */
  def filesAt(tablePath: String, pi: PartitionInfo): Seq[ResolvedFile] =
    filesAtWith(store.getCommits(tablePath, pi.snapshot), pi)

  private def filesAtWith(commits: Map[String, DataCommitInfo],
      pi: PartitionInfo): Seq[ResolvedFile] = {
    val deleted = scala.collection.mutable.HashSet[String]()
    val out = scala.collection.mutable.ArrayBuffer[ResolvedFile]()
    // newest -> oldest so a `del` hides any older `add` of the same path
    pi.snapshot.zipWithIndex.reverse.foreach { case (cid, ordinal) =>
      val c = commits(cid)
      c.files.foreach { f =>
        f.fileOp match {
          case "del" => deleted += f.path
          case "add" =>
            if (!deleted.contains(f.path))
              out += ResolvedFile(f, ordinal, pi.partitionDesc, c.timestamp)
          case other => throw new IllegalArgumentException(s"bad fileOp $other")
        }
      }
    }
    out.sortBy(_.commitOrdinal).toSeq
  }

  /** [[filesAt]] over many partitions with ONE (chunked) commit fetch —
    * a wide-table snapshot pays O(commit-ids / chunk) database
    * round-trips, never one per partition. */
  def filesAtMany(tablePath: String,
      pis: Seq[PartitionInfo]): Seq[ResolvedFile] = {
    val ids = pis.iterator.flatMap(_.snapshot).toSeq.distinct
    if (ids.isEmpty) return Nil
    val commits = store.getCommits(tablePath, ids)
    pis.flatMap(pi => filesAtWith(commits, pi))
  }

  /** Current files of every partition matching `partitionPred`. */
  def currentFiles(
      tablePath: String,
      partitionPred: String => Boolean = _ => true): Seq[ResolvedFile] =
    filesAtMany(tablePath,
      store.listPartitionHeads(tablePath)
        .filter(pi => partitionPred(pi.partitionDesc)))

  /** Current files of EXACTLY the named partitions — a point lookup per
    * desc, never a full head listing (the equal-value prune fast path; at
    * 100k+ partitions the listing itself is the cost). */
  def currentFilesForDescs(
      tablePath: String, descs: Seq[String]): Seq[ResolvedFile] =
    filesAtMany(tablePath, descs.flatMap(d => store.partitionHead(tablePath, d)))

  /** Time-travel analog of [[currentFilesForDescs]]: lineages fetched in
    * one bulk round ([[MetaStore.partitionVersionsBulk]]), boundary pick
    * per desc. */
  def filesUptoTimeForDescs(
      tablePath: String, endTime: Long, descs: Seq[String]): Seq[ResolvedFile] = {
    val lineages = store.partitionVersionsBulk(tablePath, descs)
    filesAtMany(tablePath,
      descs.flatMap(d => lineages.getOrElse(d, Nil)
        .filter(_.timestamp <= endTime).lastOption))
  }

  /** Time travel: latest version with timestamp <= endTime
    * (DataOperation.getLastedVersionUptoTime, :166-207). */
  def versionUptoTime(
      tablePath: String,
      partitionDesc: String,
      endTime: Long): Option[PartitionInfo] =
    store.partitionVersions(tablePath, partitionDesc)
      .filter(_.timestamp <= endTime)
      .lastOption

  def filesUptoTime(
      tablePath: String,
      endTime: Long,
      partitionPred: String => Boolean = _ => true): Seq[ResolvedFile] =
    // prune on the head listing FIRST (pushed partition predicates), then
    // resolve the survivors' lineages in one bulk round instead of a
    // point query per partition — wide-table time travel is O(batches),
    // not O(partitions), in database round-trips
    filesUptoTimeForDescs(tablePath, endTime,
      store.listPartitionHeads(tablePath).map(_.partitionDesc)
        .filter(partitionPred))

  /** Incremental read of one partition over (startTime, endTime]: the union
    * of non-compaction commits in range; aborts (empty) if an Update commit
    * intervened (DataOperation.scala:209-254). Compaction commits are
    * skipped: their data is a rewrite of already-delivered rows. */
  def incrementalFiles(
      tablePath: String,
      partitionDesc: String,
      startTime: Long,
      endTime: Long,
      strict: Boolean = false): Seq[ResolvedFile] =
    incrementalFromLineage(tablePath, partitionDesc,
      store.partitionVersions(tablePath, partitionDesc),
      startTime, endTime, strict)

  /** [[incrementalFiles]] body over a pre-fetched lineage — the bulk
    * callers ([[incrementalFilesAll]], [[incrementalFilesForDescs]]) fetch
    * every changed desc's lineage in ONE [[MetaStore.partitionVersionsBulk]]
    * round instead of two point queries per desc (a new stream's first
    * micro-batch spans full history: O(all partitions) descs). */
  private def incrementalFromLineage(
      tablePath: String,
      partitionDesc: String,
      all: Seq[PartitionInfo],
      startTime: Long,
      endTime: Long,
      strict: Boolean): Seq[ResolvedFile] = {
    val ids = incrementalCommitIds(tablePath, partitionDesc, all,
      startTime, endTime, strict)
    assembleIncremental(partitionDesc, ids,
      store.getCommits(tablePath, ids))
  }

  /** Plan half of [[incrementalFromLineage]]: the ordered NEW commit ids a
    * partition delivers over the window — no commit JSON touched, so bulk
    * callers can fetch every desc's commits in ONE chunked round. */
  private def incrementalCommitIds(
      tablePath: String,
      partitionDesc: String,
      all: Seq[PartitionInfo],
      startTime: Long,
      endTime: Long,
      strict: Boolean): Seq[String] = {
    val versions = all
      .filter(v => v.timestamp > startTime && v.timestamp <= endTime)
    val nonDelta = versions.filter(v => v.commitOp == CommitOp.Update ||
      v.commitOp == CommitOp.Rewrite)
    if (nonDelta.nonEmpty) {
      if (strict) throw new NonIncrementalWindowException(
        tablePath, partitionDesc, nonDelta.map(_.timestamp).min)
      return Nil
    }
    val fresh = versions.filterNot(_.commitOp == CommitOp.Compaction)
    // New commits of each version = snapshot minus previous version's snapshot.
    val commitIds = scala.collection.mutable.LinkedHashSet[String]()
    fresh.foreach { v =>
      val prev = all.filter(_.version < v.version).lastOption
        .map(_.snapshot.toSet).getOrElse(Set.empty)
      v.snapshot.filterNot(prev).foreach(commitIds += _)
    }
    commitIds.toSeq
  }

  private def assembleIncremental(partitionDesc: String, ids: Seq[String],
      commits: Map[String, DataCommitInfo]): Seq[ResolvedFile] =
    ids.zipWithIndex.flatMap { case (cid, ordinal) =>
      val c = commits(cid)
      c.files.filter(_.fileOp == "add")
        .map(f => ResolvedFile(f, ordinal, partitionDesc, c.timestamp))
    }

  /** Distinct commit timestamps in (startTime, endTime], ascending, each
    * with the number of data files that slice of history adds — the
    * admission-control pacing unit for the streaming source (stream
    * offsets ARE commit timestamps, so any returned timestamp is a valid
    * batch boundary). Counting mirrors [[incrementalFiles]]: compaction
    * versions deliver 0 (their data is a rewrite of already-delivered
    * rows) but still emit a boundary so a paced stream can step past
    * them. Update/Rewrite versions are counted by their added files — an
    * overestimate for partitions where they abort incremental delivery,
    * which only paces those batches conservatively. */
  def commitBatches(tablePath: String, startTime: Long, endTime: Long,
      maxBoundaries: Int = Int.MaxValue): Seq[CommitBatch] = {
    // Pass 1 (cheap, in-memory log only): every version line in range with
    // the commit ids it newly adds. No commit JSON is touched yet. Only
    // partitions with lines in range are consulted (indexed range query on
    // the JDBC store — pacing a deep backlog must not point-read every
    // partition's history).
    val lines = scala.collection.mutable.ArrayBuffer[(PartitionInfo, Seq[String])]()
    val changed = store.partitionsChangedBetween(tablePath, startTime, endTime)
    val changedLineages = store.partitionVersionsBulk(tablePath, changed)
    changed.foreach { desc =>
      val all = changedLineages.getOrElse(desc, Nil)
      all.filter(v => v.timestamp > startTime && v.timestamp <= endTime)
        .foreach { v =>
          val newIds =
            if (v.commitOp == CommitOp.Compaction) Nil
            else {
              val prev = all.filter(_.version < v.version).lastOption
                .map(_.snapshot.toSet).getOrElse(Set.empty[String])
              v.snapshot.filterNot(prev)
            }
          lines += ((v, newIds))
        }
    }
    // Pass 2: file/byte counts ONLY for the first `maxBoundaries` distinct
    // timestamps — a paced stream admitting k commits per trigger must not
    // decode a million-commit backlog's metadata to plan one batch.
    lines.groupBy(_._1.timestamp).toSeq.sortBy(_._1).take(maxBoundaries)
      .map { case (ts, ls) =>
        val adds = ls.flatMap { case (_, ids) =>
          store.getCommits(tablePath, ids).values
            .flatMap(_.files.filter(_.fileOp == "add"))
        }
        CommitBatch(ts, adds.size.toLong, adds.map(_.size).sum)
      }
  }

  def incrementalFilesAll(
      tablePath: String,
      startTime: Long,
      endTime: Long,
      partitionPred: String => Boolean = _ => true,
      strict: Boolean = false): Seq[ResolvedFile] = {
    // a DROP tombstone (dropPartition, or restoreTable on a partition born
    // after the boundary) anywhere PAST startTime is invisible below:
    // lineage cuts history at it and partitionsChangedBetween filters to
    // live heads — a strict stream would silently skip the partition's
    // rows and advance its offset past the gap. The probe deliberately
    // ignores endTime: a tombstone committed AFTER the window (a restore
    // landing between offset resolution and file planning — the in-flight
    // micro-batch race) cuts the in-window lineage just the same, so
    // serving (start, end] is already impossible. Fail loudly (same
    // contract as the non-delta-commit check in incrementalFiles); a
    // re-pinned stream (readStartTime >= boundary) never sees it.
    if (strict)
      store.droppedBetween(tablePath, startTime, Long.MaxValue)
        .find(t => partitionPred(t._1))
        .foreach { case (desc, ts) =>
          throw new NonIncrementalWindowException(tablePath, desc, ts) }
    // only partitions with commits in the window can contribute (or carry
    // a non-delta boundary) — a micro-batch on a 100k-partition table
    // resolves O(changed) partitions, not O(all); their lineages come back
    // in one bulk round and their commit JSON in ONE chunked fetch (a
    // getCommits round per desc made a wide catch-up batch O(descs) trips)
    val descs = store.partitionsChangedBetween(tablePath, startTime, endTime)
      .filter(partitionPred)
    val lineages = store.partitionVersionsBulk(tablePath, descs)
    val plans = descs.map(d => d -> incrementalCommitIds(tablePath, d,
      lineages.getOrElse(d, Nil), startTime, endTime, strict))
    val commits = store.getCommits(tablePath,
      plans.iterator.flatMap(_._2).toSeq.distinct)
    plans.flatMap { case (d, ids) => assembleIncremental(d, ids, commits) }
  }

  /** Incremental analog of [[currentFilesForDescs]]: per-desc resolution
    * without a head listing, all lineages in one bulk round (a dead or
    * never-existing desc resolves to an empty lineage and contributes
    * nothing — the explicit per-desc liveness probe this replaces paid a
    * point query per desc for the same answer). */
  def incrementalFilesForDescs(
      tablePath: String,
      startTime: Long,
      endTime: Long,
      descs: Seq[String]): Seq[ResolvedFile] = {
    val lineages = store.partitionVersionsBulk(tablePath, descs)
    val plans = descs.map(d => d -> incrementalCommitIds(tablePath, d,
      lineages.getOrElse(d, Nil), startTime, endTime, strict = false))
    val commits = store.getCommits(tablePath,
      plans.iterator.flatMap(_._2).toSeq.distinct)
    plans.flatMap { case (d, ids) => assembleIncremental(d, ids, commits) }
  }
}
