package graft.meta

/** Core metadata model for the graft table format.
  *
  * Mirrors the reference's five logical meta tables (see SURVEY.md §1.1;
  * reference: lakesoul-spark .../utils/MetaData.scala:34-102 and
  * docker/lakesoul-docker-compose-env/meta_init.sql:5-99) but persisted in an
  * embedded, driver-local store instead of PostgreSQL.
  */
object CommitOp {
  val Append = "append" // plain insert of new files
  val Merge = "merge" // delta / upsert files (merge-on-read applies)
  val Update = "update" // full rewrite of a partition (replaces snapshot)
  val Compaction = "compaction" // rewrite of merged state (replaces snapshot)
  val Rewrite = "rewrite" // file-targeted rewrite (del+add): appends to the
  // snapshot like merge, but ABORTS incremental reads like update — the
  // rewritten rows are not a consumable delta
}

/** One physical file belonging to a commit.
  * Reference: DataOperation.scala:35-49 (`DataFileInfo`).
  *
  * @param path     absolute file path
  * @param fileOp   "add" | "del"
  * @param size     bytes
  * @param bucketId hash-bucket id parsed from the file's directory, -1 if the
  *                 table has no primary key
  * @param existCols comma-joined list of columns physically present in the
  *                  file (schema evolution: absent columns read as null)
  * @param stats    per-column min/max JSON ([[FileStats]]); "" = none
  *                 collected (never skip on unknown)
  */
case class DataFileInfo(
    path: String,
    fileOp: String,
    size: Long,
    bucketId: Int,
    existCols: String = "",
    stats: String = "")

/** One atomic commit against one range partition.
  * Reference: TransactionCommit.scala:268-376, meta_init.sql:71-99.
  */
case class DataCommitInfo(
    commitId: String,
    partitionDesc: String,
    files: Seq[DataFileInfo],
    commitOp: String,
    timestamp: Long)

/** One version of one range partition: snapshot = ordered commit-id list
  * (oldest first). Reference: partition_info (meta_init.sql:85-99).
  */
case class PartitionInfo(
    partitionDesc: String,
    version: Int,
    snapshot: Seq[String],
    commitOp: String,
    timestamp: Long)

/** Table-level metadata. Reference: MetaData.scala:34-102 (`TableInfo`). */
case class TableInfo(
    tableId: String,
    tablePath: String,
    schemaJson: String, // Spark StructType.json
    rangeColumns: Seq[String],
    hashColumns: Seq[String],
    bucketNum: Int,
    properties: Map[String, String],
    shortName: Option[String] = None) {
  def hasPrimaryKey: Boolean = hashColumns.nonEmpty
  def cdcColumn: Option[String] = properties.get(TableInfo.CdcColumnProp)
}

/** TOMBSTONE delta runs (beyond-ref; the LSM answer to deletion vectors):
  * a run whose rows are just primary keys, marking every older version of
  * those keys deleted. DELETE stops rewriting whole buckets and writes only
  * the matched keys; the k-way merge drops a key whose newest holder is a
  * tombstone run. Flagged by a reserved token inside `existCols` so
  * [[DataFileInfo]] and its serialization stay unchanged. */
object Tombstone {
  val Marker = "__graft_tombstone__"
  def isTombstone(existCols: String): Boolean =
    existCols != null && existCols.nonEmpty &&
      existCols.split(',').contains(Marker)
  def isTombstone(f: DataFileInfo): Boolean = isTombstone(f.existCols)
}

object TableInfo {
  /** Reference: `lakesoul_cdc_change_column` (LakeSoulUtils.scala:228-247). */
  val CdcColumnProp = "graft.cdc.column"
  /** "tombstone" routes predicate DELETEs on PK tables through [[Tombstone]]
    * delta runs instead of file rewrites (default: rewrite). */
  val DeleteModeProp = "graft.delete.mode"
  /** "delta" routes UPDATEs on PK tables (use_last-family merge ops only)
    * through upsert delta runs instead of file rewrites (default: rewrite). */
  val UpdateModeProp = "graft.update.mode"
  /** "delta" routes general MERGE INTO clauses through delta commits
    * (update/insert rows as an upsert delta + deletes as a tombstone run,
    * published atomically) instead of copy-on-write bucket rewrites, when
    * the clause/operator mix is eligible (default: rewrite). */
  val MergeModeProp = "graft.merge.mode"
  /** Reference: `skip_merge_on_read` (LakeSoulUtils.scala:232). */
  val SkipMergeOnReadProp = "graft.skipMergeOnRead"
  /** Owning domain for catalog authorization ([[AuthContext]]); absent =
    * "public" (shared). Stamped by [[JdbcMetaStore.createTable]] from the
    * caller's identity; the reference keeps the same fact in its PG
    * `domain` columns guarded by row-level security. */
  val DomainProp = "graft.domain"
  /** Per-column merge operators, e.g. "sum" -> "sum_all". */
  def mergeOpProp(col: String): String = s"graft.mergeop.$col"
  /** Root partition desc for tables without range partitions; reference uses
    * the same sentinel (PartitionFilter.scala:79-82). */
  val RootPartition = "-5"
}

/** Resolved view of a partition version: files with their commit ordinal
  * (position of their commit in the snapshot — lower = older write).
  * `commitTs` is the producing commit's store timestamp (ms) when the
  * resolver knows it, else 0 ("unknown"): readers use it to decide which
  * side of a re-bucket MAPPING boundary a file's rows were bucketed under
  * — 0 must be treated as mapping-ambiguous, never as "old". */
case class ResolvedFile(file: DataFileInfo, commitOrdinal: Int,
    partitionDesc: String, commitTs: Long = 0L)
