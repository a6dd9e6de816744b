package graft.meta

import java.io.{File, RandomAccessFile}
import java.nio.channels.FileLock
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.json4s._
import org.json4s.jackson.Serialization
import org.json4s.jackson.Serialization.{read => jread, write => jwrite}

/** Thrown when an optimistic commit loses a CAS race; callers re-read the
  * snapshot and retry. Reference: MetaRerunException
  * (TransactionCommit.scala:398-427). */
class MetaRerunException(msg: String) extends RuntimeException(msg)

/** Metadata store API — the same five logical tables as the reference's
  * PostgreSQL catalog (SURVEY.md §1.1), behind a trait so other backends can
  * be added later. */
trait MetaStore {
  def createTable(info: TableInfo): Unit
  def getTableInfo(tablePath: String): Option[TableInfo]
  def updateTableInfo(info: TableInfo): Unit

  /** Atomically publish `commits` (one per touched partition), bumping each
    * partition's version. `expectedVersions` maps partitionDesc -> version the
    * writer read (-1 = partition did not exist); a mismatch at publish time
    * raises [[MetaRerunException]]. */
  def commit(
      tablePath: String,
      commits: Seq[DataCommitInfo],
      expectedVersions: Map[String, Int]): Unit

  /** Head (latest) version of every partition. */
  def listPartitionHeads(tablePath: String): Seq[PartitionInfo]

  /** Full version history of one partition, oldest first. */
  def partitionVersions(tablePath: String, partitionDesc: String): Seq[PartitionInfo]

  def getCommits(tablePath: String, ids: Seq[String]): Map[String, DataCommitInfo]

  /** Repoint a partition head to an old version (C10 rollbackPartition). */
  def rollbackPartition(tablePath: String, partitionDesc: String, toVersion: Int): Unit

  def dropTable(tablePath: String): Unit
  def dropPartition(tablePath: String, partitionDesc: String): Unit

  /** Streaming sink exactly-once bookkeeping (LakeSoulSink.scala:46-49). */
  def getMaxBatchId(tablePath: String, queryId: String): Long
  def recordBatchId(tablePath: String, queryId: String, batchId: Long): Unit
}

/** Filesystem-embedded [[MetaStore]]: per-table directory
  * `<tablePath>/_graft_meta/` holding `table_info.json`, one JSON file per
  * commit under `commits/`, and an append-only `versions.jsonl` log whose last
  * line per partition is the head. Multi-partition commits are atomic under a
  * JVM striped lock + OS file lock (single-driver assumption documented in
  * SURVEY.md §7.5).
  */
class FileMetaStore extends MetaStore {
  private implicit val fmts: Formats = Serialization.formats(NoTypeHints)

  private val locks = new ConcurrentHashMap[String, Object]()
  private def lockFor(tablePath: String): Object =
    locks.computeIfAbsent(canonical(tablePath), _ => new Object)
  private def canonical(p: String): String = new File(p).getCanonicalPath

  private def metaDir(tablePath: String) = Paths.get(canonical(tablePath), "_graft_meta")
  private def tableInfoPath(tp: String) = metaDir(tp).resolve("table_info.json")
  private def commitsDir(tp: String) = metaDir(tp).resolve("commits")
  private def versionsPath(tp: String) = metaDir(tp).resolve("versions.jsonl")
  private def batchesPath(tp: String) = metaDir(tp).resolve("stream_batches.jsonl")

  // Commit timestamps must be strictly increasing per store so that
  // time-travel boundaries are well-defined even when commits land within the
  // same millisecond (tests do).
  private var lastTs: Long = 0L
  private def nextTs(): Long = synchronized {
    lastTs = math.max(System.currentTimeMillis(), lastTs + 1); lastTs
  }

  private def withFileLock[T](tablePath: String)(body: => T): T =
    lockFor(tablePath).synchronized {
      Files.createDirectories(metaDir(tablePath))
      val raf = new RandomAccessFile(metaDir(tablePath).resolve("_lock").toFile, "rw")
      var lock: FileLock = null
      try { lock = raf.getChannel.lock(); body }
      finally { if (lock != null) lock.release(); raf.close() }
    }

  override def createTable(info: TableInfo): Unit = withFileLock(info.tablePath) {
    val p = tableInfoPath(info.tablePath)
    if (Files.exists(p))
      throw new IllegalStateException(s"graft table already exists at ${info.tablePath}")
    Files.createDirectories(commitsDir(info.tablePath))
    Files.writeString(p, jwrite(info))
  }

  override def getTableInfo(tablePath: String): Option[TableInfo] = {
    val p = tableInfoPath(tablePath)
    if (Files.exists(p)) Some(jread[TableInfo](Files.readString(p))) else None
  }

  override def updateTableInfo(info: TableInfo): Unit = withFileLock(info.tablePath) {
    Files.writeString(tableInfoPath(info.tablePath), jwrite(info))
  }

  override def commit(
      tablePath: String,
      commits: Seq[DataCommitInfo],
      expectedVersions: Map[String, Int]): Unit = withFileLock(tablePath) {
    val heads = headMap(tablePath)
    // CAS: every touched partition must still be at the version the writer saw.
    commits.foreach { c =>
      val cur = heads.get(c.partitionDesc).map(_.version).getOrElse(-1)
      val exp = expectedVersions.getOrElse(c.partitionDesc, -1)
      if (cur != exp)
        throw new MetaRerunException(
          s"partition '${c.partitionDesc}' moved: expected v$exp, found v$cur")
    }
    val ts = nextTs()
    val newHeads = commits.map { c0 =>
      val c = c0.copy(timestamp = ts)
      Files.writeString(commitsDir(tablePath).resolve(s"${c.commitId}.json"), jwrite(c))
      val prev = heads.get(c.partitionDesc)
      val snapshot = c.commitOp match {
        case CommitOp.Append | CommitOp.Merge | CommitOp.Rewrite =>
          prev.map(_.snapshot).getOrElse(Nil) :+ c.commitId
        case CommitOp.Update | CommitOp.Compaction => Seq(c.commitId)
        case other => throw new IllegalArgumentException(s"unknown commitOp $other")
      }
      PartitionInfo(c.partitionDesc, prev.map(_.version + 1).getOrElse(0),
        snapshot, c.commitOp, ts)
    }
    appendVersions(tablePath, newHeads)
  }

  private def appendVersions(tablePath: String, infos: Seq[PartitionInfo]): Unit = {
    val lines = infos.map(jwrite(_)).mkString("", "\n", "\n")
    Files.write(versionsPath(tablePath), lines.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def allVersionLines(tablePath: String): Seq[PartitionInfo] = {
    val p = versionsPath(tablePath)
    if (!Files.exists(p)) Nil
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map(jread[PartitionInfo](_))
  }

  /** Head per partition = last log line per desc (a rollback/drop appends a
    * new line, so log order — not max version — defines the head). */
  private def headMap(tablePath: String): Map[String, PartitionInfo] = {
    val m = scala.collection.mutable.LinkedHashMap[String, PartitionInfo]()
    allVersionLines(tablePath).foreach(pi => m(pi.partitionDesc) = pi)
    m.filter(_._2.version >= 0).toMap // version -1 = dropped tombstone
  }

  override def listPartitionHeads(tablePath: String): Seq[PartitionInfo] =
    headMap(tablePath).values.toSeq.sortBy(_.partitionDesc)

  override def partitionVersions(tablePath: String, desc: String): Seq[PartitionInfo] = {
    // Versions valid for the current head lineage: cut history at the last
    // tombstone, and collapse rollback re-appends (same version re-published).
    val lines = allVersionLines(tablePath).filter(_.partitionDesc == desc)
    val afterDrop = lines.lastIndexWhere(_.version == -1) match {
      case -1 => lines
      case i => lines.drop(i + 1)
    }
    val m = scala.collection.mutable.LinkedHashMap[Int, PartitionInfo]()
    afterDrop.foreach(pi => m(pi.version) = pi)
    val head = afterDrop.lastOption.map(_.version).getOrElse(-1)
    m.values.toSeq.filter(_.version <= head).sortBy(_.version)
  }

  override def getCommits(tablePath: String, ids: Seq[String]): Map[String, DataCommitInfo] =
    ids.map { id =>
      val p = commitsDir(tablePath).resolve(s"$id.json")
      id -> jread[DataCommitInfo](Files.readString(p))
    }.toMap

  override def rollbackPartition(tablePath: String, desc: String, toVersion: Int): Unit =
    withFileLock(tablePath) {
      val target = partitionVersions(tablePath, desc).find(_.version == toVersion)
        .getOrElse(throw new IllegalArgumentException(
          s"no version $toVersion for partition '$desc'"))
      appendVersions(tablePath, Seq(target.copy(timestamp = nextTs())))
    }

  override def dropTable(tablePath: String): Unit = withFileLock(tablePath) {
    def rec(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec)
      f.delete()
    }
    val d = metaDir(tablePath).toFile
    if (d.exists()) rec(d)
  }

  override def dropPartition(tablePath: String, desc: String): Unit =
    withFileLock(tablePath) {
      appendVersions(tablePath,
        Seq(PartitionInfo(desc, -1, Nil, CommitOp.Update, nextTs())))
    }

  override def getMaxBatchId(tablePath: String, queryId: String): Long = {
    val p = batchesPath(tablePath)
    if (!Files.exists(p)) -1L
    else Files.readAllLines(p).asScala
      .filter(_.startsWith(queryId + "\t"))
      .map(_.split("\t")(1).toLong)
      .foldLeft(-1L)(math.max)
  }

  override def recordBatchId(tablePath: String, queryId: String, batchId: Long): Unit =
    withFileLock(tablePath) {
      Files.write(batchesPath(tablePath),
        s"$queryId\t$batchId\n".getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
}

object MetaStore {
  /** Process-wide default store (single-driver embedded catalog). */
  lazy val default: MetaStore = new FileMetaStore
  def newCommitId(): String = UUID.randomUUID().toString
}
