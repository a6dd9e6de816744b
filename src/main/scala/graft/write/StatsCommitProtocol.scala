package graft.write

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage
import org.apache.spark.internal.io.FileNameSpec
import org.apache.spark.sql.execution.datasources.SQLHadoopMapReduceCommitProtocol
import org.apache.spark.sql.types.DataType

/** Footer-stats collection INSIDE the write tasks, piggybacked on the file
  * commit protocol (the fix for the last fixed per-upsert tax: driver-side
  * post-write footer reads in [[FileStatsCollector.attach]]).
  *
  * Each write task records the files it creates (`newTaskTempFile`), and at
  * `commitTask` — while the just-written footers are page-cache hot ON THAT
  * EXECUTOR — reads their min/max bounds and ships them back inside the
  * task commit message. The driver merges the per-task maps at `commitJob`
  * and [[TransactionalWrite.writeFiles]] attaches them by file name, so at
  * cluster scale stats collection costs zero extra IO round-trips: no
  * driver re-open of N remote files, no second Spark job. Files whose
  * task-side read failed (never observed in practice — parquet stats are
  * an optimization, not a correctness dependency) fall back to the old
  * driver-side attach.
  *
  * The spec (which columns to index) is handed from `writeFiles` to the
  * protocol instance through [[StatsCommitProtocol.register]], keyed by the
  * job's output path: `FileCommitProtocol.instantiate` only passes
  * (jobId, outputPath, dynamicPartitionOverwrite), and the instance is
  * constructed on the DRIVER and serialized to every task, so a driver-side
  * handoff at construction reaches all executors. Writes that did not
  * register (any other parquet write while the conf is set) behave exactly
  * like the parent protocol. */
class StatsCommitProtocol(jobId: String, path: String,
    dynamicPartitionOverwrite: Boolean)
    extends SQLHadoopMapReduceCommitProtocol(jobId, path,
      dynamicPartitionOverwrite) {

  // resolved driver-side at construction, serialized into every task
  private val spec: StatsCommitProtocol.Spec =
    StatsCommitProtocol.pending.get(StatsCommitProtocol.key(path))

  // (output-relative key, staging path): a task writing several dynamic
  // partition dirs produces SAME-NAMED part files in each, so the key MUST
  // include the partition dir, never the bare file name
  @transient private var taskFiles: ArrayBuffer[(String, String)] = _

  override def setupTask(taskContext: TaskAttemptContext): Unit = {
    super.setupTask(taskContext)
    taskFiles = ArrayBuffer.empty[(String, String)]
  }

  override def newTaskTempFile(taskContext: TaskAttemptContext,
      dir: Option[String], fileSpec: FileNameSpec): String = {
    val f = super.newTaskTempFile(taskContext, dir, fileSpec)
    if (spec != null && taskFiles != null) {
      val name = new org.apache.hadoop.fs.Path(f).getName
      taskFiles += ((dir.map(_ + "/").getOrElse("") + name, f))
    }
    f
  }

  override def commitTask(taskContext: TaskAttemptContext): TaskCommitMessage = {
    // read footers BEFORE the parent moves the task's files
    val stats: Map[String, String] =
      if (spec == null || taskFiles == null) Map.empty
      else taskFiles.iterator.filter(_._2.endsWith(".parquet")).flatMap {
        case (key, f) =>
          try {
            val s = FileStatsCollector.readLocalOrHadoop(f,
              taskContext.getConfiguration, spec.indexed, spec.rowCountShadowed)
            if (s.isEmpty) None else Some(key -> s)
          } catch { case NonFatal(_) => None }
      }.toMap
    val base = super.commitTask(taskContext)
    new TaskCommitMessage((base.obj, stats))
  }

  override def commitJob(jobContext: JobContext,
      taskCommits: Seq[TaskCommitMessage]): Unit = {
    val unwrapped = taskCommits.map { m =>
      m.obj match {
        case (orig, _: Map[_, _]) => new TaskCommitMessage(orig)
        case _ => m
      }
    }
    super.commitJob(jobContext, unwrapped)
    if (spec != null) {
      val merged = taskCommits.iterator.flatMap(_.obj match {
        case (_, s: Map[_, _]) => s.asInstanceOf[Map[String, String]]
        case _ => Nil
      }).toMap
      StatsCommitProtocol.results.put(StatsCommitProtocol.key(path), merged)
      StatsCommitProtocol.collectedFiles.addAndGet(merged.size)
    }
  }

  override def abortJob(jobContext: JobContext): Unit = {
    super.abortJob(jobContext)
    StatsCommitProtocol.results.remove(StatsCommitProtocol.key(path))
  }
}

object StatsCommitProtocol {
  /** What to collect: indexed column types + whether the reserved
    * row-count key is shadowed by a real column. Serialized to tasks. */
  case class Spec(indexed: Map[String, DataType], rowCountShadowed: Boolean)

  private val pending = new ConcurrentHashMap[String, Spec]()
  private val results = new ConcurrentHashMap[String, Map[String, String]]()

  /** Total files whose stats were collected task-side in this JVM
    * (ops/test introspection: proves the driver fallback stayed idle). */
  val collectedFiles = new java.util.concurrent.atomic.AtomicLong(0)

  /** Normalize "file:/x" vs "/x" — `instantiate` may receive either. */
  private def key(p: String): String = {
    val u = new org.apache.hadoop.fs.Path(p).toUri
    if (u.getPath == null || u.getPath.isEmpty) p else u.getPath
  }

  /** Driver-side, before the write job: hand the spec to the protocol
    * instance the job will construct for `outputPath`. */
  def register(outputPath: String, spec: Spec): Unit =
    pending.put(key(outputPath), spec)

  /** Driver-side, after the write job: collect (and clear) the merged
    * fileName -> stats map; empty when the job never ran or collected
    * nothing. Always clears the registration. */
  def take(outputPath: String): Map[String, String] = {
    pending.remove(key(outputPath))
    Option(results.remove(key(outputPath))).getOrElse(Map.empty)
  }
}
