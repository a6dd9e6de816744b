package graft.streaming

import graft.meta.CommitBatch

/** Shared admission-control budget walk for both streaming sources (DSv2
  * micro-batch stream and the DSv1 format("graft") source): offsets are
  * commit timestamps, so pacing advances the end offset along ascending
  * commit boundaries, admitting whole commits until any budget would be
  * exceeded. Always admits at least one commit — a single oversized commit
  * still forms one batch, it cannot be split below offset granularity. */
object StreamPacing {

  def unpaced(maxCommits: Option[Int], maxFiles: Option[Long],
      maxBytes: Option[Long]): Boolean =
    maxCommits.isEmpty && maxFiles.isEmpty && maxBytes.isEmpty

  /** The paced end offset for a batch starting (exclusive) at `start`.
    * `batches` are the ascending commit boundaries of (start, newest]. */
  def boundedEnd(batches: Seq[CommitBatch], start: Long,
      maxCommits: Option[Int], maxFiles: Option[Long],
      maxBytes: Option[Long]): Long = {
    val byCommits = maxCommits.getOrElse(Int.MaxValue)
    val fileBudget = maxFiles.getOrElse(Long.MaxValue)
    val byteBudget = maxBytes.getOrElse(Long.MaxValue)
    var end = start
    var commits = 0
    var files = 0L
    var bytes = 0L
    val it = batches.iterator
    var done = false
    while (it.hasNext && !done) {
      val b = it.next()
      if (commits > 0 && (commits >= byCommits || files + b.files > fileBudget ||
          bytes + b.bytes > byteBudget)) done = true
      else { end = b.ts; commits += 1; files += b.files; bytes += b.bytes }
    }
    end
  }

  /** How many commit boundaries a paced latestOffset can possibly admit:
    * exactly maxCommits when commit-paced; otherwise a generous cap (every
    * non-compaction commit consumes >= 1 file of budget, so only
    * pathological all-compaction stretches hit it, and hitting it only
    * under-admits — never over). Bounds the metadata decoded per trigger
    * on deep backlogs. */
  def boundaryCap(maxCommits: Option[Int], maxFiles: Option[Long]): Int =
    maxCommits.getOrElse(
      maxFiles.map(f => math.min(f + 1, 65536L).toInt).getOrElse(65536))

  /** Case-insensitive option lookups shared by both sources. */
  def intOption(options: Map[String, String], key: String): Option[Int] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v.toInt }
  def longOption(options: Map[String, String], key: String): Option[Long] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v.toLong }
}
