package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization via `flatMapGroupsWithState` — the
  * custom-state half of the streaming surface (the windowed-aggregation
  * half is covered by watermark + window upserts; sessions need ARBITRARY
  * state because a session's extent isn't known until the gap passes).
  *
  * Semantics match [[graft.pipeline.Sessionize.sessions]] on the closed
  * portion of the stream: a session is emitted exactly once, when the
  * event-time watermark passes `session_end + gap` — late events inside
  * the watermark extend or merge open sessions (state holds EVERY session
  * not yet provably closed, so out-of-order arrivals within the watermark
  * never corrupt a result; events later than the watermark are dropped by
  * Spark upstream, the standard contract).
  *
  * Scale shape: state is per-key and bounded by the number of open
  * sessions x 3 longs — the watermark closes sessions continuously, so
  * state size tracks ACTIVE keys, not history. One stateful shuffle on
  * the key, exactly what a 1000-executor cluster wants. */
object StreamSessionize {

  /** One closed (or still-open, in state) session. */
  case class Session(key: Long, session_start: Long, session_end: Long,
      n_events: Long)

  /** Open-session state carried between micro-batches. */
  case class OpenSessions(sessions: Seq[Session])

  def foldSessions(
      existing: Seq[Session], incoming: Seq[(Long, Long)], gap: Long): Seq[Session] = {
    // merge the open sessions and the new events into gap-separated runs:
    // treat open sessions as intervals, events as points, sweep in time
    // order — adjacent pieces closer than `gap` coalesce
    val pieces =
      existing.map(s => (s.session_start, s.session_end, s.n_events)) ++
        incoming.map { case (k @ _, t) => (t, t, 1L) }
    val sorted = pieces.sortBy(p => (p._1, p._2))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    sorted.foreach { case (s, e, n) =>
      if (out.nonEmpty && s - out.last._2 <= gap) {
        val (ps, pe, pn) = out.last
        out(out.length - 1) = (ps, math.max(pe, e), pn + n)
      } else out += ((s, e, n))
    }
    out.toSeq.map { case (s, e, n) => Session(0L, s, e, n) }
  }

  /** Sessionize a STREAMING frame: `keyCol` (castable to long), `tsCol`
    * (TIMESTAMP; the caller's watermark column). Emits one row per closed
    * session with micros timestamps. `watermarkDelay` is applied here so
    * the op is self-contained. */
  def sessions(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: Long,
      watermarkDelay: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).cast("long").as("k"),
        col(tsCol).as("ts"),
        unix_micros(col(tsCol)).as("t"))
      .as[(Long, java.sql.Timestamp, Long)]

    ds.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state: GroupState[OpenSessions]) =>
          val wm = state.getCurrentWatermarkMs() * 1000L // micros
          val prior = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val merged =
            foldSessions(prior, rows.map(r => (r._1, r._3)).toSeq, gap)
              .map(_.copy(key = key))
          // provably closed: no in-watermark event can still attach
          val (closed, open) = merged.partition(_.session_end + gap < wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open))
            // fire exactly when the earliest open session's emission
            // condition can hold: Spark fires at wm_ms > timeoutTs, and
            // end+gap < wm_ms*1000 first holds at wm_ms =
            // floor((end+gap)/1000)+1 — so timeoutTs = floor((end+gap)/1000)
            val wake = (open.map(_.session_end).min + gap) / 1000L
            state.setTimeoutTimestamp(math.max(wake,
              state.getCurrentWatermarkMs() + 1L))
          }
          closed.iterator
      }
  }
}
