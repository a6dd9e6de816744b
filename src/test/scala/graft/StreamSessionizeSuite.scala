package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamSessionize

class StreamSessionizeSuite extends SparkFixture {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private val GapUs = 600L * 1000000L // 10 min in micros

  test("foldSessions: merge, coalesce across gap, counts") {
    val s0 = StreamSessionize.foldSessions(Nil, Seq((1L, 1000L), (1L, 1400L)), 500L)
    assert(s0.map(s => (s.session_start, s.session_end, s.n_events)) ==
      Seq((1000L, 1400L, 2L)))
    // event between two open sessions merges them into one
    val open = s0 ++ StreamSessionize.foldSessions(Nil, Seq((1L, 2500L)), 500L)
    val merged = StreamSessionize.foldSessions(open, Seq((1L, 1950L)), 600L)
    assert(merged.map(s => (s.session_start, s.session_end, s.n_events)) ==
      Seq((1000L, 2500L, 4L)))
    // out-of-gap event stays separate
    val sep = StreamSessionize.foldSessions(s0, Seq((1L, 9000L)), 500L)
    assert(sep.size == 2 && sep.last.n_events == 1L)
  }

  test("streaming sessions close exactly once as the watermark passes") {
    val in = MemoryStream[(Long, Timestamp)](spark, 1)
    val out = StreamSessionize.sessions(
      in.toDF().toDF("user_id", "ts"), "user_id", "ts",
      gap = GapUs, watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      def emitted(): Set[(Long, Long, Long, Long)] = spark.table("sess_out")
        .as[StreamSessionize.Session].collect()
        .map(s => (s.key, s.session_start, s.session_end, s.n_events)).toSet

      // b1: two keys, open sessions only (watermark starts at 0)
      in.addData((1L, ts(1000)), (1L, ts(1100)), (2L, ts(1000)))
      q.processAllAvailable()
      assert(emitted().isEmpty)

      // b2: key 1 jumps to 5000 -> watermark advances to 5000 and the
      // no-data follow-up batch fires the event-time timeouts: key 2's
      // [1000] and key 1's [1000,1100] close; [5000] is within gap of
      // the watermark and stays open
      in.addData((1L, ts(5000)))
      q.processAllAvailable()
      assert(emitted() == Set(
        (2L, 1000000000L, 1000000000L, 1L),
        (1L, 1000000000L, 1100000000L, 2L)))

      // b3: watermark 20000 closes [5000] — each session exactly once
      in.addData((1L, ts(20000)))
      q.processAllAvailable()
      assert(emitted() == Set(
        (2L, 1000000000L, 1000000000L, 1L),
        (1L, 1000000000L, 1100000000L, 2L),
        (1L, 5000000000L, 5000000000L, 1L)))

      // closed sessions agree with the BATCH sessionizer on the closed keys
      val batch = graft.pipeline.Sessionize.sessions(
        Seq((2L, 1000000000L), (1L, 1000000000L), (1L, 1100000000L),
          (1L, 5000000000L)).toDF("user_id", "t"),
        Seq("user_id"), "t", gap = GapUs)
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(emitted() == batch)
    } finally q.stop()
  }
}
