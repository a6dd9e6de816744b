package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.RebucketLog

/** Unit pins for the mapping-change event log (graft.meta.RebucketLog):
  * open/close lifecycle, overlap cushions, bucketNum replay, pruning +
  * horizon. The event log is what keeps incremental/diff windows exact
  * across re-buckets (CdcModelCheckSuite drives the end-to-end part). */
class RebucketLogSuite extends AnyFunSuite {

  private val empty = Map.empty[String, String]

  test("open marker overlaps every window past its start and closes in place") {
    val open = RebucketLog.appendOpen(empty, ts0 = 10000L, oldN = 4, newN = 8)
    // a crash between flip and publish leaves exactly this state: every
    // window reaching past ts0 must be treated as mapping-ambiguous
    assert(RebucketLog.overlaps(open, 20000L, 1e15.toLong))
    assert(RebucketLog.overlaps(open, 0L, 10000L))
    assert(!RebucketLog.overlaps(open, 0L, 8000L), "fully before ts0-1000")
    // bucketNum replay still works with the open end
    assert(RebucketLog.bucketNumAt(5000L, open, current = 8) == 4)
    assert(RebucketLog.bucketNumAt(20000L, open, current = 8) == 8)

    val closed = RebucketLog.close(open, ts1 = 30000L)
    assert(!RebucketLog.overlaps(closed, 40000L, 50000L),
      "a closed event no longer flags later windows")
    assert(RebucketLog.overlaps(closed, 25000L, 40000L))
    assert(closed(RebucketLog.Prop) == "10000:30000:4:8")
  }

  test("close bounds stale markers from a crashed earlier attempt too") {
    val crashed = RebucketLog.appendOpen(empty, 1000L, 4, 8)
    val retried = RebucketLog.appendOpen(crashed, 2000L, 8, 16)
    val done = RebucketLog.close(retried, 5000L)
    assert(done(RebucketLog.Prop) == "1000:5000:4:8,2000:5000:8:16")
    assert(!RebucketLog.overlaps(done, 7000L, 9000L))
  }

  test("pruning keeps open markers, records the horizon, and bucketNumAt " +
    "callers can refuse past it") {
    var props = RebucketLog.appendOpen(empty, ts0 = 5L, oldN = 2, newN = 4)
    // 300 closed events on top of one open marker -> prune must drop only
    // closed ones and remember the newest dropped boundary
    (1 to 300).foreach { i =>
      props = RebucketLog.appendClosed(props,
        1000L * i, 1000L * i + 10, i, i + 1)
    }
    val entries = props(RebucketLog.Prop).split(",")
    assert(entries.length == RebucketLog.MaxEvents)
    assert(entries.exists(_.endsWith(":open:2:4")),
      "the open marker must survive pruning — it is the only record of a " +
        "possibly-mixed-mapping table")
    val h = RebucketLog.horizon(props)
    assert(h.nonEmpty && h.get >= 1000L * (300 - RebucketLog.MaxEvents) + 10,
      s"horizon must cover the dropped events (got $h)")
  }

  test("windows reaching past the prune horizon or under a pending restore " +
    "are conservatively mapping-ambiguous") {
    val horizoned = Map(RebucketLog.HorizonProp -> "5000")
    assert(RebucketLog.overlaps(horizoned, 1000L, 9000L),
      "a window starting before the horizon may span a pruned event")
    assert(!RebucketLog.overlaps(horizoned, 6000L, 9000L),
      "a window fully past the horizon with no events is single-mapping")
    val pending = Map(graft.meta.MetaStore.RestorePendingProp -> "1234")
    assert(RebucketLog.overlaps(pending, 999999L, 9999999L),
      "an unfinished restore makes every window mapping-ambiguous")
  }

  test("legacy closed-format strings parse unchanged") {
    val props = Map(RebucketLog.Prop -> "100:200:4:8,300:400:8:2")
    assert(RebucketLog.bucketNumAt(50L, props, current = 2) == 4)
    assert(RebucketLog.bucketNumAt(250L, props, current = 2) == 8)
    assert(RebucketLog.bucketNumAt(500L, props, current = 2) == 2)
    assert(RebucketLog.overlaps(props, 150L, 350L))
    assert(!RebucketLog.overlaps(props, 1500L, 3500L))
  }
}
