package graft.write

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Refcounted session-conf swap for write-scoped settings
  * (`spark.sql.parquet.outputTimestampType`,
  * `spark.sql.sources.commitProtocolClass`).
  *
  * Concurrent [[TransactionalWrite.writeFiles]] calls on ONE SparkSession
  * all want the same session-constant values; a naive save/set/restore per
  * writer is racy — writer A's finally can unset the conf while writer B's
  * plan is still resolving, silently switching B to INT96 timestamps (no
  * parquet stats) or to the driver-side stats fallback. Here the first
  * acquirer records the pre-existing value and sets the conf; only the
  * last releaser restores it. Values must be identical across concurrent
  * holders of one key (enforced — a mismatch is a programming error). */
private[graft] object SessionConfGuard {

  private final class Hold(var count: Int, val prev: Option[String], val value: String)

  // keyed by (session, conf key); guarded by the map's own monitor — conf
  // get/set is driver-side and cheap, contention is writer-start/end only
  private val holds = mutable.Map.empty[(SparkSession, String), Hold]

  def acquire(spark: SparkSession, key: String, value: String): Unit =
    holds.synchronized {
      holds.get((spark, key)) match {
        case Some(h) =>
          require(h.value == value,
            s"conflicting guarded values for $key: '${h.value}' vs '$value'")
          h.count += 1
        case None =>
          val prev = spark.conf.getOption(key)
          spark.conf.set(key, value)
          holds((spark, key)) = new Hold(1, prev, value)
      }
    }

  def release(spark: SparkSession, key: String): Unit =
    holds.synchronized {
      holds.get((spark, key)).foreach { h =>
        h.count -= 1
        if (h.count <= 0) {
          h.prev match {
            case Some(v) => spark.conf.set(key, v)
            case None => spark.conf.unset(key)
          }
          holds.remove((spark, key))
        }
      }
    }

  /** Held entries for a session (test/ops introspection). */
  def heldKeys(spark: SparkSession): Seq[String] =
    holds.synchronized { holds.keys.collect { case (s, k) if s eq spark => k }.toSeq }
}
