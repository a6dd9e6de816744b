package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's skew
  * splitter can't help (e.g. the hot key is one giant partition on the
  * BUILD side of a sort-merge join, or the skew only materializes after an
  * upstream transform AQE can't see through).
  *
  * Every left row gets a deterministic salt in [0, salt) derived from the
  * full row (murmur3 of all columns — identical rows collapse, everything
  * else spreads uniformly), the right side is replicated `salt` times, and
  * the join key becomes (keys..., salt): a hot key's rows now land on
  * `salt` reducers instead of one. Cost: right side × salt — use for
  * moderate right sides (dimension tables too big to broadcast but far
  * smaller than the skewed fact side).
  */
object SaltedJoin {

  def inner(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1 (otherwise use a plain join)")
    require(keys.nonEmpty, "salted join needs equi-keys")
    val l = left.withColumn("_g_salt",
      pmod(hash(left.columns.map(col): _*), lit(salt)))
    val r = right.withColumn("_g_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, (keys :+ "_g_salt").toSeq).drop("_g_salt")
  }
}
