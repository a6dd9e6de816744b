package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Seeded randomized SQL UPDATE/DELETE vs a model, across the TIERED
  * dispatch: predicates over range columns only (metadata-only partition
  * expiry), full PK equality (one-bucket rewrite), plain data predicates
  * (file-targeted rewrite), nested SET leaves, and the delta update/
  * tombstone delete modes — each scenario randomly flips the table's
  * graft.update.mode / graft.delete.mode so both the rewrite and the
  * O(matched-rows) tiers face the same statements. */
class DmlSqlFuzzSuite extends SparkFixture {
  import spark.implicits._

  private val structType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("part", StringType),
    StructField("v", IntegerType),
    StructField("st", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))))

  test("random SQL UPDATE/DELETE sequences match the model (20 scenarios)") {
    spark.conf.set("spark.sql.catalog.graft_df", "graft.catalog.GraftCatalogV2")
    withTempPath { wh =>
      spark.conf.set("spark.graft.warehouse", wh)
      val rnd = new scala.util.Random(4242)
      for (sc <- 1 to 20) {
        case class T(part: String, v: Int, stA: Int, stB: String)
        val n = 8 + rnd.nextInt(12)
        var model: Map[Long, T] = (0 to n).map(k => k.toLong ->
          T(s"p${k % 3}", rnd.nextInt(100), rnd.nextInt(100),
            s"b${rnd.nextInt(3)}")).toMap
        val rows = model.toSeq.map { case (k, m) =>
          Row(k, m.part, m.v, Row(m.stA, m.stB)) }
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 2), structType)
          .createOrReplaceTempView("df_src")
        spark.sql(s"CREATE TABLE graft_df.df.t$sc " +
          "PARTITIONED BY (part, bucket(2, id)) AS SELECT * FROM df_src")
        val tbl = s"graft_df.df.t$sc"
        // random tier modes for this scenario
        if (rnd.nextBoolean())
          spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES " +
            "('graft.update.mode' = 'delta')")
        if (rnd.nextBoolean())
          spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES " +
            "('graft.delete.mode' = 'tombstone')")

        for (_ <- 0 until 3 + rnd.nextInt(4)) rnd.nextInt(6) match {
          case 0 => // range-only DELETE: metadata partition expiry tier
            val p = s"p${rnd.nextInt(3)}"
            spark.sql(s"DELETE FROM $tbl WHERE part = '$p'")
            model = model.filter { case (_, m) => m.part != p }
          case 1 => // PK-equality UPDATE: one-bucket tier
            val k = rnd.nextInt(n + 1).toLong
            val nv = rnd.nextInt(1000)
            spark.sql(s"UPDATE $tbl SET v = $nv WHERE id = $k")
            model = model.map { case (kk, m) =>
              kk -> (if (kk == k) m.copy(v = nv) else m) }
          case 2 => // data-predicate UPDATE with a nested leaf
            val cut = rnd.nextInt(100)
            spark.sql(s"UPDATE $tbl SET st.a = v + 1, st.b = 'u' " +
              s"WHERE v >= $cut")
            model = model.map { case (kk, m) =>
              kk -> (if (m.v >= cut) m.copy(stA = m.v + 1, stB = "u") else m) }
          case 3 => // data-predicate DELETE (rewrite or tombstone tier)
            val cut = rnd.nextInt(100)
            spark.sql(s"DELETE FROM $tbl WHERE v < $cut")
            model = model.filter { case (_, m) => m.v >= cut }
          case 4 => // mixed-predicate UPDATE (range + data conjunction)
            val p = s"p${rnd.nextInt(3)}"
            val cut = rnd.nextInt(100)
            spark.sql(s"UPDATE $tbl SET v = v - 1 " +
              s"WHERE part = '$p' AND v > $cut")
            model = model.map { case (kk, m) =>
              kk -> (if (m.part == p && m.v > cut) m.copy(v = m.v - 1) else m) }
          case 5 => // PK-equality DELETE
            val k = rnd.nextInt(n + 1).toLong
            spark.sql(s"DELETE FROM $tbl WHERE id = $k")
            model -= k
        }

        val got = spark.table(tbl).collect().map { r =>
          r.getLong(0) -> T(r.getString(1), r.getInt(2),
            r.getStruct(3).getInt(0), r.getStruct(3).getString(1))
        }.toMap
        assert(got == model, s"scenario $sc:\n got=$got\n exp=$model")
        spark.sql(s"DROP TABLE $tbl")
      }
    }
  }
}
