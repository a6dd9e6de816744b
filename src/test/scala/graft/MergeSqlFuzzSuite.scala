package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Seeded randomized SQL MERGE INTO shapes vs an in-memory model — fuzzes
  * the DML rule's clause translation (GraftDmlRules.buildClausesCommand:
  * attribute qualification, assignment alignment/unwrap, self-assignment
  * elision, conditional clause chains) end-to-end through Spark's
  * analyzer, which pads/aligns assignments in ways handwritten suites
  * under-sample. Each scenario draws: overlapping/disjoint source keys,
  * clause sets from {MATCHED DELETE, MATCHED UPDATE (conditional or not,
  * random SET subsets incl. a nested leaf), NOT MATCHED INSERT
  * (conditional or not)}, and random predicates over target AND source
  * columns. */
class MergeSqlFuzzSuite extends SparkFixture {
  import spark.implicits._

  private val structType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", IntegerType),
    StructField("tag", StringType),
    StructField("st", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))))

  test("random SQL MERGE clause shapes match the model (30 scenarios)") {
    spark.conf.set("spark.sql.catalog.graft_mf", "graft.catalog.GraftCatalogV2")
    withTempPath { wh =>
      spark.conf.set("spark.graft.warehouse", wh)
      val rnd = new scala.util.Random(1212)
      for (sc <- 1 to 30) {
        // target: keys 0..n, known values
        val n = 6 + rnd.nextInt(10)
        case class T(v: Int, tag: String, stA: Int, stB: String)
        var model: Map[Long, T] = (0 to n).map(k =>
          k.toLong -> T(rnd.nextInt(50), s"t${rnd.nextInt(3)}",
            rnd.nextInt(50), s"b${rnd.nextInt(3)}")).toMap
        val rows = model.toSeq.map { case (k, m) =>
          Row(k, m.v, m.tag, Row(m.stA, m.stB)) }
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 2), structType)
          .createOrReplaceTempView("mf_src")
        spark.sql(s"CREATE TABLE graft_mf.mf.t$sc " +
          "PARTITIONED BY (bucket(2, id)) AS SELECT * FROM mf_src")

        // source: overlaps ~half the keys plus some fresh ones
        val srcKeys = rnd.shuffle((0 to n).toList).take(1 + n / 2)
          .map(_.toLong) ++ (n + 1 to n + 1 + rnd.nextInt(4)).map(_.toLong)
        val src = srcKeys.map(k => (k, rnd.nextInt(50), s"s${rnd.nextInt(3)}"))
        src.toDF("k", "nv", "ntag").createOrReplaceTempView("mf_delta")
        val srcMap = src.map(s => s._1 -> s).toMap

        // clause set: always at least one
        val cutM = rnd.nextInt(50)
        val cutI = rnd.nextInt(50)
        val withDelete = rnd.nextBoolean()
        val updateCond = rnd.nextBoolean()
        val insertCond = rnd.nextBoolean()
        val nestedSet = rnd.nextBoolean()
        val setTag = rnd.nextBoolean()

        val deleteSql =
          if (withDelete) s"WHEN MATCHED AND t.v < $cutM THEN DELETE " else ""
        val setParts = Seq(
          Some("t.v = s.nv + 1"),
          if (setTag) Some("t.tag = s.ntag") else None,
          if (nestedSet) Some("t.st.a = -s.nv") else None).flatten
        val updateSql = s"WHEN MATCHED ${if (updateCond) s"AND s.nv >= $cutM " else ""}" +
          s"THEN UPDATE SET ${setParts.mkString(", ")} "
        val insertSql = s"WHEN NOT MATCHED ${if (insertCond) s"AND s.nv < $cutI " else ""}" +
          "THEN INSERT (id, v, tag, st) VALUES " +
          "(s.k, s.nv, s.ntag, named_struct('a', 0, 'b', 'new')) "
        spark.sql(s"MERGE INTO graft_mf.mf.t$sc t USING mf_delta s " +
          s"ON t.id = s.k $deleteSql$updateSql$insertSql")

        // model fold: clause order = first matching clause wins
        model = model.flatMap { case (k, m) =>
          srcMap.get(k) match {
            case None => Some(k -> m)
            case Some((_, nv, ntag)) =>
              if (withDelete && m.v < cutM) None
              else if (!updateCond || nv >= cutM) Some(k -> m.copy(
                v = nv + 1,
                tag = if (setTag) ntag else m.tag,
                stA = if (nestedSet) -nv else m.stA))
              else Some(k -> m)
          }
        }
        model ++= srcMap.collect {
          case (k, (_, nv, ntag)) if !model.contains(k) && k > n &&
              (!insertCond || nv < cutI) =>
            k -> T(nv, ntag, 0, "new")
        }

        val got = spark.table(s"graft_mf.mf.t$sc").collect().map { r =>
          r.getLong(0) -> T(r.getInt(1), r.getString(2),
            r.getStruct(3).getInt(0), r.getStruct(3).getString(1))
        }.toMap
        assert(got == model,
          s"scenario $sc (delete=$withDelete updCond=$updateCond " +
            s"insCond=$insertCond nested=$nestedSet setTag=$setTag " +
            s"cutM=$cutM cutI=$cutI):\n got=$got\n exp=$model")
        spark.sql(s"DROP TABLE graft_mf.mf.t$sc")
      }
    }
  }
}
