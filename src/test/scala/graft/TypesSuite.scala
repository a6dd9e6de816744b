package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.tables.GraftTable

/** Type-system coverage (SURVEY.md §1.2: MergeLogic.getValueByType handles
  * String/Int/Date/Bool/Byte/Short/Long/Timestamp/Float/Double/Binary/
  * Decimal/Struct/Array/Map) — round-trip + merge-on-read per type, plus
  * multi-column PKs and null/empty partition-value sentinels. */
class TypesSuite extends SparkFixture {
  import spark.implicits._

  test("all column types round-trip through write + MOR merge") {
    withTempPath { path =>
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("s", StringType),
        StructField("i", IntegerType),
        StructField("b", BooleanType),
        StructField("y", ByteType),
        StructField("sh", ShortType),
        StructField("f", FloatType),
        StructField("d", DoubleType),
        StructField("dec", DecimalType(10, 2)),
        StructField("dt", DateType),
        StructField("ts", TimestampType),
        StructField("bin", BinaryType),
        StructField("arr", ArrayType(IntegerType)),
        StructField("map", MapType(StringType, LongType)),
        StructField("st", StructType(Seq(
          StructField("a", IntegerType), StructField("b", StringType))))))
      def row(id: Long, tag: String, n: Int) = Row(
        id, tag, n, n % 2 == 0, n.toByte, n.toShort, n.toFloat, n.toDouble,
        new java.math.BigDecimal(s"$n.25"), Date.valueOf("2024-01-01"),
        Timestamp.valueOf("2024-01-01 12:00:00"), Array[Byte](1, 2, n.toByte),
        Seq(n, n + 1), Map(tag -> n.toLong), Row(n, tag))
      val seed = spark.createDataFrame(
        java.util.Arrays.asList(row(1L, "one", 1), row(2L, "two", 2)), schema)
      val t = GraftTable.create(spark, seed, path,
        hashColumns = Seq("id"), bucketNum = 2)
      // upsert overwrites id=2 with new values of every type
      t.upsert(spark.createDataFrame(
        java.util.Arrays.asList(row(2L, "TWO", 20), row(3L, "three", 3)), schema))
      val got = t.toDF.orderBy("id").collect()
      assert(got.length == 3)
      val r2 = got(1)
      assert(r2.getAs[String]("s") == "TWO")
      assert(r2.getAs[java.math.BigDecimal]("dec").toString == "20.25")
      assert(r2.getAs[scala.collection.Seq[Int]]("arr") == Seq(20, 21))
      assert(r2.getAs[scala.collection.Map[String, Long]]("map")("TWO") == 20L)
      assert(r2.getAs[Row]("st").getInt(0) == 20)
      assert(r2.getAs[Array[Byte]]("bin").toSeq == Seq[Byte](1, 2, 20))
      assert(r2.getAs[Timestamp]("ts") == Timestamp.valueOf("2024-01-01 12:00:00"))
    }
  }

  test("multi-column primary key merges on the composite key") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        Seq((1, "a", 10), (1, "b", 20), (2, "a", 30)).toDF("k1", "k2", "v"),
        path, hashColumns = Seq("k1", "k2"), bucketNum = 2)
      t.upsert(Seq((1, "b", 99)).toDF("k1", "k2", "v"))
      assertRows(t.toDF, Seq("[1,a,10]", "[1,b,99]", "[2,a,30]"))
      assertRows(t.lookupByPk(Seq(1, "b")), Seq("[1,b,99]"))
    }
  }

  test("null and empty-string range partition values use sentinels") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        Seq((Some("p1"), 1, 1), (None: Option[String], 2, 2), (Some(""), 3, 3))
          .toDF("r", "id", "v"),
        path, rangeColumns = Seq("r"), hashColumns = Seq("id"), bucketNum = 1)
      assert(t.partitions.map(_.partitionDesc).toSet ==
        Set("r=p1", "r=__GRAFT_NULL__", "r=__GRAFT_EMPTY__"))
      // values come back as stored, not as sentinel strings
      assertRows(t.toDF, Seq("[p1,1,1]", "[null,2,2]", "[,3,3]"))
      t.upsert(Seq((None: Option[String], 2, 22)).toDF("r", "id", "v"))
      assertRows(t.toDF, Seq("[p1,1,1]", "[null,2,22]", "[,3,3]"))
    }
  }

  test("decimal/date primary keys bucket consistently") {
    withTempPath { path =>
      val df = Seq(("2024-01-01", 1), ("2024-01-02", 2), ("2024-01-03", 3))
        .toDF("d", "v").withColumn("d", col("d").cast("date"))
      val t = GraftTable.create(spark, df, path,
        hashColumns = Seq("d"), bucketNum = 4)
      t.upsert(Seq(("2024-01-02", 99)).toDF("d", "v")
        .withColumn("d", col("d").cast("date")))
      assert(t.toDF.filter(col("v") === 99).count() == 1)
      assert(t.toDF.count() == 3)
      assert(t.lookupByPk(Seq(Date.valueOf("2024-01-02"))).head.getInt(1) == 99)
    }
  }
}
