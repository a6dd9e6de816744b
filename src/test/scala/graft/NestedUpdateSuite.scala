package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.tables.GraftTable

/** Nested-struct-field UPDATE (C3 + reference
  * UpdateExpressionsSupport.scala:39-108): partial leaf updates rebuild
  * only the touched struct leaf, conflicting/unknown paths fail loudly,
  * and the rewrite survives write + MOR merge. Mirrors the reference's
  * nested UpdateSuiteBase cases including sibling-conflict rejection. */
class NestedUpdateSuite extends SparkFixture {
  import spark.implicits._

  private val structType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType),
    StructField("st", StructType(Seq(
      StructField("a", IntegerType),
      StructField("b", StringType),
      StructField("inner", StructType(Seq(
        StructField("x", LongType),
        StructField("y", StringType)))))))))

  private def mkTable(path: String): GraftTable = {
    val rows = Seq(
      Row(1L, "r1", Row(10, "b1", Row(100L, "y1"))),
      Row(2L, "r2", Row(20, "b2", Row(200L, "y2"))),
      Row(3L, "r3", null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), structType)
    GraftTable.create(spark, df, path, hashColumns = Seq("id"), bucketNum = 1)
  }

  private def fetch(t: GraftTable): Map[Long, Row] =
    t.toDF.collect().map(r => r.getLong(0) -> r).toMap

  test("API: nested leaf update keeps siblings and other rows intact") {
    withTempPath { path =>
      val t = mkTable(path)
      t.update($"id" === 1L, Map("st.a" -> lit(11)))
      val m = fetch(t)
      assert(m(1L).getStruct(2) == Row(11, "b1", Row(100L, "y1")), m(1L))
      assert(m(2L).getStruct(2) == Row(20, "b2", Row(200L, "y2")), m(2L))
      assert(m(3L).getStruct(2) == null, m(3L))
    }
  }

  test("API: deep path + sibling leaf in one statement") {
    withTempPath { path =>
      val t = mkTable(path)
      t.update($"id" === 2L,
        Map("st.inner.x" -> lit(999L), "st.b" -> lit("B2")))
      val m = fetch(t)
      assert(m(2L).getStruct(2) == Row(20, "B2", Row(999L, "y2")), m(2L))
      assert(m(1L).getStruct(2) == Row(10, "b1", Row(100L, "y1")), m(1L))
    }
  }

  test("API: updating a leaf of a NULL struct rebuilds it (reference CreateNamedStruct semantics)") {
    withTempPath { path =>
      val t = mkTable(path)
      t.update($"id" === 3L, Map("st.a" -> lit(33)))
      val m = fetch(t)
      assert(m(3L).getStruct(2) == Row(33, null, null), m(3L))
    }
  }

  test("API: nested SET value may read current nested values") {
    withTempPath { path =>
      val t = mkTable(path)
      t.update($"id" === 1L, Map("st.a" -> (col("st.a") + 5)))
      assert(fetch(t)(1L).getStruct(2) == Row(15, "b1", Row(100L, "y1")))
    }
  }

  test("SQL: UPDATE SET s.a through the DSv2 catalog") {
    withTempPath { wh =>
      spark.conf.set("spark.sql.catalog.graft_nu", "graft.catalog.GraftCatalogV2")
      spark.conf.set("spark.graft.warehouse", wh)
      val rows = Seq(
        Row(1L, "r1", Row(10, "b1", Row(100L, "y1"))),
        Row(2L, "r2", Row(20, "b2", Row(200L, "y2"))))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), structType)
        .createOrReplaceTempView("nu_src")
      spark.sql("CREATE TABLE graft_nu.nu.t " +
        "PARTITIONED BY (bucket(2, id)) AS SELECT * FROM nu_src")
      spark.sql("UPDATE graft_nu.nu.t SET st.inner.y = 'Y1', v = 'R1' WHERE id = 1")
      val m = spark.table("graft_nu.nu.t").collect()
        .map(r => r.getLong(0) -> r).toMap
      assert(m(1L).getString(1) == "R1", m(1L))
      assert(m(1L).getStruct(2) == Row(10, "b1", Row(100L, "Y1")), m(1L))
      assert(m(2L).getStruct(2) == Row(20, "b2", Row(200L, "y2")), m(2L))
      // conflicting nested SQL SET paths are rejected like the API's
      val e = intercept[Exception](spark.sql(
        "UPDATE graft_nu.nu.t SET st.inner = named_struct('x', 0L, 'y', ''), st.inner.x = 1 WHERE id = 1"))
      assert(e.getMessage.toLowerCase.contains("conflict"), e.getMessage)
      spark.sql("DROP TABLE graft_nu.nu.t")
    }
  }

  test("conflicting paths are rejected (s + s.a, s.a + s.a.b)") {
    withTempPath { path =>
      val t = mkTable(path)
      val e1 = intercept[UnsupportedOperationException](
        t.update($"id" === 1L, Map(
          "st" -> struct(lit(1).as("a"), lit("z").as("b"),
            struct(lit(0L).as("x"), lit("").as("y")).as("inner")),
          "st.a" -> lit(2))))
      assert(e1.getMessage.contains("conflicting"), e1.getMessage)
      val e2 = intercept[UnsupportedOperationException](
        t.update($"id" === 1L,
          Map("st.inner" -> lit(null), "st.inner.x" -> lit(1L))))
      assert(e2.getMessage.contains("conflicting"), e2.getMessage)
    }
  }

  test("unknown top-level and nested names fail loudly (no flat backtick column)") {
    withTempPath { path =>
      val t = mkTable(path)
      val e1 = intercept[IllegalArgumentException](
        t.update($"id" === 1L, Map("nope.a" -> lit(1))))
      assert(e1.getMessage.contains("not found"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException](
        t.update($"id" === 1L, Map("st.nope" -> lit(1))))
      assert(e2.getMessage.contains("st.nope"), e2.getMessage)
      // schema unchanged — the old behavior wrote a flat `st.a`-named column
      assert(t.schema.fieldNames.toSeq == Seq("id", "v", "st"))
    }
  }

  test("descending into a non-struct column is rejected") {
    withTempPath { path =>
      val t = mkTable(path)
      val e = intercept[UnsupportedOperationException](
        t.update($"id" === 1L, Map("v.x" -> lit(1))))
      assert(e.getMessage.contains("non-struct"), e.getMessage)
    }
  }

  test("case-insensitive nested resolution (C18 contract)") {
    withTempPath { path =>
      val t = mkTable(path)
      t.update($"id" === 1L, Map("ST.A" -> lit(77)))
      assert(fetch(t)(1L).getStruct(2) == Row(77, "b1", Row(100L, "y1")))
    }
  }

  test("nested SET under graft.update.mode=delta routes as a whole-struct delta") {
    withTempPath { path =>
      val t = mkTable(path)
      t.setProperties(Map("graft.update.mode" -> "delta"))
      val before = t.history.size
      t.update($"id" === 2L, Map("st.b" -> lit("delta!")))
      val m = fetch(t)
      assert(m(2L).getStruct(2) == Row(20, "delta!", Row(200L, "y2")), m(2L))
      // a delta update ADDS one run (no del+add rewrite; setProperties is
      // meta-only and writes no commit)
      assert(t.history.size == before + 1,
        s"history grew by ${t.history.size - before}")
      t.compaction()
      assert(fetch(t)(2L).getStruct(2) == Row(20, "delta!", Row(200L, "y2")))
    }
  }

  test("API MERGE INTO clauses accept nested SET paths") {
    withTempPath { path =>
      val t = mkTable(path)
      import graft.tables.{GraftMerge, MergeMatchedClause}
      val src = Seq((1L, 111), (9L, 999)).toDF("k", "newa")
      t.mergeIntoClauses(src, Map("id" -> "k"),
        matched = Seq(MergeMatchedClause(None,
          Some(Map("st.a" -> GraftMerge.source("newa"))))),
        notMatched = Nil)
      val m = fetch(t)
      // matched row: only leaf a rewritten; unmatched source key dropped
      assert(m(1L).getStruct(2) == Row(111, "b1", Row(100L, "y1")), m(1L))
      assert(m(2L).getStruct(2) == Row(20, "b2", Row(200L, "y2")), m(2L))
      assert(!m.contains(9L))
      // conflicting nested paths rejected in merge clauses too
      val e = intercept[UnsupportedOperationException](
        t.mergeIntoClauses(src, Map("id" -> "k"),
          matched = Seq(MergeMatchedClause(None, Some(Map(
            "st.inner" -> lit(null), "st.inner.x" -> lit(1L))))),
          notMatched = Nil))
      assert(e.getMessage.contains("conflicting"), e.getMessage)
    }
  }

  test("MERGE carries and rebuilds literal-dot column names (backtick-quoted target base)") {
    withTempPath { path =>
      import graft.tables.{GraftMerge, MergeMatchedClause}
      // top-level columns whose NAMES contain a literal dot: "a.b" (scalar,
      // only carried) and "s.t" (struct, rebuilt from a nested SET via a
      // backtick path). The merge rebuild base must quote the name or both
      // re-parse as nesting inside the _g_target alias and misresolve.
      val sch = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("a.b", IntegerType),
        StructField("s.t", StructType(Seq(
          StructField("x", LongType), StructField("y", StringType))))))
      val rows = Seq(Row(1L, 10, Row(100L, "y1")), Row(2L, 20, Row(200L, "y2")))
      val t = GraftTable.create(spark,
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), sch),
        path, hashColumns = Seq("id"), bucketNum = 1)
      val src = Seq((1L, 555L)).toDF("k", "nx")
      t.mergeIntoClauses(src, Map("id" -> "k"),
        matched = Seq(MergeMatchedClause(None,
          Some(Map("`s.t`.x" -> GraftMerge.source("nx"))))),
        notMatched = Nil)
      val m = fetch(t)
      assert(m(1L).getInt(1) == 10 && m(1L).getStruct(2) == Row(555L, "y1"), m(1L))
      assert(m(2L).getInt(1) == 20 && m(2L).getStruct(2) == Row(200L, "y2"), m(2L))
    }
  }

  test("literal-dot column names survive the full lifecycle (upsert/update/delete/diff/compaction)") {
    withTempPath { path =>
      // a literal-dot PRIMARY KEY plus a literal-dot data column pushes the
      // quoting through every internal schema-name iteration: pre-merge
      // repartition/groupBy, write sort, merged-read projection, the
      // change-feed pack, and the rewrite paths
      val sch = StructType(Seq(
        StructField("pk.id", LongType, nullable = false),
        StructField("a.b", IntegerType),
        StructField("v", StringType)))
      def df(rows: Seq[Row]) = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), sch)
      val t = GraftTable.create(spark,
        df(Seq(Row(1L, 10, "r1"), Row(2L, 20, "r2"), Row(3L, 30, "r3"))),
        path, hashColumns = Seq("pk.id"), bucketNum = 2)
      val ts0 = t.lastCommitTs
      t.upsert(df(Seq(Row(2L, 22, "r2b"), Row(4L, 40, "r4"))))
      t.update(col("`a.b`") >= 30, Map("v" -> lit("big")))
      t.delete(col("`pk.id`") === 1L)
      val got = t.toDF.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(got == Set((2L, 22, "r2b"), (3L, 30, "big"), (4L, 40, "big")), got)
      // change feed over the window (exercises the diff pack/emit paths)
      val d = t.diff(ts0, t.lastCommitTs)
      val types = d.groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(types.getOrElse("insert", 0L) == 1L &&
        types.getOrElse("delete", 0L) == 1L &&
        types.getOrElse("update_postimage", 0L) >= 2L, types)
      t.compaction()
      assert(t.toDF.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getString(2))).toSet == got)
    }
  }

  test("SQL MERGE INTO accepts nested SET paths") {
    withTempPath { wh =>
      spark.conf.set("spark.sql.catalog.graft_nm", "graft.catalog.GraftCatalogV2")
      spark.conf.set("spark.graft.warehouse", wh)
      val rows = Seq(
        Row(1L, "r1", Row(10, "b1", Row(100L, "y1"))),
        Row(2L, "r2", Row(20, "b2", Row(200L, "y2"))))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), structType)
        .createOrReplaceTempView("nm_src")
      spark.sql("CREATE TABLE graft_nm.nm.t " +
        "PARTITIONED BY (bucket(2, id)) AS SELECT * FROM nm_src")
      Seq((1L, 555L)).toDF("k", "nx").createOrReplaceTempView("nm_delta")
      spark.sql("""MERGE INTO graft_nm.nm.t t USING nm_delta s ON t.id = s.k
        WHEN MATCHED THEN UPDATE SET t.st.inner.x = s.nx""")
      val m = spark.table("graft_nm.nm.t").collect()
        .map(r => r.getLong(0) -> r).toMap
      assert(m(1L).getStruct(2) == Row(10, "b1", Row(555L, "y1")), m(1L))
      assert(m(2L).getStruct(2) == Row(20, "b2", Row(200L, "y2")), m(2L))
      spark.sql("DROP TABLE graft_nm.nm.t")
    }
  }

  test("reference UpdateSuiteBase nested matrix: null subtree, named_struct, cast, no-match, nested WHERE") {
    withTempPath { path =>
      val t = mkTable(path)
      // condition referencing a NESTED field prunes/filters correctly
      t.update(col("st.inner.y") === "y2", Map("st.b" -> lit("hit")))
      assert(fetch(t)(2L).getStruct(2) == Row(20, "hit", Row(200L, "y2")))
      assert(fetch(t)(1L).getStruct(2) == Row(10, "b1", Row(100L, "y1")))
      // no-match condition: table unchanged
      t.update(col("id") === 99L, Map("st.a" -> lit(0)))
      assert(fetch(t)(1L).getStruct(2) == Row(10, "b1", Row(100L, "y1")))
      // set a STRUCT subtree to null (reference: a.c = null)
      t.update(col("id") === 1L, Map("st.inner" -> lit(null)))
      assert(fetch(t)(1L).getStruct(2) == Row(10, "b1", null))
      // set a struct subtree with named_struct, siblings intact
      t.update(col("id") === 1L,
        Map("st.inner" -> struct(lit(7L).as("x"), lit("n").as("y"))))
      assert(fetch(t)(1L).getStruct(2) == Row(10, "b1", Row(7L, "n")))
      // string value castable into the int leaf (reference: a.g = '-1')
      t.update(col("id") === 1L, Map("st.a" -> lit("-1")))
      assert(fetch(t)(1L).getStruct(2) == Row(-1, "b1", Row(7L, "n")))
    }
  }

  test("MERGE whose UPDATE is entirely self-assignments is a legal no-op clause") {
    withTempPath { wh =>
      spark.conf.set("spark.sql.catalog.graft_ns", "graft.catalog.GraftCatalogV2")
      spark.conf.set("spark.graft.warehouse", wh)
      Seq((1L, 10), (2L, 20)).toDF("id", "v").createOrReplaceTempView("ns_src")
      spark.sql("CREATE TABLE graft_ns.ns.t " +
        "PARTITIONED BY (bucket(2, id)) AS SELECT * FROM ns_src")
      Seq((2L, 99), (3L, 30)).toDF("k", "nv").createOrReplaceTempView("ns_delta")
      // Spark's alignment elides SET v = t.v into an EMPTY assignment set:
      // the clause must act as keep-target, not throw
      spark.sql("""MERGE INTO graft_ns.ns.t t USING ns_delta s ON t.id = s.k
        WHEN MATCHED THEN UPDATE SET v = t.v
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.k, s.nv)""")
      val got = spark.table("graft_ns.ns.t").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == Set((1L, 10), (2L, 20), (3L, 30)), got)
      spark.sql("DROP TABLE graft_ns.ns.t")
    }
  }

  test("parsePath/encodePath round-trip on adversarial names") {
    import graft.tables.NestedUpdate._
    val cases = Seq(
      Seq("a"), Seq("a", "b"), Seq("a.b"), Seq("a.b", "c"),
      Seq("we`ird", "x"), Seq("a", "b.c.d"), Seq("UPPER", "mIxEd"))
    cases.foreach { p =>
      assert(parsePath(encodePath(p)) == p,
        s"$p -> ${encodePath(p)} -> ${parsePath(encodePath(p))}")
    }
  }

  test("updateExpr accepts dotted paths") {
    withTempPath { path =>
      val t = mkTable(path)
      t.updateExpr("id = 1", Map("st.a" -> "st.a * 2"))
      assert(fetch(t)(1L).getStruct(2) == Row(20, "b1", Row(100L, "y1")))
    }
  }
}
