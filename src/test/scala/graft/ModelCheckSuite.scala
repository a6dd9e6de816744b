package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.meta.TableInfo
import graft.tables.GraftTable

/** Seeded randomized model check — the reference's cross-engine oracle idea
  * (python/tests/compat/cases.py: expected table = last-writer-wins fold over
  * primary keys, python/tests/compat/normalize.py assert_table_matches)
  * turned into a property test: drive random op sequences against a graft
  * table while mirroring each op in a plain in-memory model, then compare
  * the merged read (and random time-travel snapshots) after every round.
  * Fixed seeds keep failures reproducible.
  */
class ModelCheckSuite extends SparkFixture {
  import spark.implicits._

  private def readState(df: DataFrame): Map[Long, (Long, String)] =
    df.select("id", "v", "tag").as[(Long, Long, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("random upsert/delete/compaction sequences vs last-writer-wins model") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 5) {
      withTempPath { path =>
        val keySpace = 0 until (10 + rnd.nextInt(40))
        def batch(): Seq[(Long, Long, String)] =
          rnd.shuffle(keySpace.toList).take(1 + rnd.nextInt(keySpace.size))
            .map(k => (k.toLong, rnd.nextInt(1000).toLong, s"t${rnd.nextInt(5)}"))

        val init = batch()
        val t = GraftTable.create(spark, init.toDF("id", "v", "tag"), path,
          hashColumns = Seq("id"), bucketNum = 1 + rnd.nextInt(4))
        var model = init.map { case (k, v, g) => k -> (v, g) }.toMap
        var snapshots = Vector(t.lastCommitTs -> model)

        // shallow clones taken mid-history: each pins the source state at
        // its moment; vacuum/restore/re-bucket on the SOURCE must never
        // break them (the clone-reference registry keeps their files)
        val clones = scala.collection.mutable.ArrayBuffer[
          (graft.tables.GraftTable, Map[Long, (Long, String)])]()
        for (_ <- 0 until 4 + rnd.nextInt(5)) {
          rnd.nextInt(13) match {
            case 0 | 1 => // upsert (unique PKs per batch — the format contract)
              val b = batch()
              t.upsert(b.toDF("id", "v", "tag"))
              model ++= b.map { case (k, v, g) => k -> (v, g) }
            case 2 => // predicate delete (non-PK column -> rewrite tiers)
              val cut = rnd.nextInt(1000)
              t.delete(col("v") < cut)
              model = model.filter { case (_, (v, _)) => v >= cut }
            case 3 => // compaction must never change the merged result
              t.compaction()
            case 4 => // tiered UPDATE (probe -> file-targeted rewrite)
              val cut = rnd.nextInt(1000)
              t.update(col("v") >= cut, Map("tag" -> lit("upd")))
              model = model.map { case (k, (v, g)) =>
                k -> (v, if (v >= cut) "upd" else g)
              }
            case 5 => // TOMBSTONE delete: same visible semantics as case 2,
              // zero data files rewritten (key-only delta run)
              val cut = rnd.nextInt(1000)
              t.deleteTombstone(col("v") < cut)
              model = model.filter { case (_, (v, _)) => v >= cut }
            case 6 => // leveled compaction: newest-suffix merge must never
              // change the merged result (tombstones carried, order kept)
              t.compaction(graft.tables.CompactionOptions(
                fileSizeLimit = Some(256L * 1024)), _ => true)
            case 7 => // DELTA update: same visible semantics as case 4,
              // zero data files rewritten (upsert delta of matched rows)
              val cut = rnd.nextInt(1000)
              t.updateDelta(col("v") >= cut, Map("tag" -> lit("du")))
              model = model.map { case (k, (v, g)) =>
                k -> (v, if (v >= cut) "du" else g)
              }
            case 8 => // whole-table RE-BUCKET (r14: the bucket-CAS paths):
              // a full rewrite under a new bucket count must never change
              // the merged result, and every later op merges under it
              t.compaction(graft.tables.CompactionOptions(
                newBucketNum = Some(1 + rnd.nextInt(4))), _ => true)
            case 9 => // whole-table RESTORE to a random earlier boundary —
              // interleaved with case 8 this drives the restore x
              // re-bucket mapping replay (RestoreRebucketSuite's bugs)
              val (ts, m) = snapshots(rnd.nextInt(snapshots.size))
              t.restoreToTimestamp(ts)
              model = m
            case 10 => // TRUNCATE — the empty-table state interleaved with
              // re-bucket (metadata-only path) and restore across the gap
              t.truncateTable()
              model = Map.empty
            case 11 => // VACUUM/TTL sweep (r15): interleaved with restores'
              // repointed heads, tombstone runs, re-bucket discard lists
              // and compaction-superseded files — no file any RETAINED
              // version references may be deleted, and time travel to
              // every retained boundary must still read green. The model
              // prunes its snapshot list to the sweep's retention window
              // (vacuum also prunes version history, so older boundaries
              // are no longer contractually readable or restorable).
              val keepFrom = snapshots(rnd.nextInt(snapshots.size))._1
              t.vacuum(math.max(0L, System.currentTimeMillis() - keepFrom))
              // versions AT keepFrom survive as each partition's boundary
              // base; strictly older ones may be gone
              val kept = snapshots.filter(_._1 >= keepFrom)
              snapshots = if (kept.isEmpty) Vector(snapshots.last) else kept
              // immediate invariant: a random retained boundary reads
              // exactly its model state right after the sweep
              val (vts, vm) = snapshots(rnd.nextInt(snapshots.size))
              assert(readState(t.snapshotAt(vts)) == vm,
                s"vacuum deleted a file a retained version (@$vts) references")
            case 12 => // SHALLOW CLONE of the current state: registers its
              // referenced files against the source's cleaners — the
              // vacuum op above must keep them alive even when the
              // source's own retention window has moved past them
              if (clones.size < 2)
                clones += ((t.cloneTo(s"$path-clone${clones.size}"), model))
          }
          Thread.sleep(2) // distinct commit timestamps for time travel
          snapshots :+= t.lastCommitTs -> model
        }

        assert(readState(t.toDF) == model, s"round $round: final state")
        // format invariants hold after ANY op sequence (fsck)
        assert(t.validate() == Nil, s"round $round: validate")
        // every clone still reads exactly the state it pinned, whatever
        // vacuums/restores/re-buckets/truncates hit the source after it
        clones.zipWithIndex.foreach { case ((c, m), i) =>
          assert(readState(c.toDF) == m,
            s"round $round: clone $i diverged from its pinned state")
          c.dropTable()
        }
        // clone dirs are siblings of the temp path — clean them up
        clones.indices.foreach { i =>
          def rec(x: java.io.File): Unit = {
            if (x.isDirectory) Option(x.listFiles()).foreach(_.foreach(rec))
            x.delete()
          }
          rec(new java.io.File(s"$path-clone$i"))
        }
        val (ts, expected) = snapshots(rnd.nextInt(snapshots.size))
        assert(readState(t.snapshotAt(ts)) == expected,
          s"round $round: snapshot @$ts")

        // CDF invariant: diff(tsA, tsB) must equal the model-state delta
        // for ANY pair of versions — inserts, deletes, update pre+post
        // images, exactly, and nothing for untouched keys (rewrites and
        // compactions in between must not fabricate changes)
        val Seq(ia, ib) =
          Seq(rnd.nextInt(snapshots.size), rnd.nextInt(snapshots.size)).sorted
        val (tsA, mA) = snapshots(ia)
        val (tsB, mB) = snapshots(ib)
        val expDiff: Set[(Long, Long, String, String)] =
          (mB.keySet -- mA.keySet).map(k => (k, mB(k)._1, mB(k)._2, "insert")) ++
          (mA.keySet -- mB.keySet).map(k => (k, mA(k)._1, mA(k)._2, "delete")) ++
          (mA.keySet & mB.keySet).filter(k => mA(k) != mB(k)).flatMap(k => Seq(
            (k, mA(k)._1, mA(k)._2, "update_preimage"),
            (k, mB(k)._1, mB(k)._2, "update_postimage")))
        val gotDiff = t.diff(tsA, tsB).select("id", "v", "tag", "_change_type")
          .as[(Long, Long, String, String)].collect().toSet
        assert(gotDiff == expDiff, s"round $round: diff($tsA, $tsB)")

        // vacuum with a retention boundary cutting mid-history: every
        // snapshot at-or-after the boundary must still read bit-exact
        // (vacuum liveness = retained versions, not just heads)
        val bIdx = rnd.nextInt(snapshots.size)
        val boundaryTs = snapshots(bIdx)._1
        t.vacuum(retainMs = System.currentTimeMillis() - boundaryTs + 1)
        snapshots.drop(bIdx).foreach { case (sts, exp) =>
          assert(readState(t.snapshotAt(sts)) == exp,
            s"round $round: snapshot @$sts after vacuum(boundary=$boundaryTs)")
        }
        assert(readState(t.toDF) == model, s"round $round: head after vacuum")

        // aggregate-pushdown invariant: the catalog COUNT/MIN answer must
        // equal the model whichever path planned it (metadata after
        // compaction, scan when multi-run) — catches row-count/stats drift
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.catalog.GraftCatalogV2")
        graft.catalog.GraftCatalog.register(spark, s"mc.t$round", path)
        def sqlAgg(): (Long, Option[Long]) = {
          val r = spark.sql("SELECT count(*), min(v) " +
            s"FROM graft_cat.mc.t$round").head
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))
        }
        val before = sqlAgg()
        assert(before._1 == model.size && (model.isEmpty ||
          before._2.contains(model.values.map(_._1).min)),
          s"round $round: agg (pre-compaction) vs model")
        if (model.nonEmpty) {
          t.compaction()
          val after = sqlAgg()
          val plan = spark.sql("SELECT count(*), min(v) " +
            s"FROM graft_cat.mc.t$round").queryExecution.executedPlan.toString
          assert(plan.contains("LocalTableScan"),
            s"round $round: compacted agg should push down:\n$plan")
          assert(after == before, s"round $round: agg pre/post compaction")
        }
      }
    }
  }

  test("random nested-struct x partial-batch x nested-update sequences vs column model") {
    // the r12 surfaces under one randomized harness: a NON-NULLABLE int
    // column and a two-leaf struct ride full upserts, PARTIAL upserts
    // (random column subsets — including dropping the non-nullable column,
    // the decode shape that was a real r12 bug), nested leaf updates,
    // deletes, and compactions; the model tracks per-COLUMN values so
    // file_exist_cols fall-through is checked leaf by leaf
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    case class V(w: Option[Int], v: Option[String],
        stA: Option[Int], stB: Option[String], stSet: Boolean)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("w", IntegerType, nullable = false),
      StructField("v", StringType),
      StructField("st", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType))))))
    def df(rows: Seq[Row], cols: Seq[String]) = {
      val sub = StructType(cols.map(c => schema(c)))
      val proj = rows.map(r => Row.fromSeq(cols.map {
        case "id" => r.get(0); case "w" => r.get(1)
        case "v" => r.get(2); case "st" => r.get(3)
      }))
      spark.createDataFrame(spark.sparkContext.parallelize(proj, 2), sub)
    }
    def readDf(d: org.apache.spark.sql.DataFrame): Map[Long, V] =
      d.select("id", "w", "v", "st").collect().map { r =>
        val st = if (r.isNullAt(3)) null else r.getStruct(3)
        r.getLong(0) -> V(
          if (r.isNullAt(1)) None else Some(r.getInt(1)),
          Option(r.getString(2)),
          Option(st).flatMap(s => if (s.isNullAt(0)) None else Some(s.getInt(0))),
          Option(st).flatMap(s => Option(s.getString(1))),
          st != null)
      }.toMap

    val rnd = new scala.util.Random(777)
    for (round <- 1 to 4) {
      withTempPath { path =>
        val keys = 0 until (8 + rnd.nextInt(20))
        def fullRow(k: Int) = Row(k.toLong, rnd.nextInt(100),
          s"v${rnd.nextInt(9)}", Row(rnd.nextInt(100), s"b${rnd.nextInt(9)}"))
        val init = keys.map(fullRow)
        val t = GraftTable.create(spark, df(init, schema.fieldNames.toSeq),
          path, hashColumns = Seq("id"), bucketNum = 1 + rnd.nextInt(3))
        var model: Map[Long, V] = init.map(r => r.getLong(0) -> V(
          Some(r.getInt(1)), Some(r.getString(2)),
          Some(r.getStruct(3).getInt(0)), Some(r.getStruct(3).getString(1)),
          stSet = true)).toMap
        var snapshots = Vector(t.lastCommitTs -> model)

        for (_ <- 0 until 5 + rnd.nextInt(4)) {
          rnd.nextInt(9) match {
            case 0 => // full upsert of a random key subset
              val b = rnd.shuffle(keys.toList).take(1 + rnd.nextInt(keys.size))
                .map(fullRow)
              t.upsert(df(b, schema.fieldNames.toSeq))
              model ++= b.map(r => r.getLong(0) -> V(Some(r.getInt(1)),
                Some(r.getString(2)), Some(r.getStruct(3).getInt(0)),
                Some(r.getStruct(3).getString(1)), stSet = true))
            case 1 => // PARTIAL upsert: random non-key column subset
              val cols = "id" +: rnd.shuffle(List("w", "v", "st"))
                .take(1 + rnd.nextInt(3))
              val b = rnd.shuffle(keys.toList).take(1 + rnd.nextInt(keys.size))
                .map(fullRow)
              t.upsert(df(b, cols))
              model = model ++ b.map { r =>
                val k = r.getLong(0)
                val old = model.getOrElse(k, V(None, None, None, None, stSet = false))
                k -> V(
                  if (cols.contains("w")) Some(r.getInt(1)) else old.w,
                  if (cols.contains("v")) Some(r.getString(2)) else old.v,
                  if (cols.contains("st")) Some(r.getStruct(3).getInt(0)) else old.stA,
                  if (cols.contains("st")) Some(r.getStruct(3).getString(1)) else old.stB,
                  if (cols.contains("st")) true else old.stSet)
              }
            case 2 => // nested leaf update over a w-predicate
              val cut = rnd.nextInt(100)
              val nv = rnd.nextInt(1000)
              t.update(col("w") >= cut, Map("st.a" -> lit(nv)))
              model = model.map { case (k, m) =>
                // CreateNamedStruct rebuild: a matched NULL struct becomes
                // non-null with the updated leaf and null sibling
                k -> (if (m.w.exists(_ >= cut))
                  m.copy(stA = Some(nv), stSet = true) else m)
              }
            case 3 => // top-level + nested leaf in ONE statement
              val cut = rnd.nextInt(100)
              t.update(col("w") >= cut,
                Map("v" -> lit("upd"), "st.b" -> lit("nb")))
              model = model.map { case (k, m) =>
                k -> (if (m.w.exists(_ >= cut))
                  m.copy(v = Some("upd"), stB = Some("nb"), stSet = true) else m)
              }
            case 4 => // predicate delete (null w rows never match)
              val cut = rnd.nextInt(100)
              t.delete(col("w") < cut)
              model = model.filter { case (_, m) => !m.w.exists(_ < cut) }
            case 5 =>
              t.compaction()
            case 6 => // whole-table RESTORE to a random earlier boundary:
              // the partial-column fall-through state must roll back
              // EXACTLY (presence is per-run, and restore swaps run sets)
              val (ts, m) = snapshots(rnd.nextInt(snapshots.size))
              t.restoreToTimestamp(ts)
              model = m
            case 7 => // whole-table RE-BUCKET: per-run column presence and
              // nested values must survive the mapping rewrite, and the
              // restore op above must replay the count across it
              t.compaction(graft.tables.CompactionOptions(
                newBucketNum = Some(1 + rnd.nextInt(4))), _ => true)
            case 8 => // CRASHED RE-BUCKET (r16 find): flip + open marker,
              // NO rewrite — exactly what compactionRun leaves if it dies
              // after updateInfoAtFlip. Every later op (upserts layering
              // the NEW mapping on the old base, deletes, compactions that
              // must not bake duplicates, restores across the dangling
              // marker) runs against the mixed state; the model is
              // unchanged (the flip moves no data), so the per-op read
              // assertion below IS the no-duplicate/no-loss check.
              val newN = 1 + rnd.nextInt(4)
              if (newN != t.info.bucketNum)
                graft.meta.MetaStore.default.updateInfoAtFlip(path)((cur, ts0) =>
                  cur.copy(bucketNum = newN,
                    properties = graft.meta.RebucketLog.appendOpen(
                      cur.properties, ts0, cur.bucketNum, newN)))
          }
          Thread.sleep(2) // distinct commit boundaries for restore targets
          snapshots :+= t.lastCommitTs -> model
          assert(readDf(t.toDF) == model, s"round $round after op")
        }
        // every recorded boundary still reads exactly through time travel
        val (sts, sm) = snapshots(rnd.nextInt(snapshots.size))
        assert(readDf(t.snapshotAt(sts)) == sm, s"round $round: snapshot @$sts")
        assert(t.validate() == Nil, s"round $round: validate")
      }
    }
  }

  test("random upserts vs sum_all / use_last_not_null merge-op model") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 3) {
      withTempPath { path =>
        val keys = (0 until 20).map(_.toLong)
        val init = keys.map(k => (k, rnd.nextInt(100).toLong, s"s$k"))
        val t = GraftTable.create(spark, init.toDF("id", "n", "s"), path,
          hashColumns = Seq("id"), bucketNum = 2,
          properties = Map(
            TableInfo.mergeOpProp("n") -> "sum_all",
            TableInfo.mergeOpProp("s") -> "use_last_not_null"))
        var sums = init.map(x => x._1 -> x._2).toMap
        var lastS = init.map(x => x._1 -> x._3).toMap

        for (_ <- 0 until 5) {
          val b = rnd.shuffle(keys.toList).take(1 + rnd.nextInt(19)).map(k =>
            (k, rnd.nextInt(100).toLong,
              if (rnd.nextBoolean()) s"u${rnd.nextInt(9)}" else null))
          t.upsert(b.toDF("id", "n", "s"))
          sums ++= b.map(x => x._1 -> (sums(x._1) + x._2))
          lastS ++= b.collect { case (k, _, s2) if s2 != null => k -> s2 }
        }

        def state(): Map[Long, (Long, String)] =
          t.toDF.select("id", "n", "s").as[(Long, Long, Option[String])]
            .collect().map(r => r._1 -> (r._2, r._3.orNull)).toMap
        val expected = sums.map { case (k, v) => k -> (v, lastS(k)) }
        assert(state() == expected, s"round $round: merged state")
        t.compaction() // must preserve merge-op semantics
        assert(state() == expected, s"round $round: post-compaction state")
      }
    }
  }

  test("snapshot-diff tee fast path == exact two-merge path on randomized windows") {
    // ADVICE r13: the delta-shape diff's boundedness rests on a lockstep
    // argument — pin it. Randomized delta-only histories (duplicate keys
    // across delta runs, partial-column upserts for mask variation,
    // tombstone deletes for the fallback gate, revival of deleted keys);
    // every sampled (tsA, tsB) window runs through BOTH the tee fast path
    // (default) and the exact two-merge path (forceExactDiffPath), asserting
    // identical output AND a small max tee queue depth — a lockstep-breaking
    // future edit fails here in sbt, not as an executor OOM at 100 TB.
    import graft.read.{BucketMergeRead, TeeIterator}
    val rnd = new scala.util.Random(20260816)
    var fastWindowsTotal = 0
    var depthMax = 0
    for (round <- 1 to 3) {
      withTempPath { path =>
        val keys = 0 until (30 + rnd.nextInt(40))
        def fullBatch() =
          rnd.shuffle(keys.toList).take(1 + rnd.nextInt(keys.size))
            .map(k => (k.toLong, rnd.nextInt(1000).toLong, s"t${rnd.nextInt(5)}"))
        val init = fullBatch()
        val t = GraftTable.create(spark, init.toDF("id", "v", "tag"), path,
          hashColumns = Seq("id"), bucketNum = 1 + rnd.nextInt(3))
        var model = init.map { case (k, v, g) => k -> (v, Option(g)) }.toMap
        var snapshots = Vector(t.lastCommitTs -> model)
        var deleted = Set.empty[Long]

        for (_ <- 0 until 6 + rnd.nextInt(4)) {
          rnd.nextInt(6) match {
            case 0 | 1 => // full upsert — duplicate keys across delta runs
              val b = fullBatch()
              t.upsert(b.toDF("id", "v", "tag"))
              model ++= b.map { case (k, v, g) => k -> (v, Option(g)) }
            case 2 => // PARTIAL upsert (id, v only): per-run mask variation
              val b = fullBatch().map { case (k, v, _) => (k, v) }
              t.upsert(b.toDF("id", "v"))
              model = model ++ b.map { case (k, v) =>
                k -> (v, model.get(k).flatMap(_._2))
              }
            case 3 => // delta update: adds a data run, no rewrite
              val cut = rnd.nextInt(1000)
              t.updateDelta(col("v") >= cut, Map("tag" -> lit("du")))
              model = model.map { case (k, (v, g)) =>
                k -> (v, if (v >= cut) Some("du") else g)
              }
            case 4 => // tombstone delete: the fast path's fallback gate
              val cut = rnd.nextInt(300)
              t.deleteTombstone(col("v") < cut)
              val cutKeys = model.collect { case (k, (v, _)) if v < cut => k }
              deleted ++= cutKeys
              model --= cutKeys
            case 5 => // REVIVAL: re-upsert previously-deleted keys
              val back = rnd.shuffle(deleted.toList).take(deleted.size / 2)
              if (back.nonEmpty) {
                val b = back.map(k => (k, rnd.nextInt(1000).toLong, "rev"))
                t.upsert(b.toDF("id", "v", "tag"))
                model ++= b.map { case (k, v, g) => k -> (v, Option(g)) }
                deleted --= back
              }
          }
          Thread.sleep(2)
          snapshots :+= t.lastCommitTs -> model
        }

        def diffSet(tsA: Long, tsB: Long): Set[(Long, Long, Option[String], String)] =
          t.diff(tsA, tsB).select("id", "v", "tag", "_change_type")
            .as[(Long, Long, Option[String], String)].collect().toSet

        for (_ <- 0 until 4) {
          val Seq(ia, ib) =
            Seq(rnd.nextInt(snapshots.size), rnd.nextInt(snapshots.size)).sorted
          val (tsA, mA) = snapshots(ia)
          val (tsB, mB) = snapshots(ib)
          BucketMergeRead.deltaShapeCount.set(0)
          TeeIterator.maxObservedDepth.set(0)
          val fast = diffSet(tsA, tsB)
          val fastWindows = BucketMergeRead.deltaShapeCount.get()
          val depth = TeeIterator.maxObservedDepth.get()
          BucketMergeRead.forceExactDiffPath = true
          val exact = try diffSet(tsA, tsB)
            finally BucketMergeRead.forceExactDiffPath = false
          assert(fast == exact,
            s"round $round: tee path vs exact path diverge on diff($tsA, $tsB)")
          // and both must equal the model delta
          val expDiff: Set[(Long, Long, Option[String], String)] =
            (mB.keySet -- mA.keySet).map(k => (k, mB(k)._1, mB(k)._2, "insert")) ++
            (mA.keySet -- mB.keySet).map(k => (k, mA(k)._1, mA(k)._2, "delete")) ++
            (mA.keySet & mB.keySet).filter(k => mA(k) != mB(k)).flatMap(k => Seq(
              (k, mA(k)._1, mA(k)._2, "update_preimage"),
              (k, mB(k)._1, mB(k)._2, "update_postimage")))
          assert(fast == expDiff, s"round $round: diff($tsA, $tsB) vs model")
          if (fastWindows > 0) {
            fastWindowsTotal += fastWindows
            depthMax = math.max(depthMax, depth)
            assert(depth <= 64,
              s"round $round: tee queue depth $depth breaks the lockstep bound")
          }
        }
      }
    }
    assert(fastWindowsTotal > 0,
      "property is vacuous: no sampled window took the delta-shape fast path")
    info(s"fast-path windows exercised: $fastWindowsTotal, max tee depth: $depthMax")
  }

  test("crash between data-file write and meta publish: invisible, valid, sweepable") {
    import graft.write.TransactionalWrite
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1L to 100L).map(i => (i, i * 2, s"t$i")).toDF("id", "v", "tag"), path,
        hashColumns = Seq("id"), bucketNum = 4)
      t.upsert(Seq((1L, 10L, "u1")).toDF("id", "v", "tag"))
      val liveBefore = t.liveFiles.map(_.file.path).toSet
      def dataFiles() = {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(path, "data"))
        try s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
          .map(_.toAbsolutePath.toString).toSet
        finally s.close()
      }
      val filesBefore = dataFiles()
      // crash INSIDE the commit window: data files are on disk, the meta
      // publish never runs
      TransactionalWrite.postWriteHook =
        () => throw new RuntimeException("injected crash before publish")
      try {
        val e = intercept[RuntimeException] {
          t.upsert((200L to 260L).map(i => (i, i, "orphan")).toDF("id", "v", "tag"))
        }
        assert(e.getMessage.contains("injected crash"))
      } finally TransactionalWrite.postWriteHook = () => ()
      val orphans = dataFiles() -- filesBefore
      assert(orphans.nonEmpty, "the crashed write must have left files behind")
      // 1. readers never see the orphan (meta store is the source of truth)
      assert(t.toDF.count() == 100)
      assert(t.toDF.filter(col("tag") === "orphan").count() == 0)
      assert(t.liveFiles.map(_.file.path).toSet == liveBefore)
      // 2. fsck is clean — orphans are not a consistency violation
      assert(t.validate() == Nil)
      // 3. vacuum sweeps exactly the orphans; live data unaffected
      val swept = t.vacuum(0L)
      assert(swept >= orphans.size,
        s"vacuum must sweep the ${orphans.size} orphan files, swept $swept")
      assert((dataFiles() & orphans).isEmpty, "orphans still on disk")
      assert(t.toDF.count() == 100 && t.validate() == Nil)
      // 4. the crashed op retries cleanly (no wedged state)
      t.upsert((200L to 260L).map(i => (i, i, "retried")).toDF("id", "v", "tag"))
      assert(t.toDF.count() == 161)
      assert(t.toDF.filter(col("tag") === "retried").count() == 61)
      assert(t.validate() == Nil)
    }
  }
}
