package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.{CompactionOptions, GraftTable}

/** Reference-scale MOR degradation probe — the 2.2.0-blog scenario at its
  * OWN size (BASELINE.md:13; blog index.md:73): a ~10M-row PK table takes
  * 100 upsert commits with no compaction, and the MOR read penalty vs the
  * fully-compacted read must stay within ~15%. The driver's testdata tops
  * out at sf0.1 (~600k rows), so the table is synthesized here: 10M rows
  * init + 100 upserts of 200k rows each (20M incremental rows — the
  * contest dataset's 2M-per-commit stream split 100 ways, matching the
  * blog's "incremental data split into 100 upserts").
  *
  * Shape notes that make the comparison honest:
  *  - The incremental batches are NEW keys (the contest stream is
  *    incremental data): both the MOR read and the compacted read then
  *    scan the same 30M merged rows, so the penalty isolates MERGE
  *    overhead — the thing the blog's chart measures. With overwriting
  *    batches the MOR read scans 3x the bytes of the compacted one and no
  *    merge could hit 15%.
  *  - The read metric is sum(val) over the merged state, not count():
  *    a count() on a compacted single-run table answers from footer
  *    statistics without touching data (F7 aggregate pushdown) and would
  *    make the denominator a metadata lookup.
  *
  * Phase 2 repeats the write stream under the leveled compaction CADENCE
  * (every 10th upsert, fileNumLimit=8 + fileSizeLimit=128MB) — the
  * production operating mode — and reports the steady-state read penalty
  * there too.
  *
  * args: [initRows] [upserts] [rowsPerUpsert] [bucketNum] (defaults
  * 10M / 100 / 200k / 32; CI can rerun smaller). bucketNum sets the
  * rows-per-delta-file (perUpsert/bucketNum): at 32 the backlog is 3232
  * ~6k-row files and the per-file open tax dominates both reads; at 8 the
  * files carry 25k rows, closer to the contest stream's file sizes, and
  * the merge tax is read off a less open-bound floor. Prints one summary
  * line per phase.
  */
object RefScaleProbe {
  def main(args: Array[String]): Unit = {
    val initRows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nUpserts = args.lift(1).map(_.toInt).getOrElse(100)
    val perUpsert = args.lift(2).map(_.toLong).getOrElse(200000L)
    val buckets = args.lift(3).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-refscale-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def min3(body: => Unit): Double = Seq.fill(3)(time(body)).min

    // deterministic synthetic rows: id PK + numeric + ~40-byte payload.
    // args(4) = "decimal" switches val to DECIMAL(12,2) — the TPC-H-shaped
    // analytics schema — proving the columnar slice copier's decimal path
    // carries the same merge tax as primitives at reference scale
    val decimalVal = args.lift(4).contains("decimal")
    def rows(start: Long, n: Long) = spark.range(start, start + n)
      .select(col("id"),
        (if (decimalVal) (col("id") % 997 * 3.5).cast("decimal(12,2)")
         else col("id") % 997 * 3.5).as("val"),
        concat(lit("payload-"), col("id") % 100000,
          lit("-"), col("id") % 7919).as("tag"))
    // upsert batch i: NEW keys above the init range (incremental data,
    // the contest-stream shape — see the scaladoc); a small overlapping
    // tail (1%) keeps genuine key collisions in play so the merge path
    // is exercised, not just concatenation
    def batch(i: Int) = rows(initRows + (i - 1).toLong * perUpsert, perUpsert)
      .union(rows(((i * 1009L) % initRows) min (initRows - perUpsert / 100),
        perUpsert / 100).withColumn("val", (col("val") + i)
          .cast(if (decimalVal) "decimal(12,2)" else "double")))

    def runPhase(tag: String, cadence: Int): Unit = {
      val dir = ProbeTmp.dir(s"graft-refscale-$tag-")
      var t: GraftTable = null
      val tInit = time {
        t = GraftTable.create(spark, rows(0, initRows), dir,
          hashColumns = Seq("id"), bucketNum = buckets)
      }
      var tCompactions = 0.0
      // under a cadence, the steady-state read carries the AVERAGE pending
      // load — half a cadence of deltas past the last compaction — so the
      // upsert count extends by cadence/2 (a read right after compaction
      // would trivially equal the compacted read)
      val total = if (cadence > 0) nUpserts + cadence / 2 else nUpserts
      val tUpserts = time {
        (1 to total).foreach { i =>
          t.upsert(batch(i))
          if (cadence > 0 && i % cadence == 0) tCompactions += time {
            t.compaction(CompactionOptions(fileNumLimit = Some(8),
              fileSizeLimit = Some(128L * 1024 * 1024)), _ => true)
          }
        }
      }
      val live = t.liveFiles
      val runsNow = live.map(f => (f.partitionDesc, f.commitOrdinal))
        .distinct.size
      def readAgg(): Unit = t.toDF.agg(sum(col("val"))).collect()
      // merge-free floor over the SAME file set: plain parquet union scan.
      // (The blog's chart compares MOR frameworks all reading the same
      // delta backlog, so the merge tax — mor vs this — is the comparable
      // number; mor vs the compacted 32-file scan additionally carries the
      // small-file tax every format pays on an uncompacted backlog.)
      val plain = spark.read.parquet(live.map(_.file.path): _*)
      val readPlain = min3 { plain.agg(sum(col("val"))).collect() }
      // default read: open-run cap active (spark.graft.merge.maxOpenRuns,
      // default 16) — past the cap the merge pre-spills oldest runs, so
      // per-task reader memory stays bounded at any backlog depth
      graft.read.MergeReaderGauge.reset()
      val readDeltas = min3 { readAgg() }
      val peakCapped = graft.read.MergeReaderGauge.peak
      // unbounded comparison: every run's reader open for the whole merge
      // (the pre-round-7 behavior — fine here, OOM risk on wide schemas)
      spark.conf.set(graft.read.BoundedMerge.ConfKey, "100000")
      graft.read.MergeReaderGauge.reset()
      val readDeltasUnbounded = min3 { readAgg() }
      val peakUnbounded = graft.read.MergeReaderGauge.peak
      spark.conf.unset(graft.read.BoundedMerge.ConfKey)
      val tCompact = time { t.compaction() }
      val readCompacted = min3 { readAgg() }
      val mergeTax = readDeltas / readPlain - 1.0
      val mergeTaxUnbounded = readDeltasUnbounded / readPlain - 1.0
      val backlogTax = readDeltas / readCompacted - 1.0
      println(f"[refscale:$tag] init=${initRows}r/$tInit%.1fs " +
        f"upserts=${nUpserts}x$perUpsert%dr/$tUpserts%.1fs " +
        f"cadence_compactions=$tCompactions%.1fs live_runs=$runsNow " +
        f"files=${live.size} read_plain_same_files=$readPlain%.2fs " +
        f"read_deltas=$readDeltas%.2fs (peak_open_readers=$peakCapped) " +
        f"read_deltas_unbounded=$readDeltasUnbounded%.2fs " +
        f"(peak_open_readers=$peakUnbounded) " +
        f"full_compaction=$tCompact%.1fs read_compacted=$readCompacted%.2fs " +
        f"merge_tax=${mergeTax * 100}%.1f%% " +
        f"merge_tax_unbounded=${mergeTaxUnbounded * 100}%.1f%% " +
        f"backlog_tax=${backlogTax * 100}%.1f%%")
    }

    runPhase("no-compaction", cadence = 0)
    runPhase("leveled-cadence", cadence = 10)
    spark.stop()
  }
}
