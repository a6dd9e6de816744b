package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.streaming.GraftSink
import graft.tables.GraftTable

class PipelineSuite extends SparkFixture {
  import spark.implicits._

  override def beforeAll(): Unit = { super.beforeAll(); GraftFunctions.register(spark) }

  def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  def embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("custom expressions: hamming / cosine / simhash / xx64") {
    val df = Seq((Array(0xFFL, 0x0L), Array(0x0L, 0x0L))).toDF("a", "b")
    assert(df.select(GraftFunctions.hamming($"a", $"b")).head.getInt(0) == 8)
    val c = Seq((Array(1.0f, 0f), Array(1.0f, 0f)), (Array(1.0f, 0f), Array(0f, 1.0f)))
      .toDF("a", "b").select(round(GraftFunctions.cosine($"a", $"b"), 6)).collect()
    assert(c.map(_.getDouble(0)).toSeq == Seq(1.0, 0.0))
    // simhash of identical token arrays identical; different differ
    val s = Seq(Seq("a", "b", "c"), Seq("a", "b", "c"), Seq("x", "y", "z"))
      .toDF("t").select(GraftFunctions.simhash($"t")).collect().map(_.getLong(0))
    assert(s(0) == s(1) && s(0) != s(2))
    // deterministic across eval modes
    val h1 = Seq("hello").toDF("s").select(GraftFunctions.xx64($"s")).head.getLong(0)
    val h2 = Seq("hello").toDF("s").select(GraftFunctions.xx64($"s")).head.getLong(0)
    assert(h1 == h2)
  }

  test("text analysis stats over documents") {
    val stats = TextAnalysis.documentStats(docs).limit(50).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val nTokens = r.getAs[Int]("n_tokens")
      assert(nTokens > 0)
      assert(r.getAs[Double]("quality") >= 0.0 && r.getAs[Double]("quality") <= 1.0)
      assert(r.getAs[String]("lang_pred") != null)
    }
    // token count matches a trivial recount for one row
    val one = docs.orderBy("doc_id").limit(1).collect()(0)
    val expected = one.getAs[String]("text").trim.split("\\s+").count(_.nonEmpty)
    val got = docs.orderBy("doc_id").limit(1)
      .select(TextAnalysis.tokenCount($"text")).head.getInt(0)
    assert(got == expected)
  }

  test("exact dedup keeps min-id row per duplicated text") {
    val df = Seq((1L, "same text here"), (2L, "same  TEXT here"), (3L, "unique one"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val pairs = Dedup.exactDupPairs(df, "doc_id", "text").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("exactDupPairs groups null texts like exact() does (ADVICE r16)") {
    // null-text docs hash to one null group: exact() keeps the min-id row
    // and drops the rest, so exactDupPairs REPORTS those drops as pairs —
    // the r16 window rewrite intentionally aligned the pair report with
    // exact()'s groupBy semantics (the old join-back silently dropped
    // null-hash rows); this pin documents that callers deleting reported
    // dup_ids get exactly exact()'s survivor set, nulls included
    val df = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "u")).toDF("doc_id", "text")
    val survivors = Dedup.exact(df, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 3L))
    val pairs = Dedup.exactDupPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("passage dedup removes repeated windows, keeps first occurrence") {
    val d = Seq(
      (1L, "a b c d e f g h i j k l"), // 2 passages: [a..j], [k l]
      (2L, "a b c d e f g h i j x y"), // first passage duplicates doc 1's
      (3L, "zz yy")                    // unique short doc
    ).toDF("doc_id", "text")
    val out = Dedup.passageDedup(d, "doc_id", "text", window = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a b c d e f g h i j k l")
    assert(out(2L) == "x y") // shared first window removed, tail survives
    assert(out(3L) == "zz yy")
    // duplicate-within-doc: second copy of the window is dropped
    val rep = Seq((7L, ("p q r s t u v w x y " * 2).trim))
      .toDF("doc_id", "text")
    val repOut = Dedup.passageDedup(rep, "doc_id", "text", window = 10)
      .head.getString(1)
    assert(repOut == "p q r s t u v w x y")
  }

  test("substring dedup: maximal duplicated spans + first-occurrence removal") {
    val d = Seq(
      (1L, "u1 u2 s1 s2 s3 s4 s5 u3 u4"), // shared s1..s5 at token 2
      (2L, "v1 s1 s2 s3 s4 s5 v2 v3 v4"), // same snippet at token 1
      (3L, "w1 w2 w3 w4 w5 w6")           // unique
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(d, "doc_id", "text", window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // both occurrences of the 5-token snippet surface as one maximal span
    assert(spans == Set((1L, 2L, 5L), (2L, 1L, 5L)))
    val clean = Dedup.substringDedup(d, "doc_id", "text", window = 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 1 holds the corpus-first occurrence: untouched
    assert(clean(1L) == (("u1 u2 s1 s2 s3 s4 s5 u3 u4", 0L)))
    assert(clean(2L) == (("v1 v2 v3 v4", 5L)))
    assert(clean(3L) == (("w1 w2 w3 w4 w5 w6", 0L)))
    // self-repetition within one doc: the second copy is excised
    val rep = Seq((7L, "p q r s p q r s")).toDF("doc_id", "text")
    val spans7 = Dedup.duplicatedSpans(rep, "doc_id", "text", window = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(spans7 == Set((0L, 4L), (4L, 4L)))
    val rep7 = Dedup.substringDedup(rep, "doc_id", "text", window = 4)
      .head
    assert(rep7.getString(1) == "p q r s" && rep7.getLong(2) == 4L)
  }

  test("near-dup index: persisted check, incremental growth, reopen") {
    import graft.pipeline.NearDupIndex
    val corpus = docs.limit(200).select($"doc_id", $"text")
    val dir = java.nio.file.Files.createTempDirectory("graft-ndi-").toFile.getAbsolutePath
    val idx = NearDupIndex.create(spark, dir)
    idx.add(corpus, "doc_id", "text")
    // a batch of exact copies must come back as J = 1.0 pairs vs their originals
    val batch = corpus.filter($"doc_id" % 7 === 0)
      .withColumn("doc_id", $"doc_id" + 5000000L)
    val hits = idx.check(batch, "doc_id", "text", corpus, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = corpus.filter($"doc_id" % 7 === 0)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty)
    assert(expected.subsetOf(hits.collect { case (a, b, j) if j == 1.0 && b == a + 5000000L => a }.toSet))
    // unrelated fresh docs surface nothing
    val fresh = Seq((9000001L, "entirely novel content zqx wvu tpo")).toDF("doc_id", "text")
    assert(idx.check(fresh, "doc_id", "text", corpus, threshold = 0.9).isEmpty)
    // grow the index with the batch, reopen from disk, re-check a copy of a
    // BATCH doc — found via the delta-upserted signatures only
    idx.add(batch, "doc_id", "text")
    val reopened = NearDupIndex.forPath(spark, dir)
    assert(reopened.bands == 8 && reopened.numHashes == 32)
    val batchTexts = batch.select($"doc_id", $"text")
    val again = batchTexts.limit(1).withColumn("doc_id", $"doc_id" + 1000L)
    val found = reopened.check(again, "doc_id", "text",
        corpus.unionByName(batchTexts), threshold = 0.9)
      .filter($"jaccard" === 1.0).collect()
    assert(found.nonEmpty)

    // DELETION maintenance: remove one indexed doc (tombstone run, nothing
    // rewritten) -> a copy of it no longer surfaces; other docs still do
    val victim = expected.head
    reopened.remove(Seq(victim))
    val copyOfVictim = corpus.filter($"doc_id" === victim)
      .withColumn("doc_id", $"doc_id" + 7000000L)
    assert(reopened.check(copyOfVictim, "doc_id", "text", corpus,
      threshold = 0.9).filter($"id_a" === victim).isEmpty)
    val survivor = expected.find(_ != victim).get
    val copyOfSurvivor = corpus.filter($"doc_id" === survivor)
      .withColumn("doc_id", $"doc_id" + 8000000L)
    assert(!reopened.check(copyOfSurvivor, "doc_id", "text", corpus,
      threshold = 0.9).filter($"id_a" === survivor).isEmpty)
  }

  test("vector index deletion maintenance: remove kills ids; re-append relocates") {
    import graft.pipeline.VectorIndex
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-vrm-")
      .toFile.getAbsolutePath
    val idx = VectorIndex.build(spark, e, dir, "vec_id", "embedding", nlist = 8)
    val q0 = e.filter($"vec_id" === 0).select("embedding")
      .head.getSeq[Float](0).toArray
    def topIds(k: Int) = idx.search(q0, k, nprobe = 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(topIds(5).head == 0L) // self-match first
    idx.remove(Seq(0L))
    assert(!topIds(5).contains(0L), "removed id must not surface")
    // relocate: re-append id 0 with a DIFFERENT vector (may hop cells) —
    // the documented mutable-embedding contract remove+append
    val moved = e.filter($"vec_id" === 17).select(
      lit(0L).as("vec_id"), $"embedding")
    idx.append(moved)
    val hits = idx.search(e.filter($"vec_id" === 17).select("embedding")
      .head.getSeq[Float](0).toArray, 5, nprobe = 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(hits.contains(0L), s"relocated id must surface near its new home: $hits")
  }

  test("streaming curation: cross-batch near-dup admission via the persisted index") {
    import graft.pipeline.TrainingSet
    val root = java.nio.file.Files.createTempDirectory("graft-scur-").toFile.getAbsolutePath
    val b1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val b2 = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // copy of doc 1
      (11L, "completely different fresh content arrives right here now"),
      (12L, "short")                                          // fails the gate
    ).toDF("doc_id", "text")
    val src = GraftTable.create(spark, b1, s"$root/src")
    src.append(b2) // second commit -> second micro-batch under pacing
    val q = TrainingSet.curateStream(
      spark.readStream.format("graft").option("maxCommitsPerTrigger", "1")
        .load(s"$root/src"),
      "doc_id", "text", s"$root/out", s"$root/idx", s"$root/ckpt",
      cfg = TrainingSet.Config(
        qualityPred = Some(length($"text") > 10), minTokens = 0,
        minhashThreshold = 0.8),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(120000)
    val out = GraftTable.forPath(spark, s"$root/out").toDF
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // batch 1 fully accepted; batch 2's copy is caught by the index grown
    // in batch 1, the short doc by the quality gate
    assert(out == Set(1L, 2L, 11L))
    // the index carries signatures for every accepted doc
    val idxDocs = GraftTable.forPath(spark, s"$root/idx").toDF
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(idxDocs == Set(1L, 2L, 11L))
    // replay idempotence: a fresh checkpoint re-processes every batch from
    // scratch; earlier-accepted rows are invisible to the check (same-id
    // matches drop) and the PK upserts replay harmlessly
    val q2 = TrainingSet.curateStream(
      spark.readStream.format("graft").option("maxCommitsPerTrigger", "1")
        .load(s"$root/src"),
      "doc_id", "text", s"$root/out", s"$root/idx", s"$root/ckpt2",
      cfg = TrainingSet.Config(
        qualityPred = Some(length($"text") > 10), minTokens = 0,
        minhashThreshold = 0.8),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q2.awaitTermination(120000)
    val out2 = GraftTable.forPath(spark, s"$root/out").toDF
      .select("doc_id").collect().map(_.getLong(0))
    assert(out2.length == 3 && out2.toSet == Set(1L, 2L, 11L))
  }

  test("NB quality classifier separates seed-like from crawl-like docs") {
    import graft.pipeline.QualityClassifier
    val seed = Seq(
      ("the quick study of science and history", true),
      ("careful analysis of primary sources", true),
      ("click here buy now free offer", false),
      ("free free click buy offer now", false)
    ).toDF("text", "lab")
    val docs = Seq(
      (1L, "study of science sources"),   // positive-seed words
      (2L, "click buy free offer"),       // negative-seed words
      (3L, "zebra quantum")               // unseen: smoothed prior only
    ).toDF("doc_id", "text")
    val m = QualityClassifier.nbScore(docs, "doc_id", "text", seed, "text", "lab")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("llr_mean")).toMap
    assert(m(1L) > 0.0 && m(2L) < 0.0)
    assert(m(1L) > m(3L) && m(3L) > m(2L))
    // both classes have 12 seed tokens, so the unseen-token prior is 0
    assert(math.abs(m(3L)) < 0.1)
    val kept = QualityClassifier.classifierFilter(
        docs, "doc_id", "text", seed, "text", "lab", minLlr = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("repetition scores flag duplicated words and n-grams") {
    val d = Seq(
      (1L, "one two three four"),          // no repetition
      (2L, "spam spam spam spam"),         // all dup words + grams
      (3L, "ab cd ab cd ab cd")            // repeated bigram pattern
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionScores(d)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("dup_word_frac"), r.getAs[Double]("dup_2gram_frac"),
          r.getAs[Double]("dup_3gram_frac"))).toMap
    assert(m(1L) == ((0.0, 0.0, 0.0)))
    assert(m(2L)._1 == 0.75 && m(2L)._2 == 0.666667 && m(2L)._3 == 0.5)
    assert(m(3L)._1 > 0.5 && m(3L)._2 > 0.5 && m(3L)._3 > 0.0)
  }

  test("minhash LSH finds near-duplicates; jaccard verified") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely different words nothing shared at all zebra piano cloud"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(df, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("jaccard pair build releases its corpus-sized caches (consecutive jobs don't accumulate)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").limit(300)
    def cachedRdds: Int = spark.sparkContext.getPersistentRDDs.size
    val before = cachedRdds
    // three consecutive pipelines — the 100x-probe shape whose accumulated
    // dead blocks OOM'd the third job before the explicit release
    (1 to 3).foreach { _ =>
      Dedup.jaccardNearDupPairs(docs, "doc_id", "text", threshold = 0.5).count()
    }
    // each run leaves up to three TINY localCheckpoints behind (verified
    // pairs, candidate pairs, candidate shingles — context-cleaner-owned),
    // but the two CORPUS-SIZED persists per run must be gone
    // deterministically: 3 runs x 3 small <= 9; a release regression adds
    // 3 runs x 2 corpus caches on top and trips the bound
    val growth = cachedRdds - before
    assert(growth <= 9,
      s"persistent RDD count grew by $growth after 3 dedup runs — " +
        "corpus-sized dedup intermediates are no longer released")
  }

  test("shared pair memo: hit on the same corpus, never across directories") {
    // the r14 memo keys on canonicalized-plan + INPUT FILES: a canonicalized
    // LogicalRelation elides the path, so two same-shaped corpora in
    // different directories would otherwise collide and the big corpus
    // would silently get the small one's pairs (caught by the 100x probe's
    // first-sample column)
    withTempPath { dirA =>
      withTempPath { dirB =>
        val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        Seq((1L, base), (2L, base.replace("kappa", "lambda")),
          (3L, "unrelated words entirely other content here now"))
          .toDF("doc_id", "text").write.parquet(s"$dirA/d.parquet")
        // same schema/shape, DIFFERENT duplicate structure: no near-dups
        Seq((1L, "one two three four five six seven eight nine ten"),
          (2L, "cold warm hot cool mild damp dry wet icy snowy"),
          (3L, "red blue green yellow purple orange pink black white gray"))
          .toDF("doc_id", "text").write.parquet(s"$dirB/d.parquet")
        def pairsOf(dir: String) = Dedup.jaccardNearDupPairsShared(
          spark.read.parquet(s"$dir/d.parquet"), "doc_id", "text",
          threshold = 0.5)
        val a1 = pairsOf(dirA)
        val a2 = pairsOf(dirA)
        assert(a1 eq a2, "same corpus + params must hit the memo")
        val b = pairsOf(dirB).collect()
        assert(b.isEmpty,
          s"different directory must MISS the memo (got dirA's pairs? " +
            s"${b.mkString(",")})")
        assert(a1.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
          Seq((1L, 2L)))
      }
    }
  }

  test("shared pair memo: refresh recomputes after an in-place overwrite; " +
    "non-file-backed inputs bypass the memo") {
    // the memo key rests on file immutability — an in-place rewrite keeps
    // plan text and file list, so without refresh the stale pairs would be
    // served (documented escape hatch)
    withTempPath { dir =>
      val p = s"$dir/d.parquet"
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      Seq((1L, base), (2L, base.replace("kappa", "lambda")))
        .toDF("doc_id", "text").write.parquet(p)
      def pairs(refresh: Boolean) = Dedup.jaccardNearDupPairsShared(
        spark.read.parquet(p), "doc_id", "text", threshold = 0.5,
        refresh = refresh)
      assert(pairs(refresh = false).count() == 1)
      // overwrite IN PLACE with a no-duplicate corpus of the same shape
      Seq((1L, "one two three four five six seven eight nine ten"),
        (2L, "red blue green yellow purple orange pink black white gray"))
        .toDF("doc_id", "text").write.mode("overwrite").parquet(p)
      val refreshed = pairs(refresh = true)
      assert(refreshed.count() == 0,
        "refresh=true must recompute against the overwritten corpus")
      assert(pairs(refresh = false) eq refreshed,
        "refresh must RE-memoize the recomputed frame")
    }
    // in-memory corpora: inputFiles is empty and LocalRelation plan text
    // truncates row data — two different corpora would collide on the key,
    // so the memo must be bypassed entirely
    val memA = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota")).toDF("doc_id", "text")
    val a = Dedup.jaccardNearDupPairsShared(memA, "doc_id", "text", 0.5)
    val a2 = Dedup.jaccardNearDupPairsShared(memA, "doc_id", "text", 0.5)
    assert(a.count() == 1)
    assert(!(a eq a2), "non-file-backed inputs must not be memoized")
  }

  test("jaccard verify past the broadcast cap falls back to shuffled " +
    "joins with identical pairs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").limit(200)
    val reference = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      threshold = 0.5).collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.dedup.broadcastVerifyMaxDocs", "1")
    try {
      val fallback = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        threshold = 0.5).collect().map(_.toString).sorted.toSeq
      assert(fallback == reference,
        s"fallback diverged: got ${fallback.size} vs ${reference.size} pairs")
    } finally spark.conf.unset("spark.graft.dedup.broadcastVerifyMaxDocs")
  }

  test("simhash near-dup pairs on documents subset") {
    val common = (1 to 30).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, common + " ending1"), (2L, common + " ending2"),
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(df, "doc_id", "text", maxDist = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)) && !pairs.contains((1L, 3L)))
  }

  test("embedding LSH near-dup recovers high-cosine pairs vs brute force") {
    val sub = embs.filter($"vec_id" < 200)
    val brute = Dedup.bruteForceCosinePairs(sub, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupPairs(sub, "vec_id", "embedding",
      threshold = 0.95, bits = 8, tables = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), s"LSH produced false positives: ${lsh -- brute}")
    if (brute.nonEmpty) {
      val recall = lsh.size.toDouble / brute.size
      assert(recall >= 0.5, s"LSH recall too low: $recall (found ${lsh.size}/${brute.size})")
    }
  }

  test("brute-force and IVF ANN top-k") {
    val q = embs.filter($"vec_id" === 0).select("embedding")
      .head.getSeq[Float](0).toArray
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    assert(exact.contains(0L)) // self is its own nearest neighbor
    val approx = Similarity.annSearch(embs, "vec_id", "embedding", q, 10,
      nlist = 8, nprobe = 4).collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("training-set curation: stages compose, counts shrink monotonically, " +
    "output reproducible") {
    import spark.implicits._
    // 30 mutually-dissimilar docs (disjoint-ish vocabularies), two planted
    // near-dups, one low-quality doc
    def body(i: Int): String =
      (1 to 40).map(k => s"word${(i * 131 + k * 7) % 9973}").mkString(" ")
    val rows =
      (1 to 30).map(i => (i.toLong, body(i))) ++
      Seq((100L, body(1) + " extra")) ++                 // near-dup of 1
      Seq((101L, (1 to 60).map(_ => "zz").mkString(" "))) ++ // mean word len 2 -> fails quality
      Seq((102L, body(2) + " extra"))                    // near-dup of 2
    val docs = rows.toDF("doc_id", "text")
    val test = Seq((999L, "benchmark " + body(7).split(" ").take(12).mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.pipeline.TrainingSet.curate(
      docs, "doc_id", "text", Some(test),
      graft.pipeline.TrainingSet.Config(
        qualityPred = Some(col("flag_tokens") && col("flag_word_len")),
        minTokens = 20, minhashThreshold = 0.9, decontaminateNgram = 8,
        chunkWindow = 32, chunkStride = 32, numShards = 4, seed = "s"))
    // 101 fails quality; 100/102 near-dup away; doc 7 shares the test
    // set's 12-token prefix -> 8-gram decontamination removes it
    val gotIds = out.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(gotIds.size == 29 && !gotIds.contains(7L)
      && !gotIds.contains(101L), s"gotIds=$gotIds")
    // without the contaminated test set, survivors chunk and shard
    val out2 = graft.pipeline.TrainingSet.curate(
      docs, "doc_id", "text", None,
      graft.pipeline.TrainingSet.Config(
        qualityPred = Some(col("flag_tokens") && col("flag_word_len")),
        minTokens = 20, minhashThreshold = 0.9,
        chunkWindow = 32, chunkStride = 32, numShards = 4, seed = "s"))
    val ids = out2.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids.size == 30 && !ids.contains(101L)
      && !(ids.contains(100L) && ids.contains(1L))
      && !(ids.contains(102L) && ids.contains(2L)), s"ids=$ids")
    assert(out2.columns.contains("shard") && out2.columns.contains("pos")
      && out2.columns.contains("chunk_text"))
    // reproducible: same config + seed -> identical shards and positions
    val out3 = graft.pipeline.TrainingSet.curate(
      docs, "doc_id", "text", None,
      graft.pipeline.TrainingSet.Config(
        qualityPred = Some(col("flag_tokens") && col("flag_word_len")),
        minTokens = 20, minhashThreshold = 0.9,
        chunkWindow = 32, chunkStride = 32, numShards = 4, seed = "s"))
    assert(out2.except(out3).count() == 0 && out3.except(out2).count() == 0)

    // materialized form: shard-partitioned graft table with provenance
    withTempPath { path =>
      val t = graft.pipeline.TrainingSet.curateToTable(
        docs, "doc_id", "text", path, None,
        graft.pipeline.TrainingSet.Config(
          qualityPred = Some(col("flag_tokens") && col("flag_word_len")),
          minTokens = 20, minhashThreshold = 0.9,
          chunkWindow = 32, chunkStride = 32, numShards = 4, seed = "s"))
      assert(t.info.rangeColumns == Seq("shard"))
      assert(t.info.properties("graft.curation.seed") == "s")
      // reading one training shard = one pruned partition
      val shard0 = t.toDF(_ == "shard=0")
      assert(shard0.count() > 0 &&
        shard0.select("shard").distinct().head.getInt(0) == 0)
      assert(t.toDF.count() == out2.count())
    }
  }

  test("bigram LM scoring: fluent text beats gibberish; filter drops it") {
    import spark.implicits._
    val fluent = "the cat sat on the mat and the cat slept on the mat"
    val corpus = (1 to 20).map(i => (i.toLong, fluent)) :+
      (99L, "zq xv qj wk zz vq kx jq zv qq")
    val df = corpus.toDF("doc_id", "text")
    val scores = graft.pipeline.LanguageModel
      .bigramScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(99L) < scores(1L),
      s"gibberish must score below fluent text: $scores")
    val kept = graft.pipeline.LanguageModel
      .perplexityFilter(df, "doc_id", "text", minLogP = scores(1L) - 0.001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(99L) && kept.contains(1L))
    // short doc (no bigrams) drops out of scoring
    val one = Seq((7L, "single")).toDF("doc_id", "text")
    assert(graft.pipeline.LanguageModel
      .bigramScore(one, "doc_id", "text").count() == 0)
    // UNSEEN bigrams (separate reference corpus) get the smoothed floor,
    // not silently dropped: an all-unseen doc still scores — and lower
    // than one the model has seen
    val ref = Seq((1L, fluent)).toDF("doc_id", "text")
    val scored = graft.pipeline.LanguageModel.bigramScore(
      Seq((1L, fluent), (99L, "qz vx jw kq zv")).toDF("doc_id", "text"),
      "doc_id", "text", trainOn = Some(ref))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored.contains(99L), "all-unseen doc must still be scored")
    assert(scored(99L) < scored(1L), s"unseen must score below seen: $scored")
  }

  test("semantic decontamination flags EVERY duplicate of a test item, " +
    "not a top-k subset") {
    import spark.implicits._
    // one benchmark vector duplicated 30x in the corpus under distinct ids
    val base = embs.filter($"vec_id" < 50)
      .select($"vec_id", $"embedding")
    val benchVec = embs.filter($"vec_id" === 3).select("embedding")
    val dups = (0 until 30).map(_.toLong).toDF("i")
      .crossJoin(benchVec)
      .select(($"i" + 1000).as("vec_id"), $"embedding")
    val corpus = base.unionByName(dups)
    val test = embs.filter($"vec_id" === 3)
      .select(($"vec_id" + 9000000).as("test_id"), $"embedding".as("tvec"))
    val hits = graft.pipeline.Decontaminate.semanticHits(
      corpus, "vec_id", "embedding", test, "test_id", "tvec",
      threshold = 0.999, nlist = 8, nprobe = 8)
    // all 30 planted copies AND the original flag — no rank cap
    val flagged = hits.select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(flagged.size == 31 && flagged.contains(3L)
      && (1000L until 1030L).forall(flagged.contains), s"flagged=$flagged")
    val clean = graft.pipeline.Decontaminate.decontaminateSemantic(
      corpus, "vec_id", "embedding", test, "test_id", "tvec",
      threshold = 0.999, nlist = 8, nprobe = 8)
    assert(clean.count() == corpus.count() - 31)
  }

  test("IVF-BQ ANN: quantized pre-rank finds the true neighbors") {
    val q = embs.filter($"vec_id" === 0).select("embedding")
      .head.getSeq[Float](0).toArray
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    // exhaustive probing isolates the quantization: with nprobe = nlist the
    // only recall loss can come from the 1-bit hamming pre-rank
    val bq = Similarity.annSearchQuantized(embs, "vec_id", "embedding", q,
      k = 10, nlist = 8, nprobe = 8, refine = 8)
      .collect().map(_.getLong(0)).toSet
    assert(bq.contains(0L), "self must survive quantized pre-rank")
    val recall = (exact intersect bq).size.toDouble / exact.size
    assert(recall >= 0.6, s"BQ recall $recall")
  }

  test("KNN join: top-k per query, ranked, no cartesian product") {
    val queries = embs.filter($"vec_id" % 100 === 0) // 5 query vectors
    val j = Similarity.annJoin(queries, "vec_id", "embedding",
      embs, "vec_id", "embedding", k = 3, nlist = 8, nprobe = 8)
    val rows = j.collect()
    assert(rows.length == queries.count() * 3)
    // nprobe = nlist -> exhaustive probing: rank 1 must be the query itself
    rows.filter(_.getInt(3) == 1).foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"rank-1 should be self: $r")
    }
    // per-query ranks are 1..k
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach(g => assert(g.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3)))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"KNN join must be an equi-join on probe cells:\n$plan")
  }

  test("corpus shuffle: deterministic permutation, balanced shards, " +
    "no single-partition window") {
    val s1 = graft.pipeline.Shuffle.shuffleShards(docs, "doc_id", 8, "s1")
    val s1b = graft.pipeline.Shuffle.shuffleShards(docs, "doc_id", 8, "s1")
    val s2 = graft.pipeline.Shuffle.shuffleShards(docs, "doc_id", 8, "s2")
    assert(s1.count() == docs.count())
    // same seed -> identical permutation; different seed -> different
    assert(s1.except(s1b).count() == 0)
    assert(s1.except(s2).count() > 0)
    // every shard used, within-shard positions contiguous from 1
    val shards = s1.groupBy("shard").agg(
      count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    assert(shards.length == 8)
    shards.foreach(r => assert(r.getInt(2) == 1 && r.getInt(3) == r.getLong(1)))
    // the permutation breaks source runs: adjacent (shard,pos) rows should
    // mix sources rather than stream one source at a time
    val plan = s1.queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") || plan.contains("hashpartitioning"),
      s"shard window must hash-partition, not global-sort:\n$plan")
  }

  test("near-dup components + dedupByPairs keep one representative per cluster") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    // chain 1-2-3 and pair 5-6; 4 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val comp = graft.pipeline.Dedup.components(docs, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
    val kept = graft.pipeline.Dedup.dedupByPairs(docs, "id", pairs)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L))
  }

  test("components: empty pair set -> every doc a singleton; propagation " +
    "runs only over edge-touched vertices") {
    import spark.implicits._
    val docs = (1L to 50L).toDF("id")
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val comp = graft.pipeline.Dedup.components(docs, "id", empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == (1L to 50L).map(i => i -> i).toMap)
    // edge ids outside the doc set do not leak into the output
    val stray = Seq((100L, 101L)).toDF("id_a", "id_b")
    val comp2 = graft.pipeline.Dedup.components(docs, "id", stray)
    assert(comp2.count() == 50)
    assert(comp2.filter(col("id") > 50L).count() == 0)
  }

  test("keepBest elects the highest-quality doc per near-dup cluster") {
    import spark.implicits._
    // cluster {1,2,3}: 2 has the best quality; cluster {5,6}: tie -> min id;
    // 4 is a singleton and survives as-is
    val docs = Seq((1L, 10), (2L, 30), (3L, 20), (4L, 5), (5L, 7), (6L, 7))
      .toDF("id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = graft.pipeline.Dedup.keepBest(docs, "id", pairs, "quality")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 4L, 5L))
  }

  test("knn classify: planted clusters recover their label; determinism") {
    import spark.implicits._
    // two well-separated directions; unlabeled copies must inherit the
    // label of their direction's cluster
    def vec(base: Array[Float], eps: Float) =
      base.zipWithIndex.map { case (v, i) => v + (if (i == 0) eps else 0f) }
    val a = Array(1f, 0f, 0f, 0f); val b = Array(0f, 1f, 0f, 0f)
    val rows =
      (0 until 12).map(i => (i.toLong * 4 + 1, vec(a, i * 0.01f), 7)) ++ // labeled A
      (0 until 12).map(i => (i.toLong * 4 + 2, vec(b, i * 0.01f), 9)) ++ // labeled B
      Seq((0L, vec(a, 0.5f), -1), (4L, vec(b, 0.5f), -1))               // unlabeled
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(
      df.filter($"vec_id" % 4 === 0), "vec_id", "embedding",
      df.filter($"vec_id" % 4 =!= 0), "vec_id", "embedding",
      "label", k = 5, nlist = 4, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(0L -> 7, 4L -> 9))
  }

  test("bpe pair counts: frequency-weighted char pairs, deterministic top-k") {
    import spark.implicits._
    // "abab" x2 contributes ab:4 (2 per occurrence x 2 docs... weighted by
    // word frequency), "ab" x3 contributes ab:3 -> ab = 2*2 + 3 = 7
    val df = Seq("abab abab ab", "ab ab").toDF("text")
    val top = TextAnalysis.bpePairCounts(df, "text", topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(top("ab") == 7L)   // 2 per "abab" (x2) + 1 per "ab" (x3)
    assert(top("ba") == 2L)   // interior of "abab" only
    assert(!top.contains("aa"))
  }

  test("bpe training: greedy run-aware merges, hand-checked 3 iterations") {
    import spark.implicits._
    // vocab: aaab f=2, ab f=1
    // iter1 pairs: (a,a)=4 (two per aaab, run-counted), (a,b)=3 -> merge (a,a)
    //   greedy on [a,a,a,b]: [aa,a,b] (run of 3 -> ONE merge, not two)
    // iter2 pairs: (aa,a)=2, (a,b)=3 -> merge (a,b) -> [aa,ab], [ab]
    // iter3 pairs: (aa,ab)=2 -> merge (aa,ab)
    val m = TextAnalysis.bpeTrain(Seq("aaab aaab ab").toDF("text"), "text", 3)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(m == Seq((1, "a", "a", 4L), (2, "a", "b", 3L), (3, "aa", "ab", 2L)))
    // the apply half on the same corpus: merge 3 = (aa, ab) fuses the
    // whole word -> aaab segments to [aaab] (x2), ab stays [ab] (x1)
    val seg = TextAnalysis.bpeSegmentFrequencies(
      Seq("aaab aaab ab").toDF("text"), "text", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seg == Map("aaab" -> 2L, "ab" -> 1L))
    // at 2 merges the segmentation is non-trivial: [aa, ab] x2 + [ab]
    val seg2 = TextAnalysis.bpeSegmentFrequencies(
      Seq("aaab aaab ab").toDF("text"), "text", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seg2 == Map("aa" -> 2L, "ab" -> 3L))
  }

  test("deterministic sampling: reproducible, nesting, stratified rates") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong, if (i % 4 == 0) "en" else "de"))
      .toDF("id", "lang")
    val s1 = graft.pipeline.Sampling.sample(df, "id", 0.3)
    assert(s1.collect().toSeq == graft.pipeline.Sampling.sample(df, "id", 0.3)
      .collect().toSeq) // reproducible
    val s2 = graft.pipeline.Sampling.sample(df, "id", 0.1)
    // gates nest: the 10% sample is a subset of the 30% sample
    assert(s2.join(s1, Seq("id"), "left_anti").count() == 0)
    val strat = graft.pipeline.Sampling.stratifiedSample(df, "id", "lang",
      Map("en" -> 1.0), defaultRate = 0.0)
    assert(strat.count() == 500)
    assert(strat.filter($"lang" =!= "en").count() == 0)
  }

  test("token packing: deterministic shards, budget-bounded pack starts") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, 100)).toDF("id", "tok")
    val packed = graft.pipeline.Packing.packDocuments(df, "id", "tok",
      budget = 300, numShards = 4)
    val rows = packed.collect().map(r =>
      (r.getLong(0), r.getLong(2), r.getLong(3)))
    // deterministic across runs
    assert(rows.toSeq == graft.pipeline.Packing
      .packDocuments(df, "id", "tok", 300, 4).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq)
    // every pack STARTS under budget: at most ceil(300/100)=3 docs begin in
    // one bin, so pack sizes are 300 (plus at most one straddling doc)
    val sizes = rows.groupBy(t => (t._2, t._3)).view.mapValues(_.length * 100)
    assert(sizes.values.forall(_ <= 300), s"oversized pack: $sizes")
  }

  test("multimodal: feature extraction + frame sampling plumbing") {
    val media = Multimodal.asMediaTable(docs.limit(20), "text", "doc_id")
    val feats = Multimodal.extractImageFeatures(media, "content")
    val rows = feats.collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getAs[scala.collection.Seq[Float]]("features").length == 16))
    // determinism
    val again = Multimodal.extractImageFeatures(media, "content")
      .orderBy("doc_id").collect().map(_.getAs[scala.collection.Seq[Float]]("features").toSeq)
    assert(feats.orderBy("doc_id").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("features").toSeq).toSeq == again.toSeq)
    val frames = Multimodal.sampleVideoFrames(media, "content", "meta", everyMs = 500)
    assert(frames.count() > 20) // exploded to multiple frames per doc
  }

  test("sessionization: gap splits, per-session summaries") {
    val e = Seq(
      ("u", 0L), ("u", 100L), ("u", 5000L), ("u", 5100L), ("v", 0L))
      .toDF("k", "t")
    val s = graft.pipeline.Sessionize.sessions(e, Seq("k"), "t", gap = 1000L)
      .orderBy("k", "session_seq")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(s.toSeq == Seq(
      ("u", 0L, 0L, 100L, 2L), ("u", 1L, 5000L, 5100L, 2L),
      ("v", 0L, 0L, 0L, 1L)))
  }

  test("incremental exact dedup: batch vs corpus, within-batch collapse") {
    val corpus = Seq((1L, "Seen Text"), (2L, "other")).toDF("id", "text")
    val batch = Seq(
      (10L, "seen  text"),   // normalizes to a corpus duplicate -> dropped
      (11L, "fresh"), (12L, "FRESH"), // within-batch dupes -> min id kept
      (13L, "unique")).toDF("id", "text")
    val out = graft.pipeline.Dedup.exactIncremental(corpus, batch, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(out == Set(11L, 13L))
  }

  test("decontamination: n-gram overlap hits and corpus filtering") {
    import graft.pipeline.Decontaminate
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox appeared"), // shares "quick brown fox"
      (3L, "entirely different words here"),
      (4L, "short text")).toDF("id", "text")
    val test = Seq((100L, "one quick brown fox jumps far")).toDF("id", "text")

    val hits = Decontaminate.contaminationHits(docs, "id", "text", test, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares "quick brown fox", "brown fox jumps"; doc 2 shares one
    assert(hits == Map(1L -> 2L, 2L -> 1L))

    val clean = Decontaminate.decontaminate(docs, "id", "text", test, "text",
      n = 3, minHits = 2).select("id").as[Long].collect().toSet
    assert(clean == Set(2L, 3L, 4L)) // only doc 1 reaches the 2-hit threshold

    // fewer tokens than n -> no grams, never flagged
    val tiny = Decontaminate.decontaminate(
      Seq((9L, "ab")).toDF("id", "text"), "id", "text", test, "text", n = 3)
    assert(tiny.count() == 1)
  }

  test("ppm codec: real header parse + feature math; spark path; fallback") {
    // 2x1 image: pixel1 = (255,0,0), pixel2 = (0,0,255)
    val bytes = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](255.toByte, 0, 0, 0, 0, 255.toByte)
    val codec = new Multimodal.PpmCodec()
    val f = codec.decodeImage(bytes)
    assert(math.abs(f(0) - 0.5f) < 1e-6)          // mean R
    assert(f(1) == 0.0f)                          // mean G
    assert(math.abs(f(2) - 0.5f) < 1e-6)          // mean B
    assert(math.abs(f(3) - 0.5f) < 1e-6)          // std R
    assert(math.abs(f(6) - 1f / 3) < 1e-6 && math.abs(f(7) - 1f / 3) < 1e-6)
    assert(f(8) == 0f && f(9) == 0f)              // bottom grid cells empty
    // synthetic generator roundtrips through parse
    val syn = Multimodal.PpmCodec.synthetic(8, 5, seed = 7)
    assert(Multimodal.PpmCodec.parse(syn) == ((8, 5, "P6\n8 5\n255\n".length)))
    // full Spark path over real PPM bytes, deterministic 10-dim features
    val media = Multimodal.asPpmMediaTable(docs.limit(10).select("doc_id"), "doc_id")
    val out = Multimodal.extractImageFeatures(media, "content", codec = codec)
      .select("doc_id", "features").collect()
    assert(out.length == 10 && out.forall(_.getSeq[Float](1).length == 10))
    // non-PPM bytes fall back to the deterministic stub (16-dim)
    assert(codec.decodeImage("not an image".getBytes).length == 16)
  }

  test("pii scrub: email/ip/phone redacted, clean text untouched") {
    val df = Seq(
      (1L, "mail me at bob.smith+x@corp.example.org today"),
      (2L, "server 192.168.0.17 rebooted"),
      (3L, "call +1 (415) 555-0142 now"),
      (4L, "no pii here at all")).toDF("id", "text")
    val out = df.select($"id", TextAnalysis.scrubPii($"text").as("s"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "mail me at <EMAIL> today")
    assert(out(2L) == "server <IP> rebooted")
    assert(out(3L) == "call <PHONE> now")
    assert(out(4L) == "no pii here at all")
  }

  test("gopher filter: rule flags and combined keep verdict") {
    val good = "the cat and the dog be friends that have fun with every " +
      "toy of the house and they run around all day with joy"
    val df = Seq(
      (1L, good),                     // passes everything (minTokens = 10)
      (2L, "tiny text"),              // too few tokens
      (3L, "!!! ??? ... ;;; :::"),    // punctuation soup
      (4L, good.replaceAll("\\b(the|and|be|that|have|with|of)\\b", "xx"))
    ).toDF("id", "text")              // stopword-free
    val out = TextAnalysis.gopherFilter(df, minTokens = 10)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out(1L) && !out(2L) && !out(3L) && !out(4L))
  }

  test("doc chunking: windows, stride overlap, tail chunk") {
    val df = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")), (2L, "a b"))
      .toDF("id", "text")
    val ch = graft.pipeline.Packing.chunkDocuments(df, "id", "text",
      window = 4, stride = 2)
      .orderBy("id", "chunk_idx")
      .as[(Long, Long, String, Int)].collect()
    val one = ch.filter(_._1 == 1L)
    assert(one.map(_._3).toSeq == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10", "w9 w10"))
    assert(one.map(_._4).toSeq == Seq(4, 4, 4, 4, 2))
    assert(ch.filter(_._1 == 2L).map(_._3).toSeq == Seq("a b"))
  }

  test("temperature sampling: smallest stratum whole, mixture flattened") {
    val df = (0 until 400).map(i => (i.toLong, if (i < 320) "big" else "small"))
      .toDF("id", "grp")
    val kept = graft.pipeline.Sampling.temperatureSample(df, "id", "grp", 0.5)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 80)            // rate 1.0 — nothing dropped
    // big: rate sqrt(80/320) = 0.5 — hash gate keeps about half
    assert(kept("big") > 120 && kept("big") < 200)
    // nesting: resampling flatter (alpha 0.25) is a subset
    val flat = graft.pipeline.Sampling.temperatureSample(df, "id", "grp", 0.25)
      .select("id").as[Long].collect().toSet
    val base = graft.pipeline.Sampling.temperatureSample(df, "id", "grp", 0.5)
      .select("id").as[Long].collect().toSet
    assert(flat.subsetOf(base))
  }

  test("prefix-order + sorted-overlap kernels match their reference forms") {
    val rnd = new scala.util.Random(7)
    // sortedOverlap == set-intersection cardinality on random sorted sets
    (1 to 200).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(60).toLong).distinct.sorted
      val got = Seq((a, b)).toDF("a", "b")
        .select(GraftFunctions.sortedOverlap($"a", $"b")).head.getInt(0)
      assert(got == a.toSet.intersect(b.toSet).size, s"a=$a b=$b")
    }
    // prefixOrder: a permutation; non-demoted ascending first, then demoted
    // in reverse-demotion-list order; deterministic
    (1 to 100).foreach { _ =>
      val in = Seq.fill(rnd.nextInt(40) + 1)(rnd.nextInt(30).toLong).distinct
      val demoted = Seq.fill(rnd.nextInt(10))(rnd.nextInt(30).toLong).distinct
      val got = Seq(Tuple1(in)).toDF("h")
        .select(GraftFunctions.prefixOrder($"h", typedLit(demoted)))
        .head.getSeq[Long](0).toSeq
      val rank = demoted.zipWithIndex
        .map { case (t, i) => t -> (demoted.length - i) }.toMap
      val want = in.sortBy(t => (rank.getOrElse(t, 0), t))
      assert(got == want, s"in=$in demoted=$demoted")
    }
  }

  test("mixture planning: budget split, epoch cap + shortfall, materialize") {
    // 3 sources, 100 tokens each; 50/30/20 over a 1000-token budget with a
    // 4-epoch cap: a=cap(5->4, shortfall 100), b=3.0 exact, c=2.0 exact
    val df = (0 until 30).map(i =>
      (i.toLong, Seq("a", "b", "c")(i % 3), 10L)).toDF("id", "src", "tok")
    val plan = graft.pipeline.Mixture.plan(df, "src", "tok",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), budgetTokens = 1000L,
      maxEpochs = 4.0)
    val rows = plan.collect().map(r =>
      r.getAs[String]("source") ->
        (r.getAs[Double]("epochs"), r.getAs[Long]("full_epochs"),
          r.getAs[Double]("shortfall_tokens"))).toMap
    assert(rows("a") == ((4.0, 4L, 100.0)))  // cap bit; shortfall reported
    assert(rows("b") == ((3.0, 3L, 0.0)))
    assert(rows("c") == ((2.0, 2L, 0.0)))
    // materialize: whole epochs replicate exactly; epoch col 0..full-1
    // (fractional_rate 0 here, so the final fractional epoch keeps nothing)
    val m = graft.pipeline.Mixture.materialize(df, "id", "src", plan)
    val perSrc = m.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(perSrc == Map("a" -> 40L, "b" -> 30L, "c" -> 20L))
    // fractional pass: 1.5 epochs -> every doc once + a ~half-rate extra,
    // and the extra-epoch set is the deterministic hash-gate subset
    val p15 = graft.pipeline.Mixture.plan(df.filter($"src" === "a"), "src",
      "tok", Map("a" -> 1.0), budgetTokens = 150L, maxEpochs = 4.0)
    val m15 = graft.pipeline.Mixture.materialize(
      df.filter($"src" === "a"), "id", "src", p15)
    val byEpoch = m15.groupBy("epoch").count().as[(Int, Long)].collect().toMap
    assert(byEpoch(0) == 10L && byEpoch.getOrElse(1, 0L) < 10L)
    val extra = m15.filter($"epoch" === 1).select("id").as[Long].collect().toSet
    val gated = df.filter($"src" === "a")
      .filter(graft.pipeline.Sampling.gate($"id") < lit(500000L))
      .select("id").as[Long].collect().toSet
    assert(extra == gated)
  }

  test("kmeans: deterministic, total assignment, clusters non-trivial") {
    val a = Similarity.kmeans(embs, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Similarity.kmeans(embs, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)                          // reproducible across runs
    assert(a.size == embs.count())          // every vector assigned
    assert(a.values.toSet.size > 1)         // more than one surviving cluster
    // fitted centroids assign a NEW batch map-only, consistent with fit-time
    val cents = Similarity.kmeansCentroids(embs, "vec_id", "embedding", 4, 2)
    val newBatch = embs.filter($"vec_id" < 50)
    val assigned = Similarity.kmeansAssign(newBatch, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned == a.filter { case (id, _) => id < 50 })
  }

  test("plan shapes: per-row operators plan zero exchanges; temperature " +
    "sampling broadcasts its rate table") {
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val noShuffle = Seq(
      "pii scrub" -> docs.select(TextAnalysis.scrubPii($"text")),
      "gopher filter" -> TextAnalysis.gopherFilter(docs),
      "repetition" -> TextAnalysis.repetitionScores(docs),
      "chunking" -> graft.pipeline.Packing.chunkDocuments(
        docs, "doc_id", "text", window = 32, stride = 16))
    noShuffle.foreach { case (name, df) =>
      assert(!plan(df).contains("Exchange"), s"$name should not shuffle")
    }
    val ts = plan(graft.pipeline.Sampling.temperatureSample(
      docs, "doc_id", "lang", 0.5))
    assert(ts.contains("BroadcastHashJoin") && !ts.contains("SortMergeJoin"),
      s"corpus must join the rate table by broadcast, not shuffle:\n$ts")
    // round-4 operators: the permutation shuffle is hash-partitioned (no
    // single-task global sort), no operator plans a cartesian product
    val sh = plan(graft.pipeline.Shuffle.shuffleShards(docs, "doc_id", 8, "s"))
    assert(sh.contains("hashpartitioning") && !sh.contains("rangepartitioning"),
      s"shard permutation must hash-partition:\n$sh")
    val gk = plan(graft.pipeline.Sampling.sampleGroupK(
      docs, "doc_id", "source", 5))
    assert(gk.contains("hashpartitioning") && !gk.contains("rangepartitioning"),
      s"group-k sample must hash-partition by group:\n$gk")
    // lm_score's only nested-loop is the broadcast 1-row vocab scalar;
    // a CartesianProduct would mean the count tables joined unkeyed
    val lm = plan(graft.pipeline.LanguageModel.bigramScore(
      docs, "doc_id", "text"))
    assert(!lm.contains("CartesianProduct"),
      s"LM scoring must not plan a cartesian over data:\n$lm")
  }

  test("streaming sink: exactly-once per (queryId, batchId); modes") {
    withTempPath { path =>
      val t = GraftTable.create(spark, Seq((1L, "a")).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 1)
      val sink = new GraftSink(t, "q1", "update")
      sink.addBatch(1, Seq((2L, "b")).toDF("id", "v"))
      sink.addBatch(1, Seq((2L, "DUP")).toDF("id", "v")) // replay -> skipped
      assertRows(t.toDF, Seq("[1,a]", "[2,b]"))
      sink.addBatch(2, Seq((1L, "a2")).toDF("id", "v"))
      assertRows(t.toDF, Seq("[1,a2]", "[2,b]"))
      val complete = new GraftSink(t, "q2", "complete")
      complete.addBatch(0, Seq((9L, "z")).toDF("id", "v"))
      assertRows(t.toDF, Seq("[9,z]"))
    }
  }
}
