package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm._

/** North-star operator invariants: dedup, similarity, text, multimodal. */
class LlmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("exact dedup groups sum back to the corpus size") {
    val total = Tables.documents(spark, sf).count()
    val grouped = Dedup.exact(spark, sf).agg(sum($"n_docs")).head.getLong(0)
    assert(grouped == total)
  }

  /** The round-9 Probe.scala diagnostics, pinned as invariants: the
    * shingle index's per-doc counts are bounded by the doc's token
    * count (distinct trigrams ≤ ntok − 2, zero below 3 tokens), and the
    * distinct-shingle total never exceeds the row total. */
  test("shingle index: per-doc counts bounded by token count, distinct <= total") {
    val docs = Tables.documents(spark, sf)
    val idx = Dedup.shingleIndexOf(docs)
      .select($"doc_id", size($"shingles").as("ns"))
    val toks = docs.select($"doc_id",
      size(filter(split($"text", " "), w => length(w) > 0)).as("ntok"))
    val bad = idx.join(toks, "doc_id")
      .filter(($"ntok" >= 3 && ($"ns" < 1 || $"ns" > $"ntok" - 2)) ||
              ($"ntok" < 3 && $"ns" =!= 0))
      .count()
    assert(bad == 0)
    val ex = Dedup.shingleIndexOf(docs).select(explode($"shingles").as("s"))
    val total = ex.count()
    val distinct = ex.distinct().count()
    assert(distinct > 0 && distinct <= total)
  }

  test("fingerprint is invariant under token-order permutation") {
    val a = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val b = Seq((1L, "gamma alpha beta beta")).toDF("doc_id", "text")
    def fp(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("toks", expr(TextOps.toksExpr))
      .select(md5(concat_ws(" ", array_sort(array_distinct($"toks")))))
      .head.getString(0)
    assert(fp(a) == fp(b)) // same distinct token set → same fingerprint
  }

  test("jaccard similarity of every ngram pair is within [0, 1]") {
    val rows = Dedup.ngramJaccard(spark, sf).select("jaccard").as[Double].collect()
    assert(rows.nonEmpty && rows.forall(j => j >= 0.0 && j <= 1.0))
  }

  test("sequence packing: exact cover, budget respected, deterministic") {
    val docs = Tables.documents(spark, sf)
    val budget = 2048L
    val packed = Packing.packSequences(docs, budget)
      .as[(String, Long, Long)].collect()
    // exact cover: every doc packed exactly once
    val allIds = docs.select($"doc_id").as[Long].collect().sorted
    assert(packed.map(_._2).sorted.sameElements(allIds))
    // every sequence within budget unless it's a single-doc overflow
    packed.groupBy(_._1).foreach { case (seqId, members) =>
      val filled = members.map(_._3).sum
      assert(filled <= budget || members.length == 1, s"$seqId over budget")
    }
    // deterministic: a second run reproduces the identical assignment
    val again = Packing.packSequences(docs, budget)
      .as[(String, Long, Long)].collect()
    assert(packed.sortBy(_._2).sameElements(again.sortBy(_._2)))
    // packing is tight: ~300-char docs into 2048 → high average fill
    val stats = Packing.packingStats(spark, sf, budget).head()
    assert(stats.getAs[Double]("avg_fill") > 0.5)
    assert(stats.getAs[Long]("n_docs") == allIds.length)
  }

  test("repetition metrics: spam scores 1.0, varied text scores low") {
    // pure-phrase spam: every 2-gram is "spam spam" → top = dup = 1.0
    assert(TextOps.repetitionOf("spam spam spam spam spam") == (1.0, 1.0))
    // all-distinct 2-grams: top fraction floors at 1/n, no duplicates
    assert(TextOps.repetitionOf("one two three four five") == (0.25, 0.0))
    // under 2 tokens: no 2-grams, defined as zero
    assert(TextOps.repetitionOf("solo") == (0.0, 0.0))
    assert(TextOps.repetitionOf("") == (0.0, 0.0))
    // "a b a b a": grams = (a b, b a, a b, b a) → top 2/4, dup 4/4
    assert(TextOps.repetitionOf("a b a b a") == (0.5, 1.0))
  }

  test("sub-3-token docs form no NaN near-dup pairs or edges") {
    // 0/0 jaccard is NaN, and NaN sorts above every real similarity —
    // without the empty-shingle guard the two one-word docs would top
    // ngramJaccard and cluster together in connectedComponents
    val dir = java.nio.file.Files.createTempDirectory("graft_nan").toString
    val long1 = "the quick brown fox jumps over the lazy dog again and again"
    val long2 = "the quick brown fox jumps over the lazy dog again and once"
    Seq(
      (1L, "hi", "en", "web", 2L),
      (2L, "yo", "en", "web", 2L),
      (3L, long1, "en", "web", long1.length.toLong),
      (4L, long2, "en", "web", long2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.ngramJaccard(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(pairs.forall(p => !p._3.isNaN))
    assert(pairs.forall(p => p._1 > 2L && p._2 > 2L)) // short docs pair with nothing
    val comps = Dedup.connectedComponents(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(comps.map(_._1).toSet == Set(3L, 4L)) // only the true near-dups cluster
  }

  test("decontamination flags exactly the docs quoting the benchmark") {
    val idx = Seq(
      (0L, Seq("a b c", "b c d", "c d e")), // benchmark doc
      (1L, Seq("b c d", "c d e", "x y z")), // quotes two benchmark trigrams
      (2L, Seq("b c d", "p q r")),          // quotes one
      (3L, Seq("p q r", "x y z"))           // clean
    ).toDF("doc_id", "shingles")
    val out = Dedup.decontaminateAgainst(idx, col("doc_id") === 0L)
      .as[(Long, Long)].collect().toSeq
    // scored by distinct shared trigrams, clean docs absent
    assert(out == Seq((1L, 2L), (2L, 1L)))
  }

  test("minhash LSH recalls a planted near-duplicate") {
    // plant: doc 9001 = doc with one word changed → near-identical shingles
    val base = Tables.documents(spark, sf).filter($"doc_id" === 0)
      .select($"text").head.getString(0)
    val mutated = base.split(" ").toSeq.updated(1, "MUTATED").mkString(" ")
    val planted = Seq((0L, base, "xx", "src", base.length.toLong),
                      (9001L, mutated, "xx", "src", mutated.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_mh").toString
    planted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.minhashPairs(spark, dir)
      .filter($"a_id" === 0 && $"b_id" === 9001).collect()
    assert(pairs.length == 1 && pairs.head.getDouble(2) > 0.8)
  }

  test("knn: cosine bounded, self excluded, ranks contiguous") {
    val rows = Similarity.knnBrute(spark, sf)
      .select("query_id", "rank", "neighbor_id", "sim")
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, _, n, s) => q != n && s >= -1.0001 && s <= 1.0001 })
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.length).toSeq)
    }
  }

  test("label-pruned knn returns only same-label neighbors") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"label")
    val got = Similarity.knnWithinLabel(spark, sf)
      .join(emb.withColumnRenamed("vec_id", "query_id")
               .withColumnRenamed("label", "qlabel"), "query_id")
      .join(emb.withColumnRenamed("vec_id", "neighbor_id")
               .withColumnRenamed("label", "nlabel"), "neighbor_id")
    assert(got.filter($"qlabel" =!= $"nlabel").count() == 0)
  }

  test("IVF knn: builds centroids, searches only the query's cell") {
    val got = Similarity.ivfKnn(spark, sf, k = 3)
      .select("query_id", "rank", "neighbor_id", "sim")
      .as[(Long, Int, Long, Double)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.length).toSeq)
      // within a cell, top-1 by IVF == top-1 by brute force restricted
      // to that cell (sanity: sims sorted descending)
      assert(g.sortBy(_._2).map(_._4).toSeq.reverse.sorted.reverse == g.sortBy(_._2).map(_._4).toSeq)
    }
    assert(got.forall { case (q, _, n, s) => q != n && s >= -1.0001 && s <= 1.0001 })
  }

  test("content-defined chunks reassemble and survive prefix edits") {
    // reassembly over the corpus: per-doc chunk lengths sum to n_chars
    val lens = Dedup.contentChunks(spark, sf)
      .groupBy($"doc_id").agg(sum($"chunk_len").as("n"))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"n_chars")
    val mismatch = lens.join(docs, "doc_id").filter($"n" =!= $"n_chars").count()
    assert(mismatch == 0)
    // shift-invariance: prefixing a doc leaves the tail chunks identical
    val text = Tables.documents(spark, sf).select($"text")
      .filter(length($"text") > 400).head().getString(0)
    def chunks(t: String): Seq[String] = {
      var from = 0
      Dedup.chunkEnds(t).map { e => val c = t.substring(from, e); from = e; c }
    }
    val orig = chunks(text).toSet
    val edited = chunks("EDITED PREFIX >>> " + text)
    val shared = edited.count(orig.contains)
    assert(shared >= edited.length - 3,
      s"only $shared/${edited.length} chunks survived the prefix edit")
  }

  test("trigram language-ID separates a planted multilingual corpus") {
    // distinct char distributions per lang (the fixture's lang labels
    // share one vocabulary, so separability must be planted)
    val rnd = new scala.util.Random(7)
    val vocab = Map(
      "aa" -> Seq("alpha", "apple", "arrow", "altar"),
      "bb" -> Seq("bubble", "bobbin", "byte", "brook"),
      "cc" -> Seq("cycle", "citric", "cactus", "click"))
    val rows = (0L until 120L).map { id =>
      val lang = Seq("aa", "bb", "cc")((id % 3).toInt)
      val words = Seq.fill(30)(vocab(lang)(rnd.nextInt(4)))
      (id, lang, words.mkString(" "))
    }
    val planted = rows.toDF("doc_id", "lang", "text")
    val cm = TextOps.langIdNgramOver(spark, planted).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = cm.map(_._3).sum
    val correct = cm.filter(r => r._1 == r._2).map(_._3).sum
    assert(total >= 50)
    val acc = correct.toDouble / total
    info(f"holdout accuracy $acc%.2f over $total docs")
    assert(acc > 0.9, f"accuracy $acc%.2f")
    // and the fixture matrix is produced (diagnostic; chance-level there)
    assert(TextOps.langIdNgram(spark, sf).count() > 0)
  }

  test("approx length quantiles track the exact percentiles") {
    val exact = TextOps.lengthQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = TextOps.lengthQuantilesApprox(spark, sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (p50e, p90e) = exact(r.getString(0))
      // interpolation-free sketch returns an observed value near the rank
      assert(math.abs(r.getDouble(1) - p50e) <= math.max(2.0, p50e * 0.05))
      assert(math.abs(r.getDouble(2) - p90e) <= math.max(2.0, p90e * 0.05))
    }
  }

  test("multimodal resize/frame-sample stubs: bounds and shapes hold") {
    val resized = Multimodal.resizeAll(spark, sf, maxDim = 100).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(m => m.width <= 100 && m.height <= 100 && m.width >= 1))
    val frames = Multimodal.sampleFrames(spark, sf, everyK = 1).collect()
    val totalFrames = Multimodal.decodeAll(spark, sf).collect().map(_.n_frames).sum
    assert(frames.length == totalFrames) // everyK=1 keeps every frame
    assert(frames.forall(_._2 >= 0))
  }

  test("multimodal decode stub: deterministic, channel_mean in byte range") {
    val metas = Multimodal.decodeAll(spark, sf).collect()
    assert(metas.length == Tables.documents(spark, sf).count())
    assert(metas.forall(m => m.channel_mean >= 0.0 && m.channel_mean <= 255.0))
    val m = Multimodal.decodeStub(7L, "abc".getBytes("UTF-8"))
    assert(m.n_bytes == 3 && m.width == 4 && m.height == 4 && m.n_frames == 1)
    assert(m.channel_mean == ('a' + 'b' + 'c').toDouble / 3)
  }

  test("source preference keeps the best-ranked copy of planted dups") {
    import spark.implicits._
    // "same text" lands in src7, src2, and src9 — the keeper must be
    // the src2 copy (lowest numeric rank), regardless of doc_id order
    val docs = Seq(
      (1L, "same text", "en", "src7", 9L),
      (2L, "same text", "en", "src2", 9L),
      (3L, "same text", "en", "src9", 9L),
      (4L, "unique a", "en", "src7", 8L),
      (5L, "unique b", "en", "src9", 8L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.sourcePreferenceOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("src2") == ((1L, 1L, 0L))) // the dup's keeper
    assert(out("src7") == ((2L, 1L, 1L))) // lost the dup, kept its unique
    assert(out("src9") == ((2L, 1L, 1L)))
    // conservation: docs seen = input rows; kept = distinct content
    assert(out.values.map(_._1).sum == 5L && out.values.map(_._2).sum == 3L)
  }

  test("incremental dedup classifies corpus dups, batch dups, and fresh docs") {
    import spark.implicits._
    // corpus: docs 1,3,5 — batch (even ids): 10 dups corpus text "aa";
    // 20+30 share new text "bb" (first-wins in batch); 40 is fresh
    val docs = Seq(
      (1L, "aa", "en", "src0", 2L), (3L, "cc", "en", "src0", 2L),
      (5L, "dd", "en", "src0", 2L),
      (10L, "aa", "en", "src1", 2L), (20L, "bb", "en", "src1", 2L),
      (30L, "bb", "en", "src1", 2L), (40L, "ee", "en", "src1", 2L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.incrementalDedupOf(docs, col("doc_id") % 10 === 0).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 2L, 1L, 1L))) // batch=4: admitted 20+40, corpus-dup 10, batch-dup 30
  }

  test("published shard lake carries contiguous ranks and a faithful manifest") {
    val docs = Tables.documents(spark, sf)
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_shard_spec").getAbsolutePath
    graft.llm.Packing.publishShards(docs, dir, shards = 4)
    val n = docs.count()
    val manifest = graft.llm.Packing.shardManifest(spark, dir).collect()
    assert(manifest.length == 4)
    // each shard's [ord_min, ord_max] range is gapless and the ranges
    // tile 1..n in shard order
    var next = 1L
    manifest.sortBy(_.getInt(0)).foreach { r =>
      val (cnt, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lo == next && hi - lo + 1 == cnt, s"shard ${r.getInt(0)}")
      next = hi + 1
    }
    assert(next == n + 1)
    // the lake rows themselves join back 1:1 to the corpus
    val lake = spark.read.parquet(dir)
    assert(lake.count() == n)
    assert(lake.join(docs, "doc_id").count() == n)
  }

  test("training order is a balanced, deterministic permutation") {
    val docs = Tables.documents(spark, sf)
    val a = graft.llm.Packing.trainingOrderOf(docs, shards = 8).collect()
    val n = docs.count()
    assert(a.length == n)
    // ord is exactly 1..n
    assert(a.map(_.getLong(1)).sorted.sameElements(1L to n))
    // rank-contiguous shards balanced to ±1 row
    val sizes = a.groupBy(_.getInt(2)).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0 until 8).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    // a re-run reproduces the identical assignment (fixed permutation)
    val b = graft.llm.Packing.trainingOrderOf(docs, shards = 8).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
           b.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq)
    // and it is not the identity layout: the md5 key actually shuffles
    assert(a.map(_.getLong(0)).take(50).toSeq != a.map(_.getLong(0)).take(50).sorted.toSeq)
  }

  test("snapshot diff of a corpus against itself is all-unchanged") {
    val docs = Tables.documents(spark, sf)
    val diff = Versioning.snapshotDiffOf(docs, docs)
    assert(diff.filter($"status" =!= "unchanged").count() == 0)
    assert(diff.agg(sum($"n_docs")).head.getLong(0) == docs.count())
  }

  test("token budget edge cases: zero budget admits nothing, huge admits all") {
    val zero = Curate.tokenBudgetSelect(spark, sf, 0L).count()
    assert(zero == 0)
    val all = Curate.tokenBudgetSelect(spark, sf, Long.MaxValue / 8)
      .agg(sum($"n_docs")).head.getLong(0)
    assert(all == Tables.documents(spark, sf).count())
  }

  test("snapshot diff classifies a planted add/remove/change/keep fixture") {
    val v1 = Seq(
      (1L, "en", "alpha"), (2L, "en", "beta"), (3L, "de", "gamma"),
      (4L, "de", "delta")).toDF("doc_id", "lang", "text")
    val v2 = Seq(
      (1L, "en", "alpha"),            // unchanged
      (2L, "en", "beta EDITED"),      // changed
      (4L, "de", "delta"),            // unchanged (3 removed)
      (5L, "fr", "epsilon")           // added
    ).toDF("doc_id", "lang", "text")
    val got = Versioning.snapshotDiffOf(v1, v2)
      .select($"lang", $"status", $"n_docs", $"id_checksum")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("de", "removed", 1L, 3L), ("de", "unchanged", 1L, 4L),
      ("en", "changed", 1L, 2L), ("en", "unchanged", 1L, 1L),
      ("fr", "added", 1L, 5L)))
  }

  test("filter funnel stages chain: each n_in is the previous n_out") {
    val rows = Curate.filterFunnel(spark, sf)
      .select($"stage_idx", $"n_in", $"n_out", $"n_dropped")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 4)
    assert(rows.head._2 == Tables.documents(spark, sf).count())
    rows.sliding(2).foreach { case Array(prev, next) =>
      assert(next._2 == prev._3, s"stage ${next._1} n_in != prior n_out")
    }
    rows.foreach { case (_, in, out, dropped) =>
      assert(out <= in && dropped == in - out)
    }
  }

  test("source quota caps every feed at N and keeps its highest-ratio docs") {
    val cap = 5
    val perSource = Sampling.sourceQuota(spark, sf, cap)
      .select($"source", $"n_docs", $"n_kept")
      .as[(String, Long, Long)].collect()
    assert(perSource.nonEmpty)
    perSource.foreach { case (s, n, kept) =>
      assert(kept == math.min(n, cap.toLong), s"source $s kept $kept of $n")
    }
    // the kept set IS the ratio-ranked head: recompute one source brute-force
    val docs = Tables.documents(spark, sf)
      .withColumn("ratio", TextOps.lexicalRatio)
      .filter($"source" === perSource.head._1)
      .select($"doc_id", $"ratio").as[(Long, Double)].collect()
      .sortBy { case (id, r) => (-r, id) }
    val expectedChecksum = docs.take(cap).map(_._1).sum
    val gotChecksum = Sampling.sourceQuota(spark, sf, cap)
      .filter($"source" === perSource.head._1)
      .select($"kept_id_checksum").as[Long].head()
    assert(gotChecksum == expectedChecksum)
  }

  test("semantic clusters: sizes >= 2, canonical min labels, label-pure") {
    val clusters = Similarity.semanticClusters(spark, sf)
      .select($"vec_id", $"comp_id", $"comp_size")
      .as[(Long, Long, Long)].collect()
    assert(clusters.nonEmpty)
    val byComp = clusters.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      // singletons are excluded and the label is the min member id
      assert(members.length >= 2 && members.length == members.head._3)
      assert(comp == members.map(_._1).min)
    }
    // edges are label-blocked, so no cluster may span two labels
    val labelOf = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label".cast("long")).as[(Long, Long)].collect().toMap
    byComp.values.foreach { members =>
      assert(members.map(m => labelOf(m._1)).distinct.length == 1)
    }
  }

  test("LSH clusters recover the label-blocked semantic clusters' co-membership") {
    def coPairs(m: Array[(Long, Long)]): Set[(Long, Long)] =
      m.groupBy(_._2).values.flatMap { g =>
        val ids = g.map(_._1).sorted
        for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
      }.toSet
    val exact = Similarity.semanticClusters(spark, sf)
      .select($"vec_id", $"comp_id").as[(Long, Long)].collect()
    val lshRows = Similarity.lshComponents(spark, sf)
      .select($"vec_id", $"comp_id").as[(Long, Long)].collect()
    // recall: co-clustered pairs the exact label-blocked path finds
    // that the label-free LSH path also co-clusters
    val want = coPairs(exact)
    val got = coPairs(lshRows)
    val recall = (want & got).size.toDouble / want.size
    info(f"LSH co-membership recall vs exact: $recall%.3f " +
      s"(${(want & got).size}/${want.size})")
    assert(recall >= 0.8, f"LSH cluster recall $recall%.3f < 0.8")
    // same cluster algebra as every componentsOf consumer
    val byComp = lshRows.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      assert(members.length >= 2 && members.map(_._1).min == comp)
    }
  }

  test("fluency buckets separate a planted garble/mixed/natural corpus") {
    // N = 63. Natural docs share a tiny common vocabulary (f ≈ 0.85+);
    // garble docs are all-unique tokens (f = 1/63 ≈ 0.016 < 2% → rare);
    // the mixed doc pairs five unique tokens with 'zebra' (df = 10),
    // f = 15/378 ≈ 0.040 ∈ [2%, 5%) → mixed.
    val natural = (1L to 60L).map { i =>
      val extra = if (i <= 9) " zebra" else ""
      (i, "en", "the cat sat on the mat" + extra)
    }
    val garble = Seq(
      (61L, "en", "qzx wvu jkl mnb poi asd"),
      (62L, "en", "zzq yyw xxe ccr vvt bbn"))
    val mixed = Seq((63L, "en", "zebra qqa wwb eec rrd uup"))
    val docs = (natural ++ garble ++ mixed).toDF("doc_id", "lang", "text")
    val got = TextOps.fluencyBucketsOver(docs)
      .select($"bucket", $"n_docs", $"id_checksum")
      .as[(String, Long, Long)].collect()
      .map { case (b, n, c) => b -> ((n, c)) }.toMap
    assert(got("common") == (60L, (1L to 60L).sum))
    assert(got("rare") == (2L, 123L))
    assert(got("mixed") == (1L, 63L))
    // buckets partition the tokenized corpus
    assert(got.values.map(_._1).sum == 63L)
  }

  test("unhinted vocabulary joins still broadcast via AQE at fixture scale") {
    // the forced broadcast() on the document-frequency table is gone
    // (vocabulary grows with the corpus — the hint was a 100×-scale
    // trap); this pins the flip side: at small scale AQE must still
    // pick a broadcast hash join from runtime stats, so dropping the
    // hint cost nothing locally. BroadcastHashJoin can only be the
    // tok-equi-join — the one-row nDocs hint plans as a nested-loop.
    for (q <- Seq(TextOps.tfidfTopTerms(spark, sf),
                  TextOps.fluencyBuckets(spark, sf))) {
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected AQE to broadcast the df join in:\n$plan")
    }
  }

  test("incremental near-dup rejects edited cross-boundary copies, admits fresh") {
    // corpus (even ids) holds originals; the batch (odd ids) delivers:
    // 101 = a lightly-edited copy of 2 (must be REJECTED as near-dup),
    // 103 = a fresh unrelated doc (must be ADMITTED),
    // 105 = an edited copy of another BATCH doc (cross-boundary only:
    //       in-batch near-dups are the clustering path's job — ADMITTED)
    // 109 = a SHORT doc (< 3 tokens → empty shingle set, no MinHash
    //       signature): can never be a near-dup, must still be COUNTED
    //       and admitted, not silently dropped from the report
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val fresh = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val batchCopy = "red orange yellow green blue indigo violet cyan magenta teal " +
      "maroon olive navy coral salmon khaki plum orchid sienna tan"
    val docs = Seq(
      (2L, "en", "src_1", base.length.toLong, base),
      (4L, "en", "src_1", fresh.length.toLong, "unrelated corpus filler words " + base.reverse),
      (101L, "en", "src_1", base.length.toLong, base + " edited"),
      (103L, "en", "src_1", fresh.length.toLong, fresh),
      (105L, "en", "src_1", batchCopy.length.toLong, batchCopy),
      (107L, "en", "src_1", batchCopy.length.toLong, batchCopy + " tweaked"),
      (109L, "en", "src_1", 6L, "ok bye")
    ).toDF("doc_id", "lang", "source", "n_chars", "text")
    val got = Dedup.incrementalNearDupOver(
        Dedup.shingleIndexOf(docs), col("doc_id") % 2 === 1)
      .select($"lang", $"n_batch", $"n_near_dup", $"n_admitted")
      .as[(String, Long, Long, Long)].head()
    assert(got == (("en", 5L, 1L, 4L)))
  }

  test("persisted dedup indices round-trip: build → write → load → probe ≡ in-memory") {
    // the production shape the incremental scaladocs promise: the
    // corpus index is a parquet artifact built once per snapshot, and a
    // delivery probes the LOADED artifact — results must be identical
    // to the single-frame in-memory split on the same corpus/batch.
    val docs = Tables.documents(spark, sf)
    val isNew = col("doc_id") % 10 === 0
    val corpus = docs.filter(!isNew)
    val batch = docs.filter(isNew)
    val tmp = java.nio.file.Files.createTempDirectory("graft_idx").toString

    Dedup.writeFpIndex(corpus, s"$tmp/fp")
    val exactGot = Dedup.incrementalDedupAgainstIndex(
        batch, Dedup.loadFpIndex(spark, s"$tmp/fp"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val exactWant = Dedup.incrementalDedupOf(docs, isNew)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(exactGot == exactWant)
    // the artifact is skinny: one distinct fp per corpus text, no text
    val fps = spark.read.parquet(s"$tmp/fp")
    assert(fps.columns.toSeq == Seq("fp"))
    assert(fps.count() == corpus.select(md5($"text")).distinct().count())

    Dedup.writeNearDupIndex(corpus, s"$tmp/sig")
    val nearGot = Dedup.incrementalNearDupAgainstIndex(
        batch, Dedup.loadNearDupIndex(spark, s"$tmp/sig"))
      .as[(String, Long, Long, Long)].collect().toSeq
    val nearWant = Dedup.incrementalNearDup(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(nearGot == nearWant)
    // fixed-width signature rows: 16 minhashes + hash set, one row per
    // SHINGLED corpus doc, never text
    val sig = spark.read.parquet(s"$tmp/sig")
    assert(sig.columns.toSeq ==
      (0 until 16).map(i => s"mh$i").+:("doc_id").:+("hset"))
  }

  test("semantic keep drops exactly the non-canonical LSH cluster members") {
    val total = Tables.embeddings(spark, sf).count()
    val comps = Similarity.lshComponents(spark, sf)
      .select($"vec_id", $"comp_id").as[(Long, Long)].collect()
    val expectDropped = comps.count { case (id, comp) => id != comp }
    val kept = Similarity.semanticKeep(spark, sf)
      .agg(sum($"n_kept")).head.getLong(0)
    assert(kept == total - expectDropped)
    // keepers themselves survive: one vector per cluster remains
    assert(comps.map(_._2).distinct.length == comps.length - expectDropped)
  }

  test("persisted IVF index round-trip: probe ≡ in-session build") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.writeIvfIndex(spark, sf, dir)
    val got = Similarity.ivfKnnAgainstIndex(spark, sf, dir)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val want = Similarity.ivfKnn(spark, sf)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == want)
    // the cell assignment is a physical partition key — nprobe search
    // is partition pruning, not a filter over a monolithic file
    assert(new java.io.File(s"$dir/cells").listFiles()
      .exists(_.getName.startsWith("cell=")))
  }

  test("q136–q138 driver probe entries equal their session-index twins") {
    // the declared queries compose write → load → probe through a
    // per-(sf, artifact) scratch dir; each must reproduce the
    // session-path twin bit-for-bit (semantics already pinned above —
    // this pins the driver-entry wiring itself)
    assert(Dedup.fpIndexProbe(spark, sf).collect().toSeq ==
           Dedup.incrementalDedup(spark, sf).collect().toSeq)
    assert(Dedup.nearDupIndexProbe(spark, sf).collect().toSeq ==
           Dedup.incrementalNearDup(spark, sf).collect().toSeq)
    assert(Similarity.ivfIndexProbe(spark, sf).collect().toSeq ==
           Similarity.ivfKnn(spark, sf).collect().toSeq)
  }

  test("near-dup keep drops exactly the non-canonical cluster members") {
    val total = Tables.documents(spark, sf).count()
    val comps = Dedup.minhashComponents(spark, sf)
      .select($"doc_id", $"comp_id").as[(Long, Long)].collect()
    val expectDropped = comps.count { case (id, comp) => id != comp }
    val kept = Dedup.nearDupKeep(spark, sf).agg(sum($"n_kept")).head.getLong(0)
    assert(kept == total - expectDropped)
    // keepers themselves survive: one doc per cluster remains
    assert(comps.map(_._2).distinct.length ==
      comps.length - expectDropped)
  }

  test("dup-cap keep retains the cap smallest ids per cluster, singletons intact") {
    val cap = 2
    val total = Tables.documents(spark, sf).count()
    val comps = Dedup.connectedComponents(spark, sf)
      .select($"doc_id", $"comp_id").as[(Long, Long)].collect()
    val byComp = comps.groupBy(_._2)
    val kept = Dedup.dupCapKeep(spark, sf, cap)
      .select($"doc_id", $"comp_id").as[(Long, Long)].collect()
    val keptByComp = kept.groupBy(_._2)
    // clustered: exactly min(cap, size) survivors, the smallest doc_ids
    byComp.foreach { case (comp, members) =>
      val want = members.map(_._1).sorted.take(cap).toSeq
      assert(keptByComp(comp).map(_._1).sorted.toSeq == want)
    }
    // singletons never drop and synthesize comp_id = doc_id
    val clustered = comps.map(_._1).toSet
    val singles = kept.filter { case (id, _) => !clustered.contains(id) }
    assert(singles.forall { case (id, comp) => comp == id })
    assert(kept.length.toLong ==
      byComp.valuesIterator.map(m => math.min(cap, m.length).toLong).sum +
      (total - clustered.size))
  }

  test("dup-cap keep with a cap above every cluster size keeps everything") {
    val total = Tables.documents(spark, sf).count()
    assert(Dedup.dupCapKeep(spark, sf, cap = 1000).count() == total)
  }

  test("temperature mix over a single source is the identity") {
    val dir = java.nio.file.Files.createTempDirectory("graft_onesrc").toString
    Tables.documents(spark, sf).withColumn("source", lit("only"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = Sampling.temperatureMix(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(row.length == 1)
    val (_, before, after, rate) = row.head
    assert(rate == 1.0 && after == before) // nothing to flatten, keep all
  }

  test("lsh pair index is built once per (session, corpus)") {
    val a = Similarity.lshPairIndex(spark, sf)
    val b = Similarity.lshPairIndex(spark, sf)
    assert(a eq b) // second consumer reuses the persisted frame
  }

  test("ann recall rises with nprobe and is exact at the full probe") {
    val rows = Similarity.annRecall(spark, sf)
      .select($"nprobe", $"n_returned", $"n_hits", $"recall")
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 4, 16))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._4) // more cells, never worse
      case _           =>
    }
    // nprobe = nlist searches every cell ⇒ identical to brute force
    val full = rows.last
    assert(full._4 == 1.0 && full._2 == full._3)
  }

  test("centroid outliers conserve the corpus and the label algebra") {
    val emb = Tables.embeddings(spark, sf)
    val total = emb.count()
    val nLabels = emb.select($"label").distinct.count()
    val rows = Similarity.centroidOutliers(spark, sf)
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(rows.length == nLabels && rows.map(_._2).sum == total)
    assert(rows.forall(r => r._3 <= r._2 && r._5 >= -1.0 && r._5 <= 1.0))
    // checksum is exactly the outlier ids: zero iff no outliers
    assert(rows.filter(_._3 == 0).forall(_._4 == 0L))
  }

  test("temperature mix keeps every smallest source whole at the sqrt rate") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"source")
      .as[(Long, String)].collect()
    val bySrc = docs.groupBy(_._2)
    val minN = bySrc.valuesIterator.map(_.length).min
    def hex4(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
    val want = bySrc.map { case (s, ds) =>
      val rate = math.sqrt(minN.toDouble / ds.length.toDouble)
      val thr = "%04x".format(math.min(math.floor(rate * 65536).toLong, 65535L))
      val kept = if (rate >= 1.0) ds.length.toLong
                 else ds.count { case (id, _) => hex4(id) < thr }.toLong
      s -> ((ds.length.toLong, kept, rate))
    }
    val got = Sampling.temperatureMix(spark, sf)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == want)
    bySrc.filter(_._2.length == minN).keys.foreach { s =>
      assert(got(s)._1 == got(s)._2) // rate-1.0 sources never downsample
    }
  }

  test("dup-shingle fraction buckets boilerplate, fresh, and short docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dupfrac").toString
    val boiler = "terms of service apply to all users of this site"
    val fresh = "completely original musings about rare topics written here"
    Seq(
      (1L, boiler, "en", "web", boiler.length.toLong),
      (2L, boiler, "en", "web", boiler.length.toLong), // copy: every shingle shared
      (3L, fresh, "en", "web", fresh.length.toLong),   // nothing shared
      (4L, "too short", "en", "web", 9L))              // <3 tokens: no shingles
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.dupShingleFraction(spark, dir)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(
      ("en", "high") -> ((2L, 3L)),
      ("en", "low") -> ((1L, 3L)),
      ("en", "none") -> ((1L, 4L))))
  }

  test("cross-source dup matrix counts edges by unordered source pair") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xsrc").toString
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "the quick brown fox jumps over the lazy dog again and once"
    val u = "unrelated prose about entirely different things with many words inside"
    Seq(
      (1L, t1, "en", "srcB", t1.length.toLong),
      (2L, t2, "en", "srcA", t2.length.toLong),
      (3L, u, "en", "srcA", u.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.crossSourceDups(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("srcA", "srcB", 1L, 3L)))
  }

  test("curate-train funnel is monotone and conserves the corpus") {
    val rows = Curate.curateTrain(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, raw, dedup, train, fin, _) =>
      assert(raw >= dedup && dedup >= train && train >= fin && fin >= 0)
    }
    assert(rows.map(_._2).sum == Tables.documents(spark, sf).count())
    assert(rows.map(_._5).sum > 0) // the pipeline ships a corpus
  }

  test("normalization recovers the clean fingerprint surface per language") {
    val clean = Tables.documents(spark, sf).select($"lang", md5($"text"))
      .as[(String, String)].collect().groupBy(_._1)
      .map { case (l, v) => l -> v.map(_._2).distinct.length.toLong }
    val got = TextOps.normalizeStats(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (lang, n, nPerturbed, _, nNorm) =>
      assert(nNorm == clean(lang)) // case/space variants re-collapse exactly
      assert(nPerturbed > 0 && nPerturbed < n) // the perturbation really hit
    }
  }

  test("leak-safe split assigns whole clusters, matching driver brute force") {
    def h2(v: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(v.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(2)
    def side(comp: Long) = if (h2(comp) < "cd") "train" else "test"
    val compOf = Dedup.connectedComponents(spark, sf)
      .select($"doc_id", $"comp_id").as[(Long, Long)].collect().toMap
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang")
      .as[(Long, String)].collect()
    // doc side == its CLUSTER's side (singletons: own id) — the whole
    // cluster inherits one coin flip, so near-dups can never straddle
    val want = docs
      .groupBy { case (id, lang) => (lang, side(compOf.getOrElse(id, id))) }
      .map { case (k, v) => k -> ((v.length.toLong, v.map(_._1).sum)) }
    val got = Dedup.leakSafeSplit(spark, sf)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == want)
    assert(got.keys.map(_._2).toSet == Set("train", "test"))
  }

  test("forgetting docs propagates through the persisted dedup artifacts") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_forget").toString
    val docs = Tables.documents(spark, sf)
    val isForgotten = $"doc_id" % 23 === 0
    val forgotten = docs.filter(isForgotten)
    val kept = docs.filter(!isForgotten)
    Versioning.writeFpCountIndex(docs, s"$tmp/fp_g1")
    Dedup.writeNearDupIndex(docs, s"$tmp/sig_g1")
    Versioning.forgetFromFpCountIndex(spark, s"$tmp/fp_g1", s"$tmp/fp_g2", forgotten)
    Versioning.forgetFromNearDupIndex(spark, s"$tmp/sig_g1", s"$tmp/sig_g2",
      forgotten.select($"doc_id"))
    // the O(|forget|) decrement ≡ a full rebuild over the survivors
    Versioning.writeFpCountIndex(kept, s"$tmp/fp_rebuilt")
    def fpRows(d: String) = spark.read.parquet(d)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(fpRows(s"$tmp/fp_g2") == fpRows(s"$tmp/fp_rebuilt"))
    // sig index: forgotten ids gone, survivors untouched
    def sigIds(d: String) = spark.read.parquet(d)
      .select($"doc_id").as[Long].collect().toSet
    val forgottenIds = forgotten.select($"doc_id").as[Long].collect().toSet
    assert(sigIds(s"$tmp/sig_g2") == sigIds(s"$tmp/sig_g1") -- forgottenIds)
    // re-delivery of the forgotten batch: content that left the corpus
    // re-admits; content a survivor still carries stays blocked
    val probe = Dedup.incrementalDedupAgainstIndex(
      forgotten, spark.read.parquet(s"$tmp/fp_g2"))
    val admitted = probe.agg(sum($"n_admitted")).head.getLong(0)
    val blocked = probe.agg(sum($"n_dup_corpus")).head.getLong(0)
    val keptFps = kept.select(md5($"text")).as[String].collect().toSet
    val fBatch = forgotten.select($"doc_id", md5($"text"))
      .as[(Long, String)].collect()
    val expBlocked = fBatch.count { case (_, fp) => keptFps.contains(fp) }
    val expAdmitted = fBatch.filterNot { case (_, fp) => keptFps.contains(fp) }
      .map(_._2).distinct.length
    assert(blocked == expBlocked.toLong && admitted == expAdmitted.toLong)
  }

  test("token budget admits the greedy quality prefix and never overruns") {
    val budget = 5000L
    val docs = Tables.documents(spark, sf)
      .withColumn("n_toks", size(expr(TextOps.toksExpr)).cast("long"))
      .withColumn("ratio", TextOps.lexicalRatio)
      .select($"doc_id", $"n_toks", $"ratio").as[(Long, Long, Double)]
      .collect().sortBy { case (id, _, r) => (-r, id) }
    // brute-force greedy admit on the driver
    var cum = 0L
    val admitted = docs.takeWhile { case (_, n, _) => { cum += n; cum <= budget } }
    val got = Curate.tokenBudgetSelect(spark, sf, budget)
      .agg(sum($"n_docs"), sum($"total_tokens"), sum($"id_checksum"))
      .as[(Long, Long, Long)].head()
    assert(got._1 == admitted.length.toLong)
    assert(got._2 == admitted.map(_._2).sum && got._2 <= budget)
    assert(got._3 == admitted.map(_._1).sum)
  }
}
