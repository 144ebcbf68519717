package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Fns._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table (north-star extensions, SURVEY §7.5): token
  * counting, quality scoring, document fingerprinting, language-ID
  * heuristics.
  *
  * All tokenization is `filter(split(text, ' '), x -> x != '')` — the
  * empty-token filter makes Spark's split and DuckDB's string_split
  * agree on trailing separators (verified bit-identical fingerprints).
  * Everything here is a narrow projection followed by one hash
  * aggregate, so it scales linearly: no shuffle carries raw text except
  * the (bounded top-k) fingerprint outputs.
  */
object TextOps {

  /** Tokens column: non-empty whitespace tokens. */
  val toksExpr = "filter(split(text, ' '), x -> x != '')"

  /** Lexical-diversity ratio (distinct tokens / total tokens, 0 for
    * empty docs) — THE quality weight, shared by the curation gate
    * (q57/q72), the weighted sampler (q75) and the quality buckets so
    * a tweak here cannot desynchronize them. */
  def lexicalRatioOf(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)).cast("double") /
                 size(toks).cast("double"))

  def lexicalRatio: org.apache.spark.sql.Column = lexicalRatioOf(expr(toksExpr))

  /** Per-language corpus stats: doc counts, token counts (BPE-ish
    * proxy = whitespace tokens), char totals. */
  def textStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", expr(toksExpr))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(size(col("toks"))).cast("long").as("total_tokens"),
           sum(col("n_chars")).cast("long").as("total_chars"),
           davg(col("n_chars")).as("avg_chars"))
      .orderBy("lang")

  /** Quality scoring: lexical-diversity ratio (distinct/total tokens)
    * bucketed into quality bands — the stopword/repetition heuristic a
    * pretraining filter would run per document. The per-doc ratio is a
    * typed map (same rationale as Dedup.shingled: interpreted HOFs
    * get pushed onto the scan partition); the bucket/rollup stays
    * declarative. */
  def qualityBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ratios = Tables.documents(spark, sfDir)
      .select(col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[String]
      .mapPartitions(_.map { t =>
        val w = t.split(' ').filter(_.nonEmpty)
        if (w.isEmpty) 0.0 else w.distinct.length.toDouble / w.length.toDouble
      })
      .toDF("ratio")
    ratios
      .withColumn("quality",
        when(col("ratio") < 0.3, "low")
          .when(col("ratio") < 0.5, "mid")
          .otherwise("high"))
      .groupBy(col("quality"))
      .agg(count(lit(1)).as("n_docs"), dsum(col("ratio")).as("ratio_sum"))
      .orderBy("quality")
  }

  /** BPE-ish regex tokenization (the subword-tokenizer proxy a
    * pretraining pipeline uses for budget counting): letter runs, digit
    * runs, and punctuation runs are separate tokens — the
    * dialect-neutral core of the GPT-2 pattern (no lookahead, so Java
    * and RE2 agree). Compared against whitespace tokens per language. */
  def bpeTokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("bpe",
        expr("""regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+)', 1)"""))
      .withColumn("ws", expr(toksExpr))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(size(col("bpe"))).cast("long").as("bpe_tokens"),
           sum(size(col("ws"))).cast("long").as("ws_tokens"),
           davg(size(col("bpe")).cast("double")).as("avg_bpe"))
      .orderBy("lang")

  /** Quality signals: per-document punctuation ratio (non-alnum chars /
    * chars) and stopword ratio (stopword tokens / tokens), averaged per
    * language — the composite cheap-filter score of a pretraining
    * pipeline. Typed mapPartitions after an explicit repartition, like
    * [[qualityBuckets]]: interpreted HOFs would otherwise be pushed onto
    * the (single-row-group) scan partition. */
  def qualitySignals(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val stop = QualityStopwords
    val perDoc = Tables.documents(spark, sfDir)
      .select(col("lang"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(String, String)]
      .mapPartitions(_.map { case (lang, t) =>
        val isAln = (c: Char) =>
          (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' '
        val punct = if (t.isEmpty) 0.0 else t.count(c => !isAln(c)).toDouble / t.length.toDouble
        val w = t.split(' ').filter(_.nonEmpty)
        val sw = if (w.isEmpty) 0.0 else w.count(stop).toDouble / w.length.toDouble
        (lang, punct, sw)
      })
      .toDF("lang", "punct_ratio", "stop_ratio")
    perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           davg(col("punct_ratio")).as("avg_punct"),
           davg(col("stop_ratio")).as("avg_stop"))
      .orderBy("lang")
  }

  /** Stopword list shared with the oracle SQL (keep in sync). */
  val QualityStopwords: Set[String] = Set("the", "a", "of", "and", "to", "in", "is")

  /** Document fingerprint: md5 over the sorted distinct token set — an
    * order-insensitive content hash (the rolling-hash role; md5 because
    * both engines implement it identically). */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", expr(toksExpr))
      .select(col("doc_id"),
              size(col("toks")).as("n_tokens"),
              md5(concat_ws(" ", array_sort(array_distinct(col("toks"))))).as("fp"))
      .orderBy("doc_id")

  /** Document-length distribution per language — exact interpolated
    * percentiles (Spark `percentile` is arithmetic-identical to DuckDB
    * `quantile_cont`, verified bit-exact on the fixture). The exact
    * variant is the correctness baseline; at 100 TB swap in
    * `approx_percentile` (t-digest, mergeable partial states). */
  def lengthQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(expr("percentile(n_chars, 0.5D)").as("p50"),
           expr("percentile(n_chars, 0.9D)").as("p90"),
           expr("percentile(n_chars, 0.99D)").as("p99"),
           count(lit(1)).as("n_docs"))
      .orderBy("lang")

  /** The 100 TB form of [[lengthQuantiles]]: `approx_percentile`
    * (t-digest-style mergeable partial states — constant memory per
    * group, one shuffle of sketches, never a per-group sort of values).
    * Un-oracled: the sketch is not bit-comparable to DuckDB
    * (SURVEY §5.3); the exact twin q39 is the correctness baseline and
    * LlmSpec bounds the approximation against it. */
  def lengthQuantilesApprox(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(expr("approx_percentile(n_chars, array(0.5D, 0.9D, 0.99D), 10000)").as("q"),
           count(lit(1)).as("n_docs"))
      .select(col("lang"),
              col("q").getItem(0).cast("double").as("p50"),
              col("q").getItem(1).cast("double").as("p90"),
              col("q").getItem(2).cast("double").as("p99"),
              col("n_docs"))
      .orderBy("lang")

  /** Language-ID by character-trigram profiles — the real n-gram
    * approach (q26's marker words are its word-level collapse): build
    * top-200 trigram profiles per language from the even-doc_id half,
    * classify the odd-doc_id holdout by profile-hit argmax, and emit the
    * confusion matrix. Scale shape: profiles are a few KB (langs × 200)
    * and broadcast; trigram extraction is codegen'd position arithmetic
    * (explode over an index sequence, no typed round-trip); the per-doc
    * argmax is a window over doc_id — high cardinality, tiny state. Docs with zero profile hits drop from the matrix (inner
    * join) — at 100 TB those route to a fallback classifier. Un-oracled
    * (profile ranking has no SQL twin). NB the driver fixture's lang
    * labels share one synthetic vocabulary, so its matrix shows chance
    * by construction; LlmSpec proves the classifier on a planted
    * separable corpus instead. */
  def langIdNgram(spark: SparkSession, sfDir: String): DataFrame =
    langIdNgramOver(spark,
      Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"), col("text")))

  /** Core of [[langIdNgram]] over any (doc_id, lang, text) frame. */
  def langIdNgramOver(spark: SparkSession, docsIn: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = docsIn
    def trigrams(set: DataFrame): DataFrame = set
      // a 400-char prefix carries the distributional signal; capping
      // bounds the explode factor and de-skews long documents. The
      // sliding window is pure position arithmetic, so it stays in
      // codegen'd expressions (explode over an index sequence + one
      // substr per position) — the earlier typed mapPartitions form
      // paid tuple encode/decode on every exploded row, which at ~400
      // trigrams per doc was the whole cost of the classifier.
      // r19 (guide §2.3/§2.5): project to the 400-char prefix BEFORE
      // the parallelism repartition (the exchange used to carry the
      // full text), and hash-partition by doc_id instead of
      // round-robin — keyless repartition pays a local
      // sort-before-repartition pass (SPARK-23207) that a
      // deterministic key skips, and doc_id spreads evenly
      .select(col("doc_id"), col("lang"),
              lower(substring(col("text"), 1, 400)).as("s"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), col("lang"), col("s"),
              explode(when(length(col("s")) >= 3,
                           sequence(lit(1), length(col("s")) - 2))
                .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), col("lang"),
              col("s").substr(col("i"), lit(3)).as("tg"))
    val train = trigrams(docs.filter(col("doc_id") % 2 === 0))
    val test = trigrams(docs.filter(col("doc_id") % 2 === 1))
    val profiles = train.groupBy(col("lang").as("cand"), col("tg"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("cand")).orderBy(col("cnt").desc, col("tg"))))
      .filter(col("rnk") <= 200)
      .select(col("cand"), col("tg"))
    val scores = test.join(broadcast(profiles), Seq("tg"))
      .groupBy(col("doc_id"), col("lang"), col("cand"))
      .agg(count(lit(1)).as("hits"))
    // r19 (guide §2.4/§1.2): per-doc argmax as a HASH aggregate —
    // min(struct(-hits, cand)) picks exactly the row_number()-over-
    // (hits DESC, cand ASC) winner (cand is unique within a doc, so
    // the order is total), replacing the window's exchange+sort with
    // a partially-aggregated hash exchange
    scores.groupBy(col("doc_id"), col("lang"))
      .agg(min(struct((-col("hits")).as("nh"), col("cand"))).as("best"))
      .groupBy(col("lang"), col("best").getField("cand").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted")
  }

  /** Diagnostic rollup using the custom codegen'd Catalyst expression
    * [[graft.expr.FormatReadableSize]] (C7, `sql/monitoring.sql:24`
    * analog). Un-oracled: the formatter has no DuckDB twin. */
  def readableSizes(spark: SparkSession, sfDir: String): DataFrame = {
    val totals = Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(sum(col("n_chars")).cast("double").as("total_bytes"))
    totals
      .withColumn("readable", graft.expr.FormatReadableSize(col("total_bytes")))
      .orderBy("lang")
  }

  /** Per-document repetition metrics over overlapping word 2-grams —
    * the repetition-removal rules of quality filtering (a document
    * dominated by one repeated phrase, or mostly made of repeated
    * phrases, is boilerplate/spam): (top-gram fraction, duplicate-gram
    * fraction). Pure per-doc function so the metric itself is
    * unit-testable; (0, 0) for docs under 2 tokens. */
  def repetitionOf(t: String): (Double, Double) = {
    val w = t.split(' ').filter(_.nonEmpty)
    if (w.length < 2) (0.0, 0.0)
    else {
      val counts = scala.collection.mutable.HashMap.empty[String, Int]
      var i = 0
      while (i < w.length - 1) {
        val g = w(i) + " " + w(i + 1)
        counts.update(g, counts.getOrElse(g, 0) + 1)
        i += 1
      }
      val n = (w.length - 1).toDouble
      val mx = counts.valuesIterator.max.toDouble
      val dup = counts.valuesIterator.filter(_ > 1).sum.toDouble
      (mx / n, dup / n)
    }
  }

  /** Repetition signals rolled up per language: average top-2-gram
    * fraction and duplicate-2-gram fraction (Gopher-style repetition
    * rules). Typed mapPartitions after an explicit repartition like
    * [[qualitySignals]]; the rollup stays declarative, averages
    * decimal-routed for oracle parity. */
  def repetitionSignals(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perDoc = Tables.documents(spark, sfDir)
      .select(col("lang"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(String, String)]
      .mapPartitions(_.map { case (lang, t) =>
        val (top2, dup2) = repetitionOf(t)
        (lang, top2, dup2)
      })
      .toDF("lang", "top2", "dup2")
    perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           davg(col("top2")).as("avg_top2_frac"),
           davg(col("dup2")).as("avg_dup2_frac"))
      .orderBy("lang")
  }

  /** Language-ID heuristic: marker-token scoring (the n-gram-profile
    * approach collapsed to its word-level core), cross-tabbed against
    * the labeled lang for accuracy inspection. */
  def langMarkers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", expr(toksExpr))
      .withColumn("score_det", size(expr("filter(toks, t -> t = 'the' OR t = 'a')")))
      .withColumn("score_dom", size(expr("filter(toks, t -> t = 'data' OR t = 'query' OR t = 'table')")))
      .withColumn("predicted",
        when(col("score_det") > col("score_dom"), "natural")
          .when(col("score_det") < col("score_dom"), "technical")
          .otherwise("mixed"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("score_det")).cast("long").as("det_total"),
           sum(col("score_dom")).cast("long").as("dom_total"))
      .orderBy("lang", "predicted")

  /** PII redaction rules, applied in order (emails before phones before
    * bare digit runs, so a phone inside an email-like token is consumed
    * once). Patterns avoid backreferences/lookaround so Java regex and
    * DuckDB's RE2 agree exactly. */
  val piiRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+" -> "<EMAIL>",
    "[0-9][0-9][0-9][-.][0-9][0-9][0-9][-.][0-9][0-9][0-9][0-9]" -> "<PHONE>",
    "[0-9][0-9][0-9]+" -> "<NUM>")

  /** PII scrub: redact email-, phone-, and long-digit-run-shaped spans,
    * reporting per-language how much was removed. One narrow map (three
    * chained regexp_replace, all codegen'd) + one hash aggregate — the
    * scan-shaped pass a 100 TB scrub needs; raw text never shuffles.
    * The digit-run rule guarantees matches on this corpus, so the oracle
    * exercises real replacement, not a no-op. */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val scrubbed = piiRules.foldLeft(col("text")) { case (c, (re, repl)) =>
      regexp_replace(c, re, repl)
    }
    // per-pattern hits counted on the ORIGINAL text (the oracle does the
    // same), so a span consumed by an earlier rule still counts here
    val matches = piiRules.map { case (re, _) =>
      size(regexp_extract_all(col("text"), lit(re), lit(0)))
    }.reduce(_ + _)
    Tables.documents(spark, sfDir)
      .withColumn("clean", scrubbed)
      .withColumn("n_hits", matches)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           count(when(col("clean") =!= col("text"), lit(1))).as("docs_changed"),
           sum(col("n_hits")).cast("long").as("pattern_hits"),
           sum(length(col("text"))).cast("long").as("chars_in"),
           sum(length(col("clean"))).cast("long").as("chars_out"))
      .orderBy("lang")
  }

  /** Top-3 characteristic terms per document by a rarity-weighted score
    * — TF-IDF with the idf log dropped (`tf * N / df` is order-identical
    * to `tf * log(N/df)` per term and keeps the oracle exact: IEEE
    * division matches across engines, libm log need not).
    *
    * Shape at scale: tokenize (narrow) → (doc, term) counts (one
    * shuffle) → term document-frequency (second, much smaller shuffle)
    * → join df back → per-doc top-k. The df side is deliberately
    * UNHINTED: real vocabularies grow with the corpus (heavy-tailed web
    * text — URLs, typos, OCR garble mint new tokens forever), so a
    * forced broadcast() would hit the 8 GB ceiling exactly when the
    * operator matters; AQE broadcasts it from runtime stats while it
    * fits and falls back to a shuffled hash join on `tok` when it
    * doesn't — the same reasoning as [[Dedup.nearDupKeep]]'s anti-join.
    * Only the one-row corpus count keeps its hint. */
  def tfidfTopTerms(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // lazy one-row corpus count, cross-joined broadcast — an eager
    // .count() here would run a full scan at plan-construction time
    val nDocs = docs.agg(count(lit(1)).as("n_corpus"))
    val tf = docs
      .select(col("doc_id"), explode(expr(toksExpr)).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    tf.join(df, "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("tf") * col("n_corpus")).cast("double") / col("df").cast("double"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("tok"), col("score"))
      .orderBy("doc_id", "rnk")
  }

  /** The canonical normal form: lowercase, collapse whitespace runs,
    * trim. Idempotent and case/spacing-invariant (PropertySpec). */
  def normalizeText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Canonical TEXT NORMALIZATION — [[normalizeText]] as the
    * preprocessing pass in front of every fingerprint/shingle stage,
    * where case and spacing variants of one document must hash
    * identically or every downstream dedup undercounts. The driver
    * fixture is already canonical, so the entry PERTURBS it
    * deterministically (uppercase every 3rd doc, whitespace-mangle
    * every 5th) and proves normalization recovers the original
    * fingerprint surface exactly: distinct normalized fps per language
    * equal the clean corpus's. Pure codegen'd string expressions — no
    * UDF, narrow until the per-language rollup. */
  def normalizeStats(spark: SparkSession, sfDir: String): DataFrame = {
    val messy = when(col("doc_id") % 3 === 0, upper(col("text")))
      .when(col("doc_id") % 5 === 0,
            concat(lit("  "), regexp_replace(col("text"), " ", "  "), lit(" ")))
      .otherwise(col("text"))
    val norm = normalizeText(col("messy"))
    Tables.documents(spark, sfDir)
      .withColumn("messy", messy)
      .withColumn("norm", norm)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           count(when(col("messy") =!= col("norm"), 1)).as("n_perturbed"),
           countDistinct(md5(col("messy"))).as("n_distinct_raw"),
           countDistinct(md5(col("norm"))).as("n_distinct_norm"))
      .orderBy("lang")
  }

  /** Common-token FLUENCY histogram — the corpus-statistics quality
    * filter (C4/Gopher family): a document made of tokens that are rare
    * corpus-wide is noise/garble/OCR junk; one made of very common
    * tokens is boilerplate. Each doc's mean token document-frequency
    * fraction f = Σdf(tok) / (n_tok · N) buckets it rare / mixed /
    * common, rolled up per language.
    *
    * Every comparison is INTEGER arithmetic (f < 1/50 ⇔ 50·Σdf <
    * n_tok·N) — no floating-point division anywhere, so the oracle
    * hash-matches by construction rather than by IEEE luck. Shape at
    * scale: same as [[tfidfTopTerms]] — tokenize, two shuffles
    * (occurrence counts, df), an UNHINTED df join back (the garble this
    * filter exists to catch is precisely what grows the vocabulary, so
    * a forced broadcast would fail on the corpora that need the filter
    * most; AQE picks broadcast while the df table fits), then a doc-id
    * aggregate; docs under one token carry no signal and are excluded
    * (reported by the funnel/min-token gates instead).
    *
    * On the driver fixture every doc shares one synthetic vocabulary
    * (per-doc f ≈ 0.78 across the corpus), so the real-world 2%/5%
    * cuts land everything in `common` — like the lang-ID matrix, the
    * fixture rollup is a diagnostic; the planted-corpus spec proves
    * the buckets separate garble / mixed / natural text. */
  def fluencyBuckets(spark: SparkSession, sfDir: String): DataFrame =
    fluencyBucketsOver(Tables.documents(spark, sfDir))

  /** Core of [[fluencyBuckets]] over any (doc_id, lang, text) frame. */
  def fluencyBucketsOver(docs: DataFrame): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n_corpus"))
    val occ = docs.select(col("doc_id"), col("lang"),
                          explode(expr(toksExpr)).as("tok"))
    val df = occ.select(col("doc_id"), col("tok")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val perDoc = occ.join(df, "tok")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("df")).as("sum_df"), count(lit(1)).as("n_tok"))
      .crossJoin(broadcast(nDocs))
    val denom = col("n_tok") * col("n_corpus")
    perDoc
      .withColumn("bucket",
        when(col("sum_df") * 50 < denom, "rare")
          .when(col("sum_df") * 20 < denom, "mixed")
          .otherwise("common"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("doc_id")).cast("long").as("id_checksum"))
      .orderBy("lang", "bucket")
  }
}
