package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Fns._

/** The end-to-end curation pipeline a pretraining corpus goes through,
  * composed from the engine's own stages (north-star capstone): quality
  * gate → exact dedup (keep lowest doc_id) → per-language corpus
  * accounting. Every stage is declarative, so Catalyst fuses the gates
  * into the scan and the only shuffles are the dedup window and the
  * final rollup — the whole pipeline is two exchanges regardless of
  * corpus size. The near-dup stage (MinHash) runs separately
  * ([[Dedup.minhashPairs]]) because its candidates need human/threshold
  * review before dropping; this query is the deterministic core. */
object Curate {

  def curatedStats(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    Tables.documents(spark, sfDir)
      .withColumn("toks", expr(TextOps.toksExpr))
      .withColumn("ratio", TextOps.lexicalRatioOf(col("toks")))
      // quality gate: lexical diversity + minimum substance
      .filter(col("ratio") >= 0.3 && col("n_chars") >= 100)
      // exact dedup: keep the lowest doc_id per content hash
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(size(col("toks"))).cast("long").as("total_tokens"),
           sum(col("n_chars")).cast("long").as("total_chars"),
           davg(col("ratio")).as("avg_ratio"))
      .orderBy("lang")
  }

  /** The stateless prefix of the pipeline — quality gate + PII scrub as
    * one narrow projection. Streaming-safe: no window, no state, so the
    * identical stage runs under readStream for continuous-ingest
    * curation (spec asserts batch/stream parity). */
  def gateAndScrub(docs: DataFrame): DataFrame = {
    val clean = TextOps.piiRules.foldLeft(col("text")) { case (c, (re, repl)) =>
      regexp_replace(c, re, repl)
    }
    docs
      .withColumn("toks", expr(TextOps.toksExpr))
      .withColumn("ratio", TextOps.lexicalRatioOf(col("toks")))
      .filter(col("ratio") >= 0.3 && col("n_chars") >= 100)
      .withColumn("clean", clean)
  }

  /** The curated corpus as rows: gate → scrub → dedup-on-clean →
    * split. The materialization point both the stats query and the
    * publish path share. */
  def curatedDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("clean"))).orderBy(col("doc_id"))
    gateAndScrub(Tables.documents(spark, sfDir))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("split",
        when(Sampling.hashBucket(col("doc_id")) < lit("cd"), "train")
          .otherwise("test"))
  }

  /** Publish the curated corpus as a training-ready lake: partitioned
    * by split (so a trainer's `split = 'train'` scan prunes at the
    * directory level) and clustered within partitions by (lang,
    * n_chars) — length-bucketed batching and per-language slicing then
    * prune on row-group stats. This is the write shape for the 100 TB
    * output: one pass, partition count pinned before the sort. */
  def publish(spark: SparkSession, sfDir: String, outDir: String): Unit =
    curatedDocs(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("split"), col("n_chars"),
              col("ratio"), col("clean"))
      // range-partition on the FULL clustering key: hashing only the
      // 2-valued split would funnel the corpus into two tasks; ranging
      // on (split, lang, length) keeps every write task busy AND makes
      // files contiguous in the clustering order
      .repartitionByRange(col("split"), col("lang"), col("n_chars"), col("doc_id"))
      .sortWithinPartitions(col("lang"), col("n_chars"), col("doc_id"))
      .write.mode("overwrite").partitionBy("split").parquet(outDir)

  /** Quality-filter FUNNEL — the drop-accounting report every curation
    * run publishes alongside its output: how many documents survive
    * each rule of the cascade, in order. Rules here are the pipeline's
    * own gates (substance → diversity → dedup); the funnel shape
    * (cumulative conjunction, one row per stage) is the operator.
    *
    * One scan: every stage flag is a narrow projection, the cumulative
    * counts are conditional aggregates over the SAME pass, and only the
    * dedup stage adds its fingerprint window exchange. A 100 TB funnel
    * costs the same as the pipeline it audits. */
  def filterFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val flagged = Tables.documents(spark, sfDir)
      .withColumn("toks", expr(TextOps.toksExpr))
      .withColumn("s1", col("n_chars") >= 100)
      .withColumn("s2", size(col("toks")) >= 20)
      .withColumn("s3", TextOps.lexicalRatioOf(col("toks")) >= 0.3)
      // dedup keeps the lowest doc_id per fingerprint — over the FULL
      // corpus (rule order puts dedup last, but the keeper choice must
      // not depend on which copies the earlier gates dropped, or adding
      // a gate would silently change which duplicate ships)
      .withColumn("s4", row_number().over(w) === 1)
    val agg = flagged.agg(
      count(lit(1)).as("c0"),
      count(when(col("s1"), 1)).as("c1"),
      count(when(col("s1") && col("s2"), 1)).as("c2"),
      count(when(col("s1") && col("s2") && col("s3"), 1)).as("c3"),
      count(when(col("s1") && col("s2") && col("s3") && col("s4"), 1)).as("c4"))
    agg.selectExpr(
      """stack(4,
           1, 'min_chars_100',    c0, c1,
           2, 'min_tokens_20',    c1, c2,
           3, 'lexical_0.3',      c2, c3,
           4, 'dedup_exact',      c3, c4)
         AS (stage_idx, stage, n_in, n_out)""")
      .withColumn("n_dropped", col("n_in") - col("n_out"))
      .orderBy("stage_idx")
  }

  /** TOKEN-BUDGET selection — "ship the best B tokens": rank the corpus
    * by quality (lexical ratio desc, doc_id tiebreak) and admit
    * documents while the running token total stays within the budget.
    * This is the final corpus-sizing step of data mixing: a target
    * token count, filled greedily from the top of the quality order.
    *
    * The running total is [[graft.ops.GlobalRank.withRunningTotal]] —
    * a range layout + per-partition prefix offsets — so no stage
    * funnels the corpus through one task the way the naive
    * `sum() OVER (ORDER BY …)` window would. Reports the admitted set
    * per language (counts, tokens, id checksum). */
  def tokenBudgetSelect(spark: SparkSession, sfDir: String,
                        budgetTokens: Long = 20000): DataFrame = {
    // tokenize ONCE: n_toks and ratio both derive from the same split
    // (two independent toksExpr copies would re-split every document)
    val scored = Tables.documents(spark, sfDir)
      .withColumn("toks", expr(TextOps.toksExpr))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("ratio", TextOps.lexicalRatioOf(col("toks")))
      .select(col("doc_id"), col("lang"), col("n_toks"), col("ratio"))
    val cum = graft.ops.GlobalRank.withRunningTotal(
      scored, Seq(col("ratio").desc, col("doc_id")), col("n_toks"), "cum_toks")
    cum.filter(col("cum_toks") <= budgetTokens)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_toks")).cast("long").as("total_tokens"),
           sum(col("doc_id")).cast("long").as("id_checksum"))
      .orderBy("lang")
  }

  /** CORPUS CARD — the one-row datasheet a published training corpus
    * ships with (datasheets-for-datasets practice): volume (docs,
    * tokens, chars), diversity (languages, sources), and redundancy
    * (distinct content fingerprints, duplicate rate). One scan plus
    * one fingerprint distinct-count; the duplicate rate is a single
    * long/long division, so the card hash-matches exactly. */
  def corpusCard(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", expr(TextOps.toksExpr))
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("lang")).as("n_langs"),
           countDistinct(col("source")).as("n_sources"),
           sum(size(col("toks"))).cast("long").as("total_tokens"),
           sum(col("n_chars")).cast("long").as("total_chars"),
           countDistinct(md5(col("text"))).as("distinct_fps"))
      .withColumn("dup_rate",
        (col("n_docs") - col("distinct_fps")).cast("double") /
          col("n_docs").cast("double"))

  /** Round-6 CAPSTONE — the training-corpus assembly line composed
    * from this round's stages, every one of them individually oracled,
    * and the composition oracled END-TO-END as one SQL pipeline:
    *
    *   1. canonical normalization ([[TextOps.normalizeText]]) → exact
    *      dedup on the NORMALIZED fingerprint (case/spacing variants
    *      collapse; keeper = min doc_id on the bounded-heap
    *      [[graft.plans.TopKPerGroup]]);
    *   2. leakage-safe TRAIN selection ([[Dedup.leakSafeSplit]]'s
    *      cluster-keyed coin flip — near-dup paraphrases never straddle
    *      the eval boundary);
    *   3. temperature-scaled source mixing ([[Sampling.temperatureMix]]'s
    *      √(min/n) rates over the surviving train corpus).
    *
    * Reports the per-language funnel (raw → deduped → train → mixed)
    * with an id-checksum of the final corpus. Shuffle profile: the
    * dedup heap exchange, the (cached) component join, and two
    * broadcast joins — text leaves the scan only to be hashed. */
  def curateTrain(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val norm = docs
      .withColumn("nfp", md5(TextOps.normalizeText(col("text"))))
      .drop("text")
    val kept1 = graft.plans.TopKPerGroup
      .topK(norm, Seq("nfp"), Seq("doc_id" -> true), 1)
      .drop("rnk")
    val comps = Dedup.connectedComponents(spark, sfDir)
      .select(col("doc_id"), col("comp_id"))
    val train = kept1.join(comps, Seq("doc_id"), "left")
      .withColumn("comp_id", coalesce(col("comp_id"), col("doc_id")))
      .filter(Sampling.hashBucket(col("comp_id")) < "cd")
    val rates = Sampling.sqrtMixRates(
      train.groupBy(col("source")).agg(count(lit(1)).as("n_before")), "source")
    val fin = train.join(broadcast(rates.drop("n_before")), "source")
      .filter(Sampling.rateKeep(col("doc_id"), col("rate")))
    docs.groupBy(col("lang")).agg(count(lit(1)).as("n_raw"))
      .join(kept1.groupBy(col("lang")).agg(count(lit(1)).as("n_dedup")),
            Seq("lang"), "left")
      .join(train.groupBy(col("lang")).agg(count(lit(1)).as("n_train")),
            Seq("lang"), "left")
      .join(fin.groupBy(col("lang"))
              .agg(count(lit(1)).as("n_final"),
                   sum(col("doc_id")).cast("long").as("id_checksum")),
            Seq("lang"), "left")
      .na.fill(0L, Seq("n_dedup", "n_train", "n_final", "id_checksum"))
      .orderBy("lang")
  }

  /** The full curation pipeline in one plan: quality gate → PII scrub →
    * exact dedup (on the SCRUBBED text — two raw docs differing only in
    * redacted spans are duplicates) → deterministic train/test split →
    * per-(lang, split) accounting of what ships to training.
    *
    * Still scan-shaped at 100 TB: the gate and scrub are narrow maps
    * fused into the scan, the dedup is one fingerprint window, the
    * split is a pure hash predicate — two exchanges total, same as the
    * simple capstone. */
  def curateFull(spark: SparkSession, sfDir: String): DataFrame = {
    curatedDocs(spark, sfDir)
      .withColumn("clean_toks", expr("filter(split(clean, ' '), x -> x != '')"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
           sum(size(col("clean_toks"))).cast("long").as("total_tokens"),
           sum(length(col("clean"))).cast("long").as("total_chars"),
           davg(col("ratio")).as("avg_ratio"))
      .orderBy("lang", "split")
  }
}
