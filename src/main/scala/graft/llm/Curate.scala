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
