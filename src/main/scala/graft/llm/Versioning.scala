package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus snapshot versioning — the delivery-audit operator a continuous
  * training lake runs between two corpus snapshots: which documents were
  * added, removed, changed (same id, different content), or carried
  * unchanged. The reference's analog is the archive/complete-view split
  * (`usdc-transfers/sql/archive-strategy.sql:41-44`) — two physical
  * generations of one logical table; here the generations are compared
  * rather than unioned.
  *
  * Scale shape: both sides are reduced to (doc_id, lang, fp=md5(text))
  * BEFORE the full-outer join, so the id-hash shuffle carries 3 skinny
  * columns and the text column never leaves its scan. The join keys on
  * doc_id — at 100 TB both snapshots hash-partition on the same key and
  * the classification is a narrow projection over the joined row.
  */
object Versioning {

  /** Classify v1 → v2 per (lang, status): added / removed / changed /
    * unchanged, with doc counts and an id checksum (sum of doc_ids —
    * engine-portable proof the exact same rows landed in each class). */
  def snapshotDiffOf(v1: DataFrame, v2: DataFrame): DataFrame = {
    def skinny(df: DataFrame) =
      df.select(col("doc_id"), col("lang"), md5(col("text")).as("fp"))
    val a = skinny(v1).withColumnRenamed("fp", "fp1").withColumnRenamed("lang", "lang1")
    val b = skinny(v2).withColumnRenamed("fp", "fp2").withColumnRenamed("lang", "lang2")
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("fp1").isNull, "added")
          .when(col("fp2").isNull, "removed")
          .when(col("fp1") === col("fp2"), "unchanged")
          .otherwise("changed"))
      .withColumn("lang", coalesce(col("lang2"), col("lang1")))
      .groupBy(col("lang"), col("status"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("doc_id")).cast("long").as("id_checksum"))
      .orderBy("lang", "status")
  }

  // ——— right-to-be-forgotten propagation ———————————————————————————
  //
  // A takedown/consent-revocation request must remove documents from
  // the corpus AND from every derived artifact, or the next
  // incremental delivery keeps rejecting re-submissions of content
  // that officially no longer exists. Artifacts are immutable
  // snapshots: each forget writes the NEXT generation to a new
  // directory (never in-place — a parquet self-overwrite reads the
  // files it is deleting), exactly the generation story of
  // [[snapshotDiffOf]].

  /** Refcounted exact-dedup fingerprint index — (fp, n_docs). The
    * refcount is what makes forgetting O(|forget set|) instead of a
    * full-corpus text rescan: removing a doc DECREMENTS its fp and the
    * row drops only at zero, so an fp shared with surviving docs keeps
    * blocking re-admission (summing-state semantics, the same
    * mergeable-partial idea as the streaming MV sinks). */
  def writeFpCountIndex(docs: DataFrame, dir: String): Unit =
    docs.select(md5(col("text")).as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(dir)

  /** Next-generation fp index after forgetting `forgottenDocs`: only
    * the forgotten docs are hashed (no corpus scan); counts decrement
    * and zero-count rows drop. */
  def forgetFromFpCountIndex(spark: SparkSession, indexDir: String,
                             outDir: String, forgottenDocs: DataFrame): Unit = {
    val dec = forgottenDocs.select(md5(col("text")).as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("n_forget"))
    spark.read.parquet(indexDir)
      .join(dec, Seq("fp"), "left")
      .withColumn("n_docs", col("n_docs") - coalesce(col("n_forget"), lit(0L)))
      .filter(col("n_docs") > 0)
      .select(col("fp"), col("n_docs"))
      .write.mode("overwrite").parquet(outDir)
  }

  /** Next-generation near-dup signature index after forgetting the
    * given doc_ids: a skinny anti-join on the index's own key — the
    * signatures of surviving docs are reused byte-for-byte, no
    * re-shingling of the corpus. */
  def forgetFromNearDupIndex(spark: SparkSession, indexDir: String,
                             outDir: String, forgetIds: DataFrame): Unit =
    Dedup.loadNearDupIndex(spark, indexDir)
      .join(forgetIds.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(outDir)

  /** The forget-request AUDIT report (driver fixture: ids ≡ 0 mod 23
    * are forgotten): per language, corpus and distinct-fingerprint
    * counts before/after — the numbers a compliance log records with
    * each generation bump. The fingerprint deltas are what prove
    * content actually left the dedup surface (an fp survives iff a
    * surviving doc still carries it). */
  def forgetReport(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val f = col("doc_id") % 23 === 0
    docs.withColumn("__f", f)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_before"),
           count(when(col("__f"), 1)).as("n_forgotten"),
           count(when(!col("__f"), 1)).as("n_after"),
           countDistinct(md5(col("text"))).as("n_fps_before"),
           countDistinct(when(!col("__f"), md5(col("text")))).as("n_fps_after"))
      .orderBy("lang")
  }

  /** Driver entry: two deterministic synthetic generations of the
    * documents table — v1 drops ids ≡ 3 (mod 11), v2 drops ids ≡ 5
    * (mod 13) and rewrites the text of ids ≡ 0 (mod 17) (an upstream
    * re-crawl). Every status class is populated at every SF. */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val v1 = docs.filter(col("doc_id") % 11 =!= 3)
    val v2 = docs.filter(col("doc_id") % 13 =!= 5)
      .withColumn("text",
        when(col("doc_id") % 17 === 0, concat(lit("v2 "), col("text")))
          .otherwise(col("text")))
    snapshotDiffOf(v1, v2)
  }
}
