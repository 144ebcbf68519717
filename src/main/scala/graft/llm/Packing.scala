package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Fns

/** Sequence packing — the training-prep step that packs documents into
  * fixed-budget training sequences (context windows) so the trainer
  * wastes no tokens on padding.
  *
  * Layout first, then pack: documents are range-partitioned and sorted
  * by doc_id (a deterministic, reproducible layout), and each partition
  * greedily fills sequences up to the budget. Packing is inherently
  * sequential WITHIN a sequence, so the per-partition imperative loop is
  * the honest implementation; the partition is the parallelism unit —
  * at 100 TB every partition packs independently and sequence ids are
  * (partition, ordinal), so there is no global coordination, no shuffle
  * after the layout exchange, and a re-run reproduces the exact same
  * packing. A document longer than the budget becomes its own overflow
  * sequence (splitting it belongs to the tokenizer/chunking stage —
  * see [[Dedup.contentChunks]]). */
object Packing {

  /** Per-document sequence assignment: (seq_id, doc_id, n_chars). */
  def packSequences(docs: DataFrame, budgetChars: Long = 2048): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars"))
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var seq = 0
        var fill = 0L
        it.map { case (id, n) =>
          if (fill > 0L && fill + n > budgetChars) { seq += 1; fill = 0L }
          fill += n
          (s"$pid-$seq", id, n)
        }
      }
      .toDF("seq_id", "doc_id", "n_chars")
  }

  /** Corpus-level packing report (rows-only: seq ids depend on the
    * session's parallelism, which a SQL oracle cannot see): sequence
    * and document totals, average fill ratio, and how many oversize
    * documents overflowed their own sequence. */
  def packingStats(spark: SparkSession, sfDir: String,
                   budgetChars: Long = 2048): DataFrame = {
    val perSeq = packSequences(Tables.documents(spark, sfDir), budgetChars)
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("filled"))
    perSeq.agg(
        count(lit(1)).as("n_seqs"),
        sum(col("n_docs")).cast("long").as("n_docs"),
        Fns.davg((col("filled") / lit(budgetChars.toDouble))).as("avg_fill"),
        max(col("filled")).cast("long").as("max_filled"),
        count(when(col("filled") > budgetChars, lit(1))).as("n_overflow"))
  }
}
