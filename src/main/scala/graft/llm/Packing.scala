package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Fns

/** Sequence packing — the training-prep step that packs documents into
  * fixed-budget training sequences (context windows) so the trainer
  * wastes no tokens on padding.
  *
  * Layout first, then pack: documents are partitioned into EXPLICIT
  * contiguous doc_id ranges (bucket = doc_id·P / (max_id+1) — derived
  * from the data, not from RangePartitioner's reservoir sample, whose
  * run-dependent boundaries would shift sequence ids between runs once
  * the corpus outgrows the sample) and sorted by doc_id, then each
  * partition greedily fills sequences up to the budget. Packing is
  * inherently sequential WITHIN a sequence, so the per-partition
  * imperative loop is the honest implementation; the partition is the
  * parallelism unit — at 100 TB every partition packs independently and
  * sequence ids are (bucket, ordinal), so there is no global
  * coordination, no shuffle after the layout exchange, and a re-run
  * over the same corpus reproduces the exact same packing. A document
  * longer than the budget becomes its own overflow sequence (splitting
  * it belongs to the tokenizer/chunking stage — see
  * [[Dedup.contentChunks]]). */
object Packing {

  /** Per-document sequence assignment: (seq_id, doc_id, n_chars). */
  def packSequences(docs: DataFrame, budgetChars: Long = 2048): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    // one tiny driver-side aggregate pins the bucket width; boundaries
    // are then a pure function of (doc_id, max_id, P) — reproducible
    val maxId = docs.agg(max(col("doc_id"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    docs.select(col("doc_id"), col("n_chars"))
      .withColumn("bucket",
        (col("doc_id") * p / lit(maxId + 1)).cast("int"))
      .repartition(p, col("bucket"))
      .sortWithinPartitions("bucket", "doc_id")
      .select(col("bucket"), col("doc_id"), col("n_chars"))
      .as[(Int, Long, Long)]
      .mapPartitions { it =>
        var curBucket = Int.MinValue
        var seq = 0
        var fill = 0L
        it.map { case (bucket, id, n) =>
          // hash repartition can co-locate several buckets in one task;
          // seq ids key on the BUCKET so placement never leaks into ids
          if (bucket != curBucket) { curBucket = bucket; seq = 0; fill = 0L }
          if (fill > 0L && fill + n > budgetChars) { seq += 1; fill = 0L }
          fill += n
          (s"$bucket-$seq", id, n)
        }
      }
      .toDF("seq_id", "doc_id", "n_chars")
  }

  /** Deterministic global TRAINING ORDER with contiguous shard
    * assignment — the trainer wants the corpus in a reproducible
    * pseudo-random order, split into S equal output shards. The order
    * key is md5 of the doc id: a fixed permutation of the corpus,
    * independent of file layout, partitioning, or run — and the global
    * position comes from [[graft.ops.GlobalRank]]'s range-partitioned
    * two-pass rank, so no stage funnels the corpus through a single
    * task the way an unpartitioned `row_number` window would. Shards
    * are rank-contiguous (`floor((ord-1)·S / n)`), so shard sizes
    * differ by at most one and a shard maps 1:1 to an output file. */
  def trainingOrderOf(docs: DataFrame, shards: Int): DataFrame = {
    require(shards >= 1, s"shard count must be >= 1, got $shards")
    val keyed = docs.select(
      col("doc_id"), md5(col("doc_id").cast("string")).as("__key"))
    val (ranked, n) = graft.ops.GlobalRank.withRank(
      keyed, Seq(col("__key"), col("doc_id")), "ord")
    ranked
      .withColumn("shard",
        floor(((col("ord") - 1) * shards) / lit(n.toDouble)).cast("int"))
      .select(col("doc_id"), col("ord"), col("shard"))
      .orderBy("ord")
  }

  def trainingOrder(spark: SparkSession, sfDir: String): DataFrame =
    trainingOrderOf(Tables.documents(spark, sfDir), shards = 8)

  /** Publish the corpus as a TRAINING-READY sharded lake: one hive
    * partition per shard, rows inside each file in training order. The
    * trainer streams shard directories sequentially — no further
    * shuffle, no sampling at load time. One exchange total (the
    * hash-repartition on shard; [[trainingOrderOf]]'s rank layout is
    * reused by the join's shuffle on doc_id). */
  def publishShards(docs: DataFrame, outDir: String, shards: Int): Unit =
    docs.join(trainingOrderOf(docs, shards), "doc_id")
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "ord")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** Per-shard manifest read back FROM THE PUBLISHED LAKE — the
    * delivery receipt a training job validates before reading: doc
    * count, the contiguous [ord_min, ord_max] rank range, and an
    * order-weighted checksum (decimal-routed so both engines sum
    * exactly). Oracled end-to-end: the SQL twin recomputes the manifest
    * from the SOURCE table, so the lake write + read-back must preserve
    * every (doc_id, ord, shard) triple bit-for-bit to hash-match. */
  def shardManifest(spark: SparkSession, lakeDir: String): DataFrame =
    spark.read.parquet(lakeDir)
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
           min(col("ord")).as("ord_min"),
           max(col("ord")).as("ord_max"),
           Fns.dsum(col("ord").cast("double") * col("doc_id").cast("double"))
             .as("checksum"))
      .orderBy("shard")

  /** Driver entry: publish documents to a scratch lake, then manifest. */
  def publishManifest(spark: SparkSession, sfDir: String): DataFrame = {
    val outDir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_train_shards").getAbsolutePath
    publishShards(Tables.documents(spark, sfDir), outDir, shards = 8)
    shardManifest(spark, outDir)
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
