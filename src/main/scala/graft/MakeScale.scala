package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: write a key-shifted N× replica of a fixture dir for scale
  * rehearsals past the largest driver fixture (docs/SCALING.md).
  * Usage: `runMain graft.MakeScale <srcSfDir> <outDir> [copies=10] [corpus]`.
  *
  * Each copy shifts every entity key by copy × (max+1) so the replica
  * keeps the fixture's referential structure (every lineitem still
  * joins to exactly one order, every order to one customer) while
  * multiplying row counts and key cardinalities by N — what another
  * decade of data would do to the relational plans. `ts` is left
  * unchanged: event density per time unit grows ×N, the window span
  * doesn't (the fixture's own 0.01→0.1 step grows the span instead;
  * both regimes occur in production). The tiny dims (nation/region)
  * are copied ×1 (FK targets kept stable).
  *
  * The text corpus (documents/embeddings) is copied ×1 by default:
  * naive replication would measure duplicate-pathology (every doc in an
  * N-way near-dup clique), not scale. The optional `corpus` mode scales
  * it honestly instead:
  *  - documents: a per-copy marker is fused onto every 3rd word, so
  *    every word-TRIGRAM shingle (the unit `llm/Dedup` signs) differs
  *    across copies — no cross-copy near-dup edges — while WITHIN a
  *    copy both exact- and near-dup structure is preserved exactly
  *    (the same transformation is applied to both sides of any pair);
  *    `n_chars` is recomputed to stay consistent with the text.
  *  - embeddings: a per-copy seeded SIGN FLIP of the dimensions.
  *    diag(±1) is orthogonal, so within-copy norms, dot products, and
  *    cosines are bit-exact (planted kNN/near-dup structure survives
  *    untouched) while cross-copy similarity is scrambled — corpus
  *    growth without N-way clone clusters. Copy 0 keeps the originals. */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    build(spark, args(0), args(1),
          if (args.length > 2) args(2).toInt else 10,
          corpusToo = args.length > 3 && args(3) == "corpus")
    spark.stop()
  }

  def build(spark: SparkSession, src: String, out: String, copies: Int,
            corpusToo: Boolean = false): Unit = {
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1L

    val orders = spark.read.parquet(s"$src/orders.parquet")
    val custs = spark.read.parquet(s"$src/customer.parquet")
    val parts = spark.read.parquet(s"$src/part.parquet")
    val supps = spark.read.parquet(s"$src/supplier.parquet")
    val events = Tables.events(spark, src)
    val (oMax, cMax, pMax, sMax) =
      (maxOf(orders, "o_orderkey"), maxOf(custs, "c_custkey"),
       maxOf(parts, "p_partkey"), maxOf(supps, "s_suppkey"))
    val (eMax, uMax) = (maxOf(events, "event_id"), maxOf(events, "user_id"))

    // one scan per table: explode a copy-index array, shift keys by it
    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
      val withI = df.withColumn("__i",
        explode(sequence(lit(0L), lit(copies - 1L))))
      shifts.foldLeft(withI) { case (d, (c, base)) =>
        d.withColumn(c, col(c) + col("__i") * base)
      }.drop("__i")
    }

    // 4 part files: enough that the per-file streaming drives
    // (maxFilesPerTrigger=1) exercise multi-batch accumulation without
    // their wall-clock becoming a micro-batch-count measurement, while
    // batch scans still parallelize fine — parquet splits by row-group
    // byte ranges, not by file count
    def write(df: DataFrame, name: String): Unit =
      df.repartition(4).write.mode("overwrite").parquet(s"$out/$name.parquet")

    write(replicate(orders, Map("o_orderkey" -> oMax, "o_custkey" -> cMax)), "orders")
    write(replicate(spark.read.parquet(s"$src/lineitem.parquet"),
      Map("l_orderkey" -> oMax, "l_partkey" -> pMax, "l_suppkey" -> sMax)), "lineitem")
    write(replicate(custs, Map("c_custkey" -> cMax)), "customer")
    write(replicate(parts, Map("p_partkey" -> pMax)), "part")
    write(replicate(supps, Map("s_suppkey" -> sMax)), "supplier")
    write(replicate(events, Map("event_id" -> eMax, "user_id" -> uMax)), "events")
    val copyAsIs = if (corpusToo) Seq("nation", "region")
                   else Seq("nation", "region", "documents", "embeddings")
    for (t <- copyAsIs)
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    if (corpusToo) buildCorpus(spark, src, out, copies)
    println(s"[makescale] wrote ${copies}x replica of $src to $out" +
            (if (corpusToo) " (corpus scaled)" else ""))
  }

  /** Honest N× corpus growth — see the object doc for the invariants. */
  def buildCorpus(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val dMax = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val vMax = embs.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val dim = embs.select(size(col("embedding"))).head.getInt(0)

    docs.withColumn("__i", explode(sequence(lit(0L), lit(copies - 1L))))
      .withColumn("doc_id", col("doc_id") + col("__i") * dMax)
      .withColumn("text", when(col("__i") === 0, col("text")).otherwise(
        array_join(
          transform(split(col("text"), " "),
            (w, j) => when(j % 3 === 2, concat(w, lit("⁐c"), col("__i")))
              .otherwise(w)),
          " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__i")
      .repartition(4).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val rng = new scala.util.Random(42)
    val signs = (0 until copies).map { i =>
      (i.toLong, if (i == 0) Array.fill(dim)(1.0f)
                 else Array.fill(dim)(if (rng.nextBoolean()) 1.0f else -1.0f))
    }.toDF("__i", "__sign")
    embs.withColumn("__i", explode(sequence(lit(0L), lit(copies - 1L))))
      .join(broadcast(signs), Seq("__i"))
      .withColumn("vec_id", col("vec_id") + col("__i") * vMax)
      .withColumn("embedding",
        zip_with(col("embedding"), col("__sign"), (x, s) => x * s))
      .drop("__i", "__sign")
      .repartition(4).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }
}
