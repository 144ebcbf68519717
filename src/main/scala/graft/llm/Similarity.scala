package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (north-star, SURVEY
  * §7.5): brute-force cosine top-k as the exact baseline, and a
  * partition-pruned (IVF-style) variant as the scale path.
  *
  * Cosine is computed with codegen'd higher-order functions
  * (`zip_with` + sequential `aggregate` fold in double space) — no UDF,
  * and the fold order is bit-identical to DuckDB's
  * list_cosine_similarity on DOUBLE[], so the oracle matches exactly.
  *
  * Scale design: the query set is broadcast (tiny) against the
  * candidate corpus, so the scan is embarrassingly parallel and the
  * only shuffle is the per-query top-k (`row_number` over query_id —
  * k·|queries| rows). The IVF variant prunes candidates to the query's
  * coarse cluster (here the `label` column plays the centroid-id role);
  * with cluster-partitioned storage that becomes partition pruning at
  * the scan.
  */
object Similarity {

  /** Typed (id, label, double-vector, norm) frame. The norm is computed
    * once per vector, not once per candidate pair — the higher-order
    * fold is interpreted, so per-pair norm recomputation dominated the
    * pairwise stages (the resulting doubles are identical: same fold,
    * same order). */
  private def withVec(df: DataFrame, idAs: String, vecAs: String): DataFrame =
    df.select(col("vec_id").as(idAs), col("label"),
              expr("transform(embedding, x -> cast(x as double))").as(vecAs))
      .withColumn(s"${vecAs}_norm",
        sqrt(expr(s"aggregate(transform($vecAs, x -> x * x), 0D, (acc, x) -> acc + x)")))

  private val cosine: org.apache.spark.sql.Column =
    (expr("aggregate(zip_with(qe, ce, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
      (col("qe_norm") * col("ce_norm")))

  private def topK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
      .orderBy("query_id", "rank")
  }

  /** Exact brute-force cosine top-5 for query vectors vec_id < 10. */
  def knnBrute(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val q = withVec(emb.filter(col("vec_id") < 10), "query_id", "qe").drop("label")
    val c = withVec(emb, "neighbor_id", "ce").drop("label")
    val pairs = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine)
    topK(pairs, 5)
  }

  /** IVF-style ANN: candidates pruned to the query's coarse cluster
    * (`label` = centroid id). Same top-k, a |corpus|/|clusters| scan. */
  def knnWithinLabel(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val q = withVec(emb.filter(col("vec_id") < 10), "query_id", "qe")
    val c = withVec(emb, "neighbor_id", "ce")
    val pairs = c.join(broadcast(q), Seq("label"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine)
    topK(pairs, 5)
  }

  /** Embedding-cosine near-duplicate pairs (the dedup flavor of the
    * similarity op): top-20 most similar same-label pairs — at scale the
    * label/cell blocking bounds the pair space exactly like the text
    * dedup's blocking key. Exactly oracled (cosine is bit-identical to
    * DuckDB on DOUBLE[]). */
  def embedDupPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val a = withVec(emb, "a_id", "qe")
    val b = withVec(emb, "b_id", "ce")
    a.join(b, Seq("label"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", cosine)
      .select(col("a_id"), col("b_id"), col("sim"))
      .orderBy(col("sim").desc, col("a_id"), col("b_id"))
      .limit(20)
  }

  /** True IVF (inverted-file) ANN: build nlist coarse centroids with
    * k-means, assign every vector to its nearest centroid, and search
    * only the query's cell (nprobe=1). The index build is a separate,
    * amortized step — at scale the assignment becomes the table's
    * partition key and cell search becomes partition pruning. Returns
    * top-k per query among same-cell candidates. Un-oracled: k-means is
    * not SQL-expressible (invariants covered in IvfSpec). */
  def ivfKnn(spark: SparkSession, sfDir: String, k: Int = 5, nlist: Int = 16): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Tables.embeddings(spark, sfDir)
      .withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("features").fit(emb)
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("prediction").as("cell"),
              expr("transform(embedding, x -> cast(x as double))").as("e"))
      .withColumn("nrm",
        sqrt(expr("aggregate(transform(e, x -> x * x), 0D, (acc, x) -> acc + x)")))
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("cell"),
              col("e").as("qe"), col("nrm").as("qe_norm"))
    val c = assigned
      .select(col("vec_id").as("neighbor_id"), col("cell"),
              col("e").as("ce"), col("nrm").as("ce_norm"))
    val pairs = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine)
    topK(pairs, k)
  }

  /** Random-hyperplane LSH bucketing (the other ANN scale path):
    * 8 sign-bits from fixed pseudo-random hyperplanes → bucket id;
    * reports bucket occupancy. Un-oracled (hyperplanes are engine-side
    * constants). */
  def lshBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = 64
    val rnd = new scala.util.Random(42)
    val planes: Seq[Array[Double]] =
      Seq.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))
    val bit = (p: Array[Double], i: Int) => {
      val planeCol = array(p.map(lit): _*)
      when(expr(s"aggregate(zip_with(e, plane$i, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") > 0,
        lit(1 << i)).otherwise(lit(0))
    }
    val withPlanes = planes.zipWithIndex.foldLeft(emb) { case (df, (p, i)) =>
      df.withColumn(s"plane$i", array(p.map(lit): _*))
    }
    val bucket = (0 until 8).map(i => bit(planes(i), i)).reduce(_ + _)
    withPlanes.withColumn("bucket", bucket)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_vecs"))
      .orderBy("bucket")
  }
}
