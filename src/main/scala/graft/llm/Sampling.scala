package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling / splitting for training-data curation
  * (north-star extensions; the reference has no sampling surface — its
  * closest analog is the block-range slicing in
  * `usdc-transfers/src/main.ts:46-57`, which selects by key range, not
  * probability).
  *
  * Every sample here is a pure predicate on a cryptographic hash of the
  * row key — no RNG, no state:
  *
  *   keep(row) := substr(md5(cast(key as string)), 1, 2) < threshold
  *
  * The first two lowercase-hex chars of md5 are uniform over 256 values,
  * and fixed-width lowercase hex compares lexicographically exactly as
  * it compares numerically, so `< "1a"` keeps 26/256 ≈ 10.2% of keys.
  * Properties that matter at 100 TB:
  *
  *  - *Engine-portable*: md5 + substr + string compare evaluate
  *    identically in Spark and DuckDB (the oracle hash-matches the
  *    exact sampled row set, not just its size).
  *  - *Shuffle-free*: the predicate is a narrow map evaluated at the
  *    scan; sampling 1% of 100 TB reads the key column and nothing
  *    else until after the filter.
  *  - *Stable under reprocessing*: a re-run, a backfill, or a second
  *    pipeline stage selects the same rows — and train/test membership
  *    never flips when data is added (per-row decision, no global sort).
  *  - *Composable*: a 10% sample of a 50% split is itself deterministic
  *    (thresholds on disjoint hash prefixes stay independent if keys
  *    are salted per stage: md5(stage || key)).
  */
object Sampling {

  /** First-two-hex-chars bucket of md5(key) — 256 uniform buckets. */
  def hashBucket(key: Column): Column = substring(md5(key.cast("string")), 1, 2)

  /** Oracle-side twin of [[hashBucket]]. */
  def hashBucketSql(key: String): String = s"substr(md5(CAST($key AS VARCHAR)), 1, 2)"

  /** The deterministic per-row keep decision at `rate`: md5-prefix of
    * the id against the 16-bit threshold, with rate ≥ 1.0 keeping
    * UNCONDITIONALLY (the 0xffff clamp would otherwise drop the
    * ~1/65536 of rows whose hash prefix is "ffff" — violating the
    * "under-represented groups keep everything" contract). ONE
    * definition, shared by rebalancing, temperature mixing, and the
    * curate-train capstone, so the clamp rule cannot diverge between
    * an individually-oracled stage and a composition that claims it. */
  private[llm] def rateKeep(idCol: Column, rate: Column): Column = {
    val threshold = lpad(lower(hex(
      least(floor(rate * 65536), lit(65535)).cast("long"))), 4, "0")
    rate >= 1.0 || substring(md5(idCol.cast("string")), 1, 4) < threshold
  }

  /** √(min_n / n) temperature rates (α = 1/2, normalized so the
    * smallest group's rate is exactly 1) over a (key, n_before) count
    * frame — the rate derivation [[temperatureMix]] and
    * [[Curate.curateTrain]] share. */
  private[llm] def sqrtMixRates(perKey: DataFrame, keyCol: String): DataFrame =
    perKey
      .crossJoin(broadcast(perKey.agg(min(col("n_before")).as("__min_n"))))
      .withColumn("rate",
        sqrt(col("__min_n").cast("double") / col("n_before").cast("double")))
      .select(col(keyCol), col("n_before"), col("rate"))

  /** Deterministic ~10% Bernoulli sample of documents (26/256), keyed on
    * doc_id. Materializing: proves the exact selected row set. */
  def bernoulliSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(hashBucket(col("doc_id")) < lit("1a"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")

  /** Deterministic 80/20 train/test split ('cd' = 205/256 ≈ 80.1%),
    * keyed on doc_id, with per-(lang, split) counts proving both the
    * assignment and that membership is a pure function of the key. */
  def trainTestSplit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("split",
        when(hashBucket(col("doc_id")) < lit("cd"), "train").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).cast("long").as("total_chars"),
           min(col("doc_id")).as("first_id"))
      .orderBy("lang", "split")

  /** Weighted (quality-proportional) sampling: each document is kept
    * with probability equal to its lexical-diversity ratio — keep-if
    * `substr(md5(key),1,4) < lpad(hex(floor(ratio·2¹⁶)),4,'0')`. The
    * 4-hex-char prefix is uniform over 2¹⁶; comparing it against the
    * per-row threshold rendered as FIXED-WIDTH lowercase hex turns the
    * lexicographic compare into a numeric one, so the keep decision is
    * still a pure deterministic row predicate — no RNG — with per-row
    * probability. (Clamped to 65535/65536: a ratio of exactly 1.0 keeps
    * all but one hash slot.) Achieved per-language rate ≈ mean ratio. */
  def weightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val ratio = graft.llm.TextOps.lexicalRatio
    val threshold = lpad(lower(hex(
      least(floor(col("ratio") * 65536), lit(65535)).cast("long"))), 4, "0")
    val kept = substring(md5(col("doc_id").cast("string")), 1, 4) < threshold
    Tables.documents(spark, sfDir)
      .withColumn("ratio", ratio)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           count(when(kept, lit(1))).as("n_kept"),
           graft.ops.Fns.davg(col("ratio")).as("avg_ratio"))
      .withColumn("rate", col("n_kept").cast("double") / col("n_docs").cast("double"))
      .orderBy("lang")
  }

  /** Language rebalancing — the DATA-MIXING step of corpus assembly:
    * downsample over-represented languages toward a uniform per-language
    * share (target = corpus_total / n_langs docs each; under-represented
    * languages keep everything — sampling cannot create rows, so
    * up-weighting belongs to the training loader's epoch weights, not
    * the corpus). The per-language rate becomes a per-row deterministic
    * hash predicate exactly like [[weightedSample]], so the mix is
    * stable under reprocessing and shuffle-free at the scan.
    *
    * Scale shape: the rate table is one row per language (broadcast
    * join); the fact side evaluates one md5 + compare per row. Reports
    * per-language before/after counts and the nominal rate. */
  def rebalanceLanguages(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val perLang = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_before"))
    // corpus total + language count via a one-row broadcast aggregate,
    // not an unpartitioned window: same number, no single-task stage
    val totals = perLang.agg(sum(col("n_before")).as("__total"),
                             count(lit(1)).as("__langs"))
    val rates = perLang
      .crossJoin(broadcast(totals))
      .withColumn("target",
        col("__total").cast("double") / col("__langs").cast("double"))
      .withColumn("rate",
        least(lit(1.0), col("target") / col("n_before").cast("double")))
      .select(col("lang"), col("n_before"), col("rate"))
    val kept = rateKeep(col("doc_id"), col("rate"))
    docs.join(broadcast(rates), "lang")
      .groupBy(col("lang"))
      .agg(first(col("n_before")).as("n_before"),
           count(when(kept, lit(1))).as("n_after"),
           first(col("rate")).as("rate"))
      .orderBy("lang")
  }

  /** TEMPERATURE-scaled source mixing — the multilingual-pretraining
    * mixing rule (mT5/XLM-R style): sample source i proportionally to
    * n_i^α with α = 1/2, flattening the head without going fully
    * uniform. Sampling cannot create rows, so the realized mix keeps
    * every doc of the SMALLEST source and downsamples source i at rate
    * √(min_n / n_i) — the α = 1/2 rate normalized so the smallest
    * source's rate is exactly 1. The root is `sqrt` (IEEE
    * correctly-rounded, bit-identical across engines), NOT `pow`
    * (libm-dependent, would break the oracle hash); the keep decision
    * is the same deterministic md5-prefix predicate as
    * [[weightedSample]], so the mix is stable under reprocessing.
    *
    * Scale shape: the rate table is one row per source, broadcast onto
    * the corpus scan; one md5 + compare per row, shuffle-free until the
    * per-source rollup. */
  def temperatureMix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val rates = sqrtMixRates(
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_before")), "source")
    val kept = rateKeep(col("doc_id"), col("rate"))
    docs.join(broadcast(rates), "source")
      .groupBy(col("source"))
      .agg(first(col("n_before")).as("n_before"),
           count(when(kept, lit(1))).as("n_after"),
           first(col("rate")).as("rate"))
      .orderBy("source")
  }

  /** Per-source QUOTA cap — corpus assembly rule "no feed contributes
    * more than N documents, keep its best": rank each source's docs by
    * quality (lexical ratio desc, doc_id tiebreak) and keep the top N.
    *
    * The ranking runs on the native bounded-heap
    * [[graft.plans.TopKPerGroup]] operator, not a row_number window: a
    * handful of mega-feeds is exactly the skew this cap exists to
    * bound, and the window form would FULL-SORT each feed's billions of
    * rows inside one task to keep N of them. The heap pass is
    * O(n log cap) with O(cap) memory per feed and drops losers as they
    * stream in (q48 proves the operator row-identical to the window).
    * Totals come from a separate partial-aggregable count (map-side
    * combined), joined per-source — both sides are one row per feed.
    * Only skinny (doc_id, source, ratio) rows shuffle — never text. */
  def sourceQuota(spark: SparkSession, sfDir: String, cap: Int = 100): DataFrame = {
    val skinny = Tables.documents(spark, sfDir)
      .withColumn("ratio", graft.llm.TextOps.lexicalRatio)
      .select(col("doc_id"), col("source"), col("ratio"))
    val totals = skinny.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val kept = graft.plans.TopKPerGroup.topK(
        skinny, Seq("source"), Seq("ratio" -> false, "doc_id" -> true), cap)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
           sum(col("doc_id")).cast("long").as("kept_id_checksum"))
    totals.join(kept, Seq("source")).orderBy("source")
  }

  /** Per-class sampling rates for stratified event curation: keep every
    * rare positive (purchase, error), downsample the high-volume classes.
    * Thresholds are on [[hashBucket]] of event_id. */
  val strataThresholds: Seq[(String, String)] = Seq(
    "click" -> "1a",  //  26/256 ≈ 10.2%
    "view"  -> "0d",  //  13/256 ≈  5.1%
    "signup" -> "cd", // 205/256 ≈ 80.1%
    "purchase" -> "zz", // keep all ('zz' > any hex pair)
    "error" -> "zz")  // keep all

  /** Stratified sample of events: one pass, per-class keep-predicate,
    * reporting achieved vs nominal rate per class. The keep decision is
    * evaluated at the scan; only survivors reach the aggregate. */
  def stratifiedEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val b = hashBucket(col("event_id"))
    val kept = strataThresholds.foldLeft(lit(false)) { case (acc, (cls, thr)) =>
      when(col("event_type") === cls, b < lit(thr)).otherwise(acc)
    }
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"),
           count(when(kept, lit(1))).as("n_sampled"))
      .withColumn("rate", col("n_sampled").cast("double") / col("n_total").cast("double"))
      .orderBy("event_type")
  }
}
