package graft.ops

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Pipeline observability — the reference's `sql/monitoring.sql` role
  * (row counts, volume totals, table health probes) played by Spark's
  * `Observation` metrics: exact aggregates piggybacked on a query's own
  * scan, collected driver-side when the action completes. Zero extra
  * passes — where ClickHouse reads system tables after the fact, the
  * observation rides the job that does the work, so 100 TB of input is
  * metered by the job that already read it. */
object Monitoring {

  /** The daily rollup instrumented with scan-side metrics: input rows,
    * exact value total, null-key count (data-quality probe). Call an
    * action on the DataFrame, then read `observation.get`. */
  def observedDaily(spark: SparkSession, sfDir: String): (DataFrame, Observation) = {
    val obs = Observation("daily_metrics")
    val df = Tables.events(spark, sfDir)
      .observe(obs,
        count(lit(1)).as("rows_scanned"),
        Fns.dsum(col("value")).as("value_total"),
        count(when(col("user_id").isNull, lit(1))).as("null_users"))
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(Fns.dsum(col("value")).as("total_value"),
           count(lit(1)).as("tx_count"))
      .orderBy("day", "user_id")
    (df, obs)
  }

  /** Storage-footprint report — the reference's table-size monitoring
    * query (`usdc-transfers/sql/monitoring.sql:20-29`: per-table bytes,
    * part counts, `formatReadableSize` over `system.parts`) re-expressed
    * for a lake: per registered table, file count, total/avg bytes, and
    * the human-readable rendering via the native
    * [[graft.expr.FormatReadableSize]] expression.
    *
    * The file listing is driver-side filesystem METADATA — the direct
    * analog of reading `system.parts`, which ClickHouse also serves
    * from memory rather than by scanning data. Cost is O(files) name
    * ops against the namenode/listing API, not O(bytes); at 100 TB
    * (~10⁵ files) this is milliseconds, and the aggregation itself
    * still runs as a (tiny) Spark plan so the readable-size rendering
    * exercises the same codegen'd expression the big queries use. */
  def tableFootprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val files: Seq[(String, String, Long)] = Tables.names.flatMap { t =>
      LakeFiles.dataFiles(conf, s"$sfDir/$t.parquet")
        .map { case (name, len) => (t, name, len) }
    }
    files.toDF("table_name", "file", "bytes")
      .groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_files"),
           sum(col("bytes")).as("total_bytes"),
           avg(col("bytes")).as("avg_file_bytes"))
      .withColumn("readable",
        graft.expr.FormatReadableSize(col("total_bytes").cast("double")))
      .orderBy(col("total_bytes").desc, col("table_name"))
  }

  /** Column-level data-quality PROFILE — the per-column health report
    * (null counts, cardinality, value range) a pipeline publishes with
    * each snapshot, the lake answer to `DESCRIBE`-plus-system-stats
    * probes. ONE scan computes every column's stats: the multi-column
    * distinct counts expand the input (Spark's Expand operator, one row
    * per distinct-aggregate per input row) and aggregate in a single
    * exchange — no per-column passes; min/max render as strings so one
    * long-format frame carries mixed column types. */
  def profileOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
          countDistinct(col(c)).as(s"__nd_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
             col("__n").as("n_rows"),
             (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
             col(s"__nd_$c").as("n_distinct"),
             col(s"__min_$c").as("min_val"),
             col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy("col_name")
  }

  /** Driver entry: profile the documents table's full schema. */
  def profileDocuments(spark: SparkSession, sfDir: String): DataFrame =
    profileOf(Tables.documents(spark, sfDir),
              Seq("doc_id", "lang", "n_chars", "source", "text"))
}
