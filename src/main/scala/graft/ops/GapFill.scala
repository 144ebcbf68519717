package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series gap filling (round 15) — ClickHouse's `ORDER BY day
  * WITH FILL [FROM … TO … STEP 1] INTERPOLATE (col AS expr)` as a
  * Spark plan. A sparse per-(key, day) aggregate becomes a DENSE
  * series: every key × every day of the spine appears, absent
  * measures fill with declared defaults, and carry-forward columns
  * interpolate from the last present row (the dashboard-friendly
  * "last known value" line).
  *
  * Spark-first shape, and why it scales:
  *  1. the spine is `sequence(min_day, max_day)` exploded ONCE — a
  *     few-KB driver-free generate_series, never a table scan;
  *  2. keys × spine is a broadcast nested-loop of two TINY sides
  *     (distinct keys × days — report-sized by definition, the same
  *     cardinality the dense report itself has);
  *  3. the dense frame LEFT-joins the sparse aggregate on (key, day)
  *     — one hash shuffle of report-sized rows, not facts;
  *  4. carry-forward is `last(col, ignoreNulls) OVER (PARTITION BY
  *     key ORDER BY day)` — a running frame, no self-joins.
  * The fact table is read exactly once (the aggregate). */
object GapFill {

  /** Densify `sparse` (one row per (keys…, dayCol) present) over the
    * full day spine [min(day), max(day)]: missing rows appear with
    * `defaults` for their columns; `carryForward` columns additionally
    * interpolate from the last present row per key group (NULL before
    * the first observation — ClickHouse INTERPOLATE's own behavior). */
  def fillDays(sparse: DataFrame, dayCol: String, keys: Seq[String],
               defaults: Map[String, Column],
               carryForward: Seq[String] = Nil): DataFrame = {
    val bounds = sparse.agg(min(col(dayCol)).as("lo"), max(col(dayCol)).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"))).as(dayCol))
    val keyRows = sparse.select(keys.map(col): _*).distinct()
    val dense = broadcast(keyRows).crossJoin(broadcast(spine))
    val joined = dense.join(sparse, keys :+ dayCol, "left")
    val filled = defaults.foldLeft(joined) { case (df, (c, d)) =>
      df.withColumn(c, coalesce(col(c), d))
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carryForward.foldLeft(filled) { case (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Driver entry (q226, oracled): the high-value event series per
    * type, gap-filled — rare (value > 240) events leave (day, type) holes; the
    * dense report zero-fills counts and volume and carries the last
    * observed max forward (`WITH FILL … INTERPOLATE`). The DuckDB
    * oracle builds the same spine with generate_series and the same
    * carry with IGNORE NULLS window frames. */
  def filledSeries(spark: SparkSession, sfDir: String): DataFrame = {
    val sparse = Tables.events(spark, sfDir)
      .filter(col("value") > 240.0d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           Fns.dsum(col("value")).as("volume"),
           max(col("value")).as("day_max"))
    fillDays(sparse, "day", Seq("event_type"),
        defaults = Map("n" -> lit(0L), "volume" -> lit(0.0d)),
        carryForward = Seq("day_max"))
      .select(col("day"), col("event_type"), col("n"), col("volume"),
              col("day_max").as("last_max"))
      .orderBy("day", "event_type")
  }
}
