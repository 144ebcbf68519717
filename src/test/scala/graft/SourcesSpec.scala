package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source-format breadth (S-class) and window-shape breadth (T2+):
  * the engine is format-agnostic through the DataFrame boundary, and
  * supports sliding/session windows beyond the reference's tumbling
  * buckets. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("JSON and CSV roundtrips preserve the events table") {
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    ev.write.mode("overwrite").json(s"$dir/ev_json")
    ev.write.mode("overwrite").option("header", "true").csv(s"$dir/ev_csv")
    val fromJson = spark.read.schema(ev.schema).json(s"$dir/ev_json")
    val fromCsv = spark.read.schema(ev.schema)
      .option("header", "true").csv(s"$dir/ev_csv")
    val key = Seq("event_id")
    assert(fromJson.count() == ev.count())
    assert(fromCsv.count() == ev.count())
    assert(fromJson.except(ev).isEmpty && ev.except(fromJson).isEmpty)
    assert(fromCsv.except(ev).isEmpty && ev.except(fromCsv).isEmpty)
  }

  test("ORC roundtrip preserves the full events table and pushes filters") {
    val ev = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    ev.write.mode("overwrite").orc(s"$dir/ev_orc")
    val fromOrc = spark.read.orc(s"$dir/ev_orc")
    assert(fromOrc.except(ev).isEmpty && ev.except(fromOrc).isEmpty)
    // the columnar reader keeps pushdown + pruning, same as parquet
    val plan = fromOrc.filter($"user_id" === 3).select($"event_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,3)"))
  }

  test("sliding windows: each event lands in windowMinutes/slideMinutes windows") {
    val n = Tables.events(spark, sf).count()
    val windowed = Tables.events(spark, sf)
      .groupBy(window($"ts", "60 minutes", "15 minutes"))
      .agg(count(lit(1)).as("c"))
    // 60/15 = 4 overlapping windows contain every event
    assert(windowed.agg(sum($"c")).head.getLong(0) == 4 * n)
  }

  test("session windows: gap-based sessions per user partition all events") {
    val n = Tables.events(spark, sf).count()
    val sessions = Tables.events(spark, sf)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("c"))
    assert(sessions.agg(sum($"c")).head.getLong(0) == n)
    // sessions are disjoint per user and longer than a single point
    val bad = sessions.filter($"session_window.end" <= $"session_window.start").count()
    assert(bad == 0)
  }

  /** Loader contract (SURVEY §1.4): `ts` must surface as session-zoned
    * TimestampType whatever parquet encoding the fixture generator
    * happened to use — the fixture regeneration between rounds 8 and 9
    * flipped events.ts from TIMESTAMP(NANOS) to TIMESTAMP_NTZ micros and
    * broke five queries downstream. This pins the contract at the loader
    * so the NEXT encoding drift fails here, by name, not nine tests
    * downstream. */
  test("loader contract: Tables.events ts is TimestampType at every fixture sf") {
    import org.apache.spark.sql.types.TimestampType
    val dirs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(s"$d/events.parquet").exists)
    assert(dirs.nonEmpty)
    for (d <- dirs) {
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType == TimestampType, s"$d surfaced ${ev.schema("ts").dataType}")
      assert(ev.limit(1).count() == 1, s"$d events unreadable")
    }
  }

  /** Pin the as-read fixture schema so any future driver-side fixture
    * drift (renamed column, widened type, re-encoded timestamp) fails
    * HERE by name instead of as a scatter of downstream errors. The
    * date-like columns on lineitem/orders may surface zoned or NTZ —
    * every consumer uses them in NTZ-safe ways (datediff/comparisons);
    * only events.ts carries the hard TimestampType contract (it feeds
    * unix_micros arithmetic and watermarks). */
  test("loader contract: fixture tables surface the pinned column names and types") {
    import org.apache.spark.sql.types._
    def fields(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
      df.schema.fields.map(f => f.name -> f.dataType).toMap
    val ev = fields(Tables.events(spark, sf))
    assert(ev == Map(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType), ev)
    val docs = fields(Tables.documents(spark, sf))
    assert(docs == Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType), docs)
    val emb = fields(Tables.embeddings(spark, sf))
    assert(emb == Map(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType), emb)
    val li = fields(Tables.lineitem(spark, sf))
    assert(Set[DataType](TimestampType, TimestampNTZType)
             .contains(li("l_shipdate")), li("l_shipdate"))
    assert(li - "l_shipdate" == Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_tax" -> DoubleType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType), li)
    val o = fields(Tables.orders(spark, sf))
    assert(Set[DataType](TimestampType, TimestampNTZType)
             .contains(o("o_orderdate")), o("o_orderdate"))
    assert(o - "o_orderdate" == Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType), o)
    val c = fields(Tables.customer(spark, sf))
    assert(c == Map(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType), c)
  }

  test("loader contract: normalizeTs maps nanos-long, micros-NTZ, and micros-UTC to the same instant") {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // one known instant, written in each of the three wire encodings the
    // fixture generator has produced so far
    val us = 1700000000123456L // 2023-11-14T22:13:20.123456Z
    val dir = java.nio.file.Files.createTempDirectory("graft_tsenc").toString
    val one = spark.range(1)
    one.select(timestamp_micros(lit(us)).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/utc")
    one.select(timestamp_micros(lit(us)).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz")
    // TIMESTAMP(NANOS) can't be written from Spark; a plain INT64 column
    // reproduces exactly what the nanosAsLong reader surfaces for it
    one.select(lit(us * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/nanos")
    val expectedRaw = Map(
      "utc" -> TimestampType, "ntz" -> TimestampNTZType, "nanos" -> LongType)
    val instants = Seq("utc", "ntz", "nanos").map { enc =>
      val raw = spark.read.parquet(s"$dir/$enc")
      assert(raw.schema("ts").dataType == expectedRaw(enc),
        s"$enc fixture did not round-trip as ${expectedRaw(enc)}")
      val norm = Tables.normalizeTs(raw)
      assert(norm.schema("ts").dataType == TimestampType, enc)
      norm.select(unix_micros($"ts")).head.getLong(0)
    }
    assert(instants.toSet == Set(us), s"instants diverged: $instants")
  }

  test("loader contract: legacy INT96 timestamps normalize to the same instant too") {
    // the fourth real-world encoding: Hive / legacy-Spark writers emit
    // INT96 timestamps; Spark's reader surfaces them as TimestampType,
    // so normalizeTs must pass them through unchanged — pinned here so
    // a fixture regenerated by an INT96 writer fails one named test
    import org.apache.spark.sql.types.TimestampType
    val us = 1700000000123456L
    val dir = java.nio.file.Files.createTempDirectory("graft_ts96").toString
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "INT96")
    try spark.range(1).select(timestamp_micros(lit(us)).as("ts"))
      .write.mode("overwrite").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    val norm = Tables.normalizeTs(spark.read.parquet(dir))
    assert(norm.schema("ts").dataType == TimestampType)
    assert(norm.select(unix_micros($"ts")).head.getLong(0) == us)
  }

  test("MakeScale replica keeps referential structure and multiplies cardinality") {
    // the scale-rehearsal tool must preserve the fixture's join
    // structure: every replicated lineitem joins exactly one order,
    // every order one customer, and key cardinalities multiply by N
    val out = java.nio.file.Files.createTempDirectory("graft_mkscale").toString
    graft.MakeScale.build(spark, sf, out, 3)
    val o = spark.read.parquet(s"$out/orders.parquet")
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val c = spark.read.parquet(s"$out/customer.parquet")
    val oBase = Tables.orders(spark, sf)
    assert(o.count() == 3 * oBase.count())
    assert(o.select("o_orderkey").distinct().count() == o.count(),
      "orderkeys must stay unique across copies")
    // no orphans in either direction of the fact-fact edge
    assert(li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti").count() == 0)
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count() == 0)
    // events ts normalizes after the replica round-trip as well
    assert(Tables.events(spark, out).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }
}
