package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{FormatReadableSize, HexToDecimal}

/** Custom Catalyst expressions: semantics + SQL registration + codegen. */
class ExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("format_readable_size matches ClickHouse-style binary units") {
    assert(FormatReadableSize.format(0) == "0.00 B")
    assert(FormatReadableSize.format(1023) == "1023.00 B")
    assert(FormatReadableSize.format(1024) == "1.00 KiB")
    assert(FormatReadableSize.format(1536) == "1.50 KiB")
    assert(FormatReadableSize.format(1048576) == "1.00 MiB")
    assert(FormatReadableSize.format(-2048) == "-2.00 KiB")
  }

  test("format_readable_size runs inside whole-stage codegen") {
    val df = spark.range(1, 4)
      .select(FormatReadableSize(col("id") * 1024).as("r"))
    assert(df.as[String].collect().toSeq == Seq("1.00 KiB", "2.00 KiB", "3.00 KiB"))
    // UnaryExpression with doGenCode (not CodegenFallback) keeps the
    // projection inside WholeStageCodegen — rendered as the `*(n)` prefix
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("format_readable_size"))
  }

  test("hex_to_decimal: 64-bit, >64-bit, 0x prefix, garbage, overflow") {
    FormatReadableSize.register(spark)
    HexToDecimal.register(spark)
    val got = spark.sql("""SELECT
        hex_to_decimal('ff'),
        hex_to_decimal('0xff'),
        hex_to_decimal('00000000000000000000000000000000000000000000000000000000000000ff'),
        hex_to_decimal('de0b6b3a7640000'),
        hex_to_decimal(repeat('ff', 32)),
        hex_to_decimal('zz')""").head
    assert(got.getDecimal(0).longValueExact == 255L)
    assert(got.getDecimal(1).longValueExact == 255L)
    assert(got.getDecimal(2).longValueExact == 255L)
    assert(got.getDecimal(3).toBigInteger == new java.math.BigInteger("1000000000000000000"))
    assert(got.isNullAt(4)) // uint256 max has 78 digits > DECIMAL(38)
    assert(got.isNullAt(5)) // invalid hex → null, not an exception
  }

  test("hex_to_decimal boundaries: 38-digit ceiling, 128-bit branch, signs") {
    HexToDecimal.register(spark)
    val one = java.math.BigInteger.ONE
    val max38 = new java.math.BigInteger("9" * 38) // 10^38 - 1
    val p63 = one.shiftLeft(63)                    // 2^63: > Long.MaxValue
    val p64 = one.shiftLeft(64)                    // 2^64: hi word nonzero
    val got = spark.sql(s"""SELECT
        hex_to_decimal('${max38.toString(16)}'),
        hex_to_decimal('${max38.add(one).toString(16)}'),
        hex_to_decimal('${p63.toString(16)}'),
        hex_to_decimal('${p64.toString(16)}'),
        hex_to_decimal('1${"0" * 32}'),
        hex_to_decimal('-ff'),
        hex_to_decimal('+ff')""").head
    assert(got.getDecimal(0).toBigInteger == max38) // ceiling accepted
    assert(got.isNullAt(1))                         // 10^38 overflows
    assert(got.getDecimal(2).toBigInteger == p63)   // beyond compact-long
    assert(got.getDecimal(3).toBigInteger == p64)   // 128-bit hi ≠ 0
    assert(got.isNullAt(4))                         // 33 significant nibbles
    // a sign is not valid hex for a uint word — pinned contract (the old
    // BigInteger(s, 16) parse accepted '-ff' as -255)
    assert(got.isNullAt(5))
    assert(got.isNullAt(6))
  }

  test("is_hex_word: exact 0x+64-lowercase-hex byte scan") {
    import graft.expr.IsHexWord
    val word = "0x" + "0" * 24 + "a" * 40
    val cases = Seq(
      word            -> true,
      word.toUpperCase.replace("0X", "0x") -> false, // uppercase hex
      ("0X" + "a" * 64) -> false,                    // uppercase prefix
      (word + "\n")   -> false,                      // trailing newline
      word.dropRight(1) -> false,                    // 65 bytes
      (word + "a")    -> false,                      // 67 bytes
      ("0x" + "g" * 64) -> false,                    // non-hex byte
      ("0x" + "é" * 32) -> false,                    // non-ASCII (64 chars)
      ""              -> false)
    cases.foreach { case (s, want) =>
      assert(IsHexWord.check(org.apache.spark.unsafe.types.UTF8String.fromString(s)) == want,
             s"IsHexWord($s)")
    }
    // null-intolerant UnaryExpression: null in → null out (drops in filters)
    val viaDf = Seq(Some(word), None).toDF("w")
      .select(IsHexWord(col("w")).as("ok")).collect()
    assert(viaDf(0).getBoolean(0) && viaDf(1).isNullAt(0))
  }

  test("is_hex_calldata: exact 0x + selector + n-word byte scan") {
    import graft.expr.IsHexCalldata
    import org.apache.spark.unsafe.types.UTF8String
    def chk(s: String, words: Int) =
      IsHexCalldata.check(UTF8String.fromString(s), words)
    val sel = "0xa9059cbb"
    val w = "0" * 24 + "a" * 40
    // words = 0: selector-only payload (pause())
    assert(chk(sel, 0))
    assert(!chk(sel, 1))            // declared 1 word, got none
    assert(!chk(sel + w, 0))        // declared 0 words, got one
    // exact length is the contract: off-by-one either way fails
    assert(chk(sel + w + w, 2))
    assert(!chk(sel + w + w.dropRight(1), 2)) // truncated last word
    assert(!chk(sel + w + w + "a", 2))        // stray trailing nibble
    // casing and prefix
    assert(!chk(("0x" + "A9059CBB"), 0))      // uppercase hex
    assert(!chk("0X" + sel.drop(2), 0))       // uppercase prefix
    assert(!chk("00" + sel.drop(2), 0))       // missing 0x
    assert(!chk(sel.dropRight(1) + "g", 0))   // non-hex byte in selector
    assert(!chk(sel + w.dropRight(1) + "g", 1)) // non-hex byte in word
    assert(!chk("", 0))
    // null-intolerant: null in → null out (drops in filters)
    val viaDf = Seq(Some(sel), None).toDF("c")
      .select(IsHexCalldata(col("c"), 0).as("ok")).collect()
    assert(viaDf(0).getBoolean(0) && viaDf(1).isNullAt(0))
  }

  test("is_hex_payload: 0x + selector + any whole number of words") {
    import graft.expr.IsHexPayload
    import org.apache.spark.unsafe.types.UTF8String
    def chk(s: String) = IsHexPayload.check(UTF8String.fromString(s))
    val sel = "0xa9059cbb"
    val w = "0" * 24 + "a" * 40
    // any whole word count passes — the router's length CASE pins it
    assert(chk(sel) && chk(sel + w) && chk(sel + w * 9))
    // a non-whole word tail fails regardless of hexness
    assert(!chk(sel + w.dropRight(1)))
    assert(!chk(sel + w + "a"))
    assert(!chk(sel.dropRight(1)))  // truncated selector
    assert(!chk("0X" + sel.drop(2) + w)) // uppercase prefix
    assert(!chk(sel.toUpperCase))        // uppercase hex
    assert(!chk(sel + w.dropRight(1) + "g")) // non-hex byte
    assert(!chk(""))
    // null-intolerant: null in → null out (drops in filters)
    val viaDf = Seq(Some(sel + w), None).toDF("c")
      .select(IsHexPayload(col("c")).as("ok")).collect()
    assert(viaDf(0).getBoolean(0) && viaDf(1).isNullAt(0))
    // and it runs inside whole-stage codegen
    val df = spark.range(1, 4)
      .select(IsHexPayload(
        concat(lit("0xa9059cbb"), lpad(lower(hex(col("id"))), 64, "0"))).as("ok"))
    assert(df.as[Boolean].collect().forall(identity))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("is_hex_payload"))
  }

  test("is_hex_calldata runs inside whole-stage codegen") {
    import graft.expr.IsHexCalldata
    val df = spark.range(1, 4)
      .select(IsHexCalldata(
        concat(lit("0xa9059cbb"), lpad(lower(hex(col("id"))), 64, "0")), 1).as("ok"))
    assert(df.as[Boolean].collect().forall(identity))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("is_hex_calldata"))
  }

  test("is_hex_word runs inside whole-stage codegen") {
    import graft.expr.IsHexWord
    val df = spark.range(1, 4)
      .select(IsHexWord(concat(lit("0x"), lpad(lower(hex(col("id"))), 64, "0"))).as("ok"))
    assert(df.as[Boolean].collect().forall(identity))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("is_hex_word"))
  }

  test("graft_dot is bit-identical to the sequential HOF fold") {
    import graft.expr.DotProduct
    val df = Tables.embeddings(spark, TestSpark.sf).limit(50)
      .select(col("vec_id"), col("embedding"))
    val both = df
      .withColumn("d", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("hof",
        expr("aggregate(zip_with(d, d, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"))
      .withColumn("native", DotProduct(col("embedding"), col("embedding")))
      .select("hof", "native").collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("graft_dot handles float x double, length mismatch, and nulls") {
    import graft.expr.DotProduct
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Some(Array(2.0, 0.5, 1.0))),
      (Array(1.0f, 2.0f, 3.0f), Some(Array(10.0))),
      (Array(1.0f), None)
    ).toDF("f", "d")
    val got = DotProduct.register(spark) match { case _ =>
      df.selectExpr("graft_dot(f, d) AS x").collect()
    }
    assert(got(0).getDouble(0) == 1.0 * 2.0 + 2.0 * 0.5 + 3.0 * 1.0)
    assert(got(1).getDouble(0) == 10.0) // shorter side bounds the loop
    assert(got(2).isNullAt(0))
    // a null ELEMENT contributes 0, identically in interpreted + codegen
    val withNullElem = spark.sql(
      "SELECT graft_dot(array(1.0D, CAST(NULL AS DOUBLE), 3.0D), " +
      "array(2.0D, 5.0D, 4.0D)) AS x").collect()
    assert(withNullElem(0).getDouble(0) == 1.0 * 2.0 + 3.0 * 4.0)
  }

  test("Functions.registerAll exposes the full SQL surface") {
    graft.Functions.registerAll(spark)
    val r = spark.sql(
      """SELECT format_readable_size(1536.0) AS a,
         hex_to_decimal('ff') AS b,
         graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS c""").head()
    assert(r.getString(0) == "1.50 KiB")
    assert(r.getDecimal(1).intValue == 255)
    assert(r.getDouble(2) == 11.0)
    // the KLL family from pure SQL: state → merge → quantile
    val p = spark.sql(
      """SELECT graft_kll_quantile(graft_kll_merge(st), 0.5) AS p50 FROM (
           SELECT graft_kll_agg(CAST(id AS DOUBLE), 200) AS st
           FROM range(10000) GROUP BY id % 8)""").head().getDouble(0)
    assert(math.abs(p - 5000.0) / 10000 <= 0.03, s"SQL-surface p50 $p")
  }

  test("graft_dot runs inside whole-stage codegen") {
    import graft.expr.DotProduct
    val plan = Tables.embeddings(spark, TestSpark.sf)
      .select(DotProduct(col("embedding"), col("embedding")).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(")) // WholeStageCodegen span covers the project
  }

  test("KLL aggregates: distributed build/merge within rank error; empty is NULL") {
    import graft.expr.Kll
    import spark.implicits._
    // 1..20000 across 16 partitions: p50 within the k=200 rank bound,
    // and nulls in the input are skipped like every SQL aggregate
    val n = 20000
    val df = (1 to n).map(i => (i % 7, i.toDouble)).toDF("g", "v")
      .repartition(16)
      .union(Seq((0, Option.empty[Double])).toDF("g", "v")) // a null row
    val est = df.agg(Kll.quantile(Kll.agg($"v", 200), 0.5).as("p50"))
      .head().getDouble(0)
    assert(math.abs(est - n / 2.0) / n <= 0.03, s"p50 estimate $est vs ${n / 2}")
    // merge of per-group states ≡ (in rank error) one global state
    val states = df.groupBy($"g").agg(Kll.agg($"v", 200).as("st"))
    val merged = states.agg(Kll.quantile(Kll.merge($"st", 200), 0.95).as("p95"))
      .head().getDouble(0)
    assert(math.abs(merged - 0.95 * n) / n <= 0.03, s"merged p95 $merged")
    // an empty sketch estimates to NULL (SQL empty-group semantics)
    val emptyState =
      org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200).toByteArray
    val row = Seq(Tuple1(emptyState)).toDF("st")
      .select(Kll.quantile($"st", 0.5).as("p")).head()
    assert(row.isNullAt(0), "empty KLL state must estimate to NULL")
  }

  test("r19 series-fold kernels: moving sum/avg ring buffer, EMA fold, " +
       "delta-state fold — values, empties, null elements, type guards") {
    import org.apache.spark.sql.graftx.Bridge
    import graft.expr.{DeltaStateFold, EmaFold, MovingAvgArr, MovingSumCsv}
    def seqCol = {
      // (ts, event_id, c) struct series — measure LAST, sorted
      val rows = Seq((1L, 10L), (2L, 20L), (3L, 5L), (4L, 40L))
        .map { case (id, c) => (id, c) }
      rows.toDF("event_id", "c")
        .agg(sort_array(collect_list(struct($"event_id", $"c"))).as("seq"))
    }
    val ms = seqCol.select(Bridge.column(MovingSumCsv(
      Bridge.expressionEager($"seq"), 3)).as("m")).as[String].head()
    assert(ms == "10,30,35,65", s"k=3 ring-buffer sums: $ms")
    val ma = seqCol.select(Bridge.column(MovingAvgArr(
      Bridge.expressionEager($"seq"), 3)).as("m")).as[Seq[Double]].head()
    assert(ma == Seq(10.0 / 3, 30.0 / 3, 35.0 / 3, 65.0 / 3),
      s"always-k divisor (ClickHouse's rule), including the head: $ma")
    val ema = seqCol.select(Bridge.column(EmaFold(
      Bridge.expressionEager($"seq"), 0.5)).as("e")).as[Double].head()
    // ((10*.5+? seed 10) -> 20*.5+10*.5=15 -> 5*.5+15*.5=10 -> 40*.5+10*.5=25
    assert(ema == 25.0, s"EMA fold seeded at the first value: $ema")
    // empty series: EMA is NULL, csv empty, avg array empty
    val empty = Seq.empty[(Long, Long)].toDF("event_id", "c")
      .agg(sort_array(collect_list(struct($"event_id", $"c"))).as("seq"))
    assert(empty.select(Bridge.column(EmaFold(
      Bridge.expressionEager($"seq"), 0.5))).head().isNullAt(0),
      "empty series must fold to NULL")
    assert(empty.select(Bridge.column(MovingSumCsv(
      Bridge.expressionEager($"seq"), 3))).as[String].head() == "")
    // delta-state fold: two day buckets with a positive boundary climb
    // (5 -> 9 adds 4) and one with a reset boundary (contributes 0)
    val states = Seq(
      (java.sql.Date.valueOf("2024-01-01"), 3L, 5L, 7L),
      (java.sql.Date.valueOf("2024-01-02"), 9L, 2L, 11L),
      (java.sql.Date.valueOf("2024-01-03"), 1L, 6L, 13L))
      .toDF("day", "first", "last", "dsum")
      .agg(sort_array(collect_list(struct($"day", $"first", $"last", $"dsum")))
        .as("st"))
    val total = states.select(Bridge.column(DeltaStateFold(
      Bridge.expressionEager($"st")))).as[Long].head()
    assert(total == 7 + 11 + 13 + 4,
      s"bucket dsums + the one positive boundary term: $total")
    // type guard: a non-long trailing measure refuses at analysis
    val bad = Seq((1, "x")).toDF("a", "b")
      .agg(collect_list(struct($"a", $"b")).as("seq"))
    val err = intercept[Exception] {
      bad.select(Bridge.column(MovingSumCsv(
        Bridge.expressionEager($"seq"), 3))).collect()
    }
    assert(err.getMessage.contains("measure"), err.getMessage)
    // null-measure contract (r19 review finding): a dropped element
    // would silently shift positions vs the raw window spelling the
    // kernels share oracles with — refuse loudly instead
    val withNull = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("event_id", "c")
      .agg(sort_array(collect_list(struct($"event_id", $"c"))).as("seq"))
    val nullErr = intercept[Exception] {
      withNull.select(Bridge.column(MovingSumCsv(
        Bridge.expressionEager($"seq"), 3))).collect()
    }
    assert(nullErr.getMessage.contains("null measure") ||
      Option(nullErr.getCause).exists(_.getMessage.contains("null measure")),
      s"a null measure must refuse loudly: ${nullErr.getMessage}")
  }
}
