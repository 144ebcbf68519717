package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expr.{HexToDecimal, IsHexCalldata, IsHexWord}

/** Decode-projection ingest operators (SURVEY §2.2 F1/F2, §2.7 C8/C9).
  *
  * The reference's ingest handler ABI-decodes raw EVM log words —
  * `events.Transfer.decode(log)` (`usdc-transfers/src/main.ts:86`) pulls
  * `{from, to, value}` out of 32-byte hex topics/data — after a
  * defensive re-check of the pushed filter (`src/main.ts:83-84`).
  *
  * The fixtures carry no raw hex, so [[synthesizeLogs]] builds the wire
  * format from `events` with engine expressions (the encode direction is
  * itself C9 marshalling), and [[decodeTransfers]] decodes it back with
  * the same machinery a real ingest would use: substring word-slicing
  * for addresses, [[graft.expr.HexToDecimal]] for uint256 amounts. The
  * roundtrip makes the decode oracle-checkable: DuckDB computes the same
  * aggregate from the *original* columns.
  */
object Ingest {

  /** 0x + 64-hex word with the id right-aligned (topic encoding). */
  def topicFromId(id: Column): Column =
    concat(lit("0x"), lpad(lower(hex(id)), 64, "0"))

  /** Address = low 20 bytes (40 hex chars) of a topic word. */
  def addressFromTopic(t: Column): Column =
    concat(lit("0x"), substring(t, 3 + 24, 40))

  /** uint256 hex word → DECIMAL(38,0) via the custom expression. */
  def uint256(data: Column): Column = HexToDecimal(data)

  /** The events source spread across cores BEFORE wire-format
    * synthesis. The fixture parquet is a single row-group (one scan
    * task), so the string concat + decode chain would otherwise run on
    * one core; the exchange here carries only the SKINNY typed source
    * columns (ids + a double), never the ~140–330-char packed strings
    * the old plan shuffled post-synthesis. An explicit repartition(n)
    * always shuffles every source row — at 100 TB this is a real
    * exchange, just a cheap one (skinny columns, round-robin, no sort)
    * relative to the decode it parallelizes — and in either case no
    * wire payload ever crosses an exchange (decode-before-shuffle, the
    * q120-vs-q128 lesson from round 6, pinned by PlanLintSpec). */
  private def parallelEvents(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)

  /** events → synthetic Transfer logs: topic1=from, topic2=to (sender
    * shifted into a disjoint id space), data=value in integer cents. */
  def synthesizeLogs(spark: SparkSession, sfDir: String): DataFrame =
    parallelEvents(spark, sfDir).select(
      col("event_id"),
      topicFromId(col("user_id")).as("topic1"),
      topicFromId(col("user_id") + 1000000L).as("topic2"),
      lpad(lower(hex(floor(col("value") * 100).cast("long"))), 64, "0").as("data"))

  /** Defensive equality re-check of the pushed filter (F2,
    * `src/main.ts:83-84`): drop any log whose topic OR data words are
    * not well-formed 0x+64-hex — the belt-and-braces predicate the
    * handler applies even though the gateway already filtered. The data
    * word is checked too: a malformed amount would otherwise survive
    * the filter and decode to a silent null (count and sum would
    * disagree downstream) instead of the row being dropped like every
    * other malformed word. [[IsHexWord]] is the codegen'd byte-scan
    * equivalent of `rlike("^0x[0-9a-f]{64}$")` without the per-row
    * regex Matcher; the data word omits the 0x prefix in this wire
    * shape, so it gets the bare-word check. */
  def defensiveFilter(logs: DataFrame): DataFrame =
    logs.filter(IsHexWord(col("topic1")) && IsHexWord(col("topic2")) &&
                IsHexWord(concat(lit("0x"), col("data"))))

  /** Decode logs back to a typed transfer frame (F1). */
  def decodeTransfers(logs0: DataFrame): DataFrame = {
    val logs = defensiveFilter(logs0)
    logs.select(
      col("event_id"),
      addressFromTopic(col("topic1")).as("from_address"),
      addressFromTopic(col("topic2")).as("to_address"),
      uint256(col("data")).as("value_cents"))
  }

  /** Encode→decode→aggregate roundtrip query: volume per sender address.
    * Oracled against the same aggregate computed directly from the
    * un-encoded columns in DuckDB. The decode stage (regex re-check +
    * big-integer parse per row) is spread across cores by
    * [[parallelEvents]] — the exchange happens on the skinny source
    * columns upstream of the string concat, never on wire strings. */
  def evmRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    decodeTransfers(synthesizeLogs(spark, sfDir))
      .groupBy(col("from_address"))
      .agg(count(lit(1)).as("n_transfers"),
           sum(col("value_cents")).cast("long").as("total_cents"))
      .orderBy("from_address")

  // ——— multi-event ABI surface (C8 breadth) ———
  //
  // The reference ABI declares 17 events (`usdc-transfers/src/abi/
  // usdc.ts:5-23`) across three word layouts: two indexed addresses +
  // a uint256 data word (Transfer :20, Approval :6, Mint :13), one
  // indexed address and NO data word (Blacklisted :9, MinterRemoved
  // :15, ...), and zero-topic markers (Pause :17). The router below
  // declares one shape per layout class; adding a new event is one
  // [[EventShape]] row. The synthetic signature words stand in for the
  // keccak topic0 constants (no keccak in this container; the router
  // only needs distinct well-formed words).

  /** Synthetic topic0 for Transfer-shaped logs. */
  val TransferSig: String = "0x" + "0" * 63 + "1"
  /** Synthetic topic0 for Approval-shaped logs. */
  val ApprovalSig: String = "0x" + "0" * 63 + "2"
  /** Synthetic topic0 for Blacklisted-shaped logs (one indexed
    * address, no second topic, no data — `usdc.ts:9`). */
  val BlacklistedSig: String = "0x" + "0" * 63 + "3"
  /** Synthetic topic0 for Mint-shaped logs (two indexed addresses +
    * uint256 amount — `usdc.ts:13`, the Transfer/Approval layout). */
  val MintSig: String = "0x" + "0" * 63 + "4"
  /** Synthetic topic0 for Burn-shaped logs (ONE indexed address +
    * uint256 amount in data — `usdc.ts:11`; also MinterConfigured's
    * layout, `usdc.ts:14`): a topic1+data word combination neither
    * Transfer nor Blacklisted exercises. */
  val BurnSig: String = "0x" + "0" * 63 + "5"
  /** Synthetic topic0 for UnBlacklisted-shaped logs (one indexed
    * address — `usdc.ts:21`, the Blacklisted layout). */
  val UnBlacklistedSig: String = "0x" + "0" * 63 + "6"
  /** Synthetic topic0 for Pause-shaped logs (NO indexed params, no
    * data — `usdc.ts:17,22`: `Pause()`/`Unpause()` carry only their
    * topic0). */
  val PauseSig: String = "0x" + "0" * 63 + "7"

  /** One declared ABI event: its topic0, decoded name, and word layout
    * (which of the indexed topics and the uint256 data word exist).
    * The wire contract is positional: absent words are NULL columns in
    * the log frame, never zero-filled. The declared set covers the
    * reference ABI's four distinct word layouts
    * (`usdc-transfers/src/abi/usdc.ts:5-23`); a new event of any
    * covered layout is one table row. */
  private case class EventShape(sig: String, name: String,
                                hasTopic2: Boolean, hasData: Boolean,
                                hasTopic1: Boolean = true)

  private val declaredEvents = Seq(
    EventShape(TransferSig, "Transfer", hasTopic2 = true, hasData = true),
    EventShape(ApprovalSig, "Approval", hasTopic2 = true, hasData = true),
    EventShape(BlacklistedSig, "Blacklisted", hasTopic2 = false, hasData = false),
    EventShape(MintSig, "Mint", hasTopic2 = true, hasData = true),
    EventShape(BurnSig, "Burn", hasTopic2 = false, hasData = true),
    EventShape(UnBlacklistedSig, "UnBlacklisted", hasTopic2 = false, hasData = false),
    EventShape(PauseSig, "Pause", hasTopic2 = false, hasData = false,
               hasTopic1 = false))

  /** events → a MIXED log stream: `signup` events encode as Approval,
    * `view` events as Blacklisted (a one-topic layout: topic2 and data
    * are absent → NULL), everything else as Transfer — the mixed-topic
    * wire shape a real contract emits into one log stream. */
  def synthesizeMixedLogs(spark: SparkSession, sfDir: String): DataFrame = {
    val oneTopic = col("event_type") === "view"
    parallelEvents(spark, sfDir).select(
      col("event_id"),
      when(col("event_type") === "signup", lit(ApprovalSig))
        .when(oneTopic, lit(BlacklistedSig))
        .otherwise(lit(TransferSig)).as("topic0"),
      topicFromId(col("user_id")).as("topic1"),
      when(oneTopic, lit(null).cast("string"))
        .otherwise(topicFromId(col("user_id") + 1000000L)).as("topic2"),
      when(oneTopic, lit(null).cast("string"))
        .otherwise(lpad(lower(hex(floor(col("value") * 100).cast("long"))), 64, "0"))
        .as("data"))
  }

  /** ABI router + decoder (the handler's `events.X.decode` dispatch,
    * `usdc-transfers/src/main.ts:85-86`, widened to the declared event
    * set): shape-aware well-formedness re-check — every PRESENT word
    * must be 0x+64-hex, every ABSENT word must be NULL (a zero-filled
    * or stray word on a one-topic event is a malformed log, dropped
    * like any other) — then route on topic0 and decode to one typed
    * frame with per-event role names collapsed to (event, addr1,
    * addr2, amount). Columns an event's layout lacks decode as NULL.
    * Logs with an undeclared topic0 are DROPPED — exactly what a typed
    * ABI handler does with events it has no decoder for. */
  def decodeAbi(logs0: DataFrame): DataFrame = {
    val wellFormed = declaredEvents.map { e =>
      val t1 = if (e.hasTopic1) IsHexWord(col("topic1")) else col("topic1").isNull
      val t2 = if (e.hasTopic2) IsHexWord(col("topic2")) else col("topic2").isNull
      val d = if (e.hasData) IsHexWord(concat(lit("0x"), col("data")))
              else col("data").isNull
      col("topic0") === lit(e.sig) && t1 && t2 && d
    }.reduce(_ || _)
    val eventName = declaredEvents.foldLeft(lit(null).cast("string")) {
      (acc, e) => when(col("topic0") === lit(e.sig), lit(e.name)).otherwise(acc)
    }
    val withTopic1 = declaredEvents.filter(_.hasTopic1).map(e => lit(e.sig))
    val withTopic2 = declaredEvents.filter(_.hasTopic2).map(e => lit(e.sig))
    val withData = declaredEvents.filter(_.hasData).map(e => lit(e.sig))
    logs0
      .filter(wellFormed)
      .select(
        col("event_id"),
        eventName.as("event"),
        when(col("topic0").isin(withTopic1: _*),
             addressFromTopic(col("topic1"))).as("addr1"),
        when(col("topic0").isin(withTopic2: _*),
             addressFromTopic(col("topic2"))).as("addr2"),
        when(col("topic0").isin(withData: _*),
             uint256(col("data"))).as("amount_cents"))
  }

  /** Approval-path roundtrip: per-owner approval count + max allowance
    * from the DECODED mixed stream. Oracled against the same aggregate
    * computed from the un-encoded columns (owner = the synthesized
    * address of user_id, rows where event_type = 'signup'). */
  def approvalRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    decodeAbi(synthesizeMixedLogs(spark, sfDir))
      .filter(col("event") === "Approval")
      .groupBy(col("addr1").as("owner_address"))
      .agg(count(lit(1)).as("n_approvals"),
           max(col("amount_cents")).cast("long").as("max_allowance_cents"))
      .orderBy("owner_address")

  /** Router visibility: decoded event mix (count + volume per declared
    * event shape) — proves both decoders ran over one stream. Oracled
    * with the equivalent CASE routing on the original columns. */
  def abiEventMix(spark: SparkSession, sfDir: String): DataFrame =
    decodeAbi(synthesizeMixedLogs(spark, sfDir))
      .groupBy(col("event"))
      .agg(count(lit(1)).as("n_logs"),
           sum(col("amount_cents")).cast("long").as("total_cents"))
      .orderBy("event")

  /** One-topic-layout roundtrip: per-account flag count for decoded
    * Blacklisted logs — proves the router decodes a layout with NO
    * second topic and NO data word (addr2/amount_cents are NULL by
    * shape, not by accident). Oracled against the `view` slice of the
    * original columns. */
  def blacklistRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    decodeAbi(synthesizeMixedLogs(spark, sfDir))
      .filter(col("event") === "Blacklisted")
      .groupBy(col("addr1").as("account_address"))
      .agg(count(lit(1)).as("n_flags"))
      .orderBy("account_address")

  /** events → the FULL-lifecycle mixed log stream over all five
    * declared layouts: `signup` encodes as Approval (two topics +
    * data), `purchase` as Mint (same layout, distinct topic0), `click`
    * as Burn (ONE topic + data), `view` as Blacklisted (one topic, no
    * data), `error` as Pause (topic0 only — no topics, no data).
    * Absent words are NULL, exactly the positional wire contract
    * [[decodeAbi]] enforces. */
  def synthesizeLifecycleLogs(spark: SparkSession, sfDir: String): DataFrame = {
    val t = col("event_type")
    val sig = when(t === "signup", lit(ApprovalSig))
      .when(t === "purchase", lit(MintSig))
      .when(t === "click", lit(BurnSig))
      .when(t === "view", lit(BlacklistedSig))
      .otherwise(lit(PauseSig)) // error (and any future type) → Pause
    // the complement of the sig chain's Pause fallback, NOT a single
    // type test: an unlisted event_type must encode a WELL-FORMED
    // topic-less Pause (a stray topic1 would make decodeAbi drop it
    // while the oracle's ELSE branch still counts it)
    val hasT1 = t.isin("signup", "purchase", "click", "view")
    val hasT2 = t.isin("signup", "purchase")
    val hasD = t.isin("signup", "purchase", "click")
    parallelEvents(spark, sfDir).select(
      col("event_id"),
      sig.as("topic0"),
      when(hasT1, topicFromId(col("user_id"))).as("topic1"),
      when(hasT2, topicFromId(col("user_id") + 1000000L)).as("topic2"),
      when(hasD, lpad(lower(hex(floor(col("value") * 100).cast("long"))), 64, "0"))
        .as("data"))
  }

  /** Full-lifecycle router roundtrip: decode the five-layout mixed
    * stream and aggregate per event — count, distinct indexed
    * addresses (0 for the topic-less Pause layout), and amount volume
    * (NULL where the layout has no data word). One query proves every
    * declared layout decodes through one router over one stream.
    * Oracled with the equivalent CASE routing on the raw columns. */
  def lifecycleRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    decodeAbi(synthesizeLifecycleLogs(spark, sfDir))
      .groupBy(col("event"))
      .agg(count(lit(1)).as("n_logs"),
           countDistinct(col("addr1")).as("n_addrs"),
           sum(col("amount_cents")).cast("long").as("amount_cents"))
      .orderBy("event")

  /** One declared ABI FUNCTION: 4-byte selector, name, and word layout
    * of its calldata (address arg first, then an optional uint256).
    * The function half of the reference ABI
    * (`usdc-transfers/src/abi/usdc.ts:26-76` declares ~50 selectors);
    * the four layouts here cover transfer/approve (addr+amount), burn
    * (amount only), balanceOf (addr only), pause (no args) — selectors
    * are the real public keccak prefixes from that table. */
  private case class FnShape(selector: String, name: String,
                             hasAddr: Boolean, hasAmount: Boolean)

  private val declaredFns = Seq(
    FnShape("a9059cbb", "transfer", hasAddr = true, hasAmount = true),
    FnShape("095ea7b3", "approve", hasAddr = true, hasAmount = true),
    FnShape("42966c68", "burn", hasAddr = false, hasAmount = true),
    FnShape("70a08231", "balanceOf", hasAddr = true, hasAmount = false),
    FnShape("8456cb59", "pause", hasAddr = false, hasAmount = false))

  private def word(i: Int): Column =
    substring(col("input"), 11 + 64 * i, 64)

  /** events → synthetic CALLDATA: one packed `0x` + selector + 32-byte
    * words string per event — the transaction-input wire shape, vs the
    * event router's separate topic columns. `purchase` encodes as
    * transfer(to, value), `signup` as approve(spender, value), `click`
    * as burn(value), `view` as balanceOf(account), `error` as pause(). */
  def synthesizeCalldata(spark: SparkSession, sfDir: String): DataFrame = {
    val t = col("event_type")
    def w(c: Column): Column = lpad(lower(hex(c)), 64, "0")
    val addrW = w(col("user_id") + 1000000L)
    val selfW = w(col("user_id"))
    val amtW = w(floor(col("value") * 100).cast("long"))
    val input = when(t === "purchase", concat(lit("0xa9059cbb"), addrW, amtW))
      .when(t === "signup", concat(lit("0x095ea7b3"), addrW, amtW))
      .when(t === "click", concat(lit("0x42966c68"), amtW))
      .when(t === "view", concat(lit("0x70a08231"), selfW))
      .otherwise(lit("0x8456cb59")) // error → pause()
    parallelEvents(spark, sfDir).select(col("event_id"), input.as("input"))
  }

  /** Selector-routed CALLDATA decoder — the function-side twin of
    * [[decodeAbi]]: route on the 4-byte selector, enforce the declared
    * layout EXACTLY (total length must match the word count — a
    * truncated word or a stray extra word is a malformed call, dropped;
    * every present word must be hex), and extract typed args by
    * position. Undeclared selectors drop like undeclared topic0s. */
  def decodeCalldata(calls: DataFrame): DataFrame = {
    val sel = substring(col("input"), 3, 8)
    // one whole-payload byte scan per candidate word count (the 0x
    // prefix, total length, and every word's hexness in a single pass —
    // [[graft.expr.IsHexCalldata]]); distinct word counts collapse to
    // at most three scans and Spark CSE dedups the repeats
    val wellFormed = declaredFns.map { f =>
      val nWords = (if (f.hasAddr) 1 else 0) + (if (f.hasAmount) 1 else 0)
      sel === lit(f.selector) && IsHexCalldata(col("input"), nWords)
    }.reduce(_ || _)
    val fnName = declaredFns.foldLeft(lit(null).cast("string")) {
      (acc, f) => when(sel === lit(f.selector), lit(f.name)).otherwise(acc)
    }
    val withAddr = declaredFns.filter(_.hasAddr).map(f => lit(f.selector))
    val amountIdx = declaredFns.filter(_.hasAmount).map { f =>
      (f.selector, if (f.hasAddr) 1 else 0)
    }
    val amount = amountIdx.foldLeft(lit(null).cast("decimal(38,0)")) {
      case (acc, (s, i)) => when(sel === lit(s), uint256(word(i))).otherwise(acc)
    }
    calls.filter(wellFormed)
      .select(
        col("event_id"),
        fnName.as("fn"),
        when(sel.isin(withAddr: _*),
             addressFromTopic(concat(lit("0x"), word(0)))).as("addr_arg"),
        amount.as("amount_cents"))
  }

  /** Calldata roundtrip: decode the five-selector mixed call stream and
    * aggregate per function — the q120 shape for the packed-string wire
    * format. Oracled with the equivalent CASE routing on raw columns. */
  def calldataRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    decodeCalldata(synthesizeCalldata(spark, sfDir))
      .groupBy(col("fn"))
      .agg(count(lit(1)).as("n_calls"),
           countDistinct(col("addr_arg")).as("n_addrs"),
           sum(col("amount_cents")).cast("long").as("amount_cents"))
      .orderBy("fn")

  /** Defensive semi-structured ingest (the F2 posture applied to JSON
    * payloads): parse a JSON string column against an explicit schema
    * in PERMISSIVE mode with a corrupt-record catch-all, so malformed
    * rows are COUNTED AND QUARANTINED instead of failing the job or
    * silently nulling — the ingest contract a 100 TB pipeline needs
    * when a fraction of upstream payloads is always broken. Returns
    * (parsed-good-rows, quarantined-raw-rows). */
  def robustJsonIngest(payloads: DataFrame, jsonCol: String,
                       schemaDDL: String): (DataFrame, DataFrame) = {
    val parsed = payloads.withColumn("__p",
      from_json(col(jsonCol), org.apache.spark.sql.types.StructType.fromDDL(
        schemaDDL + ", _corrupt_record STRING"),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")))
    // NULL payloads quarantine too: from_json(NULL) is a NULL struct
    // with a null corrupt-record marker, which would otherwise pass as
    // an all-null "good" row — the exact silent-nulling this exists to
    // prevent
    val good = parsed
      .filter(col(jsonCol).isNotNull && col("__p._corrupt_record").isNull)
      .select(col("*"), col("__p.*")).drop("__p", "_corrupt_record", jsonCol)
    val quarantined = parsed
      .filter(col(jsonCol).isNull || col("__p._corrupt_record").isNotNull)
      .drop("__p")
    (good, quarantined)
  }
}
