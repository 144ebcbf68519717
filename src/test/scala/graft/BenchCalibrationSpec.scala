package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's r17 self-calibration, pinned as pure logic: a uniform
  * machine slowdown must NOT flag rows (r16's +28% headline was noise
  * that cost a judge re-measurement), while a genuine regression must
  * be flagged even ON a slow machine — and near-miss escapes like
  * r16's q92/q104/q194 (2.3–3.2× band, under the old 2×+0.3 trigger)
  * must now fire. */
class BenchCalibrationSpec extends AnyFunSuite {
  private val sentinels = Set("q01", "q08", "q09", "q23", "q68", "q89")
  private val bands = Map(
    "q01" -> 0.5, "q08" -> 0.25, "q09" -> 0.8, "q23" -> 0.3,
    "q68" -> 1.0, "q89" -> 0.6, "q92" -> 0.3, "q104" -> 0.6)

  private def run(rows: (String, Double)*): (Double, Seq[String]) =
    Bench.calibrate(rows, Set.empty, bands, sentinels)

  test("an idle run reports factor 1.0 and flags nothing in-band") {
    val (f, out) = run(
      "q01_a" -> 0.5, "q08_b" -> 0.25, "q09_c" -> 0.8, "q23_d" -> 0.3,
      "q68_e" -> 1.0, "q89_f" -> 0.6, "q92_g" -> 0.3, "q104_h" -> 0.6)
    assert(f == 1.0 && out.isEmpty, s"($f, $out)")
  }

  test("a uniform 1.35x machine slowdown normalizes away: rows at " +
       "1.35x band are NOT out-of-band (the r16 false headline)") {
    val (f, out) = run(
      "q01_a" -> 0.675, "q08_b" -> 0.3375, "q09_c" -> 1.08,
      "q23_d" -> 0.405, "q68_e" -> 1.35, "q89_f" -> 0.81,
      "q92_g" -> 0.405, "q104_h" -> 0.81)
    assert(math.abs(f - 1.35) < 1e-9, s"factor must be the uniform ratio: $f")
    assert(out.isEmpty, s"uniformly-inflated rows must not flag: $out")
  }

  test("the r16 escapes fire even on a slow machine: q92 at 2.6x band " +
       "and q104 at 2.3x band flag under the 1.5x+0.2 trigger") {
    // sentinels at 1.35x (machine state), the two suspects genuinely hot
    val (f, out) = run(
      "q01_a" -> 0.675, "q08_b" -> 0.3375, "q09_c" -> 1.08,
      "q23_d" -> 0.405, "q68_e" -> 1.35, "q89_f" -> 0.81,
      "q92_g" -> 0.3 * 2.6 * 1.35, "q104_h" -> 0.6 * 2.3 * 1.35)
    assert(math.abs(f - 1.35) < 1e-9)
    assert(out.toSet == Set("q92_g", "q104_h"),
      s"both residual-hot rows must flag after normalization: $out")
  }

  test("a HALF-contended run takes the true middle-pair median, not " +
       "the upper-middle element — a residual-hot row still flags") {
    // three sentinels idle, three at 1.5x: true median 1.25 (the
    // upper-middle 1.5 would normalize 2.2x/1.5 = 1.47x under the
    // trigger and let the regression escape — the r16 class again)
    val rows = Seq(
      "q01_a" -> 0.5, "q08_b" -> 0.25, "q09_c" -> 0.8,
      "q23_d" -> 0.45, "q68_e" -> 1.5, "q89_f" -> 0.9,
      "q92_g" -> 0.3 * 2.9) // 2.9x band; 2.9/1.25 = 2.32 > 1.5 + 0.2/0.3
    val (f, out) = run(rows: _*)
    assert(math.abs(f - 1.25) < 1e-9, s"even-count median must average the middle pair: $f")
    assert(out == Seq("q92_g"), s"the residual-hot row must flag: $out")
  }

  test("no sentinel bands -> factor 1.0 (subset runs never divide by " +
       "a guess); failed queries never enter the factor or the flags") {
    val (f, out) = Bench.calibrate(
      Seq("q92_g" -> 5.0, "q104_h" -> 0.6), Set("q92_g"),
      bands, sentinels)
    assert(f == 1.0 && out.isEmpty, s"($f, $out)")
  }

  test("a query without a band is new and never flagged") {
    val (_, out) = run("q01_a" -> 0.5, "q260_new" -> 99.0)
    assert(out.isEmpty, s"band-less queries must not flag: $out")
  }

  test("factor corroboration (r18, the r17 advice): a flat solo " +
       "sentinel says contention, an inflated one says the ENGINE " +
       "regressed; sub-threshold factors skip the check") {
    assert(Bench.factorVerdict(1.1, None) == "not_needed",
      "a factor inside the threshold needs no corroboration")
    assert(Bench.factorVerdict(1.5, Some(1.02)) == "contention",
      "a flat isolated sentinel confirms machine state")
    assert(Bench.factorVerdict(1.5, Some(1.48)) == "engine_regression",
      "a solo run matching the factor means the engine itself slowed")
    assert(Bench.factorVerdict(1.5, None) == "unverified",
      "a failed solo run must be reported, never silently dropped")
  }

  test("the corroboration sentinel is the MEDIAN witness — nearest " +
       "the factor, not an outlier like r17's q01 wobble") {
    // q01 at 1.76x its band (the r17 driver-run wobble), q89 failed
    // (excluded), the rest spread around 1.35x: the odd-count median
    // IS q68's ratio, so the pick is q68 at distance zero — never q01
    val rows = Seq(
      "q01_a" -> 0.5 * 1.76, "q08_b" -> 0.25 * 1.2, "q09_c" -> 0.8 * 1.3,
      "q23_d" -> 0.3 * 1.4, "q68_e" -> 1.0 * 1.35, "q89_f" -> 0.6)
    val failed = Set("q89_f")
    val (f, _) = Bench.calibrate(rows, failed, bands, sentinels)
    assert(math.abs(f - 1.35) < 1e-9, s"factor: $f")
    val pick = Bench.corroborationPick(rows, failed, bands, sentinels, f)
    assert(pick.contains("q68_e"),
      s"the pick must be the sentinel nearest the factor $f: $pick")
    // the failed sentinel is never picked, even as runner-up
    val pick2 = Bench.corroborationPick(rows, failed + "q68_e", bands,
      sentinels, f)
    assert(pick2.isDefined && !pick2.contains("q68_e") &&
      !pick2.contains("q89_f") && !pick2.contains("q01_a"),
      s"failed sentinels and outliers must not be picked: $pick2")
  }
}
