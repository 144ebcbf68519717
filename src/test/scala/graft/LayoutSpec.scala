package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Layouts

/** Z-order layout invariants: the Morton curve itself, and the pruning
  * claim — a Z-clustered layout prunes range scans on BOTH dimensions
  * where a single-column sort prunes only its own. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("morton interleave round-trips bit positions") {
    import graft.expr.ZValue.{interleave, spread}
    assert(spread(0L) == 0L && spread(1L) == 1L && spread(2L) == 4L)
    assert(interleave(0, 1) == 2L) // b's bit 0 lands at position 1
    assert(interleave(3, 0) == 5L) // a's bits land at 0 and 2
    // adjacent cells differ in few curve positions: monotone in each
    // dim when the other is fixed
    val zs = (0L until 16L).map(interleave(_, 7L))
    assert(zs == zs.sorted && zs.distinct.size == 16)
    // SQL surface
    Functions.registerAll(spark)
    assert(spark.sql("SELECT graft_zval(3, 0) AS z").head.getLong(0) == 5L)
  }

  test("rank normalization densifies a skewed dim into balanced buckets") {
    val skewed = Tables.events(spark, sf)
      .select(floor(col("value")).cast("long").as("d")) // heavy low-value skew
    val n = Layouts.rankNormalize(skewed, "d", 16, "rk")
    val stats = n.groupBy($"rk").count()
      .agg(min($"count"), max($"count"), countDistinct($"rk"))
      .head()
    assert(stats.getLong(2) == 16) // all buckets used
    assert(n.agg(max($"rk")).head.getLong(0) == 15L)
  }

  test("z-clustering prunes both dimensions, linear sort only one") {
    // comparable-range dims (the ZValue normalization precondition):
    // d1 ~ [0, 250], d2 ~ [0, 330] at sf0.001
    val base = Tables.events(spark, sf)
      .select(expr("event_id DIV 4").cast("long").as("d1"),
              floor(col("value")).cast("long").as("d2"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val nFiles = 16
    Layouts.writeZClustered(base, "d1", "d2", s"$tmp/z", nFiles)
    Layouts.writeLinear(base, "d1", s"$tmp/l", nFiles)

    val d1Span = base.agg(max($"d1")).head.getLong(0)
    val (lo1, hi1) = (d1Span * 11 / 20, d1Span * 11 / 20 + d1Span / 10)
    val d2Span = base.agg(max($"d2")).head.getLong(0)
    // two d2 probes: the dense low-value region (holds most rows — a
    // stats-pruned scan legitimately touches many files there) and a
    // sparse mid slice (where pruning should be near-total)
    val (lo2d, hi2d) = (0L, d2Span / 10)
    val (lo2s, hi2s) = (d2Span * 11 / 20, d2Span * 11 / 20 + d2Span / 10)

    def cand(dir: String, onA: Boolean, lo: Long, hi: Long) =
      Layouts.candidateFiles(spark, s"$tmp/$dir", "d1", "d2", onA, lo, hi)

    // linear d1-sort is optimal on its own dim; z pays a bounded factor
    assert(cand("l", onA = true, lo1, hi1) <= cand("z", onA = true, lo1, hi1))
    assert(cand("z", onA = true, lo1, hi1) < nFiles / 2)
    // on d2 the linear layout is (near-)useless while z still prunes:
    // strictly better on both probes, near-total on the sparse slice
    assert(cand("z", onA = false, lo2d, hi2d) < cand("l", onA = false, lo2d, hi2d))
    assert(cand("z", onA = false, lo2s, hi2s) < cand("l", onA = false, lo2s, hi2s))
    assert(cand("z", onA = false, lo2s, hi2s) <= nFiles / 4)
  }
}
