package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Statistical moments over the SUM vocabulary (round 15). ClickHouse
  * ships `varSampState` / `corrState` as dedicated mergeable states;
  * on this engine they need NO new member: every moment is scalar
  * arithmetic over exact-decimal sums — n, Σx, Σx², Σy, Σy², Σxy —
  * and those are ordinary [[graft.plans.RollupRouting.SumOf]] pattern
  * demands (the squared/product measures are ExprPat measures like
  * any revenue expression). The aggregate node carries only the six
  * sums; the variance/stddev/corr arithmetic lives in a Project above
  * it, so the router rewrites the sums onto rollup partials and the
  * Project rides along untouched — `varSampMerge` for free. Exactness:
  * the double products are IEEE-identical on both engines, the sums
  * exact DECIMAL(38,6) ([[Fns.dsum]]), and the final double division/
  * sqrt single IEEE ops — hash-stable against DuckDB, which no
  * double-native Welford implementation is.
  *
  * Numerical note, honestly stated: the textbook (Σx² − (Σx)²/n)
  * form cancels catastrophically when stddev ≪ mean — the reason
  * Spark/DuckDB use Welford internally for their own var_samp. Here
  * the EXACT decimal sums remove the summation error entirely; the
  * one subtraction is performed in double at the end, which for MV
  * serving (the exact sums are what the rollup stores) is the right
  * trade: bit-reproducible, mergeable at any regrouping, and wrong
  * only in the last ~ulp·(mean/std)² digits — documented, and the
  * fixture's spreads keep it far inside double precision. */
object Moments {

  /** Driver entry (q224, oracled): mean / var_samp / stddev_samp of
    * lineitem quantity and the quantity-discount covariance/
    * correlation per return flag — every input an exact-decimal sum,
    * mined by the advisor as ordinary SumOf demands. Measure choice
    * is an ORACLE constraint, honestly stated: the cross-engine hash
    * needs the final decimal→double casts bit-identical, which holds
    * only while a sum's unscaled value stays inside double's exact
    * 2^53 range (all existing dsum oracles do) — squares of
    * l_extendedprice blow past it and the two engines' last-ulp
    * rounding of the SAME exact decimal diverges (measured:
    * var_price differed at the 16th digit). Quantity/discount squares
    * stay exact at any fixture sf; the ENGINE-side decimal(38,6)
    * partials themselves are nowhere near overflow either way. */
  def momentsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val agg = li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        Fns.dsum(col("l_quantity")).as("s_q"),
        Fns.dsum(col("l_quantity") * col("l_quantity")).as("ss_q"),
        Fns.dsum(col("l_discount")).as("s_d"),
        Fns.dsum(col("l_discount") * col("l_discount")).as("ss_d"),
        Fns.dsum(col("l_quantity") * col("l_discount")).as("s_qd"))
    val n = col("n").cast("double")
    val mQ = col("ss_q") - col("s_q") * col("s_q") / n
    val mD = col("ss_d") - col("s_d") * col("s_d") / n
    val mQD = col("s_qd") - col("s_q") * col("s_d") / n
    // degenerate groups follow SQL var_samp/corr semantics: a single
    // row has no sample variance (NULL, not Infinity from the n−1
    // division) and a zero-variance column has no correlation (NULL,
    // not NaN from the 0/0) — the oracle spells the same CASE guards
    val varQ = when(col("n") > 1, mQ / (n - 1))
    agg.select(
        col("l_returnflag"), col("n"),
        (col("s_q") / n).as("mean_qty"),
        varQ.as("var_qty"),
        sqrt(varQ).as("std_qty"),
        when(col("n") > 1, mQD / (n - 1)).as("covar_qty_disc"),
        when(col("n") > 1 && mQ * mD > 0, mQD / sqrt(mQ * mD))
          .as("corr_qty_disc"))
      .orderBy("l_returnflag")
  }

  /** Driver entry (q225, oracled — shares q224's oracle): the SAME
    * moments dashboard ADVISED and ROUTED. The six sum demands (four
    * of them pattern measures — the squares and the cross product)
    * mine into one (l_returnflag)-keyed grainless spec; the routed
    * read re-aggregates six partial columns and the moment arithmetic
    * above the aggregate is untouched. The fact is never scanned —
    * ClickHouse's varSampState/corrState economics from the sum
    * vocabulary alone. */
  def momentsAdvised(spark: SparkSession, sfDir: String): DataFrame = {
    val root = StarJoins.scratch(sfDir, "advised_moments")
    val advice = graft.plans.Advisor.advise(Seq(momentsRaw(spark, sfDir)), root)
    require(advice.singles.size == 1 && advice.skipped.isEmpty,
      s"advisor unexpectedly skipped: ${advice.skipped}")
    graft.plans.Advisor.runRouted(spark, advice) { momentsRaw(spark, sfDir) }
  }
}
