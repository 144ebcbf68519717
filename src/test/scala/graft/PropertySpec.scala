package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generated properties for the engine's core invariants
  * (SURVEY §5.2): the algebra that makes rollups, salting, and CDC
  * collapse safe at scale must hold for arbitrary inputs, not just the
  * fixtures. (Generators sampled with fixed seeds — the scalatest
  * bridge artifact is not in the offline cache.)
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val doubles: Gen[List[Double]] =
    Gen.listOfN(60, Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v * 100) / 100))

  test("property: as-of trilogy — composed, native broadcast, and model agree") {
    // narrow key/ts domains force the edge semantics: equal-timestamp
    // ties (the inclusive right.ts <= left.ts rule), keys with no right
    // row (null match), several rights per instant, duplicate lefts
    val gen = Gen.zip(
      Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 20L),
                              Gen.chooseNum(0L, 999L))),
      Gen.listOfN(25, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 20L))))
    for ((ls, rs) <- samples(gen, 5) if ls.nonEmpty) {
      val left = ls.toDF("k", "t", "id")
        .withColumn("ts", timestamp_micros($"t")).drop("t")
      val right = rs.toDF("k", "t")
        .withColumn("ts", timestamp_micros($"t")).drop("t")
      def shape(df: org.apache.spark.sql.DataFrame) = df
        .select($"id", $"k", unix_micros($"ts").as("lt"),
                unix_micros($"__asof.ts").as("mt"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                   if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .sortBy(x => (x._1, x._2, x._3, x._4.getOrElse(Long.MinValue)))
        .toSeq
      val composed = shape(
        graft.ops.AsOf.asofJoin(left, right, Seq("k"), "ts", "ts"))
      val native = shape(
        graft.plans.BroadcastAsOf.join(left, right, Seq("k"), "ts", "ts"))
      val byKey = rs.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sorted }
      val model = ls.map { case (k, t, id) =>
        (id, k, t, byKey.getOrElse(k, Nil).takeWhile(_ <= t).lastOption)
      }.sortBy(x => (x._1, x._2, x._3, x._4.getOrElse(Long.MinValue))).toSeq
      assert(composed == model, "composed form diverges from the model")
      assert(native == model, "native broadcast form diverges from the model")
    }
  }

  test("property: morton interleave is a bijection on 32-bit pairs") {
    def deinterleave(z: Long): (Long, Long) = {
      var a = 0L; var b = 0L
      var i = 0
      while (i < 32) {
        a |= ((z >>> (2 * i)) & 1L) << i
        b |= ((z >>> (2 * i + 1)) & 1L) << i
        i += 1
      }
      (a, b)
    }
    val pairs: Gen[(Long, Long)] =
      Gen.zip(Gen.chooseNum(0L, 0xFFFFFFFFL), Gen.chooseNum(0L, 0xFFFFFFFFL))
    for ((a, b) <- samples(pairs, 200)) {
      assert(deinterleave(graft.expr.ZValue.interleave(a, b)) == ((a, b)))
    }
    // order preservation within a fixed other-dimension
    for ((a, b) <- samples(pairs, 50)) {
      val a2 = a / 2
      assert((graft.expr.ZValue.interleave(a2, b) <=
              graft.expr.ZValue.interleave(a, b)) == (a2 <= a))
    }
  }

  test("property: decimal-routed sum is partition-count invariant") {
    for ((xs, parts) <- samples(Gen.zip(doubles, Gen.chooseNum(1, 12)), 8)
         if xs.nonEmpty) {
      val df = xs.toDF("x")
      val a = df.repartition(parts).agg(graft.ops.Fns.dsum($"x")).head.getDouble(0)
      val b = df.coalesce(1).agg(graft.ops.Fns.dsum($"x")).head.getDouble(0)
      assert(a == b, s"parts=$parts") // plain double sums would drift
    }
  }

  test("property: A6 — two-level reaggregation equals direct aggregation") {
    val rows = Gen.listOfN(50,
      Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 3L),
              Gen.chooseNum(-1e4, 1e4).map(v => math.rint(v * 100) / 100)))
    for (xs <- samples(rows, 6) if xs.nonEmpty) {
      val df = xs.toDF("k1", "k2", "v")
      val direct = df.groupBy($"k1")
        .agg(sum($"v".cast("decimal(38,6)")).cast("double").as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val twoLevel = df.groupBy($"k1", $"k2")
        .agg(sum($"v".cast("decimal(38,6)")).as("p"))
        .groupBy($"k1").agg(sum($"p").cast("double").as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(direct == twoLevel)
    }
  }

  test("property: collapse matches the keep-last model for any changelog order") {
    val rows = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 100L), Gen.oneOf(1, -1)))
    for (xs <- samples(rows, 6)) {
      // distinct (key, version): version ties make keep-last ambiguous
      val uniq = xs.groupBy(t => (t._1, t._2)).map(_._2.head).toList
      if (uniq.nonEmpty) {
        val df = uniq.toDF("k", "_version", "_sign")
        val got = graft.ops.Collapse.collapse(df.orderBy(rand(1)), Seq("k"))
          .select("k", "_version").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val model = uniq.groupBy(_._1).flatMap { case (k, g) =>
          val last = g.maxBy(_._2)
          if (last._3 == 1) Some((k, last._2)) else None
        }.toSet
        assert(got == model)
      }
    }
  }

  test("property: histogram buckets partition any input exactly") {
    for (xs <- samples(doubles, 8) if xs.nonEmpty) {
      val bucketed = xs.toDF("value").withColumn("b",
        when($"value" < 25, "small").when($"value" < 100, "medium")
          .when($"value" < 500, "large").otherwise("whale"))
        .groupBy($"b").count()
      assert(bucketed.agg(sum($"count")).head.getLong(0) == xs.length)
    }
  }

  test("property: chunk boundaries are well-formed for arbitrary text") {
    val texts = Gen.listOfN(40, Gen.chooseNum(0, 2000).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(8 -> Gen.alphaNumChar, 2 -> Gen.const(' ')))))
    for (ts <- samples(texts, 4); t <- ts) {
      val ends = graft.llm.Dedup.chunkEnds(t)
      assert(ends.lastOption.contains(t.length))
      assert(ends == ends.sorted && ends.distinct == ends)
      val lens = (0 +: ends).sliding(2).map { case Seq(a, b) => b - a }.toSeq
      // every chunk ≤ maxLen; only the final chunk may undercut minLen
      assert(lens.forall(_ <= 512))
      assert(lens.dropRight(1).forall(_ >= 32), s"short non-final chunk in $lens")
    }
  }

  test("property: native top-k equals window rank for arbitrary data") {
    val rows = Gen.listOfN(80,
      Gen.zip(Gen.chooseNum(0L, 6L),                    // few groups → deep groups
              Gen.chooseNum(-1e4, 1e4).map(v => math.rint(v * 100) / 100),
              Gen.chooseNum(0, 9)))                     // narrow tiebreak domain
    for ((xs, k) <- samples(Gen.zip(rows, Gen.chooseNum(1, 6)), 6) if xs.nonEmpty) {
      val df = xs.toDF("g", "v", "t")
      val native = graft.plans.TopKPerGroup
        .topK(df, Seq("g"), Seq("v" -> false, "t" -> true, "g" -> true), k)
        .orderBy("g", "rnk").collect().map(_.toSeq)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"v".desc, $"t", $"g")
      val expected = df.withColumn("rnk", row_number().over(w).cast("int"))
        .filter($"rnk" <= k).orderBy("g", "rnk").collect().map(_.toSeq)
      // ties among (v, t) within a group make rank assignment ambiguous;
      // compare the sorted key-multisets instead of row identity
      def keyOf(r: Seq[Any]) = s"${r(0)}|${r(1)}|${r(2)}"
      assert(native.map(keyOf).sorted.toSeq == expected.map(keyOf).sorted.toSeq,
        s"k=$k")
    }
  }

  test("property: distributed rank + running total equal the global window") {
    val rows = Gen.listOfN(70,
      Gen.zip(Gen.chooseNum(0L, 20L),                   // heavy order-key ties
              Gen.chooseNum(1L, 500L)))                 // positive weights
    for ((xs, parts) <- samples(Gen.zip(rows, Gen.chooseNum(2, 9)), 5) if xs.nonEmpty) {
      // unique id tiebreaker makes the order total (the operator contract)
      val df = xs.zipWithIndex
        .map { case ((v, wt), i) => (i.toLong, v, wt) }
        .toDF("id", "v", "wt").repartition(5)
      val order = Seq($"v".desc, $"id")
      val (ranked, n) = graft.ops.GlobalRank.withRank(df, order, "rnk", parts)
      val cum = graft.ops.GlobalRank.withRunningTotal(df, order, $"wt", "cum", parts)
      val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
      val frame = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                                org.apache.spark.sql.expressions.Window.currentRow)
      val exp = df
        .withColumn("erk", row_number().over(w).cast("long"))
        .withColumn("ecm", sum($"wt".cast("decimal(38,6)")).over(frame))
      assert(n == xs.length.toLong)
      assert(ranked.join(exp, Seq("id", "v", "wt"))
        .filter($"rnk" =!= $"erk").count() == 0, s"rank mismatch parts=$parts")
      assert(cum.join(exp, Seq("id", "v", "wt"))
        .filter($"cum" =!= $"ecm").count() == 0, s"cumsum mismatch parts=$parts")
    }
  }

  test("property: normalization is idempotent and case/space-invariant") {
    import graft.llm.TextOps.normalizeText
    val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    val ws = Gen.oneOf(" ", "  ", "\t", " \t ", "   ")
    val text = Gen.listOfN(8, Gen.zip(word, ws))
      .map(_.map { case (w, s) => w + s }.mkString)
    val rows = samples(text, 50).toDF("t")
      .withColumn("n1", normalizeText($"t"))
      // every spacing/case variant of a doc must land on one normal form
      .withColumn("n2", normalizeText(upper($"t")))
      .withColumn("n3",
        normalizeText(concat(lit("  "), regexp_replace($"t", " ", "  "))))
      .withColumn("nn", normalizeText($"n1")) // idempotence
      .as[(String, String, String, String, String)].collect()
    rows.foreach { case (t, n1, n2, n3, nn) =>
      assert(n1 == n2 && n1 == n3 && n1 == nn, s"input=<$t>")
      assert(!n1.contains("  ") && n1 == n1.trim && n1 == n1.toLowerCase)
    }
  }
}
