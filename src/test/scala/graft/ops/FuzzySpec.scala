package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("fuzzyDedupPairs finds typo pairs and reports exact distances") {
    val df = docs(
      1L -> "kitten", 2L -> "sitten", 3L -> "sitting",
      4L -> "mitten", 5L -> "banana")
    val got = Fuzzy.fuzzyDedupPairs(df, "text", maxDist = 2)
      .select("a_doc_id", "b_doc_id", "dist").as[(Long, Long, Long)]
      .collect().toSet
    // kitten-sitten 1, kitten-mitten 1, sitten-mitten 1, sitten-sitting 2;
    // kitten-sitting is 3 (out), banana matches nothing
    assert(got == Set((1L, 2L, 1L), (1L, 4L, 1L), (2L, 4L, 1L), (2L, 3L, 2L)))
  }

  test("length banding is COMPLETE: equals unblocked all-pairs ground truth") {
    // adversarial lengths straddling band boundaries (w = 3: bands 0,1,2..)
    val words = Seq("a", "ab", "abc", "abcd", "abcde", "abcdef", "zzzzz",
      "abxde", "xbcdef", "", "abcdefgh").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs(words: _*)
    val got = Fuzzy.fuzzyDedupPairs(df, "text", maxDist = 2)
      .select("a_doc_id", "b_doc_id", "dist").as[(Long, Long, Long)]
      .collect().toSet
    // ground truth: plain cross product + levenshtein, no blocking
    val truth = df.as("a").crossJoin(df.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .withColumn("dist", levenshtein($"a.text", $"b.text").cast("long"))
      .filter($"dist" <= 2)
      .select($"a.doc_id", $"b.doc_id", $"dist").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == truth)
  }

  test("pairs are emitted exactly once (no band-replica duplicates)") {
    val df = docs(1L -> "abcd", 2L -> "abce", 3L -> "abc", 4L -> "abcde")
    val out = Fuzzy.fuzzyDedupPairs(df, "text", maxDist = 2)
      .select("a_doc_id", "b_doc_id").as[(Long, Long)].collect().toSeq
    assert(out.size == out.toSet.size)
  }

  test("blockCols cut candidates: only same-block pairs survive") {
    val df = Seq(
      (1L, "red widget", "red"), (2L, "red widgets", "red"),
      (3L, "ted widget", "ted"))
      .toDF("doc_id", "text", "tok0")
    val got = Fuzzy.fuzzyDedupPairs(df, "text", maxDist = 2, blockCols = Seq("tok0"))
      .select("a_doc_id", "b_doc_id").as[(Long, Long)].collect().toSet
    // 1-3 is dist 1 but blocked away by tok0; the block column rides along
    assert(got == Set((1L, 2L)))
  }

  test("two-sided join form keeps self and cross matches against a reference") {
    val left = docs(1L -> "color", 2L -> "colour")
    val ref = Seq((10L, "colour")).toDF("doc_id", "text")
    val got = Fuzzy.fuzzyJoin(left, ref, "text", maxDist = 1, idCol = "doc_id")
      .select("a_doc_id", "b_doc_id", "dist").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 10L, 1L), (2L, 10L, 0L)))
  }

  test("null text never matches; empty text matches within maxDist") {
    val df = docs(1L -> null, 2L -> "", 3L -> "ab", 4L -> "abcd")
    val got = Fuzzy.fuzzyDedupPairs(df, "text", maxDist = 2)
      .select("a_doc_id", "b_doc_id", "dist").as[(Long, Long, Long)]
      .collect().toSet
    // "" vs "ab" dist 2 in; "" vs "abcd" dist 4 out; null matches nothing
    assert(got == Set((2L, 3L, 2L), (3L, 4L, 2L)))
  }

  test("plan blocks via an equi (hash) join, not a nested-loop cross") {
    val df = docs(1L -> "abc", 2L -> "abd")
    val plan = Fuzzy.fuzzyDedupPairs(df, "text", maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  // one degenerate block ("the"-initial titles, one length band) next to
  // a cold block — the natural hot-key shape a 100 TB catalog produces
  private def skewed = {
    val hot = (0L until 60L).map(i => (i, f"the title $i%02d", "the"))
    val cold = Seq((1000L, "unique text", "uni"), (1001L, "unique texx", "uni"))
    (hot ++ cold).toDF("doc_id", "text", "tok0")
  }

  test("hot-block guard (salt): output identical to the unguarded join on a degenerate block") {
    val base = Fuzzy.fuzzyDedupPairs(skewed, "text", maxDist = 2,
        blockCols = Seq("tok0"))
      .select("a_doc_id", "b_doc_id", "dist").as[(Long, Long, Long)]
      .collect().toSet
    assert(base.nonEmpty && base.exists(_._1 < 60L), "fixture must have hot-block pairs")
    assert(base.contains((1000L, 1001L, 1L)), "and a cold-block pair")
    // 60×60 candidates in the hot key >> 500: the guard salts it
    val salted = Fuzzy.fuzzyDedupPairs(skewed, "text", maxDist = 2,
        blockCols = Seq("tok0"), maxPairsPerBlock = 500L)
      .select("a_doc_id", "b_doc_id", "dist").as[(Long, Long, Long)]
      .collect().toSet
    assert(salted == base, "salting must not change the result set")
    // the two-sided form under the guard too
    val ref = skewed.limit(30).toDF("doc_id", "text", "tok0")
    val twoBase = Fuzzy.fuzzyJoin(skewed, ref, "text", maxDist = 2,
        blockCols = Seq("tok0"))
      .select("a_doc_id", "b_doc_id", "dist").as[(Long, Long, Long)]
      .collect().toSet
    val twoSalted = Fuzzy.fuzzyJoin(skewed, ref, "text", maxDist = 2,
        blockCols = Seq("tok0"), maxPairsPerBlock = 200L)
      .select("a_doc_id", "b_doc_id", "dist").as[(Long, Long, Long)]
      .collect().toSet
    assert(twoSalted == twoBase && twoBase.nonEmpty)
    // a bound no block exceeds leaves everything untouched (still equal)
    val loose = Fuzzy.fuzzyDedupPairs(skewed, "text", maxDist = 2,
        blockCols = Seq("tok0"), maxPairsPerBlock = 1000000L)
      .select("a_doc_id", "b_doc_id", "dist").as[(Long, Long, Long)]
      .collect().toSet
    assert(loose == base)
  }

  test("hot-block guard (fail): loud on the degenerate block, silent when blocks are bounded") {
    val e = intercept[IllegalArgumentException] {
      Fuzzy.fuzzyDedupPairs(skewed, "text", maxDist = 2,
        blockCols = Seq("tok0"), maxPairsPerBlock = 500L, onHotBlock = "fail")
    }
    assert(e.getMessage.contains("degenerate block") &&
      e.getMessage.contains("maxPairsPerBlock=500") &&
      e.getMessage.contains("the"), e.getMessage) // names the hot key
    // bounded blocks pass the gate and compute normally
    val cold = Seq((1000L, "unique text", "uni"), (1001L, "unique texx", "uni"))
      .toDF("doc_id", "text", "tok0")
    assert(Fuzzy.fuzzyDedupPairs(cold, "text", maxDist = 2,
      blockCols = Seq("tok0"), maxPairsPerBlock = 500L,
      onHotBlock = "fail").count() == 1L)
  }
}
