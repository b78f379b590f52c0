package graft

import graft.contracts._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style tests over ScalaCheck generators with fixed seeds
  * (scalatestplus bridge is not on the offline classpath, so sampling is
  * driven manually — deterministic across runs). */
object ContractGen {
  private val genType = Gen.oneOf("string", "bigint", "int", "double", "boolean",
    "date", "timestamp", "decimal", "binary", "float")

  private val genRule: Gen[QualityRule] = for {
    kind <- Gen.oneOf("gt", "ge", "lt", "le", "enum", "regex", "unique")
    t <- Gen.chooseNum(-1000000.0, 1000000.0).map(v => BigDecimal(math.round(v * 100) / 100.0))
    vals <- Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty)).map(_.take(4))
  } yield kind match {
    case "gt"    => QualityRule(mustBeGreaterThan = Some(t))
    case "ge"    => QualityRule(mustBeGreaterOrEqualTo = Some(t))
    case "lt"    => QualityRule(mustBeLessThan = Some(t))
    case "le"    => QualityRule(mustBeLessOrEqualTo = Some(t))
    case "enum"  => QualityRule(rule = Some("enum"), values = vals)
    case "regex" => QualityRule(rule = Some("regex"), pattern = Some("^[a-z]+$"))
    case _       => QualityRule(rule = Some("unique"))
  }

  private val genField: Gen[FieldDef] = for {
    name <- Gen.identifier.suchThat(_.nonEmpty).map(_.take(20))
    tpe <- genType
    req <- Gen.oneOf(true, false)
    uniq <- Gen.oneOf(true, false)
    rules <- Gen.listOf(genRule).map(_.take(3))
  } yield FieldDef(name, Some(tpe), required = req, unique = uniq, quality = rules)

  val genContract: Gen[Contract] = for {
    id <- Gen.identifier.suchThat(_.nonEmpty).map("c." + _.take(16))
    ma <- Gen.chooseNum(0, 20); mi <- Gen.chooseNum(0, 20); pa <- Gen.chooseNum(0, 20)
    fields <- Gen.nonEmptyListOf(genField).map(_.take(8))
    props <- Gen.mapOf(Gen.zip(Gen.identifier.map(_.take(8)), Gen.alphaNumStr.map(_.take(12)))).map(_.take(3))
  } yield Contract(id, s"$ma.$mi.$pa", schema = Seq(SchemaObjectDef("t", fields)),
    customProperties = props)

  def sample[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))
}

class ContractJsonPropertySpec extends AnyFunSuite {

  test("generated contracts survive a JSON round-trip exactly (100 cases)") {
    val cases = ContractGen.sample(ContractGen.genContract, 100, seed = 42L)
    assert(cases.size > 80) // generators rarely discard, but don't run vacuously
    cases.foreach { c =>
      assert(ContractJson.fromJson(ContractJson.toJson(c)) == c, ContractJson.toJson(c))
    }
  }

  test("expectation derivation is deterministic with unique keys (100 cases)") {
    ContractGen.sample(ContractGen.genContract, 100, seed = 7L).foreach { c =>
      val s1 = graft.quality.Expectations.fromContract(c)
      val s2 = graft.quality.Expectations.fromContract(c)
      assert(s1 == s2)
      assert(s1.map(_.key).distinct.size == s1.size)
    }
  }
}

class SemVerPropertySpec extends AnyFunSuite {
  private val genVer = for {
    a <- Gen.chooseNum(0, 99); b <- Gen.chooseNum(0, 99); c <- Gen.chooseNum(0, 99)
    suf <- Gen.option(Gen.oneOf("draft", "rc1", "alpha"))
  } yield SemVer(a, b, c, suf)

  test("ordering is antisymmetric and parse-stable (200 pairs)") {
    val vs = ContractGen.sample(genVer, 400, seed = 13L)
    vs.foreach(v => assert(SemVer.parse(v.toString) == v))
    vs.grouped(2).collect { case Seq(x, y) => (x, y) }.foreach { case (x, y) =>
      assert(x.compare(y).sign == -y.compare(x).sign)
      if (x.compare(y) == 0) assert(x == y)
    }
  }

  test("bump strictly increases and clears the suffix") {
    ContractGen.sample(genVer, 100, seed = 99L).foreach { v =>
      for (level <- Seq("major", "minor", "patch")) {
        val bumped = v.bump(level)
        assert(bumped > v, s"$v bump $level -> $bumped")
        assert(bumped.suffix.isEmpty)
      }
    }
  }
}

class VersionPolicyPropertySpec extends AnyFunSuite {
  private val genVer = for {
    a <- Gen.chooseNum(0, 30); b <- Gen.chooseNum(0, 30); c <- Gen.chooseNum(0, 30)
    suf <- Gen.option(Gen.oneOf("rc.1", "rc.2", "rc.10", "alpha", "alpha.3", "beta10"))
  } yield SemVer(a, b, c, suf)

  test("pre-release comparison is transitive and consistent with satisfies (200 triples)") {
    val vs = ContractGen.sample(genVer, 600, seed = 21L)
    vs.grouped(3).collect { case Seq(x, y, z) => (x, y, z) }.foreach { case (x, y, z) =>
      // transitivity on the SemVer ordering
      if (x <= y && y <= z) assert(x <= z, s"$x <= $y <= $z")
      // satisfies(a, >=b) must agree with the ordering for semver operands
      assert(VersionPolicy.satisfies(x.toString, s">=${y.toString}") == (x >= y),
        s"satisfies(${x}, >=${y})")
    }
  }

  test("semver 11.4: numeric identifiers order numerically, numeric < alphanumeric") {
    assert(SemVer.parse("1.0.0-rc.10") > SemVer.parse("1.0.0-rc.9"))
    assert(SemVer.parse("1.0.0-1") < SemVer.parse("1.0.0-alpha"))
    assert(SemVer.parse("1.0.0-alpha") < SemVer.parse("1.0.0-alpha.1"))
    assert(SemVer.parse("1.0.0-alpha.1") < SemVer.parse("1.0.0-beta"))
  }
}

class HashModePropertySpec extends AnyFunSuite {

  test("portable minhash double-hash values stay within signed-64 bounds by construction") {
    // h1 < 2^60, h2 < 2^52, seed <= 31: max = 2^60 + 31*2^52 < 2^63.
    // Pure arithmetic check over the extreme corners (no Spark needed).
    val h1Max = (1L << 60) - 1
    val h2Max = (1L << 52) - 1
    val worst = h1Max + 31L * h2Max
    assert(worst > 0, "no signed overflow at the corner")
    assert(worst < Long.MaxValue)
  }

  test("TopK bounded-buffer semantics equal sort-then-take under random ties (model)") {
    // the pure-Scala model of TopKByScore's insert/merge: for ANY input
    // order and tie pattern, the kept set must equal sorting by
    // (score desc, id asc) and taking k — the invariant that made the
    // annBrute/annIvf window -> partial-agg retrofit safe. NaN excluded
    // by contract (topKPerKey filters it).
    val gen = for {
      n <- Gen.chooseNum(0, 40)
      rows <- Gen.listOfN(n, for {
        id <- Gen.chooseNum(0L, 15L) // small domains force heavy ties
        s <- Gen.oneOf(0.1, 0.5, 0.5, 0.9)
      } yield (id, s))
      k <- Gen.chooseNum(1, 6)
      cut <- Gen.chooseNum(0, n)
    } yield (rows, k, cut)
    ContractGen.sample(gen, 200, seed = 47L).foreach { case (rows, k, cut) =>
      def better(a: (Long, Double), b: (Long, Double)) =
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
      def insert(buf: List[(Long, Double)], x: (Long, Double)) = {
        val (pre, post) = buf.span(better(_, x))
        val m = pre ::: (x :: post)
        if (m.lengthCompare(k) > 0) m.take(k) else m
      }
      // split into two "partitions", reduce each, then merge — the
      // partial-aggregation path Spark actually runs
      val (p1, p2) = rows.splitAt(cut)
      val b1 = p1.foldLeft(List.empty[(Long, Double)])(insert)
      val b2 = p2.foldLeft(List.empty[(Long, Double)])(insert)
      val merged = b2.foldLeft(b1)(insert)
      val expected = rows.sortBy { case (id, s) => (-s, id) }.take(k)
      assert(merged == expected,
        s"rows=$rows k=$k cut=$cut got=$merged expected=$expected")
    }
  }

  test("intervalOverlap canonical-bucket emission is exactly-once (arithmetic model)") {
    // model of RangeJoin.intervalOverlap's bucket replication + the
    // emit-only-in-max(bucket(lStart), bucket(rStart)) filter: for ANY
    // interval pair and width, an overlapping pair is emitted exactly
    // once, a non-overlapping pair never.
    def floorDiv(x: Long, w: Long) = (x - java.lang.Math.floorMod(x, w)) / w
    val gen = for {
      w <- Gen.chooseNum(1L, 13L)
      a <- Gen.chooseNum(-60L, 60L); sa <- Gen.chooseNum(0L, 40L)
      b <- Gen.chooseNum(-60L, 60L); sb <- Gen.chooseNum(0L, 40L)
    } yield (w, a, a + sa, b, b + sb)
    ContractGen.sample(gen, 400, seed = 61L).foreach { case (w, ls, le, rs, re) =>
      val overlaps = ls <= re && rs <= le
      val lBuckets = (floorDiv(ls, w) to floorDiv(le, w)).toSet
      val rBuckets = (floorDiv(rs, w) to floorDiv(re, w)).toSet
      val emissions = (lBuckets intersect rBuckets).count(b =>
        overlaps && b == math.max(floorDiv(ls, w), floorDiv(rs, w)))
      assert(emissions == (if (overlaps) 1 else 0),
        s"w=$w [$ls,$le] [$rs,$re]: $emissions emissions")
    }
  }

  test("multi-probe canonical-block emission is exactly-once (set model)") {
    // model of semanticPairsMultiProbe's gridPairs filter: a pair whose
    // members share ANY probed cluster is emitted in exactly one block —
    // the minimum shared cid — and a pair sharing none is never emitted.
    val genSet = Gen.nonEmptyListOf(Gen.chooseNum(0, 9)).map(_.toSet.take(3))
    val gen = for { a <- genSet; b <- genSet } yield (a, b)
    ContractGen.sample(gen, 300, seed = 59L).foreach { case (csA, csB) =>
      val shared = csA intersect csB
      // blocks where BOTH members appear = shared; emitted where
      // block == min(shared)
      val emissions = shared.count(c => c == shared.min)
      assert(emissions == (if (shared.nonEmpty) 1 else 0), s"a=$csA b=$csB")
    }
  }

  test("GramBloom: zero false negatives by construction; realised fpp respects the bound") {
    // the regression that motivated the odd-stride + enhanced-double-hash
    // probes: a tiny filter at fpp=1e-6 measured 1.9e-4 with textbook K-M.
    // Model the build-side indexing (same floorMod arithmetic) directly.
    val rnd = new scala.util.Random(9L)
    def pair() = (rnd.nextLong() & ((1L << 60) - 1), rnd.nextLong() & ((1L << 52) - 1))
    val members = Array.fill(50)(pair())
    val bloom = graft.ops.GramBloom.build(members, fpp = 1e-4)
    def hits(h1: Long, h2: Long): Boolean = {
      val stride = 2L * h2 + 1L
      (0 until bloom.kh).forall { i =>
        val mix = (i.toLong * i * i - i) / 6
        val idx = java.lang.Math.floorMod(h1 + i.toLong * stride + mix, bloom.mBits)
        (bloom.words((idx >> 6).toInt) >> (idx & 63).toInt & 1L) == 1L
      }
    }
    members.foreach { case (h1, h2) => assert(hits(h1, h2), "false negative") }
    val fps = (0 until 200000).count { _ => val (a, b) = pair(); hits(a, b) }
    // 10x headroom over the nominal bound keeps the test un-flaky while
    // still catching the 1000x degradation the old probing had
    assert(fps <= 200, s"$fps false positives in 200k probes (nominal 1e-4)")
  }

  test("MinKPairs bounded-buffer equals sort-then-take under random ties (model)") {
    val gen = for {
      n <- Gen.chooseNum(0, 40)
      rows <- Gen.listOfN(n, for {
        sk <- Gen.chooseNum(0L, 7L) // heavy sort-key ties
        id <- Gen.chooseNum(0L, 15L)
      } yield (sk, id))
      k <- Gen.chooseNum(1, 6)
      cut <- Gen.chooseNum(0, n)
    } yield (rows, k, cut)
    ContractGen.sample(gen, 200, seed = 53L).foreach { case (rows, k, cut) =>
      def less(a: (Long, Long), b: (Long, Long)) =
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      def insert(buf: List[(Long, Long)], x: (Long, Long)) = {
        val (pre, post) = buf.span(less(_, x))
        val m = pre ::: (x :: post)
        if (m.lengthCompare(k) > 0) m.take(k) else m
      }
      val (p1, p2) = rows.splitAt(cut)
      val merged = p2.foldLeft(p1.foldLeft(List.empty[(Long, Long)])(insert))(insert)
      val expected = rows.sorted.take(k)
      assert(merged == expected, s"rows=$rows k=$k cut=$cut")
    }
  }

  test("packChunks chunk ids are non-decreasing within a source and start at 0 (arithmetic model)") {
    // model of the window expression over sampled token lengths
    val gen = Gen.listOfN(50, Gen.chooseNum(0, 700))
    ContractGen.sample(gen, 50, seed = 33L).foreach { toks =>
      val budget = 512
      var cum = 0L
      var prev = 0L
      toks.zipWithIndex.foreach { case (n, i) =>
        val chunk = (cum / budget)
        if (i == 0) assert(chunk == 0L)
        assert(chunk >= prev, "chunk ids must be non-decreasing")
        prev = chunk
        cum += n
      }
    }
  }
}
