package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** Property-based parity for the native Catalyst kernels (ScalaCheck,
  * fixed seed for reproducibility). Two invariant families:
  *
  *  - PolyHash / DotF32 carry REAL `doGenCode` bodies, so the compiled
  *    projection is a second implementation that can silently diverge
  *    from `nullSafeEval` (plans flip between the two paths on codegen
  *    fallback). Property: interpreted == codegen == an independently
  *    written model, over adversarial unicode (astral plane, control
  *    whitespace) and float extremes (NaN, ±Inf, -0.0, subnormals).
  *
  *  - The fused kernels (WordShingleHashes, TermCounts, TextEntropy)
  *    restate simpler definitions for speed; each is pinned to the
  *    composed definition it claims to equal.
  *
  * No SparkSession: rows are evaluated straight through Catalyst
  * projections, so the whole suite runs in milliseconds.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def checkProp(p: Prop, min: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(min)
        .withInitialSeed(Seed(42L)),
      p)
    assert(res.passed, res.status.toString)
  }

  // -- generators -----------------------------------------------------------

  /** Code points weighted toward ASCII but covering control whitespace,
    * Latin-1/CJK, and the astral plane (2 UTF-16 units, 1 code point —
    * exactly where per-char vs per-codepoint folds diverge).
    */
  private val genCodePoint: Gen[Int] = Gen.frequency(
    8 -> Gen.choose(0x20, 0x7e),
    2 -> Gen.oneOf(0x9, 0xa, 0xd, 0xb, 0xc, 0x20),
    2 -> Gen.choose(0xa0, 0x2fff),
    1 -> Gen.choose(0x10000, 0x10fff0))

  private val genUnicode: Gen[String] = Gen.listOf(genCodePoint)
    .map(cps => new String(cps.toArray, 0, cps.length))

  /** Word-ish text: tokens and whitespace runs, for the tokenizing kernels. */
  private val genText: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> Gen.choose('a', 'z').flatMap(c =>
      Gen.choose(1, 6).map(n => c.toString * n)),
    2 -> Gen.oneOf("😀", "a😀b", "Ünïcode", "汉字", "é", "ONE", "''"),
    4 -> Gen.oneOf(" ", "  ", "\t", "\n", "\r\n", "\f", "")))
    .map(_.mkString)

  private val genFloat: Gen[Float] = Gen.frequency(
    8 -> Gen.chooseNum(-1e6f, 1e6f),
    2 -> Gen.oneOf(0.0f, -0.0f, 1.0f, -1.0f, Float.MinPositiveValue,
      Float.MaxValue, Float.NaN, Float.PositiveInfinity))

  /** Boxed float array with occasional null elements. */
  private val genFloatArr: Gen[Array[Any]] =
    Gen.listOf(Gen.frequency(
      19 -> genFloat.map(f => (f: java.lang.Float): Any),
      1 -> Gen.const(null: Any)))
      .map(_.toArray)

  // -- PolyHash -------------------------------------------------------------

  test("PolyHash: codegen == interpreted == codepoint-fold model") {
    for ((base, mod) <- Seq((31L, 1000000007L), (131L, 1000000009L),
        (257L, 1000003L))) {
      val expr = PolyHash(BoundReference(0, StringType, nullable = true), base, mod)
      val proj = GenerateMutableProjection.generate(Seq(expr))
      checkProp(Prop.forAll(genUnicode) { s =>
        val row = InternalRow(UTF8String.fromString(s))
        val interp = expr.eval(row).asInstanceOf[Long]
        val gen = proj(row).getLong(0)
        var acc = 0L
        val it = s.codePoints().iterator()
        while (it.hasNext) acc = (acc * base + it.next()) % mod
        interp == gen && interp == acc
      })
      // null propagates identically through both paths
      val nullRow = InternalRow(null)
      assert(expr.eval(nullRow) == null && proj(nullRow).isNullAt(0))
    }
  }

  // -- DotF32 ---------------------------------------------------------------

  test("DotF32: codegen == interpreted == sequential-f64 model " +
      "(NaN/Inf/-0.0/null-element/mismatched-length)") {
    val expr = DotF32(
      BoundReference(0, ArrayType(FloatType, containsNull = true), nullable = true),
      BoundReference(1, ArrayType(FloatType, containsNull = true), nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(expr))

    def model(a: Array[Any], b: Array[Any]): Option[Double] = {
      if (a.length != b.length) return None
      var acc = 0.0
      var i = 0
      while (i < a.length) {
        if (a(i) == null || b(i) == null) return None
        acc += a(i).asInstanceOf[java.lang.Float].toDouble *
          b(i).asInstanceOf[java.lang.Float].toDouble
        i += 1
      }
      Some(acc)
    }
    def bitsEq(x: Double, y: Double): Boolean =
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)

    // same-length pairs (plus the occasional length clash from genFloatArr)
    val genPair: Gen[(Array[Any], Array[Any])] = for {
      a <- genFloatArr
      sameLen <- Gen.frequency(4 -> Gen.const(true), 1 -> Gen.const(false))
      b <- if (sameLen) Gen.listOfN(a.length, Gen.frequency(
          19 -> genFloat.map(f => (f: java.lang.Float): Any),
          1 -> Gen.const(null: Any))).map(_.toArray)
        else genFloatArr
    } yield (a, b)

    checkProp(Prop.forAll(genPair) { case (a, b) =>
      val row = InternalRow(new GenericArrayData(a), new GenericArrayData(b))
      val interp = expr.eval(row)
      val out = proj(row)
      val gen = if (out.isNullAt(0)) null else (out.getDouble(0): Any)
      val m = model(a, b)
      (interp, gen, m) match {
        case (null, null, None) => true
        case (iv: java.lang.Double, gv: java.lang.Double, Some(mv)) =>
          bitsEq(iv, gv) && bitsEq(iv, mv)
        case _ => false
      }
    })
  }

  // -- WordShingleHashes ----------------------------------------------------

  test("WordShingleHashes == documented double-polyhash combine over " +
      "WordShingles strings, order and multiplicity included") {
    checkProp(Prop.forAll(genText, Gen.choose(1, 4)) { (s, n) =>
      val want = WordShingles.shingles(s, n).map(sh =>
        PolyHash.hash(sh, SimHashConf.Base1, SimHashConf.Mod1) * SimHashConf.Mod2 +
          PolyHash.hash(sh, SimHashConf.Base2, SimHashConf.Mod2))
      java.util.Arrays.equals(WordShingleHashes.hashes(s, n), want)
    })
  }

  test("WordShingles: distinct, insertion-ordered, all n tokens wide") {
    checkProp(Prop.forAll(genText, Gen.choose(1, 4)) { (s, n) =>
      val toks = GraftText.wsTokens(s)
      val sh = WordShingles.shingles(s, n)
      val expected = toks.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSeq.distinct
      sh.toSeq == expected
    })
  }

  // -- TermCounts -----------------------------------------------------------

  test("TermCounts == groupBy-count over the shared tokenizer") {
    checkProp(Prop.forAll(genText) { s =>
      val m = new scala.collection.mutable.HashMap[String, Long]()
      GraftText.wsTokens(s).foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L))
      import scala.jdk.CollectionConverters._
      val got = TermCounts.counts(s).asScala.map { case (k, v) => (k, v.longValue) }
      got.toMap == m.toMap && got.values.sum == GraftText.wsTokens(s).length
    })
  }

  // -- TextEntropy ----------------------------------------------------------

  test("TextEntropy: matches ascending-codepoint Shannon model, " +
      "0 <= H <= log2(distinct)") {
    val expr = TextEntropy(BoundReference(0, StringType, nullable = true))
    checkProp(Prop.forAll(genUnicode) { s =>
      val out = expr.eval(InternalRow(UTF8String.fromString(s)))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
      if (s.isEmpty) out.isEmpty
      else {
        // independent model, summing in ascending code-point order (the
        // kernel's TreeMap order) so equality is exact, not approximate
        val counts = new java.util.TreeMap[Integer, Long]()
        s.codePoints().forEach(cp => counts.merge(cp, 1L, (a, b) => a + b))
        val n = counts.values().stream().mapToLong(_.longValue).sum().toDouble
        val ln2 = math.log(2.0)
        var acc = 0.0
        counts.values().forEach(c => acc += c * (math.log(c.toDouble) / ln2))
        val h = math.log(n) / ln2 - acc / n
        val distinct = counts.size.toDouble
        out.length == 2 && out(0) == distinct &&
          java.lang.Double.doubleToLongBits(out(1)) ==
            java.lang.Double.doubleToLongBits(h) &&
          h >= -1e-9 && h <= math.log(distinct) / ln2 + 1e-9
      }
    })
  }

  // -- WordWindowHashes -----------------------------------------------------

  test("WordWindowHashes: positional model; hash SET equals the distinct " +
      "shingle-hash kernel's") {
    checkProp(Prop.forAll(genText, Gen.choose(1, 4)) { (s, n) =>
      val toks = GraftText.wsTokens(s)
      val got = WordWindowHashes.hashes(s, n)
      val want =
        if (toks.length < n) Array.empty[Long]
        else Array.tabulate(toks.length - n + 1) { i =>
          val w = toks.slice(i, i + n).mkString(" ")
          PolyHash.hash(w, SimHashConf.Base1, SimHashConf.Mod1) * SimHashConf.Mod2 +
            PolyHash.hash(w, SimHashConf.Base2, SimHashConf.Mod2)
        }
      java.util.Arrays.equals(got, want) &&
        got.toSet == WordShingleHashes.hashes(s, n).toSet
    })
  }

  // -- MinHashBandKeys ------------------------------------------------------

  test("MinHashBandKeys: equals the set-min model; band/row structure holds") {
    checkProp(Prop.forAll(genText) { s =>
      val sh = WordShingles.shingles(s, 3)
      val got = MinHashConf.bandKeys(s)
      if (sh.isEmpty) got.isEmpty
      else {
        // model: min over the shingle SET per hash function — insertion
        // order must not matter, so fold over the sorted distinct set
        val hs = sh.map(x => PolyHash.hash(x, 31, 1000000007L)).toSet
        val sigs = (0 until MinHashConf.NumHashes).map(j =>
          hs.map(h => (h * MinHashConf.HashA(j) + MinHashConf.HashB(j)) %
            MinHashConf.P).min)
        val want = (0 until MinHashConf.Bands).map(b =>
          (0 until MinHashConf.RowsPerBand)
            .map(r => sigs(b * MinHashConf.RowsPerBand + r)).mkString(","))
        got.toSeq == want &&
          got.length == MinHashConf.Bands &&
          got.forall(_.split(",", -1).length == MinHashConf.RowsPerBand) &&
          sigs.forall(v => v >= 0 && v < MinHashConf.P)
      }
    })
  }

  // -- TextStats ------------------------------------------------------------

  test("TextStats: each fused stat equals its standalone definition") {
    val stop = Seq("the", "a", "of", "ONE")
    val expr = TextStats(BoundReference(0, StringType, nullable = true), stop)
    checkProp(Prop.forAll(genUnicode) { s =>
      val out = expr.eval(InternalRow(UTF8String.fromString(s)))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      val toks = GraftText.wsTokens(s)
      val punct = s.codePoints().toArray.count { cp =>
        val alnum = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
          (cp >= '0' && cp <= '9')
        val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
          cp == '\f' || cp == '\r'
        !alnum && !ws
      }
      out.length == 4 &&
        out(0) == toks.length.toLong &&
        out(1) == punct.toLong &&
        out(2) == toks.count(stop.contains).toLong &&
        out(3) == toks.map(w => w.codePointCount(0, w.length).toLong).sum
    })
  }

  // -- ProfileHits ----------------------------------------------------------

  test("ProfileHits: per-profile counts equal independent filters") {
    val profiles = Seq(Seq("the", "a", "le"), Seq("der", "die", "das"), Seq.empty)
    val expr = ProfileHits(BoundReference(0, StringType, nullable = true),
      profiles.map(_.toIndexedSeq).toIndexedSeq)
    checkProp(Prop.forAll(genText) { s =>
      val out = expr.eval(InternalRow(UTF8String.fromString(s)))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      val toks = GraftText.wsTokens(s)
      out.toSeq == profiles.map(p => toks.count(p.toSet).toLong)
    })
  }

  // -- PolyHash inside the combine never overflows --------------------------

  test("shingle combine stays within Long (no silent overflow)") {
    // max h1 = Mod1-1, combine = h1*Mod2 + h2 < (1e9+7)(1e9+9) + 1e9+9
    val worst = (SimHashConf.Mod1 - 1) * SimHashConf.Mod2 + (SimHashConf.Mod2 - 1)
    assert(worst > 0L, "combine overflowed Long at the documented moduli")
  }

  // -- IvfProbes boundary-candidate selection == full-rounding program ------

  test("topByRounded equals round-everything-then-sort, near-ties included") {
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def naive(raw: Array[Double], m: Int): Seq[(Double, Int)] =
      raw.indices.map(i => (r6(raw(i)), i))
        .sortBy(identity)(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
        .take(math.min(m, raw.length))
    // engineered near-ties: values differing by < 1e-6 around the probe
    // boundary, exact .5 ups at the 7th decimal, duplicates — at SMALL and
    // LARGE magnitude (r10 advisor: above |x| ≈ 1e10 the decimal→double
    // conversion error exceeds a fixed 2e-6 headroom; topByRounded now
    // scales it with ulp, and this generator exercises that regime with
    // ulp-step tie ladders where round6 collapses whole ladders to ties)
    val gen = for {
      n <- Gen.choose(1, 40)
      base <- Gen.oneOf(Gen.choose(0.0, 10.0), Gen.choose(1e10, 1e14))
      vs <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(0.0, 10.0),
        Gen.choose(-8e-7, 8e-7).map(base + _), // rounding-tie cluster
        Gen.const(base),                        // exact duplicates
        Gen.choose(0, 20).map(base + _ * 5e-7),// .5-at-7th-decimal ladder
        Gen.choose(0, 20).map(k => base + k * Math.ulp(base)))) // ulp ladder
      m <- Gen.choose(1, 8)
    } yield (vs.toArray, m)
    val prop = Prop.forAll(gen) { case (raw, m) =>
      IvfProbes.topByRounded(raw, null, m).toSeq == naive(raw, m)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500)
        .withInitialSeed(Seed(20260815L)), prop)
    assert(res.passed, res.status.toString)
  }
}
