package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, MapType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared whitespace tokenizer for every native text kernel, with
  * EXACTLY the semantics of the Spark column program
  * `split(lower(trim(text)), "\\s+")` and the DuckDB oracle
  * `string_split_regex(lower(trim(text)), '\s+')`:
  *  - trim strips SPACES only (Java `String.trim` strips every codepoint
  *    <= 0x20 — \t \n \r included — which silently diverges on docs with
  *    leading/trailing control whitespace);
  *  - the split keeps leading AND trailing empty tokens (Java
  *    `Pattern.split` with the default limit drops trailing empties);
  *  - empty trimmed text → empty array (both engines' guard branch).
  */
object GraftText {
  private val Ws = "\\s+".r.pattern

  /** Space-only trim — Spark/DuckDB `trim` semantics, NOT Java trim. */
  def spaceTrim(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** `lower(trim(text))` split on `\s+`, keeping empty edge tokens. */
  def wsTokens(s: String): Array[String] = {
    val t = spaceTrim(s).toLowerCase(java.util.Locale.ROOT)
    if (t.isEmpty) Array.empty[String] else Ws.split(t, -1)
  }
}

/** Polynomial rolling hash (Rabin–Karp): fold over code points of
  * `acc = (acc * base + cp) mod m`. Native Catalyst expression with
  * `doGenCode`, so it runs as a single O(len) loop inside whole-stage
  * codegen — replacing the O(len²) `aggregate(sequence, substring)` column
  * program (every `substring(s, i, 1)` re-seeks from the string start).
  *
  * Semantics match the DuckDB oracle exactly: code points (= `ord(substr)`
  * per character), 64-bit modular arithmetic, empty string → 0, null → null.
  */
case class PolyHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * ${base}L + $cp) % ${mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Double-precision dot product of two `array<float>` embedding columns as
  * a native codegen'd loop. The higher-order-function equivalent
  * (`aggregate(zip_with(...))`) runs interpreted with per-element boxing —
  * this is the innermost kernel of knn / embedding-dedup / IVF search, so
  * it must be a tight loop.
  *
  * Semantics match the previous HOF program and the DuckDB oracle: floats
  * promote to double BEFORE multiply, accumulation is sequential
  * left-to-right in f64; mismatched lengths or a null element → null
  * (exactly what zip_with padding + null-poisoned aggregate produced).
  */
case class DotF32(left: Expression, right: Expression) extends BinaryExpression {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF32 =
    copy(left = newLeft, right = newRight)
}

object DotF32 {
  def column(a: Column, b: Column): Column =
    Bridge.column(DotF32(Bridge.expression(a), Bridge.expression(b)))
}

/** Distinct word n-gram shingles of lowercased whitespace-split text, as
  * one native kernel: `text → lower/trim → split(\s+) → n-grams → distinct`.
  *
  * The equivalent higher-order-function column program
  * (`array_distinct(transform(sequence…, element_at…))`) runs interpreted
  * with per-element boxing and was the dominant cost of the dedup family
  * (~4 ms/row); this kernel is one JVM pass (~µs/row). CodegenFallback is
  * deliberate: the surrounding stage stays codegen'd and makes a single
  * call per row — hand-writing array-builder codegen buys nothing here.
  *
  * Semantics identical to the DuckDB oracle:
  * `list_distinct(list_transform(range…))` over `string_split_regex(
  * lower(trim(text)), '\s+')`; < n tokens → empty array; null → null.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val shingles = WordShingles.shingles(input.asInstanceOf[UTF8String].toString, n)
    new GenericArrayData(shingles.map(UTF8String.fromString(_)))
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** [[WordShingles]] emitting the 122-bit combined double polyhash of each
  * distinct shingle (`PolyHash(s, 31, 1e9+7) * (1e9+9) + PolyHash(s, 131,
  * 1e9+9)` — the SimHashConf token-hash program over the shingle string)
  * instead of the shingle string itself: one JVM pass, no string column
  * materialized, 8-byte join keys. Distinctness is still BY STRING (the
  * oracle's `list_distinct` then hashes), so a double-hash collision
  * between distinct shingles yields the same duplicate hash values in
  * both engines. For set-membership consumers (decontamination) this is
  * the exact-parity drop-in whose broadcast is ~6× smaller than the
  * string form and whose probe compares longs.
  */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WordShingleHashes.hashes(input.asInstanceOf[UTF8String].toString, n))

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashes {
  def hashes(text: String, n: Int): Array[Long] = {
    val toks = GraftText.wsTokens(text)
    if (toks.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) {
        out += PolyHash.hash(s, SimHashConf.Base1, SimHashConf.Mod1) * SimHashConf.Mod2 +
          PolyHash.hash(s, SimHashConf.Base2, SimHashConf.Mod2)
      }
      i += 1
    }
    out.toArray
  }

  def column(c: Column, n: Int): Column =
    Bridge.column(WordShingleHashes(Bridge.expression(c), n))
}

object WordShingles {
  def shingles(text: String, n: Int): Array[String] = {
    val toks = GraftText.wsTokens(text)
    if (toks.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  def column(c: Column, n: Int = 3): Column =
    Bridge.column(WordShingles(Bridge.expression(c), n))
}

/** POSITIONAL variant of [[WordShingleHashes]]: every length-`n` token
  * window's 122-bit double polyhash, in window-start order and WITHOUT
  * the distinct collapse — element `i` is the hash of tokens `[i, i+n)`,
  * so `posexplode` recovers (position, hash) pairs. The position is what
  * duplicated-substring coverage needs (interval union over window
  * starts); the other hashing conventions are identical to
  * [[WordShingleHashes]], so the DuckDB oracle replays the same program
  * over `list_slice`d token runs. One narrow JVM pass, no string column.
  */
case class WordWindowHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_window_hashes"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WordWindowHashes.hashes(input.asInstanceOf[UTF8String].toString, n))

  override protected def withNewChildInternal(newChild: Expression): WordWindowHashes =
    copy(child = newChild)
}

object WordWindowHashes {
  def hashes(text: String, n: Int): Array[Long] = {
    val toks = GraftText.wsTokens(text)
    if (toks.length < n) return Array.empty
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      out(i) = PolyHash.hash(s, SimHashConf.Base1, SimHashConf.Mod1) * SimHashConf.Mod2 +
        PolyHash.hash(s, SimHashConf.Base2, SimHashConf.Mod2)
      i += 1
    }
    out
  }

  def column(c: Column, n: Int): Column =
    Bridge.column(WordWindowHashes(Bridge.expression(c), n))
}

/** Per-document term frequencies as a `map<string,bigint>` in one JVM
  * pass over `lower().split()` tokens. This is the map-side pre-aggregation
  * for BM25: exploding the map yields already-counted (term, f) rows, so
  * the corpus-sized (doc, term) shuffle disappears — only per-term corpus
  * stats (small) ever shuffle. First-occurrence key order (deterministic).
  */
case class TermCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "graft_term_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val counts = TermCounts.counts(input.asInstanceOf[UTF8String].toString)
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = e.getValue
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {
  def counts(text: String): java.util.LinkedHashMap[String, java.lang.Long] = {
    val out = new java.util.LinkedHashMap[String, java.lang.Long]()
    // Empty edge tokens (text starting/ending with \t \n \r) count like the
    // oracle's unnest(string_split_regex(...)) rows do — they contribute to
    // dl/avgdl; query terms are never empty, so scoring sees no '' term.
    val toks = GraftText.wsTokens(text)
    var i = 0
    while (i < toks.length) {
      out.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    out
  }

  def column(c: Column): Column =
    Bridge.column(TermCounts(Bridge.expression(c)))
}

/** MinHash LSH band keys straight from text, one JVM pass: tokens →
  * distinct 3-gram shingles → rolling-hash ids → `numHashes` affine
  * min-hashes → `bands` comma-joined band keys. Fusing the chain into one
  * kernel removes every intermediate array allocation and interpreted
  * lambda hop (the remaining cost of dedup_minhash after WordShingles).
  * Math is identical to the composed column program and to the generated
  * DuckDB oracle (constants come from [[MinHashConf]], the single source
  * of truth). Empty shingle set → empty array (doc drops out on explode).
  */
case class MinHashBandKeys(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(input: Any): Any = {
    val keys = MinHashConf.bandKeys(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(keys.map(UTF8String.fromString(_)))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

/** MinHash constants + kernel — shared by the Spark expression and the
  * generated DuckDB oracle SQL so they cannot drift.
  */
object MinHashConf {
  val P = 2147483647L
  val NumHashes = 16
  val Bands = 4
  val RowsPerBand = 4
  val HashA: IndexedSeq[Long] = (0 until NumHashes).map(i => 1000003L * i + 16777619L)
  val HashB: IndexedSeq[Long] = (0 until NumHashes).map(i => 999983L * i + 40503L)

  def bandKeys(text: String): Array[String] = {
    val sh = WordShingles.shingles(text, 3)
    if (sh.isEmpty) return Array.empty
    val sigs = new Array[Long](NumHashes)
    java.util.Arrays.fill(sigs, Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val h = PolyHash.hash(sh(i), 31, 1000000007L)
      var j = 0
      while (j < NumHashes) {
        val v = (h * HashA(j) + HashB(j)) % P
        if (v < sigs(j)) sigs(j) = v
        j += 1
      }
      i += 1
    }
    Array.tabulate(Bands) { b =>
      val sb = new java.lang.StringBuilder()
      var r = 0
      while (r < RowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(sigs(b * RowsPerBand + r))
        r += 1
      }
      sb.toString
    }
  }

  def column(c: Column): Column =
    Bridge.column(MinHashBandKeys(Bridge.expression(c)))
}

/** Fused text-statistics kernel: ONE pass over the document produces
  * `[n_ws_tokens, n_punct, n_stop_hits, sum_word_len]` (array<long>).
  * The composed column program (split + regexp_count + filter-size +
  * aggregate HOF) walks the string four times, two of them as interpreted
  * higher-order functions with per-element boxing — this kernel was worth
  * ~3× on the text_quality headliner.
  *
  * Semantics are bit-identical to the column program it replaces (and so
  * to the DuckDB oracle):
  * - tokens = [[GraftText.wsTokens]] (space-only trim, edge empties kept —
  *   exactly Spark `split(lower(trim(text)), "\\s+")` / DuckDB
  *   `string_split_regex`, including on docs with leading/trailing \t \n \r);
  * - punct counts code points of the RAW text outside [a-zA-Z0-9] and
  *   outside Java-regex `\s` (space, \t, \n, \x0B, \f, \r);
  * - stop hits = tokens ∈ `stopWords`;
  * - sum_word_len = Σ code-point length of tokens.
  */
case class TextStats(child: Expression, stopWords: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_text_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopWords.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // punct over the raw text, by code point
    var punct = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val alnum = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9')
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (!alnum && !ws) punct += 1
      i += Character.charCount(cp)
    }
    var nTok = 0L
    var stops = 0L
    var sumWl = 0L
    val toks = GraftText.wsTokens(text)
    var j = 0
    while (j < toks.length) {
      val w = toks(j)
      nTok += 1
      sumWl += w.codePointCount(0, w.length)
      if (stopSet.contains(w)) stops += 1
      j += 1
    }
    new GenericArrayData(Array[Any](nTok, punct, stops, sumWl))
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  def column(c: Column, stopWords: Seq[String]): Column =
    Bridge.column(TextStats(Bridge.expression(c), stopWords))
}

/** Case-insensitive word-boundary highlight spans of a literal term inside
  * a text column (reference `answerless_search.py:144-159 _find_spans`:
  * `re.finditer(rf"\b{escaped}\b", text, IGNORECASE)`, first `cap` spans,
  * char offsets, end exclusive). Returns `array<struct<start:long,
  * end:long>>`, matches in order, non-overlapping.
  *
  * Word chars are ASCII `[A-Za-z0-9_]` — the explicit common subset of
  * Java's default `\b`, RE2's, and Python's — so the DuckDB oracle can
  * replay the boundary test exactly. One linear scan per (row, term), no
  * regex machinery.
  */
case class HighlightSpans(child: Expression, term: String, cap: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", LongType, nullable = false),
      StructField("end", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_highlight_spans"

  private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val n = text.length
    val m = term.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (m > 0) {
      var i = 0
      while (i + m <= n && out.length < cap) {
        if (text.regionMatches(true, i, term, 0, m) &&
            (i == 0 || !isWord(text.charAt(i - 1))) &&
            (i + m == n || !isWord(text.charAt(i + m)))) {
          out += org.apache.spark.sql.catalyst.InternalRow(i.toLong, (i + m).toLong)
          i += m
        } else i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): HighlightSpans =
    copy(child = newChild)
}

object HighlightSpans {
  def column(c: Column, term: String, cap: Int = 8): Column =
    Bridge.column(HighlightSpans(Bridge.expression(c), term, cap))
}

/** Character-distribution Shannon entropy in one pass: codepoint
  * frequencies → `H = log2(n) − Σ c·log2(c) / n` (bits/char) — the classic
  * gibberish/boilerplate detector for training-data quality. Returns
  * `[n_distinct, H]` as array<double>; empty text → empty array. The
  * count-based formula (not −Σ p·log2 p) is the exact expression the
  * DuckDB oracle evaluates, so both engines run the same float program;
  * keys are summed in codepoint order for determinism.
  */
case class TextEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_text_entropy"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    if (text.isEmpty) return new GenericArrayData(Array.emptyDoubleArray)
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < text.length) {
      val cp = text.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    val ln2 = math.log(2.0)
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      acc += c * (math.log(c) / ln2)
    }
    val h = math.log(n.toDouble) / ln2 - acc / n
    new GenericArrayData(Array(counts.size.toDouble, h))
  }

  override protected def withNewChildInternal(newChild: Expression): TextEntropy =
    copy(child = newChild)
}

object TextEntropy {
  def column(c: Column): Column = Bridge.column(TextEntropy(Bridge.expression(c)))
}

/** Slice-sum perceptual hash: partition the content's codepoint sequence
  * into `bits` near-equal slices (slice of 0-based position p is
  * `p·bits/n`, integer division); bit k is set iff slice k's codepoint sum
  * exceeds the mean (`sum_k · bits > total`, integer-exact). This is the
  * blockhash/aHash family of media fingerprints — pairwise similarity is
  * hamming distance over the packed bits, so near-dup detection rides the
  * same chunk-bucket LSH machinery as SimHash.
  *
  * One pass, null for content shorter than `bits` codepoints (no slice may
  * be empty; callers filter the same predicate). `bits` ≤ 60 keeps the
  * packed value positive in a signed 64-bit lane on both engines.
  */
case class SliceHash(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  require(bits > 0 && bits <= 60, "bits must be in (0, 60]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_slice_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val n = text.codePointCount(0, text.length)
    if (n < bits) return null
    val sums = new Array[Long](bits)
    var total = 0L
    var i = 0
    var p = 0L
    while (i < text.length) {
      val cp = text.codePointAt(i)
      sums((p * bits / n).toInt) += cp
      total += cp
      p += 1
      i += Character.charCount(cp)
    }
    var h = 0L
    var k = 0
    while (k < bits) {
      if (sums(k) * bits > total) h |= 1L << k
      k += 1
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): SliceHash =
    copy(child = newChild)
}

object SliceHash {
  def column(c: Column, bits: Int): Column =
    Bridge.column(SliceHash(Bridge.expression(c), bits))
}

/** Per-profile stopword hit counts in ONE tokenization pass:
  * `array<long>` with one count per profile, each = |tokens ∈ profile|.
  * Replaces N interpreted `filter(split(...), isInCollection)` passes —
  * each of which re-split the document (projection collapse inlines the
  * token array into every reference) — with a single scan and N hash-set
  * probes per token. Tokenization is [[GraftText.wsTokens]], identical to
  * the column program and the DuckDB oracle.
  */
case class ProfileHits(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_profile_hits"

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    profiles.map { ws =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val toks = GraftText.wsTokens(input.asInstanceOf[UTF8String].toString)
    val counts = new Array[Long](sets.length)
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      var p = 0
      while (p < sets.length) {
        if (sets(p).contains(w)) counts(p) += 1
        p += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): ProfileHits =
    copy(child = newChild)
}

object ProfileHits {
  def column(c: Column, profiles: Seq[Seq[String]]): Column =
    Bridge.column(ProfileHits(Bridge.expression(c),
      profiles.map(_.toIndexedSeq).toIndexedSeq))
}

/** Sentence-pack / heading-split chunking as a native expression around
  * the [[TextChunk]] kernels (reference `chunker.py` semantics) — replaces
  * a Scala UDF, so there is no UDF serialization boundary and the operator
  * follows the same shape as every other text kernel: CodegenFallback,
  * one JVM call per row, surrounding stage stays codegen'd.
  */
case class ChunkText(child: Expression, mode: String, size: Int, overlap: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"graft_chunk_$mode"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val chunks = mode match {
      case "sentences" => TextChunk.chunkSentences(text, size, overlap)
      case "headings"  => TextChunk.chunkByHeadings(text, size, overlap)
      case _           => TextChunk.chunkFixed(text, size, overlap)
    }
    new GenericArrayData(chunks.map(UTF8String.fromString(_)).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkText =
    copy(child = newChild)
}

object ChunkText {
  def column(c: Column, mode: String, size: Int, overlap: Int): Column =
    Bridge.column(ChunkText(Bridge.expression(c), mode, size, overlap))
}

/** SimHash constants + kernel — shared by the Spark expression and the
  * generated DuckDB oracle SQL so they cannot drift. The per-token hash is
  * two independent rolling polyhashes packed into one 60-bit value
  * (p1·(1e9+9) + p2 < 2^60): BIGINT-exact in both engines, unlike xxhash64.
  */
object SimHashConf {
  val Bits = 60
  val Chunks = 4
  val ChunkBits: Int = Bits / Chunks
  val MaxHamming = 15 // same budget/width ratio as 16-of-64
  val Base1 = 31L;  val Mod1 = 1000000007L
  val Base2 = 131L; val Mod2 = 1000000009L

  /** The 4 packed 15-bit chunks of the 60-bit SimHash, one pass over the
    * document: tokens → per-token 60-bit hash → ±1 votes per bit → chunk
    * bits from vote signs. Empty-token hash is 0 (votes −1 on every bit) —
    * mirrored by the oracle's empty-token CASE. No tokens → empty array
    * (the doc drops out, as it does from the oracle's unnest).
    */
  def chunks(text: String): Array[Long] = {
    val toks = GraftText.wsTokens(text)
    if (toks.isEmpty) return Array.emptyLongArray
    val votes = new Array[Int](Bits)
    var i = 0
    while (i < toks.length) {
      val tok = toks(i)
      val h = PolyHash.hash(tok, Base1, Mod1) * Mod2 + PolyHash.hash(tok, Base2, Mod2)
      var k = 0
      while (k < Bits) {
        votes(k) += (if (((h >> k) & 1L) == 1L) 1 else -1)
        k += 1
      }
      i += 1
    }
    Array.tabulate(Chunks) { j =>
      var c = 0L
      var r = 0
      while (r < ChunkBits) {
        if (votes(j * ChunkBits + r) > 0) c |= (1L << r)
        r += 1
      }
      c
    }
  }

  def column(c: Column): Column =
    Bridge.column(SimHashChunks(Bridge.expression(c)))
}

/** Fused SimHash kernel: text → 4 packed chunk values in one JVM pass
  * (see [[SimHashConf.chunks]]). Replaces an explode(tokens) + 60-column
  * vote aggregation — i.e. a corpus-sized shuffle — with a narrow map,
  * the same fusion that made MinHashBandKeys the fast path.
  */
case class SimHashChunks(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_simhash_chunks"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(SimHashConf.chunks(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): SimHashChunks =
    copy(child = newChild)
}

/** Primitive centroid/hyperplane bank as a kernel parameter, with
  * PRECOMPUTED hashCode and eq-short-circuited equals — the [[BloomBytes]]
  * treatment for matrix-shaped expression params. As `Seq[Seq[Double]]`
  * case-class fields, a K = 65536 × 64 centroid bank is ~4.2M BOXED
  * doubles hashed and compared on every plan-tree canonicalization,
  * semanticEquals and subexpression-elimination pass — the exact
  * driver-side pathology profiled at ~1 s/run for the 4 MiB Bloom binary
  * Literal (r10). Wrapped, tree ops cost O(1) (hash is precomputed, equals
  * short-circuits on reference then hash), plan strings print a digest
  * instead of megabytes of doubles, and VALUE equality is preserved (deep
  * primitive-array compare behind the hash guard) so Catalyst CSE still
  * unifies identical kernels. The arrays are handed over by the model fits
  * and never mutated afterward (the [[BloomBytes]] ownership rule).
  */
final class DoubleMatrix(val rows: Array[Array[Double]]) extends Serializable {
  private val h = {
    var acc = 1
    var i = 0
    while (i < rows.length) { acc = 31 * acc + java.util.Arrays.hashCode(rows(i)); i += 1 }
    acc
  }
  override def hashCode: Int = h
  override def equals(o: Any): Boolean = o match {
    case m: DoubleMatrix =>
      (m eq this) || (m.h == h && m.rows.length == rows.length && {
        var i = 0
        var same = true
        while (same && i < rows.length) {
          same = java.util.Arrays.equals(m.rows(i), rows(i)); i += 1
        }
        same
      })
    case _ => false
  }
  override def toString: String =
    s"DoubleMatrix(${rows.length}x${if (rows.isEmpty) 0 else rows(0).length}, #$h)"
}

/** [[DoubleMatrix]]'s int-vector sibling (IVF cell→super membership: 65536
  * boxed Ints as a Seq param carry the same per-tree-op tax).
  */
final class IntVec(val values: Array[Int]) extends Serializable {
  private val h = java.util.Arrays.hashCode(values)
  override def hashCode: Int = h
  override def equals(o: Any): Boolean = o match {
    case v: IntVec =>
      (v eq this) || (v.h == h && java.util.Arrays.equals(v.values, values))
    case _ => false
  }
  override def toString: String = s"IntVec(${values.length}, #$h)"
}

/** [[DoubleMatrix]]'s rank-3 sibling for PQ codebooks
  * (subspace × code × dim).
  */
final class CodebookBank(val books: Array[Array[Array[Double]]]) extends Serializable {
  private val h = {
    var acc = 1
    var m = 0
    while (m < books.length) {
      var c = 0
      while (c < books(m).length) {
        acc = 31 * acc + java.util.Arrays.hashCode(books(m)(c)); c += 1
      }
      m += 1
    }
    acc
  }
  override def hashCode: Int = h
  override def equals(o: Any): Boolean = o match {
    case b: CodebookBank =>
      (b eq this) || (b.h == h && b.books.length == books.length && {
        var same = true
        var m = 0
        while (same && m < books.length) {
          same = b.books(m).length == books(m).length
          var c = 0
          while (same && c < books(m).length) {
            same = java.util.Arrays.equals(b.books(m)(c), books(m)(c)); c += 1
          }
          m += 1
        }
        same
      })
    case _ => false
  }
  override def toString: String =
    s"CodebookBank(${books.length} books, #$h)"
}

/** The `nprobe` nearest IVF cells of an `array<float>` embedding against a
  * fixed centroid table (reference `backends/faiss_ivf.py` probe step), as
  * one narrow kernel: squared-L2 to each centroid (floats promoted to
  * double, sequential accumulation — the same op order as the DuckDB
  * oracle's `list_sum`), distance rounded to 6 dp, cells ranked by
  * (d2, cell) so near-tie float noise can never flip a probe across
  * engines. Returns `array<struct<cell:long, d2:double>>`, nearest first.
  *
  * With nprobe=1 this IS the cell assignment (a narrow map — at 100 TB the
  * corpus never shuffles to get its cells); with nprobe=r it is multi-probe
  * assignment/search. Centroids ride inside the expression (a few KB), so
  * the kernel needs no join. CodegenFallback: one JVM call per row around
  * two tight loops — the surrounding stage stays codegen'd.
  */
case class IvfProbes(child: Expression, centroids: DoubleMatrix, nprobe: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cell", LongType, nullable = false),
      StructField("d2", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_ivf_probes"

  private def cents: Array[Array[Double]] = centroids.rows

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val k = cents.length
    val d2 = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      var acc = 0.0
      var j = 0
      val dim = cent.length
      while (j < dim) {
        val t = a.getFloat(j).toDouble - cent(j)
        acc += t * t
        j += 1
      }
      d2(c) = acc
      c += 1
    }
    new GenericArrayData(IvfProbes.selectRounded(d2, nprobe))
  }

  override protected def withNewChildInternal(newChild: Expression): IvfProbes =
    copy(child = newChild)
}

object IvfProbes {
  def column(c: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    Bridge.column(IvfProbes(Bridge.expression(c),
      new DoubleMatrix(centroids), nprobe))

  /** Top-`nprobe` cells by (6dp-rounded d2, cell id) from RAW distances,
    * rounding only the boundary candidates (r10: the old per-row path was
    * one BigDecimal.setScale per CENTROID plus a boxed sortBy over all K —
    * 64M BigDecimal allocations for one ivf_build pass at K=500/n=128k,
    * the flat kernel's real cost, not the arithmetic). Equivalence to
    * rounding everything: HALF_UP moves a value by ≤ 5e-7, so round(x) ==
    * round(y) requires |x−y| < 1e-6 — any cell that could TIE the m-th
    * raw-ranked cell after rounding lies within 1e-6 of it (monotonicity:
    * nothing beyond can rank strictly better). Candidates = raw ≤ m-th raw
    * + 2e-6 (double the bound for fp headroom); those are rounded exactly
    * and ordered by the canonical (rounded, id) rule. Output is therefore
    * IDENTICAL to the full-rounding program — the DuckDB oracles replay
    * unchanged — at ~m BigDecimals per row plus one primitive sort.
    */
  private[functions] def selectRounded(d2raw: Array[Double], nprobe: Int): Array[Any] = {
    val top = topByRounded(d2raw, null, nprobe)
    val out = new Array[Any](top.length)
    var i = 0
    while (i < out.length) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(top(i)._2.toLong, top(i)._1)
      i += 1
    }
    out
  }

  /** The boundary-candidate selection shared by both probe kernels:
    * top-m entries by (6dp-rounded value, id) from RAW values, where
    * `ids(i)` labels `raw(i)` (null ids = identity). See [[selectRounded]]
    * for the equivalence argument. The headroom scales with magnitude:
    * the fixed 2e-6 covers the HALF_UP quantization (≤ 5e-7 each side,
    * doubled), but round6(x).toDouble adds up to ulp(x)/2 of
    * decimal→double conversion error PER VALUE — above |x| ≈ 1e10 that
    * exceeds the fixed term (r10 advisor), so 4·ulp covers both values'
    * conversion error with the same 2× safety factor.
    */
  private[graft] def topByRounded(raw: Array[Double], ids: Array[Int],
      m0: Int): Array[(Double, Int)] = {
    val n = raw.length
    val m = math.min(m0, n)
    if (m <= 0) return Array.empty
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sorted = raw.clone()
    java.util.Arrays.sort(sorted)
    val thr = sorted(m - 1) + 2e-6 + 4 * Math.ulp(sorted(m - 1))
    // non-finite raw values are never candidates: BigDecimal(Inf/NaN)
    // throws, and an infinite distance can't rank anywhere meaningful —
    // a vector whose every distance is non-finite yields an EMPTY probe
    // list, which every consumer already handles (the memberless-super
    // path). NaN is excluded by the <= comparison itself.
    val cand = scala.collection.mutable.ArrayBuffer.empty[(Double, Int)]
    var i = 0
    while (i < n) {
      if (raw(i) <= thr && !raw(i).isInfinite)
        cand += ((r6(raw(i)), if (ids == null) i else ids(i)))
      i += 1
    }
    cand.sortBy(identity)(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
      .take(m).toArray
  }
}

/** Two-level [[IvfProbes]]: probe the `superProbes` nearest SUPER-cells
  * first, then run the exact cell argmin only over those supers' member
  * cells — O(√K + superProbes·K/√K) centroid distances per vector instead
  * of K, the coarse-assignment form that survives a corpus-proportional
  * nlist at 100 TB (FAISS IMI's trade). Distances round to 6 dp with
  * ties to the lower id at BOTH levels and the emitted (cell, d2) structs
  * follow [[IvfProbes]]' exact conventions, so a DuckDB oracle replays
  * the identical two-level program over the same literals.
  * [[DoubleMatrix]]/[[IntVec]] params keep value equality (Catalyst
  * canonicalization) at O(1) tree-op cost — at K = 65536 the old
  * Seq[Seq[Double]] form hashed ~4.2M boxed doubles per plan compare.
  */
case class IvfProbesHier(child: Expression, superCents: DoubleMatrix,
    cents: DoubleMatrix, memberOf: IntVec, superProbes: Int, nprobe: Int)
    extends UnaryExpression with CodegenFallback {

  require(memberOf.values.length == cents.rows.length,
    "memberOf must assign every cell to a super-cell")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cell", LongType, nullable = false),
      StructField("d2", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_ivf_probes_hier"

  private def sup: Array[Array[Double]] = superCents.rows
  private def cel: Array[Array[Double]] = cents.rows
  @transient private lazy val members: Array[Array[Int]] = {
    val mo = memberOf.values
    val out = Array.fill(sup.length)(new scala.collection.mutable.ArrayBuffer[Int]())
    var c = 0
    while (c < mo.length) { out(mo(c)) += c; c += 1 }
    out.map(_.toArray)
  }

  private def d2raw(a: ArrayData, cent: Array[Double]): Double = {
    var acc = 0.0
    var j = 0
    while (j < cent.length) {
      val t = a.getFloat(j).toDouble - cent(j)
      acc += t * t
      j += 1
    }
    acc
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    // both levels use the boundary-candidate rounding (IvfProbes
    // .topByRounded) — identical output to rounding every distance, at
    // ~probes BigDecimals per row instead of one per centroid visited
    val sd = Array.tabulate(sup.length)(s => d2raw(a, sup(s)))
    val probed = IvfProbes.topByRounded(sd, null, superProbes)
    val cand = probed.iterator.flatMap(p => members(p._2).iterator).toArray
    val cd = cand.map(c => d2raw(a, cel(c)))
    val top = IvfProbes.topByRounded(cd, cand, nprobe)
    val out = new Array[Any](top.length)
    var i = 0
    while (i < out.length) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(top(i)._2.toLong, top(i)._1)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): IvfProbesHier =
    copy(child = newChild)
}

object IvfProbesHier {
  def column(c: Column, superCents: Array[Array[Double]],
      cents: Array[Array[Double]], memberOf: Array[Int],
      superProbes: Int, nprobe: Int): Column =
    Bridge.column(IvfProbesHier(Bridge.expression(c),
      new DoubleMatrix(superCents), new DoubleMatrix(cents),
      new IntVec(memberOf), superProbes, nprobe))
}

object PolyHash {
  /** Hashes Unicode CODE POINTS, not UTF-16 code units (`codePointAt` +
    * `charCount` below): supplementary-plane characters (emoji, rare CJK)
    * contribute ONE term, matching the DuckDB oracles' per-character
    * `ord(substr(...))` fold exactly. Every polyhash-family oracle
    * (shingles, window hashes, simhash, minhash) depends on this parity —
    * [[graft.PolyHashSpec]] pins it with astral-plane inputs.
    */
  def hash(s: String, base: Long, mod: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column form usable anywhere a Column is, including inside
    * higher-order-function lambdas.
    */
  def column(c: Column, base: Long = 31L, mod: Long = 1000000007L): Column =
    Bridge.column(PolyHash(Bridge.expression(c), base, mod))
}

/** Product-quantization code assignment (the storage half of IVF-PQ, Jégou
  * et al. 2011): an `array<float>` embedding → per-subspace
  * `struct<code:long, d2:double>` — the argmin codebook centroid over that
  * subspace's contiguous dims plus the squared-L2 residual to it (rounded
  * 6 dp, ties to the lower code — the [[IvfProbes]] determinism rules, so
  * the DuckDB oracle replays the identical argmin over the same literals).
  *
  * One narrow JVM pass per row over all subspaces: at 100 TB the corpus
  * gets its PQ codes (SubSpaces×4 bits per vector, 64× smaller than
  * float32) without shuffling or joining anything. The codebooks ride
  * inside the expression (a few KB). CodegenFallback: one call per row
  * around tight loops; the surrounding stage stays codegen'd.
  */
case class PqCodes(child: Expression, codebooks: CodebookBank)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("code", LongType, nullable = false),
      StructField("d2", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  private def cb: Array[Array[Array[Double]]] = codebooks.books

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val out = new Array[Any](cb.length)
    var m = 0
    while (m < cb.length) {
      val book = cb(m)
      val dim = book(0).length
      val off = m * dim
      val raw = new Array[Double](book.length)
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var acc = 0.0
        var j = 0
        while (j < dim) {
          val t = a.getFloat(off + j).toDouble - cent(j)
          acc += t * t
          j += 1
        }
        raw(c) = acc
        c += 1
      }
      // argmin on the ROUNDED distance, ties to the lower code — the
      // IvfProbes rule via the SAME boundary-candidate selection
      // (topByRounded, r11): one-ish BigDecimal per subspace instead of
      // one per code visited (was codes-per-book setScale calls per row —
      // the r10 probe-kernel pathology, still live here), output
      // IDENTICAL to rounding every distance. Empty top = every distance
      // non-finite (a non-finite embedding): code 0 at +Inf, instead of
      // the BigDecimal(Inf) throw the old path hit.
      val top = IvfProbes.topByRounded(raw, null, 1)
      out(m) =
        if (top.nonEmpty)
          org.apache.spark.sql.catalyst.InternalRow(top(0)._2.toLong, top(0)._1)
        else org.apache.spark.sql.catalyst.InternalRow(0L, Double.PositiveInfinity)
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  def column(c: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqCodes(Bridge.expression(c), new CodebookBank(codebooks)))
}

/** Asymmetric-distance cosine for PQ search (the ADC scan of IVF-PQ): an
  * exact `array<float>` query (+ its precomputed norm) against a stored
  * vector's `array<long>` PQ codes. Score =
  * `Σ_m dot(q_sub_m, cent_m[code_m]) / (‖q‖ · ‖recon‖)` with the
  * reconstruction norm from the codebooks' precomputed squared norms —
  * per-subspace dots accumulate sequentially over dims and sum in subspace
  * order, the identical op sequence as the oracle's `list_sum` + fixed-order
  * additions, with 6 dp rounding at the edge.
  *
  * This is the hot scoring path of a PQ scan, so it is ONE JVM call per
  * (query, code-row) pair — codes are SubSpaces longs, the query rides the
  * broadcast side, and the codebooks (+ norms) live inside the expression.
  */
case class PqAdcScore(first: Expression, second: Expression, third: Expression,
                      codebooks: CodebookBank)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), DoubleType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, double, array<long>), " +
          s"got (${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_score"

  private def cb: Array[Array[Array[Double]]] = codebooks.books
  @transient private lazy val nsq: Array[Array[Double]] = cb.map(_.map { c =>
    var acc = 0.0
    var j = 0
    while (j < c.length) { acc += c(j) * c(j); j += 1 }
    acc
  })

  override protected def nullSafeEval(q: Any, qNrm: Any, codes: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val ca = codes.asInstanceOf[ArrayData]
    var dot = 0.0
    var rec = 0.0
    var m = 0
    while (m < cb.length) {
      val code = ca.getLong(m).toInt
      val cent = cb(m)(code)
      val dim = cent.length
      val off = m * dim
      var acc = 0.0
      var j = 0
      while (j < dim) {
        acc += qa.getFloat(off + j).toDouble * cent(j)
        j += 1
      }
      dot += acc
      rec += nsq(m)(code)
      m += 1
    }
    val score = dot / (qNrm.asInstanceOf[Double] * math.sqrt(rec))
    BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqAdcScore =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqAdcScore {
  def column(qEmb: Column, qNrm: Column, codes: Column,
             codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqAdcScore(Bridge.expression(qEmb), Bridge.expression(qNrm),
      Bridge.expression(codes), new CodebookBank(codebooks)))
}

/** Within-token adjacent character-pair counts — the count table of the
  * FIRST BPE merge iteration (tokenizer training's inner statistic: which
  * symbol pair is most frequent). One narrow map per document (the
  * [[TermCounts]] pattern: emitting a pre-aggregated `map<pair,count>`
  * keeps the corpus-sized (doc, pair) explode out of the shuffle — only
  * the pair-vocabulary agg shuffles). Pairs are taken over the same
  * whitespace tokens as every text kernel; character semantics match the
  * DuckDB oracle's `substr` on the verified-ASCII testdata (the
  * text_entropy precedent).
  */
case class PairCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "graft_pair_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val counts = PairCounts.counts(input.asInstanceOf[UTF8String].toString)
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = e.getValue
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override protected def withNewChildInternal(newChild: Expression): PairCounts =
    copy(child = newChild)
}

object PairCounts {
  def counts(text: String): java.util.LinkedHashMap[String, java.lang.Long] = {
    val m = new java.util.LinkedHashMap[String, java.lang.Long]()
    val toks = GraftText.wsTokens(text)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      var i = 0
      while (i < tok.length - 1) {
        val p = tok.substring(i, i + 2)
        val prev = m.get(p)
        m.put(p, if (prev == null) 1L else prev + 1L)
        i += 1
      }
      t += 1
    }
    m
  }

  def column(c: Column): Column = Bridge.column(PairCounts(Bridge.expression(c)))
}

/** Random-hyperplane sign-bit chunk keys of a float-array embedding, as one
  * native kernel: for each of the `planes.length` hyperplanes, the sign bit
  * of `Σ_j x_j·h_kj` (f64, ascending j — the list_sum order), packed into
  * `planes.length / chunkBits` chunk keys of `chunkBits` bits each.
  *
  * The equivalent column program is one interpreted `aggregate` fold PER
  * BIT (16 boxed 64-element folds per row — ~180 µs/row at sf0.1); this is
  * a single JVM pass. CodegenFallback: the surrounding stage stays
  * codegen'd with one call per row (the WordShingles rationale). The
  * hyperplanes ride inside the expression as literals — nothing shuffles
  * to learn them — and the arithmetic is bit-identical to the generated
  * DuckDB oracle's list_sum folds.
  */
case class VecSignChunks(child: Expression, planes: Seq[Seq[Double]], chunkBits: Int)
    extends UnaryExpression with CodegenFallback {

  // Seq params give value-based equals/hashCode (the IvfProbes pattern), so
  // Catalyst canonicalization and subexpression elimination see two
  // identical kernels as equal; the hot loop runs on a cached array view.
  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_sign_chunks"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val nChunks = planeArr.length / chunkBits
    val keys = new Array[Long](nChunks)
    var k = 0
    while (k < planeArr.length) {
      val h = planeArr(k)
      val lim = math.min(n, h.length)
      var acc = 0.0
      var j = 0
      while (j < lim) { acc += x.getFloat(j).toDouble * h(j); j += 1 }
      if (acc >= 0.0) keys(k / chunkBits) |= 1L << (k % chunkBits)
      k += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): VecSignChunks =
    copy(child = newChild)
}

object VecSignChunks {
  def column(c: Column, planes: Array[Array[Double]], chunkBits: Int): Column =
    Bridge.column(VecSignChunks(Bridge.expression(c),
      planes.map(_.toIndexedSeq).toIndexedSeq, chunkBits))
}

/** PCA projection + rank-2 residual of a float-array embedding in one
  * kernel pass: pc1/pc2 = ascending-order folds of `(x_j − μ_j)·c_kj`,
  * rounded to 6 dp exactly like Spark's `round` (BigDecimal.valueOf,
  * HALF_UP), then the residual fold uses the ROUNDED projections — the
  * identical arithmetic as the generated DuckDB oracle. Returns
  * `[pc1 … pcK, err_l2]` for K components (PCA-2 ⇒ `[pc1, pc2, err_l2]`).
  * The equivalent column program ran three
  * interpreted 64-element folds per row; this is one JVM call
  * (CodegenFallback, the WordShingles rationale).
  */
case class PcaProject(child: Expression, mean: Seq[Double],
                      comps: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {

  // Seq params for value equality (canonicalization); array views for the
  // hot loop. Output is comps.length projections + the residual, so the
  // kernel works for any component count, not just the PCA-2 default.
  @transient private lazy val meanArr: Array[Double] = mean.toArray
  @transient private lazy val compArr: Array[Array[Double]] =
    comps.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pca_project"

  private def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val lim = math.min(x.numElements(), meanArr.length)
    val p = new Array[Double](compArr.length)
    var k = 0
    while (k < compArr.length) {
      val c = compArr(k)
      var acc = 0.0
      var j = 0
      while (j < lim) {
        acc = acc + (x.getFloat(j).toDouble - meanArr(j)) * c(j)
        j += 1
      }
      p(k) = round6(acc)
      k += 1
    }
    var err = 0.0
    var j = 0
    while (j < lim) {
      var d = x.getFloat(j).toDouble - meanArr(j)
      var kk = 0
      while (kk < compArr.length) { d -= p(kk) * compArr(kk)(j); kk += 1 }
      err = err + d * d
      j += 1
    }
    val out = new Array[Double](p.length + 1)
    System.arraycopy(p, 0, out, 0, p.length)
    out(p.length) = round6(math.sqrt(err))
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PcaProject =
    copy(child = newChild)
}

object PcaProject {
  def column(c: Column, mean: Array[Double], comps: Array[Array[Double]]): Column =
    Bridge.column(PcaProject(Bridge.expression(c), mean.toIndexedSeq,
      comps.map(_.toIndexedSeq).toIndexedSeq))
}

/** Serialized-Bloom-filter holder with PRECOMPUTED hashCode and
  * eq-short-circuited equals: a 4 MiB filter as a plain binary `Literal`
  * turns every plan-tree hash/compare during analysis, optimization and
  * canonicalization into a full array scan — profiled at ~1 s of DRIVER
  * time per curation_decontam_bloom run, dwarfing the executors' 23
  * ns/probe work. As a scalar expression parameter wrapped in this class,
  * tree operations cost O(1) and the bytes still serialize into the task
  * binary exactly once per stage.
  */
final class BloomBytes(val bytes: Array[Byte]) extends Serializable {
  private val h = java.util.Arrays.hashCode(bytes)
  override def hashCode: Int = h
  override def equals(o: Any): Boolean = o match {
    case b: BloomBytes =>
      (b eq this) || (b.h == h && java.util.Arrays.equals(b.bytes, bytes))
    case _ => false
  }
  override def toString: String = s"BloomBytes(${bytes.length}B, #$h)"
  @transient lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
}

/** Probe side of `bloom_filter_agg`: `mightContainLong` against the
  * serialized filter, deserialized ONCE per instance (`@transient lazy`).
  * Replaces Spark's internal `BloomFilterMightContain` + binary-Literal
  * shape (r10): the probe itself is 23 ns, the fat Literal's plan-time
  * hashing was the cost — see [[BloomBytes]]. Same semantics: null value
  * → null; the probed value must be the same LONG hash fed to the
  * aggregate (curation_decontam_bloom probes WordShingleHashes output).
  */
case class BloomProbe(child: Expression, bf: BloomBytes)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint probe value, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_probe"

  override protected def nullSafeEval(input: Any): Any =
    bf.filter.mightContainLong(input.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object MightContain {
  def column(bloomBytes: Array[Byte], value: Column): Column =
    Bridge.column(BloomProbe(Bridge.expression(value), new BloomBytes(bloomBytes)))
}

/** Column wrapper over Spark's internal `BloomFilterAggregate` (the build
  * side of the runtime-filter pair above) — registered by Spark as an
  * internal-only routine, so it is constructed directly here. Input must
  * be LONG hashes; output is the serialized filter binary, map-side
  * merged like any typed-imperative aggregate.
  */
object BloomAgg {
  def column(value: Column, estimatedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    Bridge.column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(Bridge.expression(value),
        Literal(estimatedItems), Literal(numBits))
      .toAggregateExpression())
  }
}
