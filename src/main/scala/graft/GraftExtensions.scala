package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.Bridge

import graft.functions.{ChunkText, HighlightSpans, MinHashBandKeys, PairCounts, PolyHash, SimHashChunks, SliceHash, TermCounts, TextEntropy, WordShingles, WordWindowHashes}

/** SQL-surface registration of graft's native expressions.
  *
  * Cluster use: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (functions resolve in every session of the cluster).
  * Existing-session use: `GraftExtensions.register(spark)`.
  *
  * SQL: `graft_polyhash(str[, base, mod])`,
  *      `graft_word_shingles(str[, n])`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }

  private def litStr(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case _ => throw new IllegalArgumentException(s"$what must be a string literal")
  }

  private val polyHashBuilder: Seq[Expression] => Expression = {
    case Seq(s) => PolyHash(s, 31L, 1000000007L)
    case Seq(s, b, m) => PolyHash(s, litLong(b, "base"), litLong(m, "mod"))
    case args => throw new IllegalArgumentException(
      s"graft_polyhash expects 1 or 3 arguments, got ${args.length}")
  }

  private val shinglesBuilder: Seq[Expression] => Expression = {
    case Seq(s) => WordShingles(s, 3)
    case Seq(s, n) => WordShingles(s, litLong(n, "n").toInt)
    case args => throw new IllegalArgumentException(
      s"graft_word_shingles expects 1 or 2 arguments, got ${args.length}")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_polyhash",
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      polyHashBuilder),
    ("graft_word_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
      shinglesBuilder),
    ("graft_term_counts",
      new ExpressionInfo(classOf[TermCounts].getName, "graft_term_counts"),
      { case Seq(s) => TermCounts(s)
        case args => throw new IllegalArgumentException(
          s"graft_term_counts expects 1 argument, got ${args.length}") }),
    ("graft_minhash_bands",
      new ExpressionInfo(classOf[MinHashBandKeys].getName, "graft_minhash_bands"),
      { case Seq(s) => MinHashBandKeys(s)
        case args => throw new IllegalArgumentException(
          s"graft_minhash_bands expects 1 argument, got ${args.length}") }),
    ("graft_simhash_chunks",
      new ExpressionInfo(classOf[SimHashChunks].getName, "graft_simhash_chunks"),
      { case Seq(s) => SimHashChunks(s)
        case args => throw new IllegalArgumentException(
          s"graft_simhash_chunks expects 1 argument, got ${args.length}") }),
    ("graft_highlight_spans",
      new ExpressionInfo(classOf[HighlightSpans].getName, "graft_highlight_spans"),
      { case Seq(s, t) => HighlightSpans(s, litStr(t, "term"), 8)
        case Seq(s, t, cap) => HighlightSpans(s, litStr(t, "term"), litLong(cap, "cap").toInt)
        case args => throw new IllegalArgumentException(
          s"graft_highlight_spans expects 2 or 3 arguments, got ${args.length}") }),
    ("graft_text_entropy",
      new ExpressionInfo(classOf[TextEntropy].getName, "graft_text_entropy"),
      { case Seq(s) => TextEntropy(s)
        case args => throw new IllegalArgumentException(
          s"graft_text_entropy expects 1 argument, got ${args.length}") }),
    ("graft_chunk_text",
      new ExpressionInfo(classOf[ChunkText].getName, "graft_chunk_text"),
      { case Seq(s, m, sz, ov) =>
          ChunkText(s, litStr(m, "mode"), litLong(sz, "size").toInt, litLong(ov, "overlap").toInt)
        case args => throw new IllegalArgumentException(
          s"graft_chunk_text expects 4 arguments, got ${args.length}") }),
    ("graft_slice_hash",
      new ExpressionInfo(classOf[SliceHash].getName, "graft_slice_hash"),
      { case Seq(s) => SliceHash(s, graft.operators.Multimodal.PhashBits)
        case Seq(s, b) => SliceHash(s, litLong(b, "bits").toInt)
        case args => throw new IllegalArgumentException(
          s"graft_slice_hash expects 1 or 2 arguments, got ${args.length}") }),
    ("graft_pair_counts",
      new ExpressionInfo(classOf[PairCounts].getName, "graft_pair_counts"),
      { case Seq(s) => PairCounts(s)
        case args => throw new IllegalArgumentException(
          s"graft_pair_counts expects 1 argument, got ${args.length}") }),
    ("graft_word_window_hashes",
      new ExpressionInfo(classOf[WordWindowHashes].getName, "graft_word_window_hashes"),
      { case Seq(s) => WordWindowHashes(s, graft.operators.Dedup.SubstringLen)
        case Seq(s, n) => WordWindowHashes(s, litLong(n, "n").toInt)
        case args => throw new IllegalArgumentException(
          s"graft_word_window_hashes expects 1 or 2 arguments, got ${args.length}") }))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }
}
