package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftText

/** Fuzz parity: the shared kernel tokenizer must equal the ACTUAL Spark
  * column program `split(lower(trim(text)), "\\s+")` on adversarial
  * whitespace — leading/trailing \t \n \r \f \x0B, whitespace-only
  * strings, multi-space runs — the exact inputs where Java trim /
  * Pattern.split silently diverge (advisor round-2 finding).
  */
class GraftTextParitySpec extends SparkSpec {

  private def sparkTokens(texts: Seq[String]): Seq[Seq[String]] = {
    val s = spark
    import s.implicits._
    texts.toDF("text")
      .select(
        when(length(trim(col("text"))) === 0, array().cast("array<string>"))
          .otherwise(split(lower(trim(col("text"))), "\\s+")).as("toks"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
  }

  test("kernel tokens == Spark split on adversarial whitespace") {
    val cases = Seq(
      "", " ", "   ", "\t", "\n", "\r\n", "\ta", "a\t", "\tA b\n",
      "  a  b  ", "ab", "a\fb", " \t mixed  CASE text \r ",
      "\n\nleading", "trailing\n\n", "\t \t", "ONE", "a b\tc\nd\re",
      "Ünïcode  ÉÇ", "tab\tand  space")
    val rng = new scala.util.Random(42)
    val ws = " \t\n\r\f"
    val fuzz = (1 to 200).map { _ =>
      (1 to rng.nextInt(12)).map { _ =>
        if (rng.nextBoolean()) ws(rng.nextInt(ws.length)).toString
        else ('a' + rng.nextInt(26)).toChar.toString * (1 + rng.nextInt(3))
      }.mkString
    }
    val all = cases ++ fuzz
    val fromSpark = sparkTokens(all)
    all.zip(fromSpark).foreach { case (text, want) =>
      val got = GraftText.wsTokens(text).toSeq
      assert(got == want,
        s"diverged on ${text.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }
}
