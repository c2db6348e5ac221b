package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer

import org.xml.sax.Attributes
import org.xml.sax.helpers.DefaultHandler

/** Dependency-free OOXML parsers (reference `app/ingest/reader.py:153-154`
  * reads xlsx via `pandas.read_excel`; this is the same capability without
  * the pandas/openpyxl dependency): an .xlsx/.docx file is a zip of XML
  * parts, so `java.util.zip` + the JDK SAX parser cover the format.
  *
  * Pure byte[]-in, rows-out functions — no Spark types — so the same code
  * runs on the driver (schema discovery from one file) and inside executor
  * tasks (per-file parse in [[Readers.readXlsx]] / [[Readers.readDocx]]).
  *
  * Scope matches the reference's usage, not the whole OOXML spec: first
  * worksheet, shared + inline strings, raw stored cell values (dates stay
  * serial numbers, exactly the cell `<v>` content); docx = document.xml
  * paragraph text. All values surface as strings (the csv-without-
  * inferSchema convention; pandas' dtype inference is driver-side
  * guesswork a 100 TB pipeline shouldn't replicate).
  */
object OfficeParsers {

  private def saxFactory = {
    val f = javax.xml.parsers.SAXParserFactory.newInstance()
    // OOXML parts are fully self-contained; external entities are both
    // unneeded and an XXE hazard on untrusted files.
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setNamespaceAware(false)
    f
  }

  private def zipEntries(bytes: Array[Byte]): Iterator[(String, Array[Byte])] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    Iterator.continually(zin.getNextEntry).takeWhile(_ != null).map { e =>
      (e.getName, zin.readAllBytes())
    }
  }

  private def parseWith(xml: Array[Byte], handler: DefaultHandler): Unit =
    saxFactory.newSAXParser().parse(new ByteArrayInputStream(xml), handler)

  /** "A1" → 0, "B3" → 1, "AA7" → 26: base-26 column letters of a cell ref. */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  // ---- xlsx ---------------------------------------------------------------

  /** sharedStrings.xml: `<si>` items; each item's text is the concatenation
    * of its `<t>` runs (rich-text items split one string across runs).
    */
  private def sharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inT = false
    parseWith(xml, new DefaultHandler {
      override def startElement(uri: String, local: String, qn: String, at: Attributes): Unit =
        qn match {
          case "si" => sb.clear()
          case "t"  => inT = true
          case _    =>
        }
      override def endElement(uri: String, local: String, qn: String): Unit =
        qn match {
          case "si" => out += sb.toString
          case "t"  => inT = false
          case _    =>
        }
      override def characters(ch: Array[Char], start: Int, length: Int): Unit =
        if (inT) sb.appendAll(ch, start, length)
    })
    out.toIndexedSeq
  }

  /** First-worksheet rows as String cells (null = absent cell). Cell types:
    * `t="s"` shared-string index, `t="inlineStr"` inline `<is><t>`,
    * `t="b"` boolean 0/1 → false/true (pandas' bool rendering), everything
    * else (numbers, `t="str"` formula text) = the raw `<v>` content.
    */
  def parseXlsx(bytes: Array[Byte]): Seq[Seq[String]] = {
    var shared: IndexedSeq[String] = IndexedSeq.empty
    val sheets = scala.collection.mutable.LinkedHashMap.empty[String, Array[Byte]]
    zipEntries(bytes).foreach { case (name, data) =>
      name match {
        case "xl/sharedStrings.xml" => shared = sharedStrings(data)
        case n if n.startsWith("xl/worksheets/") && n.endsWith(".xml") =>
          sheets += (n -> data)
        case _ =>
      }
    }
    // pandas reads the FIRST sheet; worksheet parts are conventionally
    // sheet1.xml, sheet2.xml, … — order by the numeric suffix, not zip
    // order (zip order is writer-dependent).
    val num = "(\\d+)".r
    val sheetXml = sheets.toSeq
      .sortBy { case (n, _) => num.findFirstIn(n).map(_.toInt).getOrElse(Int.MaxValue) }
      .headOption.map(_._2)
    val rows = ArrayBuffer.empty[ArrayBuffer[String]]
    sheetXml.foreach { xml =>
      var row: ArrayBuffer[String] = null
      var cellCol = -1
      var cellType = ""
      var inV = false
      var inIsT = false
      val sb = new StringBuilder
      def endCell(): Unit = if (cellCol >= 0) {
        val raw = sb.toString
        val v = cellType match {
          case "s"         => shared.lift(raw.trim.toInt).getOrElse("")
          case "b"         => if (raw.trim == "1") "true" else "false"
          case _           => raw
        }
        while (row.length <= cellCol) row += null
        row(cellCol) = v
        cellCol = -1
      }
      parseWith(xml, new DefaultHandler {
        override def startElement(uri: String, local: String, qn: String, at: Attributes): Unit =
          qn match {
            case "row" => row = ArrayBuffer.empty[String]
            case "c" if row != null =>
              val ref = Option(at.getValue("r")).getOrElse("")
              cellCol = if (ref.nonEmpty) colIndex(ref) else row.length
              cellType = Option(at.getValue("t")).getOrElse("")
              sb.clear()
            case "v"  => inV = true
            case "t"  => inIsT = true
            case _    =>
          }
        override def endElement(uri: String, local: String, qn: String): Unit =
          qn match {
            case "row" => if (row != null) { rows += row; row = null }
            case "c"   => endCell()
            case "v"   => inV = false
            case "t"   => inIsT = false
            case _     =>
          }
        override def characters(ch: Array[Char], start: Int, length: Int): Unit =
          if (inV || (inIsT && cellType == "inlineStr")) sb.appendAll(ch, start, length)
      })
    }
    rows.map(_.toSeq).toSeq
  }

  // ---- docx ---------------------------------------------------------------

  /** word/document.xml → visible text: `<w:t>` runs concatenated within a
    * paragraph, one line per `<w:p>`, explicit breaks/tabs preserved, blank
    * paragraphs dropped (the reference's html-to-text convention:
    * one trimmed non-empty line per block).
    */
  def parseDocx(bytes: Array[Byte]): String = {
    val doc = zipEntries(bytes).collectFirst {
      case ("word/document.xml", data) => data
    }.getOrElse(throw new IllegalArgumentException(
      "not a docx: missing word/document.xml"))
    val lines = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inT = false
    parseWith(doc, new DefaultHandler {
      override def startElement(uri: String, local: String, qn: String, at: Attributes): Unit =
        qn match {
          case "w:p"                => sb.clear()
          case "w:t"                => inT = true
          case "w:br" | "w:cr"      => sb.append('\n')
          case "w:tab"              => sb.append('\t')
          case _                    =>
        }
      override def endElement(uri: String, local: String, qn: String): Unit =
        qn match {
          case "w:p" =>
            val t = sb.toString.trim
            if (t.nonEmpty) lines += t
          case "w:t" => inT = false
          case _     =>
        }
      override def characters(ch: Array[Char], start: Int, length: Int): Unit =
        if (inT) sb.appendAll(ch, start, length)
    })
    lines.mkString("\n")
  }
}
