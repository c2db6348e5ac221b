package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Dependency-free `.chm` (Compiled HTML Help, ITSF/ITSS) reader, written
  * from the public unofficial CHM format specification plus [MS-PATCH] for
  * the LZX layer ([[Lzx]]). Closes the reference's last `read_any` gap
  * (reader.py:139-149): there CHM needs Windows `hh.exe` or 7-Zip on PATH
  * and raises otherwise; here the container parses in-process on any JVM,
  * so a DIRECTORY of .chm files fans out one file per Spark task like the
  * other office formats.
  *
  * Container summary (public spec):
  *  - ITSF header (version 3): two header sections — section 0 carries the
  *    file size, section 1 is the directory (ITSP header + 0x1000-byte
  *    PMGL listing chunks / PMGI index chunks) — plus the content-section-0
  *    data offset. Directory entries are ENCINT-prefixed (big-endian 7-bit
  *    varint) UTF-8 names with (content section, offset, length).
  *  - Content section 0 is stored raw at the content offset. Content
  *    section 1 ("MSCompressed") is one LZX stream stored as a section-0
  *    system file, described by `ControlData` (LZXC window / reset
  *    interval) and `ResetTable` (uncompressed length, per-frame seek
  *    points) system entries.
  *
  * Extraction mirrors the reference's behavior after `hh.exe -decompile`
  * (reader.py:60-80): keep `.htm/.html/.hhc/.hhk` entries, HTML-to-text
  * each, drop empties, cap at `maxFiles` files / `maxBytes` HTML bytes.
  */
object ChmParser {

  /** reference reader.py:7-8 */
  val MaxChmFiles = 10000
  val MaxChmBytes: Long = 100L * 1024 * 1024

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    u16(b, i) | (u16(b, i + 2) << 16)
  private def i64(b: Array[Byte], i: Int): Long =
    (i32(b, i) & 0xFFFFFFFFL) | ((i32(b, i + 4) & 0xFFFFFFFFL) << 32)

  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, java.nio.charset.StandardCharsets.US_ASCII)

  /** One directory entry: name, content section, offset within the
    * section, uncompressed length.
    */
  private[sources] final case class Entry(name: String, section: Int, offset: Long, length: Long)

  /** Big-endian 7-bit varint; returns (value, next index). */
  private[sources] def encint(b: Array[Byte], at: Int): (Long, Int) = {
    var v = 0L
    var i = at
    while ((b(i) & 0x80) != 0) { v = (v << 7) | (b(i) & 0x7F); i += 1 }
    ((v << 7) | (b(i) & 0x7F), i + 1)
  }

  /** Parse the ITSF container into its directory plus the two section
    * readers. Returns (entries, section0 reader, lazily-decompressed
    * section 1 or None when absent).
    */
  private[sources] def parse(bytes: Array[Byte]): (Seq[Entry], (Long, Long) => Array[Byte], () => Array[Byte]) = {
    require(bytes.length >= 0x60 && ascii(bytes, 0, 4) == "ITSF",
      "not a CHM file (bad ITSF signature)")
    val version = i32(bytes, 4)
    require(version == 2 || version == 3, s"unsupported ITSF version $version")
    val dirOff = i64(bytes, 0x48)
    val dirLen = i64(bytes, 0x50)
    // v3 stores the content-section-0 offset; v2 content follows the directory
    val contentOff = if (version == 3) i64(bytes, 0x58) else dirOff + dirLen

    // ITSP directory header
    val d = dirOff.toInt
    require(ascii(bytes, d, 4) == "ITSP", "CHM: bad ITSP directory signature")
    val dirHeaderLen = i32(bytes, d + 8)
    val chunkSize = i32(bytes, d + 0x10)
    val nChunks = i32(bytes, d + 0x2C)

    val entries = ArrayBuffer.empty[Entry]
    var c = 0
    while (c < nChunks) {
      val base = d + dirHeaderLen + c * chunkSize
      if (ascii(bytes, base, 4) == "PMGL") { // listing chunk (PMGI = index, skipped)
        val quickRef = i32(bytes, base + 4)
        val end = base + chunkSize - quickRef
        var p = base + 0x14
        while (p < end) {
          val (nameLen, p1) = encint(bytes, p)
          if (nameLen == 0 || p1 + nameLen > end) { p = end } // quickref padding
          else {
            val name = new String(bytes, p1, nameLen.toInt,
              java.nio.charset.StandardCharsets.UTF_8)
            val (section, p2) = encint(bytes, p1 + nameLen.toInt)
            val (off, p3) = encint(bytes, p2)
            val (len, p4) = encint(bytes, p3)
            entries += Entry(name, section.toInt, off, len)
            p = p4
          }
        }
      }
      c += 1
    }

    def section0(off: Long, len: Long): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, (contentOff + off).toInt, (contentOff + off + len).toInt)

    def find(name: String): Option[Entry] = entries.find(_.name == name)
    def sys(name: String): Entry = find(name).getOrElse(
      throw new IllegalArgumentException(s"CHM: missing system entry $name"))

    val section1 = () => {
      val content = sys("::DataSpace/Storage/MSCompressed/Content")
      require(content.section == 0, "CHM: MSCompressed content must live in section 0")
      val control = section0Entry(bytes, contentOff, sys("::DataSpace/Storage/MSCompressed/ControlData"))
      require(ascii(control, 4, 4) == "LZXC", "CHM: ControlData is not LZXC")
      val lzxcVersion = i32(control, 8)
      require(lzxcVersion == 1 || lzxcVersion == 2, s"CHM: unsupported LZXC version $lzxcVersion")
      val unit = if (lzxcVersion == 2) 0x8000 else 1
      val resetIntervalBytes = i32(control, 12).toLong * unit
      val windowBytes = i32(control, 16).toLong * unit
      val windowBits = java.lang.Long.numberOfTrailingZeros(windowBytes)
      require(windowBytes == (1L << windowBits) && windowBits >= 15 && windowBits <= 21,
        s"CHM: bad LZX window size $windowBytes")
      val resetName = entries.map(_.name).find(n =>
        n.startsWith("::DataSpace/Storage/MSCompressed/Transform/") &&
          n.endsWith("/InstanceData/ResetTable")).getOrElse(
        throw new IllegalArgumentException("CHM: missing LZX ResetTable"))
      val reset = section0Entry(bytes, contentOff, sys(resetName))
      val uncompressedLen = i64(reset, 0x10)
      require(uncompressedLen <= MaxChmBytes * 2,
        s"CHM: compressed section too large ($uncompressedLen bytes)")
      val compressed = section0(content.offset, content.length)
      Lzx.decompress(compressed, uncompressedLen.toInt, windowBits,
        math.max(1, (resetIntervalBytes / 0x8000).toInt))
    }
    (entries.toSeq, section0, section1)
  }

  private def section0Entry(bytes: Array[Byte], contentOff: Long, e: Entry): Array[Byte] = {
    require(e.section == 0, s"CHM: system entry ${e.name} not in section 0")
    java.util.Arrays.copyOfRange(bytes, (contentOff + e.offset).toInt,
      (contentOff + e.offset + e.length).toInt)
  }

  /** The reference's `_html_to_text` (reader.py:10-21) without the parser
    * dependency: drop script/style/noscript and comments, strip tags,
    * decode common entities, collapse blank lines. Same regex pipeline as
    * [[Readers.readHtml]], applied executor-side per entry.
    */
  private[sources] def htmlToText(html: String): String = {
    var s = html
    s = s.replaceAll("(?is)<(script|style|noscript)[^>]*>.*?</\\1\\s*>", " ")
    s = s.replaceAll("(?s)<!--.*?-->", " ")
    s = s.replaceAll("(?s)<[^>]*>", " ")
    for ((e, ch) <- Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&"))
      s = s.replace(e, ch)
    s.split('\n').iterator.map(_.trim).filter(_.nonEmpty).mkString("\n")
      .replaceAll("[ \\t]+", " ").trim
  }

  private def isHtmlEntry(name: String): Boolean = {
    val low = name.toLowerCase
    low.endsWith(".htm") || low.endsWith(".html") ||
      low.endsWith(".hhc") || low.endsWith(".hhk")
  }

  /** All content entries (archive path -> raw bytes), both sections —
    * the container-level surface (a `hh.exe -decompile` analogue), used
    * directly by the byte-exact fixture spec.
    */
  /** Materialize one directory entry's bytes. CHM defines content
    * sections beyond 0 (uncompressed) and 1 (the MSCompressed LZX blob)
    * only via the NameList; any other declared section would be sliced at
    * a meaningless offset — fail with the section number instead.
    */
  private def entryBytes(e: Entry, section0: (Long, Long) => Array[Byte],
                         decompressed: => Array[Byte]): Array[Byte] = {
    require(e.section == 0 || e.section == 1,
      s"CHM: entry ${e.name} declares unsupported content section ${e.section}" +
        " (only 0/uncompressed and 1/MSCompressed are defined)")
    if (e.section == 0) section0(e.offset, e.length)
    else java.util.Arrays.copyOfRange(decompressed, e.offset.toInt,
      (e.offset + e.length).toInt)
  }

  def extract(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val (entries, section0, section1) = parse(bytes)
    lazy val decompressed = section1()
    entries.filter(e => e.name.startsWith("/") && e.length > 0).map { e =>
      (e.name, entryBytes(e, section0, decompressed))
    }
  }

  /** Extract (path, text) rows from one .chm, mirroring the reference's
    * post-decompile walk (reader.py:60-80): HTML-family entries only, the
    * same file/byte caps, empties dropped. Entry paths keep their leading
    * `/` stripped (the decompile-to-directory analogue).
    */
  def parseChm(bytes: Array[Byte],
               maxFiles: Int = MaxChmFiles,
               maxBytes: Long = MaxChmBytes): Seq[(String, String)] = {
    val (entries, section0, section1) = parse(bytes)
    val wanted = entries.filter(e => e.name.startsWith("/") && isHtmlEntry(e.name))
    lazy val decompressed = section1()
    val rows = ArrayBuffer.empty[(String, String)]
    var sizeAcc = 0L
    val it = wanted.iterator
    while (it.hasNext && rows.length < maxFiles && sizeAcc <= maxBytes) {
      val e = it.next()
      sizeAcc += e.length
      if (sizeAcc <= maxBytes) {
        val raw = entryBytes(e, section0, decompressed)
        val text = htmlToText(new String(raw, java.nio.charset.StandardCharsets.UTF_8))
        if (text.nonEmpty) rows += ((e.name.stripPrefix("/"), text))
      }
    }
    rows.toSeq
  }
}
