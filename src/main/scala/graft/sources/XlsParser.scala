package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Dependency-free legacy `.xls` (Excel 97-2003) parser: OLE2/CFB compound
  * container + BIFF8 records, written from the public MS-CFB / MS-XLS
  * format documentation. Closes the last reader gap vs the reference's
  * `read_any` (reader.py:153 routes `.xls` through `pd.read_excel`): first
  * sheet, cell grid out, same `Seq[Seq[String]]` contract as
  * [[OfficeParsers.parseXlsx]] so [[Readers.readXls]] can share the
  * header-fit dataframe assembly. Per-file driver/executor work like the
  * xlsx path — one file parses inside one task, a directory fans out.
  *
  * Scope: BIFF8 (BOF version 0x0600) cell records — LABELSST/LABEL/
  * NUMBER/RK/MULRK/BOOLERR/FORMULA(+STRING) — with SST CONTINUE spans and
  * both CFB stream shapes (mini-stream < 4096 B and regular FAT chains).
  * Encrypted workbooks (FILEPASS) and BIFF5 fail fast with a clear
  * message rather than mis-parsing.
  */
object XlsParser {

  private val Free = 0xFFFFFFFF
  private val EndChain = 0xFFFFFFFE

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    u16(b, i) | (u16(b, i + 2) << 16)
  private def f64(b: Array[Byte], i: Int): Double = {
    var bits = 0L
    var k = 7
    while (k >= 0) { bits = (bits << 8) | (b(i + k) & 0xFFL); k -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  // ---- CFB container -----------------------------------------------------

  /** The named stream's bytes out of a compound file (MS-CFB v3/v4). */
  private[sources] def cfbStream(bytes: Array[Byte], wanted: Set[String]): Array[Byte] = {
    require(bytes.length >= 512 &&
      (0 until 8).forall(i => u8(bytes, i) ==
        Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)(i)),
      "not an OLE2 compound file (bad signature) — is this really a .xls?")
    val ssz = 1 << u16(bytes, 30)
    val mssz = 1 << u16(bytes, 32)
    val nFat = i32(bytes, 44)
    val firstDir = i32(bytes, 48)
    val cutoff = i32(bytes, 56)
    val firstMiniFat = i32(bytes, 60)
    val firstDifat = i32(bytes, 68)

    def sector(id: Int): Int = (id + 1) * ssz // MS-CFB: offset past the header

    // FAT sector list: 109 header DIFAT slots, then the DIFAT chain (each
    // DIFAT sector holds ssz/4 - 1 FAT ids + a next pointer in its last slot)
    val fatIds = ArrayBuffer.empty[Int]
    var di = 0
    while (di < 109 && fatIds.length < nFat) {
      val v = i32(bytes, 76 + di * 4)
      if (v != Free) fatIds += v
      di += 1
    }
    var difat = firstDifat
    var guard = 0
    while (difat != EndChain && difat != Free && fatIds.length < nFat && guard < (1 << 16)) {
      val base = sector(difat)
      var j = 0
      while (j < ssz / 4 - 1 && fatIds.length < nFat) {
        val v = i32(bytes, base + j * 4)
        if (v != Free) fatIds += v
        j += 1
      }
      difat = i32(bytes, base + ssz - 4)
      guard += 1
    }
    val fat = new Array[Int](fatIds.length * (ssz / 4))
    var fi = 0
    for (id <- fatIds; j <- 0 until ssz / 4) {
      fat(fi) = i32(bytes, sector(id) + j * 4); fi += 1
    }

    /** Concatenate a FAT chain, truncated to `size` (-1 = whole chain). */
    def chain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var n = 0
      while (s != EndChain && s != Free && s >= 0 && n <= fat.length) {
        val off = sector(s)
        out.write(bytes, off, math.min(ssz, bytes.length - off))
        s = if (s < fat.length) fat(s) else EndChain
        n += 1
      }
      val b = out.toByteArray
      if (size >= 0 && size < b.length) java.util.Arrays.copyOfRange(b, 0, size.toInt) else b
    }

    val dir = chain(firstDir, -1L)
    case class Entry(name: String, typ: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { k =>
      val base = k * 128
      val nameLen = math.max(0, u16(dir, base + 64) - 2)
      val name = new String(dir, base, math.min(nameLen, 64), "UTF-16LE")
      Entry(name, u8(dir, base + 66), i32(dir, base + 116),
        i32(dir, base + 120).toLong & 0xFFFFFFFFL)
    }
    val root = entries.find(_.typ == 5).getOrElse(
      throw new IllegalArgumentException("compound file has no root entry"))
    val target = entries.find(e => e.typ == 2 && wanted(e.name.toLowerCase))
      .getOrElse(throw new IllegalArgumentException(
        s"no ${wanted.mkString("/")} stream in compound file (streams: " +
          entries.filter(_.typ == 2).map(_.name).mkString(", ") + ")"))

    if (target.size >= cutoff) chain(target.start, target.size)
    else {
      // mini stream: 64-byte sectors inside the root entry's chain,
      // chained through the miniFAT
      val ministream = chain(root.start, root.size)
      val minifatBytes = chain(firstMiniFat, -1L)
      val out = new java.io.ByteArrayOutputStream()
      var s = target.start
      var n = 0
      while (s != EndChain && s != Free && s >= 0 && n <= minifatBytes.length / 4) {
        val off = s * mssz
        out.write(ministream, off, math.min(mssz, ministream.length - off))
        s = if ((s + 1) * 4 <= minifatBytes.length) i32(minifatBytes, s * 4) else EndChain
        n += 1
      }
      val b = out.toByteArray
      if (target.size < b.length) java.util.Arrays.copyOfRange(b, 0, target.size.toInt) else b
    }
  }

  // ---- BIFF8 -------------------------------------------------------------

  private case class Rec(op: Int, start: Int, len: Int)

  /** Cursor over SST payload segments (SST record + its CONTINUE records).
    * Characters re-read an option-flags byte when they resume in a new
    * CONTINUE segment (MS-XLS 2.5.293); headers and rich/ext skip bytes
    * span segments as plain bytes.
    */
  private final class SegCursor(wb: Array[Byte], segs: IndexedSeq[Rec]) {
    private var si = 0
    private var off = 0
    def hasMore: Boolean = {
      skipEmpty(); si < segs.length
    }
    private def skipEmpty(): Unit =
      while (si < segs.length && off >= segs(si).len) { si += 1; off = 0 }
    def byte(): Int = {
      skipEmpty()
      val v = u8(wb, segs(si).start + off); off += 1; v
    }
    def u16c(): Int = byte() | (byte() << 8)
    def u32c(): Long = u16c().toLong | (u16c().toLong << 16)
    def skip(n: Int): Unit = { var k = 0; while (k < n) { byte(); k += 1 } }
    def chars(cch: Int, wideAtStart: Boolean): String = {
      val sb = new java.lang.StringBuilder(cch)
      var wide = wideAtStart
      var curSeg = si // segment where the string header ended
      var remaining = cch
      while (remaining > 0) {
        skipEmpty()
        if (si != curSeg) {
          // characters resumed in a fresh CONTINUE: its first byte is a
          // new option-flags byte (the char width may change mid-string)
          curSeg = si
          wide = (byte() & 0x01) == 1
        }
        val c = if (wide) (byte() | (byte() << 8)).toChar else byte().toChar
        sb.append(c)
        remaining -= 1
      }
      sb.toString
    }
  }

  /** XLUnicodeRichExtendedString at the cursor (SST entry). */
  private def readUniString(cur: SegCursor): String = {
    val cch = cur.u16c()
    val grbit = cur.byte()
    val cRun = if ((grbit & 0x08) != 0) cur.u16c() else 0
    val cbExt = if ((grbit & 0x04) != 0) cur.u32c() else 0L
    val s = cur.chars(cch, (grbit & 0x01) == 1)
    cur.skip(cRun * 4)
    cur.skip(cbExt.toInt)
    s
  }

  /** Inline XLUnicodeString inside a single record (LABEL / STRING). */
  private def inlineUniString(wb: Array[Byte], pos: Int): String = {
    val cch = u16(wb, pos)
    val grbit = u8(wb, pos + 2)
    if ((grbit & 0x01) == 1) new String(wb, pos + 3, cch * 2, "UTF-16LE")
    else new String(wb, pos + 3, cch, "ISO-8859-1")
  }

  /** RK number decode (MS-XLS 2.5.217). */
  private def rkValue(rk: Int): Double = {
    val div100 = (rk & 0x01) != 0
    val isInt = (rk & 0x02) != 0
    val v =
      if (isInt) (rk >> 2).toDouble // arithmetic shift keeps the sign
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if (div100) v / 100.0 else v
  }

  /** Cell-value rendering, matching the xlsx reader's conventions: numbers
    * print integrally when integral (xlsx stores "42", not "42.0"),
    * booleans as true/false.
    */
  private def numStr(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString

  def parseXls(bytes: Array[Byte]): Seq[Seq[String]] =
    try parseXls0(bytes)
    catch {
      // structural offsets out of range = truncated/corrupt container;
      // surface as the same clean failure as a bad signature, not a raw
      // index error from deep inside the record walk
      case e: IndexOutOfBoundsException => throw new IllegalArgumentException(
        s"corrupt or truncated .xls (${bytes.length} bytes): ${e.getMessage}", e)
    }

  private def parseXls0(bytes: Array[Byte]): Seq[Seq[String]] = {
    val wb = cfbStream(bytes, Set("workbook", "book"))
    // record index (stop at zero-padding: op 0 is not a BIFF record)
    val recs = ArrayBuffer.empty[Rec]
    var pos = 0
    while (pos + 4 <= wb.length) {
      val op = u16(wb, pos)
      val len = u16(wb, pos + 2)
      if (op == 0 && len == 0) pos = wb.length
      else {
        if (pos + 4 + len <= wb.length) recs += Rec(op, pos + 4, len)
        pos += 4 + len
      }
    }
    require(recs.nonEmpty && recs(0).op == 0x0809,
      "no BOF record — not a BIFF workbook stream")
    require(u16(wb, recs(0).start) >= 0x0600,
      s"BIFF version ${u16(wb, recs(0).start).toHexString} unsupported " +
        "(only BIFF8 / Excel 97-2003; re-save the file or convert to .xlsx)")

    // globals substream: up to the first EOF — SST + BOUNDSHEET positions
    var sst = IndexedSeq.empty[String]
    var firstSheetPos = -1
    var gi = 0
    var done = false
    while (gi < recs.length && !done) {
      val r = recs(gi)
      r.op match {
        case 0x000A => done = true
        case 0x002F => throw new IllegalArgumentException(
          "encrypted .xls (FILEPASS) is not supported — remove the password")
        case 0x0085 => // BOUNDSHEET: first one is the sheet pandas reads
          if (firstSheetPos < 0) firstSheetPos = i32(wb, r.start)
        case 0x00FC => // SST (+ CONTINUEs)
          val segs = ArrayBuffer(Rec(r.op, r.start + 8, r.len - 8))
          var j = gi + 1
          while (j < recs.length && recs(j).op == 0x003C) {
            segs += recs(j); j += 1
          }
          val unique = i32(wb, r.start + 4)
          val cur = new SegCursor(wb, segs.toIndexedSeq)
          val out = ArrayBuffer.empty[String]
          var k = 0
          while (k < unique && cur.hasMore) { out += readUniString(cur); k += 1 }
          sst = out.toIndexedSeq
        case _ =>
      }
      gi += 1
    }

    // first worksheet substream: cell records until its EOF
    val startPos = if (firstSheetPos >= 0) firstSheetPos else {
      // no BOUNDSHEET (single-substream writers): continue after globals EOF
      if (gi < recs.length) recs(gi).start - 4 else wb.length
    }
    val cells = scala.collection.mutable.SortedMap.empty[Int, ArrayBuffer[String]]
    def put(row: Int, colIdx: Int, v: String): Unit = {
      val r = cells.getOrElseUpdate(row, ArrayBuffer.empty[String])
      while (r.length <= colIdx) r += null
      r(colIdx) = v
    }
    var si = recs.indexWhere(_.start - 4 >= startPos)
    var inSheet = si >= 0
    var pendingString: Option[(Int, Int)] = None // FORMULA expecting a STRING
    while (inSheet && si < recs.length) {
      val r = recs(si)
      r.op match {
        case 0x000A => inSheet = false
        case 0x00FD => // LABELSST
          put(u16(wb, r.start), u16(wb, r.start + 2),
            sst.lift(i32(wb, r.start + 6)).getOrElse(""))
        case 0x0204 => // LABEL (inline string)
          put(u16(wb, r.start), u16(wb, r.start + 2),
            inlineUniString(wb, r.start + 6))
        case 0x0203 => // NUMBER
          put(u16(wb, r.start), u16(wb, r.start + 2), numStr(f64(wb, r.start + 6)))
        case 0x027E => // RK
          put(u16(wb, r.start), u16(wb, r.start + 2),
            numStr(rkValue(i32(wb, r.start + 6))))
        case 0x00BD => // MULRK: row, colFirst, (ixfe, rk)*, colLast
          val row = u16(wb, r.start)
          val c0 = u16(wb, r.start + 2)
          val n = (r.len - 6) / 6
          var k = 0
          while (k < n) {
            put(row, c0 + k, numStr(rkValue(i32(wb, r.start + 4 + k * 6 + 2))))
            k += 1
          }
        case 0x0205 => // BOOLERR
          if (u8(wb, r.start + 7) == 0)
            put(u16(wb, r.start), u16(wb, r.start + 2),
              if (u8(wb, r.start + 6) == 1) "true" else "false")
        case 0x0006 => // FORMULA: cached result
          val row = u16(wb, r.start)
          val c = u16(wb, r.start + 2)
          if (u16(wb, r.start + 12) == 0xFFFF) u8(wb, r.start + 6) match {
            case 0 => pendingString = Some((row, c)) // string in next STRING rec
            case 1 => put(row, c, if (u8(wb, r.start + 8) == 1) "true" else "false")
            case _ => // error / empty-string result -> null cell
          }
          else put(row, c, numStr(f64(wb, r.start + 6)))
        case 0x0207 => // STRING: cached string result of the prior FORMULA
          pendingString.foreach { case (row, c) =>
            put(row, c, inlineUniString(wb, r.start))
          }
          pendingString = None
        case _ =>
      }
      si += 1
    }
    cells.valuesIterator.map(_.toSeq).toSeq
  }
}
