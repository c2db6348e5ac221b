package graft.sources

/** Dependency-free LZX decompressor for the CHM (ITSS) content section,
  * written from the public format documentation: Microsoft's [MS-PATCH]
  * LZX DELTA specification (the base LZX layer), the cabinet SDK's LZX
  * description, and the unofficial "Microsoft's HTML Help (.chm) format"
  * specification. Used by [[ChmParser]] the way [[XlsParser]]'s CFB layer
  * is used for `.xls` — one file decodes inside one task.
  *
  * Format summary (all public):
  *  - The bitstream is a sequence of little-endian 16-bit words; bits are
  *    consumed MSB-first within each word.
  *  - A stream starts with a 1-bit "E8 translation" flag (plus a 32-bit
  *    translation size when set), then blocks: 3-bit type (1 = verbatim,
  *    2 = aligned offset, 3 = uncompressed) and a 24-bit uncompressed
  *    length (read as 16 then 8, high bits first).
  *  - Verbatim/aligned blocks carry canonical Huffman trees: a 20-symbol
  *    pretree (4-bit lengths) delta-codes each tree's code lengths against
  *    the previous block's (zeros after a reset); codes 17/18 are zero
  *    runs, 19 is a repeat.
  *  - Main tree: 256 literals + 8 length-headers per position slot; match
  *    length 2..257 (header 7 chains to the 249-symbol length tree);
  *    offsets are slot base + extra bits, slots 0-2 are the R0/R1/R2
  *    repeated-offset stack. Aligned blocks route the low 3 offset bits
  *    through an 8-symbol aligned tree.
  *  - CHM framing: every 0x8000 bytes of output the bitstream re-aligns to
  *    a 16-bit boundary, and every `resetInterval` frames the state fully
  *    resets (trees, offset stack, E8 header) so the reset table can seek.
  *  - E8 translation (when flagged) rewrites absolute x86 call targets
  *    back to relative form per 32 KiB frame, skipping each frame's last
  *    10 bytes.
  *
  * The companion fixture writer (`scripts/make_chm_fixture.py`) is an
  * independently-written Python encoder of the same public format, so the
  * spec cross-checks two separately-written codecs (the `.xls` pattern).
  */
object Lzx {

  /** MSB-first reader over little-endian 16-bit words. The buffer never
    * holds more than 31 bits (each primitive read is <= 16), which makes
    * the two alignment forms below exact mirrors of the format's encoder
    * padding rules.
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var buf: Long = 0L
    private var nbits: Int = 0

    private def fill(): Unit = {
      val lo = if (pos < data.length) data(pos) & 0xFF else 0
      val hi = if (pos + 1 < data.length) data(pos + 1) & 0xFF else 0
      pos += 2
      buf = (buf << 16) | (lo | (hi << 8))
      nbits += 16
    }

    /** Read n <= 16 bits, MSB-first. */
    def read(n: Int): Int = {
      if (n == 0) return 0
      while (nbits < n) fill()
      nbits -= n
      val v = (buf >>> nbits) & ((1L << n) - 1)
      buf &= (1L << nbits) - 1
      v.toInt
    }

    def readBit(): Int = read(1)

    /** Uncompressed-block alignment: discard all buffered bits; when the
      * stream is already word-aligned a full 16-bit pad word is consumed.
      * `pos` is then the first raw byte.
      */
    def alignForUncompressed(): Unit = {
      if (nbits == 0) fill()
      buf = 0; nbits = 0
    }

    /** Frame-boundary alignment: pad to the next 16-bit boundary (no-op
      * when already aligned).
      */
    def alignFrame(): Unit = {
      val rem = nbits & 15
      if (rem != 0) read(rem)
    }
  }

  /** Canonical Huffman decoder: codes assigned in order of increasing
    * length, ties by symbol index (the LZX convention). An all-zero tree
    * builds but throws on use — legal whenever the block never references
    * it (e.g. the length tree of a literals-only block).
    */
  private final class Huffman(lengths: Array[Int]) {
    private val maxLen = lengths.max
    private val firstCode = new Array[Int](maxLen + 1)
    private val count = new Array[Int](maxLen + 1)
    private val offset = new Array[Int](maxLen + 1)
    private val syms: Array[Int] = {
      var l = 0
      while (l < lengths.length) { if (lengths(l) > 0) count(lengths(l)) += 1; l += 1 }
      var code = 0
      var off = 0
      var len = 1
      while (len <= maxLen) {
        firstCode(len) = code
        offset(len) = off
        code = (code + count(len)) << 1
        off += count(len)
        len += 1
      }
      val out = new Array[Int](off)
      val next = offset.clone()
      var s = 0
      while (s < lengths.length) {
        if (lengths(s) > 0) { out(next(lengths(s))) = s; next(lengths(s)) += 1 }
        s += 1
      }
      out
    }

    def nonEmpty: Boolean = syms.nonEmpty

    def decode(br: BitReader): Int = {
      require(syms.nonEmpty, "LZX: symbol requested from an empty Huffman tree")
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.readBit()
        len += 1
        val idx = code - firstCode(len)
        if (idx >= 0 && idx < count(len)) return syms(offset(len) + idx)
      }
      throw new IllegalArgumentException("LZX: invalid Huffman code in stream")
    }
  }

  private val FrameSize = 0x8000
  private val PretreeSyms = 20
  private val LengthSyms = 249
  private val AlignedSyms = 8

  private def positionSlots(windowBits: Int): Int = windowBits match {
    case 15 => 30
    case 16 => 32
    case 17 => 34
    case 18 => 36
    case 19 => 38
    case 20 => 42
    case 21 => 50
    case b => throw new IllegalArgumentException(s"LZX: unsupported window 2^$b")
  }

  private def extraBits(slot: Int): Int = math.min(17, math.max(0, slot / 2 - 1))

  private def positionBase(slots: Int): Array[Int] = {
    val base = new Array[Int](slots)
    var i = 1
    while (i < slots) { base(i) = base(i - 1) + (1 << extraBits(i - 1)); i += 1 }
    base
  }

  /** Read one Huffman tree region: pretree (20 x 4-bit lengths), then
    * delta-coded lengths over `lengths[from, until)` against their
    * previous-block values (still in the array).
    */
  private def readLengths(br: BitReader, lengths: Array[Int], from: Int, until: Int): Unit = {
    val preLens = Array.fill(PretreeSyms)(br.read(4))
    val pretree = new Huffman(preLens)
    var i = from
    while (i < until) {
      pretree.decode(br) match {
        case 17 =>
          val run = br.read(4) + 4
          var j = 0
          while (j < run && i < until) { lengths(i) = 0; i += 1; j += 1 }
        case 18 =>
          val run = br.read(5) + 20
          var j = 0
          while (j < run && i < until) { lengths(i) = 0; i += 1; j += 1 }
        case 19 =>
          val run = br.read(1) + 4
          val v = pretree.decode(br)
          require(v <= 16, "LZX: pretree repeat of a non-length code")
          val len = ((lengths(i) - v) % 17 + 17) % 17
          var j = 0
          while (j < run && i < until) { lengths(i) = len; i += 1; j += 1 }
        case v =>
          lengths(i) = ((lengths(i) - v) % 17 + 17) % 17
          i += 1
      }
    }
  }

  /** Decompress one LZX stream of `outLen` bytes (a CHM content section),
    * with CHM frame alignment and a full state reset every
    * `resetIntervalFrames` frames. `windowBits` in 15..21 from the LZXC
    * control data.
    */
  def decompress(data: Array[Byte], outLen: Int, windowBits: Int,
                 resetIntervalFrames: Int): Array[Byte] = {
    val slots = positionSlots(windowBits)
    val base = positionBase(slots)
    val mainSyms = 256 + slots * 8
    val out = new Array[Byte](outLen)
    val br = new BitReader(data, 0)

    val mainLens = new Array[Int](mainSyms)
    val lenLens = new Array[Int](LengthSyms)
    var r0, r1, r2 = 1
    var intelE8 = false
    var e8FileSize = 0
    var headerRead = false
    var blockRemaining = 0
    var blockType = 0
    var mainTree: Huffman = null
    var lenTree: Huffman = null
    var alignedTree: Huffman = null

    var outPos = 0
    var frame = 0
    while (outPos < outLen) {
      if (frame % resetIntervalFrames == 0) {
        java.util.Arrays.fill(mainLens, 0)
        java.util.Arrays.fill(lenLens, 0)
        r0 = 1; r1 = 1; r2 = 1
        headerRead = false
        blockRemaining = 0
      }
      if (!headerRead) {
        intelE8 = br.readBit() == 1
        if (intelE8) e8FileSize = (br.read(16) << 16) | br.read(16)
        headerRead = true
      }
      // absolute frame grid: a match may overshoot one boundary, in which
      // case the next iteration decodes the shortened remainder
      val frameEnd = math.min(outLen, (frame + 1) * FrameSize)
      while (outPos < frameEnd) {
        if (blockRemaining == 0) {
          blockType = br.read(3)
          blockRemaining = (br.read(16) << 8) | br.read(8)
          require(blockRemaining > 0 && blockRemaining <= outLen - outPos,
            s"LZX: block length $blockRemaining exceeds remaining output")
          blockType match {
            case 1 | 2 => // verbatim / aligned
              if (blockType == 2)
                alignedTree = new Huffman(Array.fill(AlignedSyms)(br.read(3)))
              readLengths(br, mainLens, 0, 256)
              readLengths(br, mainLens, 256, mainSyms)
              mainTree = new Huffman(mainLens)
              readLengths(br, lenLens, 0, LengthSyms)
              lenTree = new Huffman(lenLens)
            case 3 => // uncompressed
              br.alignForUncompressed()
              def le32(): Int = {
                val p = br.pos
                br.pos += 4
                (data(p) & 0xFF) | ((data(p + 1) & 0xFF) << 8) |
                  ((data(p + 2) & 0xFF) << 16) | ((data(p + 3) & 0xFF) << 24)
              }
              r0 = le32(); r1 = le32(); r2 = le32()
            case t => throw new IllegalArgumentException(s"LZX: bad block type $t")
          }
        }
        val run = math.min(blockRemaining, frameEnd - outPos)
        if (blockType == 3) {
          System.arraycopy(data, br.pos, out, outPos, run)
          br.pos += run
          outPos += run
          blockRemaining -= run
          // an odd-length uncompressed block carries one pad byte
          if (blockRemaining == 0 && (((br.pos - 12) & 1) != 0)) br.pos += 1
        } else {
          // decode until the frame boundary; a final match may overshoot it
          var decoded = 0
          while (decoded < run) {
            val sym = mainTree.decode(br)
            if (sym < 256) {
              out(outPos) = sym.toByte
              outPos += 1
              decoded += 1
            } else {
              val m = sym - 256
              val slot = m >> 3
              val lenHdr = m & 7
              var matchLen = lenHdr + 2
              if (lenHdr == 7) matchLen = lenTree.decode(br) + 9
              val off = slot match {
                case 0 => r0
                case 1 => val t = r1; r1 = r0; r0 = t; t
                case 2 => val t = r2; r2 = r0; r0 = t; t
                case _ =>
                  val extra = extraBits(slot)
                  var v = base(slot) - 2
                  if (blockType == 2 && extra >= 3) {
                    if (extra > 3) v += br.read(extra - 3) << 3
                    v += alignedTree.decode(br)
                  } else if (extra > 16) {
                    v += (br.read(extra - 16) << 16) | br.read(16)
                  } else if (extra > 0) {
                    v += br.read(extra)
                  }
                  r2 = r1; r1 = r0; r0 = v
                  v
              }
              require(off <= outPos, s"LZX: match offset $off before stream start")
              require(outPos + matchLen <= outLen, "LZX: match overruns output")
              var k = 0
              while (k < matchLen) {
                out(outPos) = out(outPos - off)
                outPos += 1
                k += 1
              }
              decoded += matchLen
            }
          }
          blockRemaining -= decoded
          require(blockRemaining >= 0, "LZX: match crossed a block boundary")
        }
      }
      // E8 translation is per decoded frame, skipping its last 10 bytes
      if (intelE8 && e8FileSize != 0 && frame < 32768) {
        val fs = frame * FrameSize
        var i = fs
        val end = math.min(outPos, fs + FrameSize) - 10
        while (i < end) {
          if ((out(i) & 0xFF) == 0xE8) {
            val abs = (out(i + 1) & 0xFF) | ((out(i + 2) & 0xFF) << 8) |
              ((out(i + 3) & 0xFF) << 16) | ((out(i + 4) & 0xFF) << 24)
            if (abs >= -i && abs < e8FileSize) {
              val rel = if (abs >= 0) abs - i else abs + e8FileSize
              out(i + 1) = rel.toByte
              out(i + 2) = (rel >> 8).toByte
              out(i + 3) = (rel >> 16).toByte
              out(i + 4) = (rel >> 24).toByte
            }
            i += 5
          } else i += 1
        }
      }
      frame += 1
      if (outPos < outLen) br.alignFrame()
    }
    out
  }
}
