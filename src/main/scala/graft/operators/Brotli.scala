package graft.operators

/** Bounded pure-JVM RFC 7932 (Brotli) inflate — the FULL format (r17;
  * supersedes the r16 stored-only subset): stream header (all WBITS
  * codes), uncompressed and metadata meta-blocks, and compressed
  * meta-blocks with the complete machinery — simple and complex prefix
  * codes, literal/insert-copy/distance block switching, the four
  * literal context modes, RLE+inverse-MTF context maps, the distance
  * ring buffer and postfix/direct distance codes, and static-dictionary
  * references with all 121 word transforms.
  *
  * The RFC's normative data tables ride as classpath resources
  * extracted by `tools/gen_brotli_assets.py` from the system brotli
  * library and pinned by hash there: the 122,784-byte static dictionary
  * (RFC 7932 Appendix A), the 121 transforms (Appendix B), and the
  * 2,048-byte literal-context lookup table (§7.1). Everything else —
  * insert/copy/block-count code tables, the code-length-code fixed
  * prefix code, the short-distance ring semantics — is transcribed from
  * the RFC text below and VERIFIED empirically: BrotliSpec round-trips
  * fixture streams produced by the real encoder at qualities 0-11 and
  * window sizes 10-24 (`fixtures/brotli_vectors.parquet`), so a wrong
  * table constant cannot survive the suite.
  *
  * Total and bounded, the [[Warc]] contract: malformed framing, an
  * invalid prefix code, a bit overrun, or output past `cap` returns
  * None, never throws and never spins — every loop is bounded by the
  * declared meta-block length, the alphabet size, or the input bit
  * count (a poisoned record must not kill a 100 TB scan). Scale shape:
  * one pass over the input bits, output buffer doubles up to the cap,
  * O(code length) tree-walk per symbol — a per-row CPU-bounded decode
  * with no allocation proportional to anything but the output.
  *
  * Reference: RFC 7932 §§2-10 and appendices A/B. */
object Brotli {

  // ------------------------------------------------------ static assets

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    try in.readAllBytes() finally in.close()
  }

  /** RFC 7932 Appendix A: the static dictionary bytes. */
  private lazy val Dict: Array[Byte] = resource("/graft/brotli_dict.bin")

  /** §7.1 context lookup: 512 bytes per mode (p1 map ++ p2 map). */
  private lazy val CtxLut: Array[Byte] = resource("/graft/brotli_ctx.bin")

  /** Appendix B transform kinds: 0 identity, 1-9 omit-last-k,
    * 10 uppercase-first, 11 uppercase-all, 12-20 omit-first-k. */
  private final case class Transform(prefix: Array[Byte], kind: Int,
                                     suffix: Array[Byte])

  private lazy val Transforms: Array[Transform] = {
    val b = resource("/graft/brotli_transforms.bin")
    val out = Array.newBuilder[Transform]
    var i = 0
    while (i < b.length) {
      val pl = b(i) & 0xff
      val pre = java.util.Arrays.copyOfRange(b, i + 1, i + 1 + pl)
      i += 1 + pl
      val kind = b(i) & 0xff
      val sl = b(i + 1) & 0xff
      val suf = java.util.Arrays.copyOfRange(b, i + 2, i + 2 + sl)
      i += 2 + sl
      out += Transform(pre, kind, suf)
    }
    val t = out.result()
    require(t.length == 121, s"transform table carries ${t.length} entries")
    t
  }

  /** Appendix A: dictionary words per length (log2) and byte offsets. */
  private val DictSizeBits = Array(0, 0, 0, 0, 10, 10, 11, 11, 10, 10,
    10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5)
  private val DictOffsets = Array(0, 0, 0, 0, 0, 4096, 9216, 21504,
    35840, 44032, 53248, 63488, 74752, 87040, 93696, 100864, 104704,
    106752, 108928, 113536, 115968, 118528, 119872, 121280, 122016)

  // ------------------------------------------- fixed RFC code tables

  /** §5: insert-length codes (offset, extra bits). */
  private val InsOffset = Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26,
    34, 50, 66, 98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
  private val InsExtra = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
    5, 5, 6, 7, 8, 9, 10, 12, 14, 24)

  /** §5: copy-length codes (offset, extra bits). */
  private val CpyOffset = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18,
    22, 30, 38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private val CpyExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 5, 6, 7, 8, 9, 10, 24)

  /** §5 cell table: insert/copy code bases per 64-symbol cell of the
    * 704-symbol insert&copy alphabet (cells 0-1 repeat 2-3 with the
    * implicit last-distance). */
  private val CellIns = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CellCpy = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)

  /** §6: block-count codes (offset, extra bits). */
  private val BlkOffset = Array(1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81,
    97, 113, 145, 177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337,
    8433, 16625)
  private val BlkExtra = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5,
    5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)

  /** §4: the 16 short distance codes — ring index offset (relative to
    * the next-write slot) and value delta. */
  private val ShortIdx = Array(3, 2, 1, 0, 3, 3, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2)
  private val ShortOff = Array(0, 0, 0, 0, -1, 1, -2, 2, -3, 3, -1, 1, -2, 2, -3, 3)

  /** §3.5: reading order of the code-length-code lengths. */
  private val ClclOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10,
    11, 12, 13, 14, 15)

  // ------------------------------------------------------- bit reader

  /** LSB-first bit reader over `p`; `read` returns -1 on overrun (all
    * callers check — reads are at most 24 bits wide so the sentinel
    * never collides). */
  private final class Bits(p: Array[Byte]) {
    var pos: Long = 0L
    var bad = false
    def read(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val bi = (pos >> 3).toInt
        if (bi >= p.length) { bad = true; return -1 }
        v |= ((p(bi) >> (pos & 7).toInt) & 1) << k
        pos += 1
        k += 1
      }
      v
    }
    def alignToByte(): Unit = pos = (pos + 7) & ~7L
    def byteIndex: Int = (pos >> 3).toInt
  }

  // ------------------------------------------------------ prefix codes

  /** Canonical prefix decoder over per-symbol code lengths (≤15).
    * Codes are assigned per the RFC: increasing length, increasing
    * symbol within a length, read most-significant bit first. A code
    * that is not COMPLETE (leaves of a full binary tree) is invalid —
    * except the degenerate one-symbol code, which consumes no bits. */
  private final class Huff(lens: Array[Int]) {
    private val count = new Array[Int](16)
    lens.foreach(l => if (l > 0) count(l) += 1)
    private val nSyms = lens.count(_ > 0)
    val single: Int = if (nSyms == 1) lens.indexWhere(_ > 0) else -1
    // firstCode(l): smallest code of length l; symBase(l): index into
    // `sorted` of that code's symbol
    private val firstCode = new Array[Int](16)
    private val symBase = new Array[Int](16)
    private val sorted = new Array[Int](math.max(nSyms, 1))
    val valid: Boolean = {
      var code = 0
      var base = 0
      var space = 0
      var l = 1
      while (l <= 15) {
        firstCode(l) = code
        symBase(l) = base
        code = (code + count(l)) << 1
        base += count(l)
        space += count(l) << (15 - l)
        l += 1
      }
      var i = 0
      val fill = new Array[Int](16)
      while (i < lens.length) {
        val ln = lens(i)
        if (ln > 0) {
          sorted(symBase(ln) + fill(ln)) = i
          fill(ln) += 1
        }
        i += 1
      }
      nSyms == 1 || space == (1 << 15)
    }
    def decode(b: Bits): Int = {
      if (single >= 0) return single
      var acc = 0
      var l = 1
      while (l <= 15) {
        val bit = b.read(1)
        if (bit < 0) return -1
        acc = (acc << 1) | bit
        val d = acc - firstCode(l)
        if (d >= 0 && d < count(l)) return sorted(symBase(l) + d)
        l += 1
      }
      -1
    }
  }

  /** §3.5 fixed prefix code for the code-length-code lengths:
    * 0→"00", 3→"01", 4→"10", 2→"110", 1→"1110", 5→"1111". */
  private def readClcl(b: Bits): Int = {
    b.read(1) match {
      case 0 => b.read(1) match {
        case 0 => 0
        case 1 => 3
        case _ => -1
      }
      case 1 => b.read(1) match {
        case 0 => 4
        case 1 => b.read(1) match {
          case 0 => 2
          case 1 => b.read(1) match {
            case 0 => 1
            case 1 => 5
            case _ => -1
          }
          case _ => -1
        }
        case _ => -1
      }
      case _ => -1
    }
  }

  /** §3.2-3.5: one prefix code over `alphabet` symbols — simple
    * (1-4 listed symbols) or complex (code-length-code + RLE). */
  private def readHuffman(b: Bits, alphabet: Int): Huff = {
    val hskip = b.read(2)
    if (hskip < 0) return InvalidHuff
    if (hskip == 1) {
      // simple: NSYM explicit symbols
      val nsym = b.read(2) + 1
      if (nsym <= 0) return InvalidHuff
      var alphaBits = 0
      while ((1 << alphaBits) < alphabet) alphaBits += 1
      val syms = new Array[Int](nsym)
      var i = 0
      while (i < nsym) {
        val s = b.read(alphaBits)
        if (s < 0 || s >= alphabet) return InvalidHuff
        var j = 0
        while (j < i) { if (syms(j) == s) return InvalidHuff; j += 1 }
        syms(i) = s
        i += 1
      }
      val lens = new Array[Int](alphabet)
      nsym match {
        case 1 => lens(syms(0)) = 1 // degenerate: consumes no bits
        case 2 => lens(syms(0)) = 1; lens(syms(1)) = 1
        case 3 => lens(syms(0)) = 1; lens(syms(1)) = 2; lens(syms(2)) = 2
        case 4 =>
          val treeSel = b.read(1)
          if (treeSel < 0) return InvalidHuff
          if (treeSel == 0) syms.foreach(lens(_) = 2)
          else {
            lens(syms(0)) = 1; lens(syms(1)) = 2
            lens(syms(2)) = 3; lens(syms(3)) = 3
          }
      }
      val h = new Huff(if (nsym == 1) {
        val l = new Array[Int](alphabet); l(syms(0)) = 1; l
      } else lens)
      return if (h.valid) h else InvalidHuff
    }
    // complex: code lengths for the 18-symbol code-length alphabet,
    // starting at ClclOrder index `hskip`
    val clcl = new Array[Int](18)
    var space = 32
    var numCodes = 0
    var oi = hskip
    while (oi < 18 && space > 0) {
      val v = readClcl(b)
      if (v < 0) return InvalidHuff
      clcl(ClclOrder(oi)) = v
      if (v != 0) { space -= 32 >> v; numCodes += 1 }
      oi += 1
    }
    if (space < 0 || (space != 0 && numCodes != 1)) return InvalidHuff
    val clHuff = new Huff(clcl)
    if (!clHuff.valid) return InvalidHuff
    // symbol code lengths with 16 (repeat prev non-zero) / 17 (zeros)
    val lens = new Array[Int](alphabet)
    var symbol = 0
    var prevLen = 8
    var repeat = 0
    var repeatLen = 0
    var space2 = 32768
    while (symbol < alphabet && space2 > 0) {
      val cl = clHuff.decode(b)
      if (cl < 0 || b.bad) return InvalidHuff
      if (cl < 16) {
        lens(symbol) = cl
        symbol += 1
        if (cl != 0) { prevLen = cl; space2 -= 32768 >> cl }
        repeat = 0
      } else {
        val extraBits = if (cl == 16) 2 else 3
        val newLen = if (cl == 16) prevLen else 0
        if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
        val oldRepeat = repeat
        if (repeat > 0) repeat = (repeat - 2) << extraBits
        val e = b.read(extraBits)
        if (e < 0) return InvalidHuff
        repeat += e + 3
        val delta = repeat - oldRepeat
        if (symbol + delta > alphabet) return InvalidHuff
        var k = 0
        while (k < delta) { lens(symbol) = repeatLen; symbol += 1; k += 1 }
        if (repeatLen != 0) space2 -= delta << (15 - repeatLen)
      }
    }
    if (space2 != 0) return InvalidHuff
    val h = new Huff(lens)
    if (h.valid) h else InvalidHuff
  }

  private val InvalidHuff: Huff = null

  /** §7.3: context map over `size` entries into `numTrees` trees —
    * zero-RLE prefix code plus optional inverse move-to-front. */
  private def readContextMap(b: Bits, size: Int, numTrees: Int): Array[Int] = {
    val map = new Array[Int](size)
    if (numTrees <= 1) return map
    val useRle = b.read(1)
    if (useRle < 0) return null
    val rlemax = if (useRle == 1) {
      val v = b.read(4); if (v < 0) return null; v + 1
    } else 0
    val h = readHuffman(b, rlemax + numTrees)
    if (h == InvalidHuff) return null
    var i = 0
    while (i < size) {
      val sym = h.decode(b)
      if (sym < 0 || b.bad) return null
      if (sym == 0) { map(i) = 0; i += 1 }
      else if (sym <= rlemax) {
        val e = b.read(sym)
        if (e < 0) return null
        val reps = (1 << sym) + e
        if (i + reps > size) return null
        var k = 0
        while (k < reps) { map(i) = 0; i += 1; k += 1 }
      } else {
        map(i) = sym - rlemax
        i += 1
      }
    }
    val imtf = b.read(1)
    if (imtf < 0) return null
    if (imtf == 1) {
      // inverse move-to-front over the tree indices
      val mtf = Array.tabulate(numTrees)(identity)
      var j = 0
      while (j < size) {
        val idx = map(j)
        val v = mtf(idx)
        var k = idx
        while (k > 0) { mtf(k) = mtf(k - 1); k -= 1 }
        mtf(0) = v
        map(j) = v
        j += 1
      }
    }
    map
  }

  /** §9.1: 1-7 bit WBITS code → window bits 10-24, or -1 on a
    * reserved/invalid code. */
  private def readWbits(b: Bits): Int = {
    if (b.read(1) == 0) return 16
    val n = b.read(3)
    if (n < 0) return -1
    if (n != 0) return 17 + n
    val m = b.read(3)
    if (m < 0 || m == 1) return -1 // reserved
    if (m == 0) 17 else 8 + m
  }

  /** §6: NBLTYPES / NTREES var-length 1..256. */
  private def readVarLenU8(b: Bits): Int = {
    val f = b.read(1)
    if (f < 0) return -1
    if (f == 0) return 1
    val nbits = b.read(3)
    if (nbits < 0) return -1
    val e = b.read(nbits)
    if (e < 0) return -1
    (1 << nbits) + 1 + e
  }

  /** §8: in-place UTF-8-aware uppercase of `w` at `i`; returns the
    * step width. The RFC's exact rule — not a real case map for
    * non-ASCII, by design. */
  private def upperStep(w: Array[Byte], i: Int): Int = {
    val c = w(i) & 0xff
    if (c < 192) {
      if (c >= 97 && c <= 122) w(i) = (c ^ 32).toByte
      1
    } else if (c < 224) {
      if (i + 1 < w.length) w(i + 1) = (w(i + 1) ^ 32).toByte
      2
    } else {
      if (i + 2 < w.length) w(i + 2) = (w(i + 2) ^ 5).toByte
      3
    }
  }

  /** Appendix B: transformed dictionary word. */
  private def applyTransform(word: Array[Byte], t: Transform): Array[Byte] = {
    val core: Array[Byte] = t.kind match {
      case 0 => word.clone()
      case k if k >= 1 && k <= 9 => // omit last k
        if (k >= word.length) Array.emptyByteArray
        else java.util.Arrays.copyOfRange(word, 0, word.length - k)
      case 10 => // uppercase first
        val w = word.clone(); if (w.nonEmpty) upperStep(w, 0); w
      case 11 => // uppercase all
        val w = word.clone()
        var i = 0
        while (i < w.length) i += upperStep(w, i)
        w
      case k if k >= 12 && k <= 20 => // omit first k-11
        val n = k - 11
        if (n >= word.length) Array.emptyByteArray
        else java.util.Arrays.copyOfRange(word, n, word.length)
      case _ => null
    }
    if (core == null) return null
    val out = new Array[Byte](t.prefix.length + core.length + t.suffix.length)
    System.arraycopy(t.prefix, 0, out, 0, t.prefix.length)
    System.arraycopy(core, 0, out, t.prefix.length, core.length)
    System.arraycopy(t.suffix, 0, out, t.prefix.length + core.length,
      t.suffix.length)
    out
  }

  // --------------------------------------------------------- inflate

  /** Inflate a brotli stream; None on malformed input, an invalid
    * prefix code, or past `cap` inflated bytes. Never throws. */
  def inflate(p: Array[Byte], cap: Long): Option[Array[Byte]] =
    try inflate0(p, cap) catch { case _: Throwable => None }

  private def inflate0(p: Array[Byte], cap: Long): Option[Array[Byte]] = {
    if (p.isEmpty) return None
    val b = new Bits(p)
    val wbits = readWbits(b)
    if (wbits < 0) return None
    val window = (1 << wbits) - 16
    var out = new Array[Byte](math.min(math.max(p.length * 4, 1 << 12),
      math.min(cap, 1 << 22).toInt.max(64)))
    var pos = 0
    def ensure(extra: Int): Boolean = {
      if (pos.toLong + extra > cap) return false
      if (pos + extra > out.length) {
        var n = out.length.toLong
        while (n < pos.toLong + extra) n *= 2
        out = java.util.Arrays.copyOf(out, math.min(n, cap).toInt)
      }
      true
    }
    // the distance ring buffer (§4): last = rb((rbIdx + 3) & 3)
    val rb = Array(16, 15, 11, 4)
    var rbIdx = 0
    var done = false
    while (!done) {
      val islast = b.read(1)
      if (islast < 0) return None
      if (islast == 1) {
        val isempty = b.read(1)
        if (isempty < 0) return None
        if (isempty == 1) { done = true }
        else if (!decodeDataBlock(b, isLast = true)) return None
        else done = true
      } else if (!decodeDataBlock(b, isLast = false)) return None
    }

    // one non-empty meta-block (metadata / uncompressed / compressed);
    // returns false on any malformation
    def decodeDataBlock(b: Bits, isLast: Boolean): Boolean = {
      val m = b.read(2)
      if (m < 0) return false
      if (m == 3) {
        // metadata meta-block (§9.2): reserved bit, MSKIPBYTES,
        // byte-aligned skip
        if (b.read(1) != 0) return false
        val skipBytes = b.read(2)
        if (skipBytes < 0) return false
        var skipLen = 0
        var k = 0
        while (k < skipBytes) {
          val by = b.read(8)
          if (by < 0) return false
          skipLen |= by << (8 * k)
          k += 1
        }
        if (skipBytes > 0) skipLen += 1
        b.alignToByte()
        b.pos += skipLen.toLong * 8
        if (b.byteIndex > p.length) return false
        return true
      }
      val nibbles = 4 + m
      val mlenRaw = b.read(4 * nibbles)
      if (mlenRaw < 0) return false
      // >4 nibbles with a zero top nibble is non-canonical (§9.2)
      if (nibbles > 4 && (mlenRaw >> (4 * (nibbles - 1))) == 0) return false
      val mlen = mlenRaw + 1
      if (!isLast) {
        val isUncompressed = b.read(1)
        if (isUncompressed < 0) return false
        if (isUncompressed == 1) {
          b.alignToByte()
          val start = b.byteIndex
          if (start + mlen > p.length) return false
          if (!ensure(mlen)) return false
          System.arraycopy(p, start, out, pos, mlen)
          pos += mlen
          b.pos += mlen.toLong * 8
          return true
        }
      }
      decodeCompressed(b, mlen)
    }

    // §9.3: one compressed meta-block of `mlen` output bytes
    def decodeCompressed(b: Bits, mlen: Int): Boolean = {
      // block types / counts for the three categories (L, I, D)
      val nTypes = new Array[Int](3)
      val typeHuff = new Array[Huff](3)
      val countHuff = new Array[Huff](3)
      val bType = new Array[Int](3)
      val bTypePrev = new Array[Int](3)
      val bCount = new Array[Long](3)
      var c = 0
      while (c < 3) {
        val n = readVarLenU8(b)
        if (n < 1 || n > 256) return false
        nTypes(c) = n
        bType(c) = 0
        bTypePrev(c) = 1
        if (n >= 2) {
          val th = readHuffman(b, n + 2)
          if (th == InvalidHuff) return false
          val ch = readHuffman(b, 26)
          if (ch == InvalidHuff) return false
          typeHuff(c) = th
          countHuff(c) = ch
          val sym = ch.decode(b)
          if (sym < 0 || sym >= 26 || b.bad) return false
          val e = b.read(BlkExtra(sym))
          if (e < 0) return false
          bCount(c) = BlkOffset(sym).toLong + e
        } else bCount(c) = Long.MaxValue
        c += 1
      }
      // a block switch for category c (§6)
      def switchBlock(c: Int): Boolean = {
        val sym = typeHuff(c).decode(b)
        if (sym < 0 || b.bad) return false
        val nt = sym match {
          case 0 => bTypePrev(c)
          case 1 => (bType(c) + 1) % nTypes(c)
          case s => s - 2
        }
        if (nt >= nTypes(c)) return false
        bTypePrev(c) = bType(c)
        bType(c) = nt
        val cs = countHuff(c).decode(b)
        if (cs < 0 || cs >= 26 || b.bad) return false
        val e = b.read(BlkExtra(cs))
        if (e < 0) return false
        bCount(c) = BlkOffset(cs).toLong + e
        true
      }
      val npostfix = b.read(2)
      if (npostfix < 0) return false
      val ndirectRaw = b.read(4)
      if (ndirectRaw < 0) return false
      val ndirect = ndirectRaw << npostfix
      // context mode per literal block type (§7.1)
      val ctxModes = new Array[Int](nTypes(0))
      var i = 0
      while (i < nTypes(0)) {
        val cm = b.read(2)
        if (cm < 0) return false
        ctxModes(i) = cm
        i += 1
      }
      // context maps (§7.3)
      val nTreesL = readVarLenU8(b)
      if (nTreesL < 1 || nTreesL > 256) return false
      val cmapL = readContextMap(b, 64 * nTypes(0), nTreesL)
      if (cmapL == null) return false
      val nTreesD = readVarLenU8(b)
      if (nTreesD < 1 || nTreesD > 256) return false
      val cmapD = readContextMap(b, 4 * nTypes(2), nTreesD)
      if (cmapD == null) return false
      // the prefix-code arrays
      val litHuff = new Array[Huff](nTreesL)
      i = 0
      while (i < nTreesL) {
        litHuff(i) = readHuffman(b, 256)
        if (litHuff(i) == InvalidHuff) return false
        i += 1
      }
      val icHuff = new Array[Huff](nTypes(1))
      i = 0
      while (i < nTypes(1)) {
        icHuff(i) = readHuffman(b, 704)
        if (icHuff(i) == InvalidHuff) return false
        i += 1
      }
      val distAlphabet = 16 + ndirect + (48 << npostfix)
      val distHuff = new Array[Huff](nTreesD)
      i = 0
      while (i < nTreesD) {
        distHuff(i) = readHuffman(b, distAlphabet)
        if (distHuff(i) == InvalidHuff) return false
        i += 1
      }
      // ------------------------------------------------ command loop
      var mpos = 0
      while (mpos < mlen) {
        if (bCount(1) == 0 && !switchBlock(1)) return false
        bCount(1) -= 1
        val cmd = icHuff(bType(1)).decode(b)
        if (cmd < 0 || b.bad) return false
        val implicitD0 = cmd < 128
        val cell = if (implicitD0) cmd >> 6 else (cmd >> 6) - 2
        val insCode = CellIns(cell) + ((cmd >> 3) & 7)
        val cpyCode = CellCpy(cell) + (cmd & 7)
        val ie = b.read(InsExtra(insCode))
        if (ie < 0) return false
        val insertLen = InsOffset(insCode) + ie
        val ce = b.read(CpyExtra(cpyCode))
        if (ce < 0) return false
        val copyLen = CpyOffset(cpyCode) + ce
        // literals (context-mapped per §7)
        if (mpos + insertLen > mlen) return false
        if (!ensure(insertLen)) return false
        var j = 0
        while (j < insertLen) {
          if (bCount(0) == 0 && !switchBlock(0)) return false
          bCount(0) -= 1
          val mode = ctxModes(bType(0))
          val p1 = if (pos > 0) out(pos - 1) & 0xff else 0
          val p2 = if (pos > 1) out(pos - 2) & 0xff else 0
          val ctx = (CtxLut((mode << 9) + p1) & 0xff) |
            (CtxLut((mode << 9) + 256 + p2) & 0xff)
          val tree = cmapL(64 * bType(0) + ctx)
          val lit = litHuff(tree).decode(b)
          if (lit < 0 || b.bad) return false
          out(pos) = lit.toByte
          pos += 1
          mpos += 1
          j += 1
        }
        if (mpos == mlen) return true // insert-only tail command
        // distance (§4)
        var distance = 0
        var pushRing = false
        if (implicitD0) {
          distance = rb((rbIdx + 3) & 3)
        } else {
          if (bCount(2) == 0 && !switchBlock(2)) return false
          bCount(2) -= 1
          val distCtx = math.min(copyLen, 5) - 2
          val tree = cmapD(4 * bType(2) + distCtx)
          val dcode = distHuff(tree).decode(b)
          if (dcode < 0 || b.bad) return false
          if (dcode < 16) {
            distance = rb((rbIdx + ShortIdx(dcode)) & 3) + ShortOff(dcode)
            if (distance <= 0) return false
          } else if (dcode < 16 + ndirect) {
            distance = dcode - 15
          } else {
            val pofsMask = (1 << npostfix) - 1
            val d0 = dcode - ndirect - 16
            val postfix = d0 & pofsMask
            val d1 = d0 >> npostfix
            val nbits = 1 + (d1 >> 1)
            val e = b.read(nbits)
            if (e < 0) return false
            val offset = ((2 + (d1 & 1)) << nbits) - 4
            distance = ((offset + e) << npostfix) + postfix + ndirect + 1
          }
          pushRing = dcode != 0
        }
        val maxDistance = math.min(pos, window)
        if (distance <= maxDistance) {
          // backward copy from the output (overlap allowed)
          if (mpos + copyLen > mlen) return false
          if (!ensure(copyLen)) return false
          var k = 0
          while (k < copyLen) {
            out(pos) = out(pos - distance)
            pos += 1
            k += 1
          }
          mpos += copyLen
          if (pushRing) {
            rb(rbIdx & 3) = distance
            rbIdx += 1
          }
        } else {
          // static dictionary reference (§8) — never enters the ring
          if (copyLen < 4 || copyLen > 24 || DictSizeBits(copyLen) == 0)
            return false
          val wordId = distance - maxDistance - 1
          val sizeBits = DictSizeBits(copyLen)
          val index = wordId & ((1 << sizeBits) - 1)
          val tId = wordId >> sizeBits
          if (tId >= 121) return false
          val word = java.util.Arrays.copyOfRange(Dict,
            DictOffsets(copyLen) + index * copyLen,
            DictOffsets(copyLen) + (index + 1) * copyLen)
          val tw = applyTransform(word, Transforms(tId))
          if (tw == null) return false
          if (mpos + tw.length > mlen) return false
          if (!ensure(tw.length)) return false
          System.arraycopy(tw, 0, out, pos, tw.length)
          pos += tw.length
          mpos += tw.length
        }
      }
      true
    }

    Some(java.util.Arrays.copyOf(out, pos))
  }
}
