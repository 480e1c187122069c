package graft.operators

/** Bounded pure-JVM RFC 7932 (Brotli) inflate — the STORED subset
  * (r16 verdict #6): stream header (all 15 WBITS codes), UNCOMPRESSED
  * meta-blocks (the exact framing `brotli -q 0` emits for
  * incompressible payloads — ISUNCOMPRESSED=1, byte-aligned literal
  * run), METADATA meta-blocks (skipped per §9.2), and the final
  * empty-last block.
  *
  * COMPRESSED meta-blocks yield None — deliberately out of subset: a
  * conforming prefix-code decode needs the RFC's 122 KB static
  * dictionary plus its 121 word transforms, which this zero-dependency
  * engine does not carry, and a partial decoder that guesses would emit
  * garbage text into dedup/extraction. None keeps the r15 rule: bytes
  * this engine cannot decode must never reach the charset ladder.
  *
  * Total and bounded, the [[Warc]] contract: malformed header, bit
  * overrun, or an output past `cap` returns None, never throws —
  * a poisoned record must not kill a 100 TB scan.
  *
  * Reference: RFC 7932 §9.1 (stream header) and §9.2 (meta-block
  * header); the WBITS table and the ISUNCOMPRESSED byte-alignment rule
  * are transcribed from the RFC text. */
object Brotli {

  /** LSB-first bit reader over `p`; `read` returns -1 on overrun (all
    * callers check — the sentinel never collides because reads here are
    * at most 24 bits wide). */
  private final class Bits(p: Array[Byte]) {
    var pos: Long = 0L
    def read(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val bi = (pos >> 3).toInt
        if (bi >= p.length) return -1
        v |= ((p(bi) >> (pos & 7).toInt) & 1) << k
        pos += 1
        k += 1
      }
      v
    }
    def alignToByte(): Unit = pos = (pos + 7) & ~7L
    def byteIndex: Int = (pos >> 3).toInt
  }

  /** RFC 7932 §9.1: 1-7 bit WBITS code → window bits 10-24, or -1 on a
    * reserved/invalid code. The decoded value is unused by the stored
    * subset (stored blocks carry no back-references) but the header must
    * still parse — a garbage header is not a brotli stream. */
  private def readWbits(b: Bits): Int = {
    if (b.read(1) == 0) return 16
    val n = b.read(3)
    if (n < 0) return -1
    if (n != 0) return 17 + n
    val m = b.read(3)
    if (m < 0 || m == 1) return -1 // reserved
    if (m == 0) 17 else 8 + m
  }

  /** Inflate a stored-subset brotli stream; None outside the subset, on
    * malformed framing, or past `cap` inflated bytes. */
  def inflateStored(p: Array[Byte], cap: Long): Option[Array[Byte]] = {
    if (p.isEmpty) return None
    val b = new Bits(p)
    if (readWbits(b) < 0) return None
    val out = new java.io.ByteArrayOutputStream(math.min(p.length, 1 << 16))
    var done = false
    while (!done) {
      val islast = b.read(1)
      if (islast < 0) return None
      if (islast == 1) {
        val isempty = b.read(1)
        if (isempty < 0) return None
        if (isempty == 1) { done = true }
        else {
          // a last block with data is a COMPRESSED meta-block
          // (ISUNCOMPRESSED exists only when !ISLAST): out of subset
          return None
        }
      } else {
        val m = b.read(2)
        if (m < 0) return None
        if (m == 3) {
          // metadata meta-block (§9.2): reserved bit, MSKIPBYTES,
          // byte-aligned skip
          if (b.read(1) != 0) return None
          val skipBytes = b.read(2)
          if (skipBytes < 0) return None
          var skipLen = 0
          var k = 0
          while (k < skipBytes) {
            val by = b.read(8)
            if (by < 0) return None
            skipLen |= by << (8 * k)
            k += 1
          }
          if (skipBytes > 0) skipLen += 1
          b.alignToByte()
          b.pos += skipLen.toLong * 8
          if (b.byteIndex > p.length) return None
        } else {
          val nibbles = 4 + m
          val mlen = b.read(4 * nibbles)
          if (mlen < 0) return None
          val len = mlen + 1
          val isUncompressed = b.read(1)
          if (isUncompressed < 0) return None
          if (isUncompressed != 1) return None // compressed: out of subset
          b.alignToByte()
          val start = b.byteIndex
          if (start + len > p.length) return None
          if (out.size().toLong + len > cap) return None
          out.write(p, start, len)
          b.pos += len.toLong * 8
        }
      }
    }
    Some(out.toByteArray)
  }
}
