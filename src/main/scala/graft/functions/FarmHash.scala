package graft.functions

/** FarmHash Fingerprint64 (the `farmhashna::Hash64` routine) — the hash
  * behind BigQuery's FARM_FINGERPRINT. Re-implemented from the published
  * public-domain algorithm; ParitySpec locks it bit-for-bit against an
  * independent JVM implementation across lengths covering every branch
  * (empty, 1-3, 4-7, 8-16, 17-32, 33-64, and the >64 chunked loop).
  *
  * All arithmetic is on Scala Long with wrap-around semantics, which
  * matches C++ uint64_t for *, +, ^ and <<; unsigned right shift is
  * `>>>` and unsigned rotate is Long.rotateRight.
  */
object FarmHash {

  private final val K0 = 0xc3a5c85c97cb3127L
  private final val K1 = 0xb492b66fbe98f273L
  private final val K2 = 0x9ae16a3b2f90404fL

  @inline private def fetch64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def fetch32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  @inline private def rotate(v: Long, n: Int): Long = java.lang.Long.rotateRight(v, n)
  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  private def hashLen16(u: Long, v: Long, mul: Long): Long = {
    var a = (u ^ v) * mul
    a ^= (a >>> 47)
    var b = (v ^ a) * mul
    b ^= (b >>> 47)
    b * mul
  }

  private def hashLen0to16(s: Array[Byte], len: Int): Long = {
    if (len >= 8) {
      val mul = K2 + len * 2L
      val a = fetch64(s, 0) + K2
      val b = fetch64(s, len - 8)
      val c = rotate(b, 37) * mul + a
      val d = (rotate(a, 25) + b) * mul
      hashLen16(c, d, mul)
    } else if (len >= 4) {
      val mul = K2 + len * 2L
      val a = fetch32(s, 0)
      hashLen16(len + (a << 3), fetch32(s, len - 4), mul)
    } else if (len > 0) {
      val a = s(0) & 0xffL
      val b = s(len >> 1) & 0xffL
      val c = s(len - 1) & 0xffL
      val y = a + (b << 8)
      val z = len + (c << 2)
      shiftMix(y * K2 ^ z * K0) * K2
    } else K2
  }

  private def hashLen17to32(s: Array[Byte], len: Int): Long = {
    val mul = K2 + len * 2L
    val a = fetch64(s, 0) * K1
    val b = fetch64(s, 8)
    val c = fetch64(s, len - 8) * mul
    val d = fetch64(s, len - 16) * K2
    hashLen16(
      rotate(a + b, 43) + rotate(c, 30) + d,
      a + rotate(b + K2, 18) + c, mul)
  }

  private def hashLen33to64(s: Array[Byte], len: Int): Long = {
    val mul = K2 + len * 2L
    val a = fetch64(s, 0) * K2
    val b = fetch64(s, 8)
    val c = fetch64(s, len - 8) * mul
    val d = fetch64(s, len - 16) * K2
    val y = rotate(a + b, 43) + rotate(c, 30) + d
    val z = hashLen16(y, a + rotate(b + K2, 18) + c, mul)
    val e = fetch64(s, 16) * mul
    val f = fetch64(s, 24)
    val g = (y + fetch64(s, len - 32)) * mul
    val h = (z + fetch64(s, len - 24)) * mul
    hashLen16(
      rotate(e + f, 43) + rotate(g, 30) + h,
      e + rotate(f + a, 18) + g, mul)
  }

  /** WeakHashLen32WithSeeds over s[i, i+32) — returns (first, second). */
  @inline private def weakHash(
      s: Array[Byte], i: Int, a0: Long, b0: Long): (Long, Long) = {
    val w = fetch64(s, i)
    val x = fetch64(s, i + 8)
    val y = fetch64(s, i + 16)
    val z = fetch64(s, i + 24)
    var a = a0 + w
    var b = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotate(a, 44)
    (a + z, b + c)
  }

  /** Fingerprint64 of the byte array. */
  def hash(bytes: Array[Byte]): Long = {
    val len = bytes.length
    if (len <= 16) return hashLen0to16(bytes, len)
    if (len <= 32) return hashLen17to32(bytes, len)
    if (len <= 64) return hashLen33to64(bytes, len)

    val seed = 81L
    var x = seed
    var y = seed * K1 + 113L
    var z = shiftMix(y * K2 + 113L) * K2
    var vf = 0L; var vs = 0L
    var wf = 0L; var ws = 0L
    x = x * K2 + fetch64(bytes, 0)

    // process 64-byte chunks; `end` is the start of the last full chunk
    // boundary, `last64` the final (possibly overlapping) 64 bytes
    val end = ((len - 1) / 64) * 64
    val last64 = end + ((len - 1) & 63) - 63
    var s = 0
    while (s != end) {
      x = rotate(x + y + vf + fetch64(bytes, s + 8), 37) * K1
      y = rotate(y + vs + fetch64(bytes, s + 48), 42) * K1
      x ^= ws
      y += vf + fetch64(bytes, s + 40)
      z = rotate(z + wf, 33) * K1
      val v = weakHash(bytes, s, vs * K1, x + wf)
      vf = v._1; vs = v._2
      val w = weakHash(bytes, s + 32, z + ws, y + fetch64(bytes, s + 16))
      wf = w._1; ws = w._2
      val t = z; z = x; x = t
      s += 64
    }
    val mul = K1 + ((z & 0xff) << 1)
    s = last64
    wf += ((len - 1) & 63)
    vf += wf
    wf += vf
    x = rotate(x + y + vf + fetch64(bytes, s + 8), 37) * mul
    y = rotate(y + vs + fetch64(bytes, s + 48), 42) * mul
    x ^= ws * 9L
    y += vf * 9L + fetch64(bytes, s + 40)
    z = rotate(z + wf, 33) * mul
    val v = weakHash(bytes, s, vs * mul, x + wf)
    vf = v._1; vs = v._2
    val w = weakHash(bytes, s + 32, z + ws, y + fetch64(bytes, s + 16))
    wf = w._1; ws = w._2
    val t = z; z = x; x = t
    hashLen16(
      hashLen16(vf, wf, mul) + shiftMix(y) * K0 + z,
      hashLen16(vs, ws, mul) + x, mul)
  }
}
