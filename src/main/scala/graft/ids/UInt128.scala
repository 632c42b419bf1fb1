package graft.ids

import java.math.BigInteger
import java.nio.ByteBuffer
import java.util.UUID

/** 128-bit unsigned vertex identifier.
  *
  * Re-expresses the reference's 128-bit id semantics
  * (reference: `src/main/java/net/ellitron/torc/util/UInt128.java:34-41` —
  * two longs, big-endian byte order, unsigned comparison, decode from
  * Byte/Short/Int/Long/String/BigInteger/UUID/byte[]).
  *
  * Spark mapping (SURVEY.md §1.2): the canonical on-wire form is a 16-byte
  * big-endian array (`BinaryType`) — big-endian means lexicographic byte
  * order equals unsigned numeric order, so Spark's built-in binary
  * comparison gives correct unsigned 128-bit ordering with zero custom
  * Catalyst code. This class is the driver/test-side codec; columns use
  * either the 16-byte binary form or `struct<hi: bigint, lo: bigint>`.
  */
final case class UInt128(hi: Long, lo: Long) extends Ordered[UInt128] {

  /** Unsigned two-level comparison (ref UInt128.java:298-334). */
  override def compare(that: UInt128): Int = {
    val c = java.lang.Long.compareUnsigned(hi, that.hi)
    if (c != 0) c else java.lang.Long.compareUnsigned(lo, that.lo)
  }

  /** 16-byte big-endian encoding; lexicographic order == unsigned order. */
  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(hi).putLong(lo).array()
  }

  def toBigInteger: BigInteger = new BigInteger(1, toBytes)

  /** Lower-case hex with no leading zeros, matching the reference's
    * `String.format("%x%x")`-style display (ref UInt128.java:285-292). */
  def toHexString: String = toBigInteger.toString(16)

  override def toString: String = s"0x$toHexString"
}

object UInt128 {
  val Zero: UInt128 = UInt128(0L, 0L)
  val MaxValue: UInt128 = UInt128(-1L, -1L)

  def apply(lo: Long): UInt128 = UInt128(0L, lo)

  /** Decode from the host types the reference accepts
    * (ref UInt128.java:203-231). Strings accept `0x`-prefixed hex or
    * decimal; BigInteger/byte[] are truncated to the low 128 bits with
    * the same semantics as the reference (pad or keep low bytes).
    */
  def decode(value: Any): UInt128 = value match {
    case u: UInt128    => u
    case b: Byte       => UInt128(0L, b.toLong & 0xffL)
    case s: Short      => UInt128(0L, s.toLong & 0xffffL)
    case i: Int        => UInt128(0L, i.toLong & 0xffffffffL)
    case l: Long       => UInt128(0L, l)
    case s: String     => fromString(s)
    case b: BigInteger => fromBigInteger(b)
    case u: UUID       => UInt128(u.getMostSignificantBits, u.getLeastSignificantBits)
    case b: Array[Byte] => fromBytes(b)
    case other =>
      throw new IllegalArgumentException(
        s"Cannot decode UInt128 from ${other.getClass.getName}")
  }

  def fromString(s: String): UInt128 = {
    val t = s.trim
    if (t.startsWith("0x") || t.startsWith("0X"))
      fromBigInteger(new BigInteger(t.substring(2), 16))
    else fromBigInteger(new BigInteger(t, 10))
  }

  /** Keep the low 128 bits (two's-complement magnitude), like the
    * reference's byte-array fill from the tail. */
  def fromBigInteger(b: BigInteger): UInt128 = {
    val bytes = b.toByteArray // big-endian, may have sign byte / be short
    val buf = new Array[Byte](16)
    val n = math.min(bytes.length, 16)
    System.arraycopy(bytes, bytes.length - n, buf, 16 - n, n)
    fromBytes(buf)
  }

  /** Big-endian; shorter arrays are left-padded with zero, longer arrays
    * keep their low (trailing) 16 bytes. */
  def fromBytes(bytes: Array[Byte]): UInt128 = {
    val buf = new Array[Byte](16)
    val n = math.min(bytes.length, 16)
    System.arraycopy(bytes, bytes.length - n, buf, 16 - n, n)
    val bb = ByteBuffer.wrap(buf)
    UInt128(bb.getLong, bb.getLong)
  }
}
