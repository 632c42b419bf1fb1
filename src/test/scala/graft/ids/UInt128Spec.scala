package graft.ids

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

class UInt128Spec extends AnyFunSuite {

  /** Deterministic fuzz: seeded generator, mix of extreme and random values. */
  private def cases(n: Int): Seq[(UInt128, UInt128)] = {
    val rnd = new Random(42)
    val interesting = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 0xffffffffL)
    val pool = interesting ++ Seq.fill(n)(rnd.nextLong())
    for {
      hi <- pool; lo <- pool.take(6)
    } yield (UInt128(hi, lo), UInt128(pool((lo % pool.size).toInt.abs), hi))
  }

  test("decode from host types") {
    assert(UInt128.decode(5.toByte) == UInt128(0, 5))
    assert(UInt128.decode(300.toShort) == UInt128(0, 300))
    assert(UInt128.decode(-1) == UInt128(0, 0xffffffffL)) // unsigned widening
    assert(UInt128.decode(-1L) == UInt128(0, -1L))
    assert(UInt128.decode("255") == UInt128(0, 255))
    assert(UInt128.decode("0xff") == UInt128(0, 255))
    assert(UInt128.decode("0xffffffffffffffffff") == UInt128(0xff, -1L))
    assert(UInt128.decode(new java.util.UUID(3L, 4L)) == UInt128(3, 4))
  }

  test("hex formatting matches BigInteger") {
    assert(UInt128(0, 255).toHexString == "ff")
    assert(UInt128(1, 0).toHexString == "10000000000000000")
    assert(UInt128.MaxValue.toHexString == "f" * 32)
  }

  test("bytes round-trip, padding and truncation") {
    assert(UInt128.fromBytes(Array[Byte](1, 2)) == UInt128(0, 0x0102))
    val over = new Array[Byte](20)
    over(3) = 1 // dropped: beyond low 16 bytes
    over(19) = 7
    assert(UInt128.fromBytes(over) == UInt128(0, 7))
  }

  test("fuzz: unsigned ordering agrees with BigInteger") {
    cases(40).foreach { case (a, b) =>
      assert(Integer.signum(a.compare(b)) ==
        a.toBigInteger.compareTo(b.toBigInteger), s"$a vs $b")
    }
  }

  test("fuzz: byte codec round-trips; big-endian bytes order lexicographically") {
    cases(40).foreach { case (a, b) =>
      assert(UInt128.fromBytes(a.toBytes) == a)
      val lex = java.util.Arrays.compareUnsigned(a.toBytes, b.toBytes)
      assert(Integer.signum(lex) == Integer.signum(a.compare(b)), s"$a vs $b")
    }
  }

  test("fuzz: decimal and hex string round-trip") {
    cases(25).foreach { case (a, _) =>
      assert(UInt128.fromString(a.toBigInteger.toString) == a)
      assert(UInt128.fromString("0x" + a.toHexString) == a)
    }
  }
}
