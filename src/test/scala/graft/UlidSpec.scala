package graft

import graft.functions.Ulid
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ULID properties (public spec: github.com/ulid/spec): 26 Crockford-base32
  * chars, lexicographic order follows time order, timestamp recoverable.
  */
class UlidSpec extends AnyFunSuite with Checkers {

  test("ulid is 26 chars over the Crockford alphabet") {
    val u = Ulid.generate()
    assert(u.length == 26)
    assert(u.forall("0123456789ABCDEFGHJKMNPQRSTVWXYZ".contains(_)))
  }

  test("lexicographic order follows millisecond order") {
    check(Prop.forAll(Gen.choose(0L, (1L << 48) - 2), Gen.choose(1L, 1000000L)) { (t, d) =>
      val later = math.min(t + d, (1L << 48) - 1)
      Ulid.generate(t) < Ulid.generate(later) || t == later
    })
  }

  test("timestampOf inverts the time component") {
    check(Prop.forAll(Gen.choose(0L, (1L << 48) - 1)) { t =>
      Ulid.timestampOf(Ulid.generate(t)) == t
    })
  }

  test("same-millisecond mints are strictly monotonic within a thread") {
    val t = 1700000000000L
    val us = (1 to 1000).map(_ => Ulid.generate(t))
    assert(us == us.sorted)
    assert(us.distinct.size == us.size)
  }

  test("encode straddles the hi/lo entropy boundary correctly") {
    // all-ones entropy → last 16 chars all 'Z'... (31 per group)
    val u = Ulid.encode(0L, 0xffffL, -1L)
    assert(u == "0000000000" + "Z" * 16)
    val z = Ulid.encode(0L, 0L, 0L)
    assert(z == "0" * 26)
  }
}
