package graft

import graft.functions.Codec
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip properties of the zip codec (reference
  * `/root/reference/LogChange.cs:262-306`; divergence documented in the
  * Scaladoc — round-trip equality, not byte-identical archives).
  */
class CodecSpec extends AnyFunSuite with Checkers {

  test("unzip o zip = id for arbitrary strings incl. unicode") {
    val unicodeStr = Gen.listOf(
      Gen.oneOf("pi", "中", "🙂", "a", " ", "\n")).map(_.mkString)
    check(Prop.forAll(Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr, unicodeStr)) { s =>
      Codec.unzipStr(Codec.zipStr(s)) == s
    })
  }

  test("empty string round-trips") {
    assert(Codec.unzipStr(Codec.zipStr("")) == "")
  }

  test("null-safety both directions") {
    assert(Codec.zipStr(null) == null)
    assert(Codec.unzipStr(null) == null)
    assert(Codec.unzipStr(Array.empty[Byte]) == null)
  }

  test("compression actually compresses repetitive text") {
    val s = "the same phrase again and again " * 1000
    assert(Codec.zippedSize(s) < s.length / 10)
  }
}
