package graft

import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.Assertions

/** Minimal scalacheck↔scalatest bridge (the scalatestplus artifact is not in
  * the offline cache): run a Prop and fail the surrounding test on falsify.
  */
trait Checkers extends Assertions {
  def check(p: Prop, minTests: Int = 50): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, s"property falsified: ${res.status}")
  }
}

/** Fast deterministic low-compressibility text for oversize fixtures. */
object TestText {
  private val Alphabet = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')
  def random(n: Int, seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    val arr = new Array[Char](n)
    var i = 0
    while (i < n) { arr(i) = Alphabet(rnd.nextInt(Alphabet.length)); i += 1 }
    new String(arr)
  }
}
