package graft.functions

import java.security.SecureRandom

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** ULID generation — time-ordered unique ids.
  *
  * The reference builds composite document ids `userId_trigger_ULID_jsMillis`
  * lazily via NUlid (`/root/reference/LogChange.cs:29-43,80-92`). ULIDs (not
  * UUIDs) matter because ids must sort by creation time. Implemented from the
  * public ULID spec (github.com/ulid/spec): 48-bit epoch-millis + 80-bit
  * entropy, Crockford base32, 26 chars, lexicographically time-ordered.
  *
  * Monotonic within a generator: two ULIDs minted in the same millisecond by
  * the same instance increment the entropy, so per-partition ordering is
  * total. Across executors ordering is only millisecond-granular — same as
  * the reference's per-client NUlid instances.
  */
object Ulid {
  private val Alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ".toCharArray

  /** Per-thread state avoids cross-task contention on executors while
    * keeping within-thread monotonicity.
    */
  private final class State {
    val rnd            = new SecureRandom()
    var lastMs: Long   = -1L
    var hi: Long       = 0L // top 16 bits of entropy (only low 16 used)
    var lo: Long       = 0L // low 64 bits of entropy
  }
  private val state = ThreadLocal.withInitial(() => new State)

  /** Mint one ULID for the given timestamp (epoch millis). */
  def generate(nowMs: Long): String = {
    val s = state.get()
    if (nowMs == s.lastMs) {
      // same-ms: increment 80-bit entropy for monotonic ordering
      s.lo += 1
      if (s.lo == 0) s.hi = (s.hi + 1) & 0xffffL
    } else {
      s.lastMs = nowMs
      s.hi = s.rnd.nextInt(1 << 16).toLong
      s.lo = s.rnd.nextLong()
    }
    encode(nowMs, s.hi, s.lo)
  }

  def generate(): String = generate(System.currentTimeMillis())

  /** 26-char Crockford base32: 10 chars of time (48 bits) + 16 of entropy (80 bits). */
  private[graft] def encode(ms: Long, hi16: Long, lo64: Long): String = {
    val out = new Array[Char](26)
    var t   = ms & 0xffffffffffffL
    var i   = 9
    while (i >= 0) { out(i) = Alphabet((t & 31).toInt); t >>>= 5; i -= 1 }
    // 80 entropy bits: bits 79..64 = hi16, bits 63..0 = lo64; 16 base32 chars,
    // most-significant group first. Group k sits at bit offset 75 - 5k and the
    // k=3 group (offset 60) straddles the hi/lo boundary.
    var k = 0
    while (k < 16) {
      val shift = 75 - 5 * k
      val v =
        if (shift >= 64) ((hi16 >>> (shift - 64)) & 31).toInt
        else if (shift > 59) (((hi16 << (64 - shift)) | (lo64 >>> shift)) & 31).toInt
        else ((lo64 >>> shift) & 31).toInt
      out(10 + k) = Alphabet(v)
      k += 1
    }
    new String(out)
  }

  /** Extract the epoch-millis timestamp back out of a ULID. */
  def timestampOf(ulid: String): Long = {
    var t = 0L
    var i = 0
    while (i < 10) {
      t = (t << 5) | java.util.Arrays.binarySearch(AlphabetSorted, ulid.charAt(i)).toLong
      i += 1
    }
    t
  }
  private val AlphabetSorted = Alphabet.sorted // Crockford alphabet IS sorted already

  /** Column form — the native nondeterministic [[UlidExpression]], which
    * codegens to a direct `Ulid.generate()` call (no UDF serialization).
    */
  def ulid(): Column = Expressions.ulidExpr()

  /** Composite id `userId_trigger_ULID_jsMillis` — reference `GenerateId()`
    * (`LogChange.cs:80-85`). Deterministic pieces come in as columns; the
    * ULID itself is minted at eval time.
    */
  def compositeId(userId: Column, trigger: Column, jsMillis: Column): Column = {
    import org.apache.spark.sql.functions._
    concat_ws("_", userId, trigger, ulid(), jsMillis)
  }
}
