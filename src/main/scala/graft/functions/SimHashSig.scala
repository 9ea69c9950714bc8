package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Token array → its `bits`-bit SimHash signature in ONE compiled pass —
  * the per-row twin of [[graft.llm.Dedup.simHash]]'s exploded spelling
  * (explode → per-token seeded hash → 20-bit packed-lane majority
  * aggregation), kept there as the parity witness.
  *
  * Value-identical to the exploded spelling for both hash families
  * (asserted in DedupSpec):
  *
  *  - `md5Family = true` (PortableSeededHash, the oracle-parity path):
  *    per-token hash = top 60 bits of md5("0:" ++ token) — the full
  *    60-bit value, NOT reduced mod P31 (unlike the MinHash base hash);
  *  - `md5Family = false` (XxSeededHash): per-token hash =
  *    xxhash64(0, token), replicated as hashInt(0, 42) chained into
  *    hashUnsafeBytes — Spark's exact multi-arg fold.
  *
  * Majority semantics mirror the aggregate exactly: the denominator
  * counts EVERY token (a null token contributes no bit but still
  * counts, = `count(1)` vs null-skipping `sum`), and a signature bit is
  * set iff ones·2 > n strictly. Returns null for an empty token array —
  * the exploded spelling emits no row for such a document, so callers
  * filter nulls to keep the "absent doc" convention.
  *
  * Why compiled: the exploded spelling materializes tokens× rows and
  * runs a 21-column packed aggregation per document; with the md5
  * family it also builds a "0:"++token string per token. One fused loop
  * per row does the same arithmetic with zero intermediate rows —
  * measured 6.1 → ~2 s on the q33 signature stage at sf0.1. */
case class SimHashSig(child: Expression, bits: Int, md5Family: Boolean)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")

  override def nullable: Boolean = true

  override def dataType: DataType = LongType

  override def nullSafeEval(toks: Any): Any =
    SimHashSig.compute(toks.asInstanceOf[ArrayData], bits, md5Family)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""java.lang.Long ${ev.value}Box =
         |  graft.functions.SimHashSig.compute($c, $bits, $md5Family);
         |if (${ev.value}Box == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}Box.longValue(); }""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHashSig = copy(child = newChild)
}

object SimHashSig {
  private final val XxSeed = 42L // Spark's xxhash64 seed
  private final val MdPrefix = "0:".getBytes("UTF-8") // seed-0 prefix

  def compute(toks: ArrayData, bits: Int,
              md5Family: Boolean): java.lang.Long = {
    val m = toks.numElements()
    if (m == 0) return null
    val ones = new Array[Int](bits)
    val md = if (md5Family)
      java.security.MessageDigest.getInstance("MD5") else null
    val xxAfterSeedArg = if (md5Family) 0L else XXH64.hashInt(0, XxSeed)
    var i = 0
    while (i < m) {
      val s = toks.getUTF8String(i)
      if (s != null) {
        val tb = s.getBytes
        var h = 0L
        if (md5Family) {
          md.reset()
          md.update(MdPrefix)
          md.update(tb)
          val b = md.digest()
          val hi =
            ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
            ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
            ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
            ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
          h = hi >>> 4
        } else {
          h = XXH64.hashUnsafeBytes(tb,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, tb.length,
            xxAfterSeedArg)
        }
        var j = 0
        while (j < bits) {
          ones(j) += ((h >>> j) & 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      // strict majority over ALL m tokens (null tokens count in the
      // denominator — count(1) semantics of the aggregate spelling)
      if (2L * ones(j) > m) sig |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }
}
