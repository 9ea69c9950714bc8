package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Token array → the k seeded MinHash values of its word n-gram shingle
  * set, in ONE compiled pass — the per-row signature path of the online
  * near-dup detector ([[graft.streaming.StreamingNearDup]], q101).
  *
  * Value-identical (asserted in StreamingNearDupSpec) to the HOF
  * formulation `array_min(transform(hb, x → (x·(2i+1)+bᵢ) mod P31))`
  * over `transform(distinctShingles, s → pmod(hash(s, 0), P31))` for
  * both hash families:
  *
  *  - `md5Family = true` (PortableSeededHash, the oracle-parity path):
  *    base hash = top 60 bits of md5("0:" ++ shingle) mod P31 — the
  *    digest is fed token bytes incrementally (MD5 is a stream hash), so
  *    the shingle STRING is never materialized;
  *  - `md5Family = false` (XxSeededHash): base hash =
  *    pmod(xxhash64(0, shingle), P31), replicated as
  *    hashInt(0, 42) chained into hashUnsafeBytes over the shingle
  *    bytes — Spark's exact multi-arg xxhash64 fold.
  *
  * Why compiled: the HOF spelling runs k interpreted lambdas per shingle
  * PLUS an interpreted string-building lambda per shingle — measured as
  * the dominant cost of the per-row detector (~7 s of q101's ~10 s at
  * sf0.1). Duplicate shingles need no dedup — a duplicate cannot change
  * a minimum. Returns null when the document has fewer than `n` tokens
  * (no shingles — the caller's `len ≥ n` contract). */
case class ShingleMinHash(child: Expression, n: Int, k: Int,
                          md5Family: Boolean) extends UnaryExpression {
  require(n >= 1 && k >= 1)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(toks: Any): Any =
    ShingleMinHash.compute(toks.asInstanceOf[ArrayData], n, k, md5Family)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.functions.ShingleMinHash.compute($c, $n, $k, $md5Family);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ShingleMinHash = copy(child = newChild)
}

object ShingleMinHash {
  private final val P31 = 2147483647L // 2^31 - 1 == Dedup.P31
  private final val XxSeed = 42L      // Spark's xxhash64 seed
  private final val Space = ' '.toByte
  private final val MdPrefix = "0:".getBytes("UTF-8") // seed-0 prefix

  def compute(toks: ArrayData, n: Int, k: Int,
              md5Family: Boolean): ArrayData = {
    val m = toks.numElements()
    if (m < n) return null
    // token bytes fetched once; shingle windows reuse them. A null token
    // stays null: concat_ws (the HOF/batch shingle spelling) SKIPS nulls —
    // no bytes, no separator — so the window loops below must too, or the
    // two formulations hash different strings (split() never yields
    // nulls, but hand-built token arrays can; parity pinned in
    // StreamingNearDupSpec).
    val tb = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      val s = toks.getUTF8String(i)
      tb(i) = if (s == null) null else s.getBytes
      i += 1
    }
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val md = if (md5Family)
      java.security.MessageDigest.getInstance("MD5") else null
    // xx64 family: the multi-arg fold's state after the leading literal 0
    val xxAfterSeedArg =
      if (md5Family) 0L else XXH64.hashInt(0, XxSeed)
    i = 0
    while (i <= m - n) {
      var hb = 0L
      if (md5Family) {
        md.reset()
        md.update(MdPrefix)
        var j = 0
        var first = true
        while (j < n) {
          val t = tb(i + j)
          if (t != null) {
            if (!first) md.update(Space)
            md.update(t)
            first = false
          }
          j += 1
        }
        val b = md.digest()
        val hi =
          ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
          ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
          ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
          ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
        hb = (hi >>> 4) % P31 // top-60-bit value is non-negative
      } else {
        // shingle bytes = non-null tokens joined by ' ' (concat_ws
        // semantics); xxhash64 folds them as ONE string argument, so
        // materialize the window's bytes once
        var len = 0
        var nn = 0
        var j = 0
        while (j < n) {
          val t = tb(i + j)
          if (t != null) { len += t.length; nn += 1 }
          j += 1
        }
        if (nn > 1) len += nn - 1
        val buf = new Array[Byte](len)
        var p = 0
        var first = true
        j = 0
        while (j < n) {
          val t = tb(i + j)
          if (t != null) {
            // `first`, not `p > 0`: an empty first token is still a
            // joined value and the next token gets its separator
            if (!first) { buf(p) = Space; p += 1 }
            System.arraycopy(t, 0, buf, p, t.length)
            p += t.length
            first = false
          }
          j += 1
        }
        val h = XXH64.hashUnsafeBytes(buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len,
          xxAfterSeedArg)
        hb = java.lang.Math.floorMod(h, P31)
      }
      var s = 0
      while (s < k) {
        val v = (hb * (2 * s + 1) + (s.toLong * 12582917L) % P31) % P31
        if (v < out(s)) out(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
