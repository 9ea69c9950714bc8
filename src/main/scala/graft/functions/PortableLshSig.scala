package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Float-array embedding → the per-TABLE random-hyperplane LSH
  * signatures, in ONE compiled pass — the per-row twin of
  * [[graft.llm.Similarity.lshSignatures]]/`lshSignaturesMulti`'s
  * exploded spelling (posexplode → broadcast (p, d) weight join → two
  * aggregations), kept there as the parity witness.
  *
  * Value-identical for both SEEDED hash families (asserted in
  * SimilaritySpec): weight(p, d) = hash("p:d", seed 7) % 1000 − 500
  * with the family's exact byte fold —
  *
  *  - md5 family: top 60 bits of md5("7:" ++ "p:d") (non-negative, so
  *    % is plain mod);
  *  - xx64 family: hashInt(7, 42) chained into hashUnsafeBytes("p:d")
  *    — Spark's multi-arg xxhash64 fold; the signed % keeps Java/Spark
  *    remainder semantics.
  *
  * The weight table is memoized per (tables, planesPerTable, dims,
  * family) per JVM — every executor derives the identical table from
  * the pure hash, nothing ships. Fixed-point components replicate the
  * exploded spelling's `round(x·1000)` via the same BigDecimal HALF_UP
  * Spark's Round uses. Plane p = t·planesPerTable + pb; output is one
  * signature long per table (single-table call: tables = 1, element 0).
  * Null embedding → null (== the exploded spelling's "no rows for this
  * vector"; callers filter). */
case class PortableLshSig(child: Expression, tables: Int,
                          planesPerTable: Int, md5Family: Boolean)
    extends UnaryExpression {
  require(tables >= 1 && planesPerTable >= 1 && planesPerTable <= 63)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(emb: Any): Any =
    PortableLshSig.compute(emb.asInstanceOf[ArrayData], tables,
      planesPerTable, md5Family)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.functions.PortableLshSig.compute(
         |  $c, $tables, $planesPerTable, $md5Family);""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PortableLshSig = copy(child = newChild)
}

object PortableLshSig {
  private final val XxSeed = 42L
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, Boolean), Array[Int]]()

  /** weight(p, d) table for planes = tables·planesPerTable over `dims`
    * dimensions; entry at p·dims + d. */
  private def weights(planes: Int, dims: Int,
                      md5Family: Boolean): Array[Int] =
    cache.computeIfAbsent((planes, dims, md5Family), { case (pl, dm, md5) =>
      val w = new Array[Int](pl * dm)
      val digest =
        if (md5) java.security.MessageDigest.getInstance("MD5") else null
      val xxAfterSeedArg = if (md5) 0L else XXH64.hashInt(7, XxSeed)
      var p = 0
      while (p < pl) {
        var d = 0
        while (d < dm) {
          val key = s"$p:$d"
          val h =
            if (md5) {
              digest.reset()
              digest.update(s"7:$key".getBytes("UTF-8"))
              val b = digest.digest()
              val hi =
                ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
                ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
                ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
                ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
              hi >>> 4
            } else {
              val kb = key.getBytes("UTF-8")
              XXH64.hashUnsafeBytes(kb,
                org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                kb.length, xxAfterSeedArg)
            }
          // Spark/Java remainder semantics (sign of the dividend)
          w(p * dm + d) = (h % 1000L - 500L).toInt
          d += 1
        }
        p += 1
      }
      w
    })

  /** The exploded spelling's fixed point: Spark Round(x·1000, 0) on a
    * double = BigDecimal.valueOf(y).setScale(0, HALF_UP). */
  private def r1000(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def compute(emb: ArrayData, tables: Int, planesPerTable: Int,
              md5Family: Boolean): ArrayData = {
    val dims = emb.numElements()
    val planes = tables * planesPerTable
    val w = weights(planes, dims, md5Family)
    val xi = new Array[Long](dims)
    var d = 0
    while (d < dims) {
      xi(d) = r1000(emb.getFloat(d).toDouble)
      d += 1
    }
    val sigs = new Array[Long](tables)
    var p = 0
    while (p < planes) {
      var proj = 0L
      val off = p * dims
      var i = 0
      while (i < dims) {
        proj += xi(i) * w(off + i)
        i += 1
      }
      if (proj > 0) sigs(p / planesPerTable) |= 1L << (p % planesPerTable)
      p += 1
    }
    new GenericArrayData(sigs)
  }
}
