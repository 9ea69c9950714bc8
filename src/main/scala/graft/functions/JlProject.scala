package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Johnson-Lindenstrauss random projection (Johnson & Lindenstrauss 1984;
  * the database-style integer variant of Achlioptas 2003, "Database-
  * friendly random projections"): a float embedding → `outDims`
  * fixed-point projection values proj_p = Σ_d round(x_d·1000)·w(p, d),
  * with w(p, d) = hash(seed, "p:d") % 1000 − 500 — the same seeded
  * integer weight family as [[PortableLshSig]] (seed 11 by convention
  * here, so the JL matrix is independent of the seed-7 LSH hyperplanes),
  * evaluated in ONE compiled pass per row with no explode, no weight
  * join and no shuffle.
  *
  * Everything is integer arithmetic on deterministic hash-derived
  * weights: the reduced vectors are bit-identical cross-engine (the
  * oracle replays weights and sums in SQL), and pairwise L2 distances
  * are preserved in expectation up to the constant k·Var(w) ≈
  * k·(1000²−1)/12, which a relative-distance consumer (ANN shortlists,
  * clustering) never needs to remove. The classic use at 100 TB: project
  * 64-dim (or 768-dim) embeddings down to k ≈ 16 before an ANN index or
  * a pair-mining pass — 4× fewer bytes through every shuffle for a
  * (1±ε) distance distortion with ε ~ sqrt(8·ln(n)/k).
  *
  * Null embedding → null (callers filter, matching [[PortableLshSig]]).
  */
case class JlProject(child: Expression, outDims: Int, seed: Int,
                     md5Family: Boolean)
    extends UnaryExpression {
  require(outDims >= 1, "outDims must be >= 1")

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(emb: Any): Any =
    JlProject.compute(emb.asInstanceOf[ArrayData], outDims, seed, md5Family)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.functions.JlProject.compute(
         |  $c, $outDims, $seed, $md5Family);""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): JlProject = copy(child = newChild)
}

object JlProject {
  private final val XxSeed = 42L
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, Boolean, Int), Array[Int]]()

  /** weight(p, d) = floorMod(hash(seed, "p:d"), 1000) − 500 — uniform on
    * [-500, 499] and MEAN-ZERO for both hash families. This deliberately
    * differs from [[PortableLshSig]]'s signed-% spelling: a sign test
    * only needs a symmetric direction distribution, but JL projection
    * VALUES need E[w] ≈ 0 or the (Σδ)²·E[w]² term swamps the distance
    * estimate (measured: mean ratio 6.9 instead of 1.0 with signed %
    * under the xx64 family). For the md5 family the hash is already
    * non-negative, so floorMod ≡ % and the DuckDB oracle spelling is
    * unchanged. */
  private def weights(planes: Int, dims: Int, md5Family: Boolean,
                      seed: Int): Array[Int] =
    cache.computeIfAbsent((planes, dims, md5Family, seed),
      { case (pl, dm, md5, sd) =>
        val w = new Array[Int](pl * dm)
        val digest =
          if (md5) java.security.MessageDigest.getInstance("MD5") else null
        val xxAfterSeedArg = if (md5) 0L else XXH64.hashInt(sd, XxSeed)
        var p = 0
        while (p < pl) {
          var d = 0
          while (d < dm) {
            val key = s"$p:$d"
            val h =
              if (md5) {
                digest.reset()
                digest.update(s"$sd:$key".getBytes("UTF-8"))
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
            w(p * dm + d) = (Math.floorMod(h, 1000L) - 500L).toInt
            d += 1
          }
          p += 1
        }
        w
      })

  /** Spark Round(x·1000, 0) on a double — the engine-wide fixed point
    * ([[PortableLshSig]]'s spelling). */
  private def r1000(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def compute(emb: ArrayData, outDims: Int, seed: Int,
              md5Family: Boolean): ArrayData = {
    val dims = emb.numElements()
    val w = weights(outDims, dims, md5Family, seed)
    val xi = new Array[Long](dims)
    var d = 0
    while (d < dims) {
      xi(d) = r1000(emb.getFloat(d).toDouble)
      d += 1
    }
    val out = new Array[Long](outDims)
    var p = 0
    while (p < outDims) {
      var proj = 0L
      val off = p * dims
      var i = 0
      while (i < dims) {
        proj += xi(i) * w(off + i)
        i += 1
      }
      out(p) = proj
      p += 1
    }
    new GenericArrayData(out)
  }
}
