package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Token array → the hashed-linear-classifier logit (Σ weight[bucket(g)]
  * over the unigram+bigram grams) in ONE compiled pass — the per-row twin
  * of [[graft.llm.Importance.logitCol]]'s HOF spelling
  * (`aggregate(unigramsBigrams(toks), 0L, (acc, g) => acc +
  * element_at(w, pmod(hash(g, seed), B) + 1))`), which stays as the
  * value-identity parity witness (ImportanceSpec, both hash families).
  *
  * Same motivation as [[BucketWeightSum]]: HOF lambdas evaluate through
  * interpreted `Expression.eval`, whose shared virtual-dispatch sites go
  * megamorphic in a long-running JVM — and this fold runs per DOCUMENT
  * over every gram (the q112/q123/q125/q135/q140 inference scan), the
  * hottest interpreted path left after the q115 margin fold was
  * compiled. The kernel hashes each gram with the family's exact byte
  * fold (the [[ShingleMinHash]] convention):
  *
  *  - md5 family: top 60 bits of md5("<seed>:" ++ gram) via
  *    [[Md5Prefix60.compute]] — non-negative, so pmod is plain mod;
  *  - xx64 family: `xxhash64(<seed>, gram)` = hashInt(seed, 42) chained
  *    into hashUnsafeBytes over the gram bytes, signed pmod.
  *
  * Bigrams are `tok_i ++ " " ++ tok_{i+1}` (the `unigramsBigrams`
  * zip_with spelling). A null token nulls the whole logit — exactly the
  * HOF fold's null propagation (split() never produces nulls; the
  * contract matters only for hand-built arrays). */
case class HashedLogit(child: Expression, weights: Array[Long], seed: Int,
                       md5Family: Boolean) extends UnaryExpression {
  require(weights.nonEmpty, "hashed_logit needs a non-empty model")

  override def nullable: Boolean = true

  override def dataType: DataType = LongType

  override def nullSafeEval(toks: Any): Any =
    HashedLogit.compute(toks.asInstanceOf[ArrayData], weights, seed,
      md5Family)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("logitWeights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("hashedLogitRes")
      s"""Object $res = graft.functions.HashedLogit.compute(
         |  $c, $wRef, $seed, $md5Family);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $res).longValue(); }""".stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedLogit = copy(child = newChild)
}

object HashedLogit {
  private final val XxSeed = 42L
  private val Space = UTF8String.fromString(" ")

  def compute(toks: ArrayData, w: Array[Long], seed: Int,
              md5Family: Boolean): Any = {
    val m = toks.numElements()
    val buckets = w.length
    val prefix =
      if (md5Family) UTF8String.fromString(s"$seed:") else null
    val xxState = if (md5Family) 0L else XXH64.hashInt(seed, XxSeed)

    def hashOf(g: UTF8String): Long =
      if (md5Family) Md5Prefix60.compute(UTF8String.concat(prefix, g))
      else XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset,
        g.numBytes, xxState)

    def add(sum: Long, h: Long): Long = {
      val b = (h % buckets).toInt
      sum + w(if (b < 0) b + buckets else b)
    }

    var sum = 0L
    var i = 0
    while (i < m) {
      val t = toks.getUTF8String(i)
      if (t == null) return null
      sum = add(sum, hashOf(t))
      i += 1
    }
    i = 0
    while (i < m - 1) {
      sum = add(sum, hashOf(UTF8String.concat(
        toks.getUTF8String(i), Space, toks.getUTF8String(i + 1))))
      i += 1
    }
    java.lang.Long.valueOf(sum)
  }
}
