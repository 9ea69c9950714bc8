package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog registers (Flajolet, Fusy, Gandouet & Meunier 2007,
  * "HyperLogLog: the analysis of a near-optimal cardinality estimation
  * algorithm") as a `TypedImperativeAggregate` — the distinct-count
  * member of the sketch family next to [[CountMinAgg]] (frequencies),
  * [[MisraGriesAgg]] (heavy hitters) and the bottom-k/KMV sampler
  * (q145): a FIXED 2^p-byte summary per group replacing a
  * count-distinct shuffle of the keys themselves, mergeable by
  * element-wise max — so map-side partials and any merge tree produce
  * the identical registers, the 100 TB contract.
  *
  * Spark ships `approx_count_distinct` (HLL++); this sketch exists where
  * the engine-native one can't go: the REGISTERS are the output, the
  * hash is the PORTABLE seeded family (top 60 bits of
  * md5("<seed>:" || value), byte-identical to
  * [[graft.llm.PortableSeededHash]]), and the estimator is plan-side
  * arithmetic — so a cross-engine oracle recomputes every register and
  * the estimate EXACTLY, which no opaque binary sketch allows.
  *
  * Register update for value v: h = md5-60(v) (non-negative, 60 bits);
  * index = h mod m; w = h div m (a 60−p bit word); rho = (trailing
  * zeros of w) + 1, or 60−p+1 when w = 0 — the trailing-zero rank is
  * statistically equivalent to the paper's leading-zero rank (both
  * count the run length of a geometric(1/2) variable) and replays in
  * SQL as pure integer ops: `bit_count((w & -w) - 1) + 1`.
  *
  * SQL: `hll_registers(col, p, seed)` (p, seed literal; 4 ≤ p ≤ 16)
  * returns `array<int>` of length 2^p. Estimation (the α·m²/Σ2^−M
  * harmonic mean and the small-range linear-counting branch) is a
  * plan-side expression over the array — see
  * [[graft.queries.LlmQueries.hllDistinct]]. */
case class HyperLogLogAgg(
    child: Expression,
    p: Int,
    seed: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, "hll_registers needs 4 <= p <= 16")

  private val m = 1 << p
  private val maxRho = 60 - p + 1

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val prefix: UTF8String =
    UTF8String.fromString(s"$seed:")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Md5Prefix60.compute(
        UTF8String.concat(prefix, v.asInstanceOf[UTF8String]))
      val idx = (h % m).toInt
      val w = h / m
      val rho =
        if (w == 0L) maxRho
        else java.lang.Long.numberOfTrailingZeros(w) + 1
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt.asInstanceOf[Any]))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HyperLogLogAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HyperLogLogAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HyperLogLogAgg =
    copy(child = newChildren.head)
}
