package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter membership over 64-bit hashes — the beyond-broadcast scale
  * path for semi-join pruning (decontamination, blocklist joins).
  *
  * Two pieces sharing one bit layout (`GraftBloom`):
  *   - [[BloomBuildAgg]]: a distributed build — each partition sets bits in
  *     a local array, partials OR-merge, the driver receives ONE blob of
  *     ~`bitsPerElement`/8 bytes per distinct element (10 bits/elem ≈ 1%
  *     FPR at k=7). At 100 TB this replaces broadcasting the full key SET
  *     (strings, potentially GBs) with a fixed-size filter: the build is
  *     one pass over the keys and the blob is bounded model state, the
  *     KMeans-centroid pattern, never a data collect.
  *   - [[BloomMightContain]]: a codegen'd map-side membership test. False
  *     positives are possible (callers MUST re-verify with an exact join on
  *     the survivors — which now shuffles only the ~FPR-sized remainder);
  *     false negatives are impossible, so pre-filtering with it never
  *     changes an exact operator's output.
  *
  * Positions use Kirsch–Mitzenmacher double hashing (2006): k probe
  * positions derived from one 64-bit input hash as h1 + i·h2 mod m, which
  * preserves the asymptotic FPR of k independent hashes. Feed it
  * `xxhash64(key)` so the hot path stays whole-stage-codegen'd end to end.
  */
object GraftBloom {
  /** Blob layout: [int numBits][int k][longs: bit words], big-endian. */
  def blobBytes(numBits: Int): Int = 8 + (((numBits + 63) >>> 6) << 3)

  def h2(h: Long): Long = (h * 0x9E3779B97F4A7C15L) | 1L // odd => full cycle mod 2^64

  /** i-th probe position in [0, numBits). */
  def pos(h1: Long, hh2: Long, i: Int, numBits: Int): Int =
    (java.lang.Long.remainderUnsigned(h1 + i.toLong * hh2, numBits.toLong)).toInt

  final class Model(val numBits: Int, val k: Int, val words: Array[Long])
      extends Serializable {
    def mightContain(h: Long): Boolean = {
      val hh2 = GraftBloom.h2(h)
      var i = 0
      while (i < k) {
        val p = GraftBloom.pos(h, hh2, i, numBits)
        if ((words(p >>> 6) & (1L << (p & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  def parse(blob: Array[Byte]): Model = {
    val bb = java.nio.ByteBuffer.wrap(blob)
    val numBits = bb.getInt; val k = bb.getInt
    val words = new Array[Long]((numBits + 63) >>> 6)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    new Model(numBits, k, words)
  }

  def serialize(m: Model): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(blobBytes(m.numBits))
    bb.putInt(m.numBits); bb.putInt(m.k)
    var i = 0
    while (i < m.words.length) { bb.putLong(m.words(i)); i += 1 }
    bb.array()
  }
}

/** Distributed bloom build over LONG hashes (feed `xxhash64(key)`).
  * Output: one BinaryType blob (see GraftBloom layout). Partial buffers are
  * the full bit array — sized by the CALLER from the expected distinct
  * count, so keep numBits honest: the per-task memory is numBits/8 bytes. */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftBloom.Model] with ExpectsInputTypes {

  require(numBits >= 64 && numBits <= (1 << 30),
    s"bloom_build: numBits=$numBits out of range [64, 2^30]")
  require(k >= 1 && k <= 16, s"bloom_build: k=$k out of range [1, 16]")

  override def inputTypes = Seq(LongType)
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"

  override def createAggregationBuffer(): GraftBloom.Model =
    new GraftBloom.Model(numBits, k, new Array[Long]((numBits + 63) >>> 6))

  override def update(buf: GraftBloom.Model, input: InternalRow): GraftBloom.Model = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val hh2 = GraftBloom.h2(h)
      var i = 0
      while (i < k) {
        val p = GraftBloom.pos(h, hh2, i, numBits)
        buf.words(p >>> 6) |= 1L << (p & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: GraftBloom.Model, other: GraftBloom.Model): GraftBloom.Model = {
    var i = 0
    while (i < buf.words.length) { buf.words(i) |= other.words(i); i += 1 }
    buf
  }

  override def eval(buf: GraftBloom.Model): Any = GraftBloom.serialize(buf)
  override def serialize(buf: GraftBloom.Model): Array[Byte] = GraftBloom.serialize(buf)
  override def deserialize(bytes: Array[Byte]): GraftBloom.Model = GraftBloom.parse(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `bloom_might_contain(hash, blob)`: membership test against a FOLDABLE
  * bloom blob (a literal built by BloomBuildAgg and collected driver-side).
  * The parsed model is task-lifetime state (one parse per task via the
  * codegen reference), so the per-row cost is k masked probes — stays
  * inside whole-stage codegen next to the xxhash64 feeding it. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  require(right.foldable, "bloom_might_contain: the blob must be a literal")

  override def inputTypes = Seq(LongType, BinaryType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val model =
    GraftBloom.parse(right.eval().asInstanceOf[Array[Byte]])

  override def nullSafeEval(h: Any, blob: Any): Any =
    model.mightContain(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bloomModel", model,
      classOf[GraftBloom.Model].getName)
    nullSafeCodeGen(ctx, ev, (h, _) => s"${ev.value} = $modelRef.mightContain($h);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
