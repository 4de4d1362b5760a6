package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Bucket-count sketch of a distinct-hash set: a 256-byte vector counting
  * the set's elements per top-byte hash bucket (counts saturate at 255).
  *
  * Purpose: an EXACT-admissible pre-verify filter for Jaccard candidate
  * pairs. For sets A, B with sketches a, b, the per-bucket intersection
  * cannot exceed either side's bucket count, so
  *   |A ∩ B| ≤ Σ_i min(a_i, b_i)
  * — a strict upper bound (never an estimate), computed from 2×256 bytes
  * instead of the full sorted-hash arrays (~KBs per doc). Candidates whose
  * bound falls below the τ-required intersection are dropped before the
  * full arrays attach, which is where the verify stage's shuffle bytes
  * live (the arrays are ~6× the sketch). xxhash64's top byte is uniform,
  * so for unrelated docs the bound concentrates near Σ min of independent
  * Poisson counts — far below the τ requirement — while true near-dups
  * keep a bound ≥ their real intersection. Zero recall loss by
  * construction.
  */
case class BucketCountSketch(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bucket_count_sketch"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sk = new Array[Byte](256)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val b = (arr.getLong(i) >>> 56).toInt
      // unsigned saturating increment: signed bytes wrap 127 → -128 and we
      // stop at -1 (= 0xFF = 255 unsigned)
      if (sk(b) != -1) sk(b) = (sk(b) + 1).toByte
      i += 1
    }
    sk
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sk = ctx.freshName("sk"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val bkt = ctx.freshName("bkt")
      s"""
         |byte[] $sk = new byte[256];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  int $bkt = (int)($a.getLong($i) >>> 56);
         |  if ($sk[$bkt] != (byte)0xFF) $sk[$bkt]++;
         |}
         |${ev.value} = $sk;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ_i min(a_i, b_i) over two bucket-count sketches — the intersection
  * upper bound described on BucketCountSketch. Returns -1 ("no bound —
  * keep the candidate") when the bound could undercount: a bucket where
  * BOTH sides saturated at 255 (the stored min is 255 but the true min may
  * be larger), or sketches of different lengths. min(sat, unsat) is still
  * exact — the unsaturated side's true count IS the min. */
case class SketchIntersectUB(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sketch_intersect_ub"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]; val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return -1
    var ub = 0; var i = 0
    while (i < x.length) {
      val ua = x(i) & 0xFF; val vb = y(i) & 0xFF
      val m = if (ua < vb) ua else vb
      if (m == 255) return -1
      ub += m
      i += 1
    }
    ub
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ub = ctx.freshName("ub"); val i = ctx.freshName("i")
      val ua = ctx.freshName("ua"); val vb = ctx.freshName("vb")
      val m = ctx.freshName("m")
      s"""
         |int $ub = 0;
         |if ($a.length != $b.length) { $ub = -1; } else {
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    int $ua = $a[$i] & 0xFF; int $vb = $b[$i] & 0xFF;
         |    int $m = $ua < $vb ? $ua : $vb;
         |    if ($m == 255) { $ub = -1; break; }
         |    $ub += $m;
         |  }
         |}
         |${ev.value} = $ub;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
