package graft.tools

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import graft.functions.TileNearDupPairs

/** Micro-benchmark for the tile cosine kernel (dev tool, not driver-run).
  *
  * Times TileNearDupPairs.nullSafeEval directly on synthetic blocks — no
  * Spark session, so the number is the kernel itself (unpack + pair loop),
  * the FLOPs-bound cost of the dense grid path at 100 TB. LCG-seeded
  * vectors, deterministic.
  */
object TileKernelBench {

  private def lcg(s0: Long): () => Long = {
    var s = s0
    () => { s = s * 6364136223846793005L + 1442695040888963407L; s }
  }

  /** Block of n unit-ish vectors as the kernel's input ArrayData. */
  def mkBlock(n: Int, dim: Int, seed: Long, idBase: Long): ArrayData = {
    val r = lcg(seed)
    new GenericArrayData((0 until n).map { i =>
      val v = Array.fill(dim)(((r() >>> 40).toInt / (1 << 23).toDouble - 1.0).toFloat)
      var nrm = 0.0
      v.foreach(x => nrm += x.toDouble * x.toDouble)
      InternalRow(idBase + i, new GenericArrayData(v.map(x => x: Any)), math.sqrt(nrm))
    }.toArray[Any])
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 512
    val dim = if (args.length > 1) args(1).toInt else 64
    val reps = if (args.length > 2) args(2).toInt else 20
    val a = mkBlock(n, dim, 42L, 0L)
    val b = mkBlock(n, dim, 7L, 1000000L)
    // tau low enough that the band check exercises the accept path sometimes
    val expr = TileNearDupPairs(Literal(null), Literal(null), 0.5)
    // warmup
    var sink = 0L
    (1 to 5).foreach(_ => sink += expr.nullSafeEval(a, b).asInstanceOf[ArrayData].numElements())
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      sink += expr.nullSafeEval(a, b).asInstanceOf[ArrayData].numElements()
      System.nanoTime() - t0
    }
    val best = times.min / 1e9
    val pairs = n.toLong * n
    println(f"n=$n dim=$dim pairs=$pairs best=${best}%.4f s  " +
      f"${best * 1e9 / pairs}%.1f ns/pair  ${2.0 * pairs * dim / best / 1e9}%.2f GFLOP/s  (sink=$sink)")
  }
}
