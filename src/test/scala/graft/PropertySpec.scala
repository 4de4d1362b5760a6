package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions._

/** Property-style checks of the native expressions against reference
  * implementations — pure expression eval (no Spark jobs), hundreds of
  * seeded-random cases per property (deterministic across runs). */
class PropertySpec extends SparkSpecBase {

  private val rnd = new scala.util.Random(20260812L)

  private def longArray(xs: Seq[Long]): Literal =
    Literal.create(new GenericArrayData(xs.toArray), ArrayType(LongType))
  private def strArray(xs: Seq[String]): Literal =
    Literal.create(new GenericArrayData(xs.map(UTF8String.fromString).toArray),
      ArrayType(StringType))
  private def floatArray(xs: Seq[Float]): Literal =
    Literal.create(new GenericArrayData(xs.toArray), ArrayType(FloatType))

  test("SortedIntersectCount == Set.intersect over 500 random sorted arrays") {
    for (_ <- 1 to 500) {
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(200).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(200).toLong).distinct.sorted
      val got = SortedIntersectCount(longArray(a), longArray(b)).eval(null)
      assert(got == a.toSet.intersect(b.toSet).size.toLong, s"a=$a b=$b")
    }
  }

  test("ShingleArray == sliding(n).distinct over 500 random token lists") {
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff")
    for (_ <- 1 to 500) {
      val toks = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      val n = 1 + rnd.nextInt(4)
      val got = ShingleArray(strArray(toks), n).eval(null).asInstanceOf[ArrayData]
      val expect =
        if (toks.length < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      val gotSeq = (0 until got.numElements()).map(got.getUTF8String(_).toString)
      assert(gotSeq == expect, s"toks=$toks n=$n")
    }
  }

  test("MinHashSignature: signature of a union is the lane-wise min") {
    for (_ <- 1 to 200) {
      val a = Seq.fill(1 + rnd.nextInt(30))(rnd.nextLong().abs % 2147483647L)
      val b = Seq.fill(1 + rnd.nextInt(30))(rnd.nextLong().abs % 2147483647L)
      def sig(xs: Seq[Long]): Seq[Long] = {
        val r = MinHashSignature(longArray(xs), 16).eval(null).asInstanceOf[ArrayData]
        (0 until r.numElements()).map(r.getLong)
      }
      val sa = sig(a); val sb = sig(b); val su = sig(a ++ b)
      // the property LSH banding and Jaccard estimation both rest on
      assert(su == sa.zip(sb).map { case (x, y) => math.min(x, y) })
    }
  }

  test("SimHash64 is permutation-invariant") {
    for (_ <- 1 to 200) {
      val toks = Seq.fill(1 + rnd.nextInt(20))(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      val a = SimHash64(strArray(toks)).eval(null)
      val b = SimHash64(strArray(rnd.shuffle(toks))).eval(null)
      assert(a == b)
    }
  }

  test("CosineSimilarity: symmetric, bounded, exact on known cases") {
    for (_ <- 1 to 200) {
      val a = Seq.fill(8)(rnd.nextFloat() * 200f - 100f)
      val b = Seq.fill(8)(rnd.nextFloat() * 200f - 100f)
      val ab = CosineSimilarity(floatArray(a), floatArray(b)).eval(null).asInstanceOf[Double]
      val ba = CosineSimilarity(floatArray(b), floatArray(a)).eval(null).asInstanceOf[Double]
      assert(ab == ba && ab >= -1.0000001 && ab <= 1.0000001)
      val aa = CosineSimilarity(floatArray(a), floatArray(a)).eval(null).asInstanceOf[Double]
      assert(math.abs(aa - 1.0) < 1e-9)
    }
  }

  test("RollingMinHash: contained k-window implies candidate minimum is shared") {
    // identical strings hash identically; appending text can only lower the min
    for (_ <- 1 to 200) {
      val s = rnd.alphanumeric.take(20 + rnd.nextInt(40)).mkString
      val k = 4 + rnd.nextInt(8)
      def rmh(x: String): Long =
        RollingMinHash(Literal.create(UTF8String.fromString(x), StringType), k)
          .eval(null).asInstanceOf[Long]
      assert(rmh(s) == rmh(s))
      // extending a string adds windows but keeps every window of s,
      // so the minimum can only stay or drop
      val extended = s + rnd.alphanumeric.take(10).mkString
      assert(rmh(extended) <= rmh(s))
    }
  }
}
