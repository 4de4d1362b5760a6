package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Space-Saving buffer: counts map + a TreeSet ordered by
  * (count, item) so eviction of the minimum is O(log capacity) instead of an
  * O(capacity) scan per unseen item (quadratic-ish on adversarial streams of
  * mostly-unseen items).
  *
  * `err` is the buffer's over-estimation bound: 0 while nothing has ever
  * been evicted (the buffer is EXACT — counts are true frequencies), and
  * otherwise an upper bound on how much any absent item's true count can be.
  * It is what makes partial buffers MERGEABLE without losing the
  * "any item with true frequency > N/capacity is present" guarantee
  * (Agarwal et al. 2012, "Mergeable Summaries"). */
final class SpaceSavingBuffer {
  val counts = mutable.HashMap.empty[UTF8String, Long]
  private implicit val utf8Ord: Ordering[UTF8String] = (a, b) => a.compareTo(b)
  private val byCount = mutable.TreeSet.empty[(Long, UTF8String)]
  var err: Long = 0L

  def size: Int = counts.size

  /** EVERY stored reference must own its bytes: `item` may point into a
    * reused row buffer, and a stored reference whose bytes later mutate
    * corrupts both maps (removals miss, stale entries accumulate, eviction
    * picks the wrong key). NOTE `UTF8String.clone()` is NOT enough — for a
    * string that exactly wraps its backing array, `getBytes` (and therefore
    * clone) returns the SAME array, still aliased to the caller's buffer. */
  private def deepCopy(s: UTF8String): UTF8String = {
    val b = s.getBytes
    UTF8String.fromBytes(java.util.Arrays.copyOf(b, b.length))
  }

  /** Add `by` to item's count (inserting at `base + by` if absent).
    * Removal is content-based (UTF8String equality), so removing with the
    * caller's reference still matches the stored copy. */
  def add(item: UTF8String, by: Long, base: Long = 0L): Unit =
    counts.get(item) match {
      case Some(c) =>
        byCount.remove((c, item))
        counts.update(item, c + by) // HashMap keeps its original (copied) key
        byCount.add((c + by, deepCopy(item)))
      case None =>
        val it = deepCopy(item)
        counts.update(it, base + by)
        byCount.add((base + by, it))
    }

  def minEntry: (Long, UTF8String) = byCount.head

  def removeMin(): (Long, UTF8String) = {
    val e = byCount.head
    byCount.remove(e)
    counts.remove(e._2)
    e
  }

  /** Drop entries beyond `capacity`, keeping the largest counts
    * ((count desc, item asc) order). Evicted counts raise `err`. */
  def truncate(capacity: Int): Unit =
    while (counts.size > capacity) {
      val (c, _) = removeMin()
      if (c > err) err = c
    }
}

/** Custom TypedImperativeAggregate: Space-Saving heavy hitters
  * (Metwally, Agrawal, El Abbadi 2005, "Efficient Computation of Frequent
  * and Top-k Elements in Data Streams").
  *
  * Tracks at most `capacity` counters per partial buffer: a seen item
  * increments its counter; an unseen item evicts the minimum counter and
  * inherits its count as over-estimation error. Partials merge with the
  * mergeable-summaries correction: an item absent from one side gets that
  * side's error bound added (its true count there can be up to that bound),
  * then the union re-truncates to `capacity`. Guarantees (including across
  * merges): any item with true frequency > N/capacity is present, counts
  * over-estimate by at most the buffer's error bound. When capacity ≥
  * distinct items nothing is ever evicted, every error bound stays 0, and
  * the sketch is EXACT.
  *
  * The 100 TB story: top-k words over a corpus without the full
  * (word → count) shuffle — each task ships `capacity` counters, the
  * reduce side merges tiny maps. Output: array<struct<item,count>> sorted
  * by (count desc, item). */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with ExpectsInputTypes {

  require(capacity >= 1)
  override def inputTypes = Seq(StringType)
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("count", LongType))),
    containsNull = false)
  override def prettyName: String = "spacesaving_topk"

  override def createAggregationBuffer(): SpaceSavingBuffer = new SpaceSavingBuffer

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      if (buf.counts.contains(item) || buf.size < capacity) buf.add(item, 1L)
      else {
        val (minCnt, _) = buf.removeMin()
        if (minCnt > buf.err) buf.err = minCnt
        buf.add(item, 1L, base = minCnt)
      }
    }
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    // Items in both: counts sum. Items only in one side: the other side's
    // true count for them is ≤ its err, so add that bound to keep counts
    // over-estimates (the mergeable-summaries correction). err = 0 on a
    // never-evicted side keeps exact inputs exact.
    val otherItems = other.counts.toSeq // snapshot: buf mutation is independent
    otherItems.foreach { case (item, cnt) =>
      if (buf.counts.contains(item)) buf.add(item, cnt)
      else buf.add(item, cnt + buf.err)
    }
    if (other.err > 0) buf.counts.keysIterator.toArray.foreach { item =>
      if (!other.counts.contains(item)) buf.add(item, other.err)
    }
    buf.err += other.err
    buf.truncate(capacity)
    buf
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    val sorted = buf.counts.toSeq.sortBy { case (item, cnt) => (-cnt, item.toString) }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      InternalRow(item, cnt)
    }.toArray[Any])
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.err)
    out.writeInt(buf.size)
    buf.counts.foreach { case (item, cnt) =>
      val b = item.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(cnt)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val m = new SpaceSavingBuffer
    m.err = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      m.add(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
