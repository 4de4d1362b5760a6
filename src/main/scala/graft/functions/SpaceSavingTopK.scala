package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom TypedImperativeAggregate: Space-Saving heavy hitters
  * (Metwally, Agrawal, El Abbadi 2005, "Efficient Computation of Frequent
  * and Top-k Elements in Data Streams").
  *
  * Tracks at most `capacity` counters per partial buffer: a seen item
  * increments its counter; an unseen item evicts the minimum counter and
  * inherits its count as over-estimation error. Partials merge by summing
  * counts then re-truncating to `capacity`. Guarantees: any item with true
  * frequency > N/capacity is present, counts over-estimate by ≤ min-count.
  * When capacity ≥ distinct items the sketch is EXACT.
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
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] with ExpectsInputTypes {

  require(capacity >= 1)
  override def inputTypes = Seq(StringType)
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("count", LongType))),
    containsNull = false)
  override def prettyName: String = "spacesaving_topk"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  private def truncate(m: mutable.HashMap[UTF8String, Long]): Unit =
    if (m.size > capacity) {
      val keep = m.toSeq.sortBy { case (item, cnt) => (-cnt, item.toString) }.take(capacity)
      m.clear(); m ++= keep
    }

  override def update(buf: mutable.HashMap[UTF8String, Long], input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < capacity => buf.update(item.clone(), 1L)
        case None =>
          val (minItem, minCnt) = buf.minBy { case (i, c) => (c, i.toString) }
          buf.remove(minItem)
          buf.update(item.clone(), minCnt + 1)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (item, cnt) =>
      buf.update(item, buf.getOrElse(item, 0L) + cnt)
    }
    truncate(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (item, cnt) => (-cnt, item.toString) }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      InternalRow(item, cnt)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, cnt) =>
      val b = item.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(cnt)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      m.update(UTF8String.fromBytes(b), in.readLong())
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
