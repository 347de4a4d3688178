package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.util.{HashMap => JHashMap}

/** Misra-Gries heavy-hitter sketch aggregate (`graft_mg(term, m)`): at
  * most `m` (term, count) counters per buffer; any term with true
  * frequency > n/(m+1) is guaranteed to survive, and reported counts
  * undercount by at most n/(m+1) in total (Agarwal et al., "Mergeable
  * Summaries", PODS'12 merge rule: sum counters, then subtract the
  * (m+1)-th largest and drop non-positive).
  *
  * The second native `TypedImperativeAggregate` next to [[KMinValues]]:
  * partial aggregation runs map-side, so at 100 TB the shuffle carries
  * at most `m` counters per mapper instead of the term stream. When
  * `m >=` the number of distinct terms no eviction ever fires and the
  * sketch IS the exact frequency table — the regime the DuckDB oracle
  * gate pins (t24: corpus vocabulary 31 < m=64); the approximation
  * regime is spec-checked against the theoretical bound instead.
  *
  * Output: `array<struct<term string, cnt long>>` sorted by
  * (cnt DESC, term ASC) — deterministic whenever counts are exact.
  */
case class MisraGries(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JHashMap[String, Long]] {

  require(m >= 1, s"graft_mg needs m >= 1, got $m")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): JHashMap[String, Long] =
    new JHashMap[String, Long]()

  override def update(
      buffer: JHashMap[String, Long], input: InternalRow): JHashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String].toString
      val cur = buffer.getOrDefault(term, 0L) // live counters are always >= 1
      if (cur > 0L) buffer.put(term, cur + 1L)
      else if (buffer.size < m) buffer.put(term, 1L)
      else decrementAll(buffer, 1L)
    }
    buffer
  }

  override def merge(
      buffer: JHashMap[String, Long],
      other: JHashMap[String, Long]): JHashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buffer.put(e.getKey, buffer.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (buffer.size > m) {
      // subtract the (m+1)-th largest count, drop what hits zero
      val counts = new Array[Long](buffer.size)
      var i = 0
      val vs = buffer.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(buffer, counts(buffer.size - m - 1))
    }
    buffer
  }

  private def decrementAll(buffer: JHashMap[String, Long], by: Long): Unit = {
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  override def eval(buffer: JHashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buffer.size)
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    scala.util.Sorting.stableSort(entries,
      (a: (String, Long), b: (String, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    new GenericArrayData(entries.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buffer: JHashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): JHashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val map = new JHashMap[String, Long]()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      map.put(new String(b, "UTF-8"), in.readLong())
    }
    map
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}
