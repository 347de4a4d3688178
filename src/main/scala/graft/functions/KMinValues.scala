package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.util.{TreeSet => JTreeSet}

/** KMV (k-minimum-values) sketch aggregate: keeps the `k` smallest
  * DISTINCT long hash values per group — a mergeable distinct-count
  * sketch (`ndv ≈ (k-1) * hashRange / kthMin`) and simultaneously a
  * minhash signature generator in a single pass.
  *
  * A native `TypedImperativeAggregate` (the extension point SURVEY §2.12
  * reserves for custom aggregates): mutable TreeSet buffer, partial
  * aggregation (map-side combine) and buffer merge — so at 100 TB the
  * shuffle carries at most `k` longs per group per mapper.
  *
  * Deterministic output (sorted distinct minima), so it is
  * DuckDB-oracle-checkable via
  * `list_sort(list_distinct(list(h)))[1:k]`.
  */
/** Shared KMV estimator fragments — ONE definition of
  * `ndv ≈ (k−1)·hashRange / kthMin` (exhaustive-below-k exact case
  * included) for every consumer: q72's set algebra, st27's streaming
  * monitor, the scale smoke, and their DuckDB oracles. The hash range
  * is [[PolyHash32.Mod]] (the polyhash modulus both engines share).
  * Callers cast the result to bigint at the emit site.
  */
object KmvEstimator {
  /** Spark SQL expression over a sorted-minima array column `hs`. */
  def spark(hs: String, k: Int): String =
    s"CASE WHEN size($hs) >= $k THEN (${k - 1} * ${PolyHash32.Mod}L)" +
      s" div element_at($hs, $k) ELSE cast(size($hs) as bigint) END"

  /** DuckDB expression over a sorted-distinct-minima list `fl`. */
  def duck(fl: String, k: Int): String =
    s"CASE WHEN len($fl) >= $k THEN (${k - 1} * ${PolyHash32.Mod})" +
      s" // $fl[$k] ELSE len($fl) END"

  /** Driver-side fold over a collected sketch (the scale smoke). */
  def scala(hs: Seq[Long], k: Int): Long =
    if (hs.length >= k) (k - 1).toLong * PolyHash32.Mod / hs(k - 1)
    else hs.length.toLong
}

case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JTreeSet[java.lang.Long]] {

  require(k >= 1, s"kmin needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  override def update(
      buffer: JTreeSet[java.lang.Long], input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: JTreeSet[java.lang.Long],
      other: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buffer, it.next())
    buffer
  }

  private def insert(buffer: JTreeSet[java.lang.Long], v: Long): Unit = {
    buffer.add(v)
    if (buffer.size > k) buffer.pollLast() // drop current max, keep k smallest
  }

  override def eval(buffer: JTreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new JTreeSet[java.lang.Long]()
    (0 until n).foreach(_ => set.add(bb.getLong))
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KMinValues =
    copy(child = newChildren.head)
}
