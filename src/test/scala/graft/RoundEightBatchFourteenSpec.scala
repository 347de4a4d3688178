package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-14 specs (st21 / sp31 / t31). */
class RoundEightBatchFourteenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("st21 streaming lateness profile equals the q58 batch profile " +
    "(stream ≡ batch)") {
    def rows(name: String) = run(name).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(rows("st21_stream_lateness") === rows("q58_lateness_profile"))
  }

  test("latenessPerKey carries the running max across micro-batches in " +
    "GroupState") {
    import org.apache.spark.sql.streaming.TestGroupState
    // batch 1: t=100s then t=10s (90s late against the carried max)
    val s1 = TestGroupState.create[Long](
      optionalState = org.apache.spark.api.java.Optional.empty[Long](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    def call(state: TestGroupState[Long],
        evs: Seq[graft.streaming.SessEvent]) =
      graft.streaming.StreamingQueries
        .latenessPerKey(1L, evs.iterator, state).toList
    val out1 = call(s1, Seq(graft.streaming.SessEvent(1L, 1L, 100000L),
      graft.streaming.SessEvent(1L, 2L, 10000L)))
    assert(out1.map(_._3) === List(0L, 90000L))
    assert(s1.get === 100000L)
    // batch 2 for the same key: t=50s arrives 50s behind the CARRIED max
    val s2 = TestGroupState.create[Long](
      optionalState = org.apache.spark.api.java.Optional.of(100000L),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out2 = call(s2, Seq(graft.streaming.SessEvent(1L, 3L, 50000L)))
    assert(out2.map(_._3) === List(50000L))
    assert(s2.get === 100000L)
  }

  test("sp31 growth trend matches a plain-Scala three-snapshot diff") {
    val orders = Catalog.t(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def snap(p: Long => Boolean): Map[Long, Long] =
      orders.filter(o => p(o._2)).groupBy(_._1).map { case (k, v) =>
        k -> v.length.toLong
      }
    val s1 = snap(_ % 3 == 0); val s2 = snap(_ % 3 <= 1); val s3 = snap(_ => true)
    def diff(a: Map[Long, Long], b: Map[Long, Long]) = {
      val keys = a.keySet ++ b.keySet
      val st = keys.toSeq.map { k =>
        (a.get(k), b.get(k)) match {
          case (None, _) => "added"
          case (_, None) => "removed"
          case (Some(x), Some(y)) if x == y => "same"
          case _ => "changed"
        }
      }
      (st.count(_ == "added").toLong, st.count(_ == "removed").toLong,
        st.count(_ == "changed").toLong, st.count(_ == "same").toLong)
    }
    val exp = Map(1 -> diff(s1, s2), 2 -> diff(s2, s3))
    val got = run("sp31_state_growth_trend").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got === exp)
    // a strictly-growing chain never removes keys
    assert(got.values.forall(_._2 == 0L))
  }

  test("t31 burstiness matches a plain-Scala dispersion recomputation " +
    "and ranks topical terms above function words") {
    val docs = Catalog.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nn = docs.length.toLong
    val perDoc = docs.flatMap { case (id, text) =>
      text.split(" ", -1).groupBy(identity).map { case (w, o) =>
        (w, id, o.length.toLong)
      }
    }
    val exp = perDoc.groupBy(_._1).map { case (w, rs) =>
        val s = rs.map(_._3).sum
        val ss = rs.map(x => x._3 * x._3).sum
        (w, s, rs.length.toLong,
          (nn * ss - s * s).toDouble / (nn * s).toDouble)
      }.toSeq.sortBy(x => (-x._2, x._1)).take(32)
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    val got = run("t31_burstiness").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got === exp)
  }
}
