package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-management utilities for the 100 TB stance (builder prompt /
  * SURVEY §4): explicit skew salting and bucketed co-located joins,
  * complementing AQE's runtime skew handling (enabled in
  * `Catalog.sessionConfs`).
  */
object ScaleOps {

  /** Skew-mitigating inner equi-join. The big side scatters each row
    * into one of `factor` salt buckets; the small side is replicated
    * once per bucket, so a hot key's rows spread over `factor` tasks
    * instead of one straggler. Result set is identical to
    * `big.join(small, bigKey === smallKey)`.
    *
    * Use when a key's row count exceeds what one task should own and the
    * small side is broadcast-sized per salt replica. (For moderate skew
    * prefer plain AQE skew-join; salting is the heavy hammer.)
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val saltCol = "__graft_salt"
    require(!big.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"inputs may not already contain a '$saltCol' column")
    val saltedBig = big.withColumn(saltCol,
      pmod(hash(monotonically_increasing_id()), lit(factor)))
    val replicatedSmall = small.withColumn(saltCol,
      explode(array((0 until factor).map(lit): _*)))
    saltedBig
      .join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig(saltCol) === replicatedSmall(saltCol))
      .drop(saltCol)
  }
}
