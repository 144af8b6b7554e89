package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key mitigation for equi-joins (SURVEY.md §2.B join row; the
  * 100 TB skew story beside AQE's runtime skew-join splitting).
  *
  * `saltedJoin` splits each left-side key into `salt` sub-keys
  * (deterministic round-robin by row id — NOT rand(), which would
  * change row routing on task retry) and replicates the right side
  * across every sub-key. A key holding 1% of 100 TB then lands on
  * `salt` reducers instead of one. Use when the build side is too big
  * to broadcast and AQE's split threshold is too coarse; results are
  * exactly those of the plain equi-join. */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    val l = left.withColumn("__graft_salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val r = right.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "__graft_salt"), joinType).drop("__graft_salt")
  }
}
