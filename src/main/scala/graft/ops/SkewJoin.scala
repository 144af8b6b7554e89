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

  /** Join types where replicating the right side is sound: the left side
    * is salted (never duplicated) and unmatched RIGHT rows either don't
    * appear (inner/left_semi) or are dropped (left/left_anti). Right and
    * full outer would emit `salt` null-extended copies of every unmatched
    * right row — rejected. */
  private val SupportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(SupportedJoinTypes(joinType.toLowerCase),
      s"saltedJoin supports ${SupportedJoinTypes.mkString("/")}; for " +
        s"'$joinType' the replicated build side would duplicate unmatched rows")
    val l = left.withColumn("__graft_salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val r = right.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "__graft_salt"), joinType).drop("__graft_salt")
  }
}
