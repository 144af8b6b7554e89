package graft.queries

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The user-extension surface (SURVEY.md §2.B last row): scalar UDFs via
  * spark.udf.register, typed UDAFs via functions.udaf — the relational
  * re-expression of the reference's register-then-call-by-name model
  * (`/root/reference/src/mr_task_factory.cc:74-88`); the general
  * flatMap/reduce form lives in graft.mapreduce.
  *
  * Plus the map-typed / JSON scalar functions (map_keys/map_values/
  * element_at, from_json/to_json) the §2.B scalar row declares.
  */
object Extensibility {

  /** Typed UDAF: mean of a double expression — (sum, count) buffer,
    * mergeable from any partitioning (commutative, like every reference
    * reducer must be). */
  object MeanAgg extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: Double): (Double, Long) =
      (b._1 + a, b._2 + 1)
    override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Long)): Double =
      if (r._2 == 0) 0.0 else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Idempotent registration of the demo UDF/UDAF surface. */
  def ensureRegistered(s: SparkSession): Unit = {
    s.udf.register("graft_mean", udaf(MeanAgg))
    s.udf.register("graft_ntokens", (text: String) =>
      if (text == null) 0 else text.split(" ").length)
  }

  /** UDAF through the full register-resolve-execute path: mean
    * discounted price per return flag. */
  val q48Udaf: Q = Q(
    "q48_udaf_mean",
    """SELECT l_returnflag,
      | floor(avg(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000
      |   AS mean_disc_price,
      | count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, d) =>
      ensureRegistered(s)
      graft.Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          (floor(call_function("graft_mean",
            col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000
            + lit(0.5)) / 10000).as("mean_disc_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
  }

  /** Scalar UDF through the registry (the reference's user-map path,
    * here as a declared relational UDF). */
  val q49Udf: Q = Q(
    "q49_udf_ntokens",
    """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    ensureRegistered(s)
    graft.Tables.documents(s, d)
      .select(col("doc_id"),
        call_function("graft_ntokens", col("text")).as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Map-typed + JSON functions: from_json → map, map_keys/map_values/
    * element_at, to_json round-trip (compact form in both engines). */
  val q47MapJson: Q = Q(
    "q47_map_json",
    """SELECT event_id,
      | array_to_string(list_sort(json_keys(props)), ',') AS keys,
      | CAST(len(json_keys(props)) AS INTEGER) AS n_vals,
      | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
      | to_json(json(props)) AS j_norm
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    val m = from_json(col("props"),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.LongType))
    graft.Tables.events(s, d)
      .select(col("event_id"),
        concat_ws(",", array_sort(map_keys(m))).as("keys"),
        size(map_values(m)).as("n_vals"),
        element_at(m, "k").as("k_val"),
        to_json(m).as("j_norm"))
      .orderBy("event_id")
  }

  /** first/last window functions over a full frame (§2.B window row). */
  val q26WindowFirstLast: Q = Q(
    "q26_window_firstlast",
    """SELECT o_custkey, o_orderkey,
      | first_value(o_totalprice) OVER w AS first_spend,
      | last_value(o_totalprice) OVER w AS last_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("o_orderkey")
      .rowsBetween(Long.MinValue, Long.MaxValue)
    graft.Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first("o_totalprice").over(w).as("first_spend"),
        last("o_totalprice").over(w).as("last_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val all: Seq[Q] = Seq(q48Udaf, q49Udf, q47MapJson, q26WindowFirstLast)
}
