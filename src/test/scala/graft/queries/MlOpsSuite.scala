package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties + plan pins for the distributed-ML queries (MlOps):
  * k-means, count-min sketch, JL random projection. */
class MlOpsSuite extends SparkSpec {

  test("kmeans_embed: clusters partition the corpus; result is stable") {
    val out = MlOps.kmeansEmbed.run(spark, sfDir).collect()
    assert(out.length == 8, "k = 8 clusters")
    val total = out.map(_.getLong(1)).sum
    val n = graft.Tables.embeddings(spark, sfDir).count()
    assert(total == n, s"cluster sizes sum to the corpus: $total vs $n")
    // Lloyd never empties a cluster on this fixture and norms are finite
    assert(out.forall(_.getLong(1) > 0))
    assert(out.forall(r => !r.getDouble(2).isNaN && r.getDouble(2) > 0))
    // determinism: a re-run reproduces the exact rows (argmin has no
    // engine-order dependence — the whole point of the design)
    val again = MlOps.kmeansEmbed.run(spark, sfDir).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("kmeans assignment plan: broadcast centroids, partial-agg argmin") {
    // The scale contract: the per-iteration argmin must partial-
    // aggregate map-side (one row per point crosses the exchange) and
    // the centroid side must broadcast — never a point-side shuffle
    // of the k-times-replicated candidates.
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val pts = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1048576.0D) AS BIGINT))").as("xi"))
      .withColumn("xd", expr("transform(xi, v -> CAST(v AS DOUBLE) / 1048576.0D)"))
    val cents = pts.filter(col("id") < 8).limit(8)
      .select(col("id").cast("int").as("cid"),
        col("xd").as("md"))
    val dot = graft.functions.GraftFunctions.dotNative _
    val assigned = pts.crossJoin(broadcast(cents))
      .withColumn("dist", dot(col("xd"), col("md")))
      .select(col("id"), struct(col("dist"), col("cid"), col("xi")).as("sc"))
      .groupBy("id").agg(min("sc").as("m"))
    val plan = assigned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), "centroids broadcast")
    assert(plan.contains("partial_min") || plan.contains("partial min"),
      s"argmin partial-aggregates map-side:\n$plan")
  }

  test("cms_freq: CMS estimate >= true count for EVERY vocabulary token") {
    // The oracle row pins the top-20 cells exactly; this pins the
    // sketch's defining one-sided-error property over the whole vocab.
    val docs = graft.Tables.documents(spark, sfDir)
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val mults = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
    val h = wc.withColumn("hb", expr(
      "aggregate(transform(sequence(0, least(length(w), 8) - 1), " +
        "j -> ascii(substring(w, CAST(j + 1 AS INT), 1)) * CAST(pow(31, j) AS BIGINT)), " +
        "0L, (a, x) -> a + x) % 1000003"))
    val b = h.select(col("w"), col("cnt"),
      posexplode(array(mults.map(m => (col("hb") * m) % 1048573 % 1024): _*))
        .as(Seq("j", "b")))
    val cells = b.groupBy("j", "b").agg(sum("cnt").as("c"))
    val est = b.join(cells, Seq("j", "b"))
      .groupBy("w").agg(first("cnt").as("cnt"), min("c").as("est"))
    val under = est.filter(col("est") < col("cnt")).count()
    assert(under == 0, "count-min never underestimates")
  }

  test("rp_reduce: JL norm concentration on the fixture") {
    val rows = MlOps.rpReduce.run(spark, sfDir)
      .select("jl_ratio").collect().map(_.getDouble(0))
    val mean = rows.sum / rows.length
    assert(mean > 0.8 && mean < 1.2,
      s"E[|y|^2 / (16 |x|^2)] should concentrate near 1, got $mean")
    assert(rows.forall(r => r > 0 && r < 8), "no degenerate projections")
  }
}
