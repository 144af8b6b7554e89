package graft.ann

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{SparkSpec, Tables}
import graft.queries.VectorOps

/** Recall gate for the LSH ANN index against brute-force cosine. */
class AnnSuite extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir).cache()

  private def bruteTopK(k: Int, nQueries: Int): Map[Long, Set[Long]] = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
    val c = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("cv"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    c.crossJoin(broadcast(q)).filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        VectorOps.cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q2, rs) =>
        q2 -> rs.map(_.getLong(1)).toSet
      }
  }

  test("ANN recall@10 >= 0.5 vs brute force on fixture embeddings") {
    val k = 10
    val exact = bruteTopK(k, nQueries = 10)
    val approx = AnnLsh.topK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k,
      AnnLsh.Params(bitsPerTable = 5, tables = 16))
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@$k = $mean < 0.5")
  }

  test("ANN never returns the query itself and respects k") {
    val out = AnnLsh.topK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 5).collect()
    assert(out.forall(r => r.getLong(0) != r.getLong(1)))
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length <= 5))
  }

  test("IVF recall@10 >= 0.4 vs brute force; probes bound the scan") {
    val k = 10
    val exact = bruteTopK(k, nQueries = 10)
    val p = AnnIvf.Params(k = 8, iters = 4, nProbe = 4)
    val approx = AnnIvf.topK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k, p)
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // fixture embeddings are near-isotropic, so IVF recall tracks the
    // probed fraction (4/8 cells) plus cluster structure
    assert(mean >= 0.4, s"mean IVF recall@$k = $mean < 0.4")
  }

  test("IVF assigns every vector to exactly one of k cells") {
    val cents = AnnIvf.train(emb, "embedding", AnnIvf.Params(k = 8, iters = 2))
    assert(cents.size === 8)
    assert(cents.forall(_.size === 64))
    val idx = AnnIvf.index(emb, "vec_id", "embedding", cents)
    assert(idx.count() === emb.count())
    val cells = idx.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf((0 until 8).toSet) && cells.size > 1)
  }

  test("identical vectors collide in every LSH table") {
    import spark.implicits._
    val v = Seq((1L, Array.fill(64)(0.5f)), (2L, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val idx = AnnLsh.index(v, "vec_id", "embedding")
    val collisions = idx.groupBy("table", "bucket")
      .agg(countDistinct(col("id")).as("n"))
      .filter(col("n") === 2).count()
    assert(collisions === 8, "8 tables → 8 shared buckets")
  }

  test("grid_spatial_join finds EXACTLY the brute-force epsilon pairs") {
    import org.apache.spark.sql.functions._
    val pts = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "CAST(embedding[0] AS DOUBLE) AS x",
        "CAST(embedding[1] AS DOUBLE) AS y")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val brute = (for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= 0.0025
    } yield ((a._1, b._1), d2)).toMap
    val rows = graft.queries.VectorOps.gridSpatialJoin.run(spark, sfDir)
      .collect()
    // the reported total is the full brute-force pair count (the grid
    // must neither miss boundary pairs nor double-count replicas)
    assert(rows.head.getLong(3) == brute.size.toLong,
      s"pair count ${rows.head.getLong(3)} vs brute ${brute.size}")
    // and the 15 reported closest pairs are the true closest 15
    val expTop = brute.toSeq.sortBy(t => (t._2, t._1._1, t._1._2)).take(15)
    rows.zip(expTop).foreach { case (r, ((ia, ib), d2)) =>
      assert(r.getLong(0) == ia && r.getLong(1) == ib, s"pair order: $r")
      assert(math.abs(r.getDouble(2) - math.sqrt(d2)) < 2e-6)
    }
  }

  test("dbscan_grid replays a naive in-memory DBSCAN exactly") {
    val pts = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "CAST(embedding[0] AS DOUBLE) AS x",
        "CAST(embedding[1] AS DOUBLE) AS y")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val eps2 = 0.0001
    def d2(a: (Long, Double, Double), b: (Long, Double, Double)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    val nbrs = pts.map(a =>
      a._1 -> pts.filter(b => b._1 != a._1 && d2(a, b) <= eps2).map(_._1).toSet
    ).toMap
    val core = pts.map(_._1).filter(v => nbrs(v).size >= 3).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(core.toSeq.map(v => v -> v): _*)
    def find(v: Long): Long = {
      var r = v; while (parent(r) != r) r = parent(r)
      r
    }
    for (a <- core; b <- nbrs(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // every union parents the larger root to the smaller, so each
    // tree's root is the component's minimum id — matching CC's labels
    val coreByComp = core.groupBy(v => find(v))
    val borders = pts.map(_._1).filterNot(core)
      .flatMap(v => {
        val cn = nbrs(v).filter(core)
        if (cn.nonEmpty) Some(v -> cn.map(find).min) else None
      }).toMap
    val nNoise = pts.length - core.size - borders.size
    val expected = coreByComp.map { case (c, cs) =>
      (c, cs.size.toLong, borders.count(_._2 == c).toLong)
    }.toSeq.map(t => (t._1, t._2, t._3, t._2 + t._3))
    val rows = graft.queries.VectorOps.dbscanGrid.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val noiseRow = rows.find(_._1 == -1L).get
    assert(noiseRow._4 == nNoise.toLong, s"noise ${noiseRow._4} vs $nNoise")
    val gotClusters = rows.filterNot(_._1 == -1L).toSet
    assert(gotClusters == expected.toSet,
      s"clusters:\n${gotClusters.toSeq.sortBy(_._1)}\nvs\n${expected.sortBy(_._1)}")
  }

  test("morans_i replays a naive spatial-autocorrelation computation") {
    val pts = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("CAST(embedding[0] AS DOUBLE) AS x",
        "CAST(embedding[1] AS DOUBLE) AS y")
      .collect().map(r => (math.floor(r.getDouble(0) / 0.05).toLong,
        math.floor(r.getDouble(1) / 0.05).toLong))
    val cells = pts.groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    val n = cells.size.toLong
    val sx = cells.values.sum
    val dev = cells.map { case (c, x) => c -> (x * n - sx) }
    val pairs = dev.keys.toSeq.flatMap { case (cx, cy) =>
      Seq((cx + 1, cy), (cx, cy + 1)).filter(dev.contains)
        .map(nb => (dev((cx, cy)), dev(nb)))
    }
    val num = pairs.map { case (a, b) => a * b }.sum
    val w = pairs.size.toLong
    val den = dev.values.map(d => d * d).sum
    val expected = math.floor(
      n.toDouble * (2 * num) / ((2.0 * w) * den) * 1000000 + 0.5) / 1000000
    val r = graft.queries.VectorOps.moransI.run(spark, sfDir).collect()(0)
    assert(r.getLong(0) == n && r.getLong(1) == 2 * w)
    assert(r.getDouble(2) == expected, s"I ${r.getDouble(2)} vs $expected")
    assert(math.abs(r.getDouble(3) - (-1.0 / (n - 1))) < 2e-6)
  }

  test("getis_ord: hot spots replay and z-scores are extreme where dense") {
    val pts = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("CAST(embedding[0] AS DOUBLE) AS x",
        "CAST(embedding[1] AS DOUBLE) AS y")
      .collect().map(r => (math.floor(r.getDouble(0) / 0.05).toLong,
        math.floor(r.getDouble(1) / 0.05).toLong))
    val cells = pts.groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    val n = cells.size.toLong
    val sx = cells.values.sum
    val sxx = cells.values.map(v => v * v).sum
    val xbar = sx.toDouble / n
    val s = math.sqrt(sxx.toDouble / n - xbar * xbar)
    val expected = cells.keys.toSeq.map { case (cx, cy) =>
      val nb = for { dx <- -1 to 1; dy <- -1 to 1
        v <- cells.get((cx + dx, cy + dy)) } yield v
      val (si, wi) = (nb.sum, nb.length.toLong)
      val g = (si - xbar * wi) /
        (s * math.sqrt((n.toDouble * wi - wi.toDouble * wi) / (n - 1)))
      ((cx, cy), si, wi, g)
    }.sortBy(t => (-t._4, t._1._1, t._1._2)).take(10)
    val rows = graft.queries.VectorOps.getisOrd.run(spark, sfDir).collect()
    rows.zip(expected).foreach { case (r, ((cx, cy), si, wi, g)) =>
      assert(r.getLong(0) == cx && r.getLong(1) == cy, s"cell order: $r")
      assert(r.getLong(2) == si && r.getLong(3) == wi)
      assert(math.abs(r.getDouble(4) - g) < 2e-6)
    }
    // hottest cell is hotter than the global mean by construction
    assert(rows.head.getDouble(4) > 0)
  }

  test("embed_isotropy: replays brute-force pair cosines") {
    val row = graft.queries.VectorOps.embedIsotropy.run(spark, sfDir)
      .collect().head
    val (ns, np, mean, mx) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3))
    assert(np == ns * (ns - 1) / 2)
    assert(mean >= 0 && mx >= mean - 1e-9 && mx <= 1 + 1e-9)
    val vs = graft.Tables.embeddings(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 40)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val acs = for (i <- vs.indices; j <- i + 1 until vs.length)
      yield math.abs(cos(vs(i)._2, vs(j)._2))
    assert(math.abs(mean - math.floor(acs.sum / acs.length * 1000000 + 0.5)
      / 1000000) < 1e-4)
    assert(math.abs(mx - math.floor(acs.max * 1000000 + 0.5) / 1000000)
      < 1e-6)
  }
}
