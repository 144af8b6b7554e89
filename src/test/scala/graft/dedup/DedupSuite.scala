package graft.dedup

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Planted-duplicate gates for the probabilistic dedup sketches.
  * Fixture docs (sf0.001) are perturbed by replacing a few tokens —
  * near-dups must be found; unrelated docs must not pair up. */
class DedupSuite extends SparkSpec {

  /** Replace every perturbStep-th token with a marker — a ~few-% edit. */
  private def perturb(text: String, step: Int): String = {
    val ts = text.split(" ")
    ts.zipWithIndex.map { case (t, i) => if (i % step == step - 1) "zzqx" else t }
      .mkString(" ")
  }

  private lazy val planted = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").limit(20)
    import spark.implicits._
    val orig = docs.as[(Long, String)].collect()
    val copies = orig.map { case (id, t) => (id + 100000L, perturb(t, 20)) }
    spark.createDataFrame(orig ++ copies).toDF("doc_id", "text")
  }

  test("MinHash-LSH finds every planted near-dup pair, nothing else") {
    val pairs = MinHashLSH
      .dedupPairs(planted, "doc_id", "text",
        MinHashLSH.Params(threshold = 0.5))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val expected = (0 until 20).map(i => (i.toLong, i + 100000L)).toSet
    val plantedFound = pairs.filter { case (a, b) => b - a == 100000L }
    assert(plantedFound === expected, "every planted pair must be recalled")
    // The fixture's own 0.9+ planted dups may also appear; no pair may
    // join two UNRELATED docs (exact-Jaccard verify forbids it).
    val sus = pairs -- expected
    assert(sus.forall { case (a, b) => (b - a) != 1 || a >= 100000L },
      s"unexpected unrelated pairs: $sus")
  }

  test("MinHash keep-first drops exactly the id_b side of found pairs") {
    val p = MinHashLSH.Params(threshold = 0.5)
    val pairs = MinHashLSH.dedupPairs(planted, "doc_id", "text", p)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val kept = MinHashLSH.dedupKeepFirst(planted, "doc_id", "text", p)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expectDropped = pairs.map(_._2).toSet
    assert(kept === planted.select("doc_id").collect().map(_.getLong(0)).toSet
      -- expectDropped)
    // every perturbed copy pairs with its original, so none survive
    assert((0 until 20).forall(i => !kept.contains(i + 100000L)),
      "perturbed copies (higher ids) are dropped")
  }

  test("SimHash separates planted near-dups from unrelated docs") {
    // The fixture vocabulary is ~40 shared words, so unrelated docs are
    // genuinely similar as bags-of-words — SimHash can only be asserted
    // as a statistical separator here, not a hard threshold.
    val sigs = SimHash.signatures(planted, "doc_id", "text").cache()
    val a = sigs.select(col("id").as("ia"), col("sh").as("sa"))
    val b = sigs.select(col("id").as("ib"), col("sh").as("sb"))
    val dists = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        SimHash.hamming(col("sa"), col("sb")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val plantedD = dists.collect { case (x, y, d2) if y - x == 100000L => d2 }
    val unrelatedD = dists.collect {
      case (x, y, d2) if y - x != 100000L && y < 100000L => d2
    }
    val meanP = plantedD.sum.toDouble / plantedD.length
    val meanU = unrelatedD.sum.toDouble / unrelatedD.length
    assert(meanP + 8 < meanU,
      s"planted mean $meanP not well below unrelated mean $meanU")
    assert(plantedD.count(_ <= 16).toDouble / plantedD.length >= 0.6,
      s"too few planted pairs within Hamming 16: ${plantedD.mkString(",")}")
  }

  test("SimHash hash quality: fixture pair density stays near the ideal-hash level") {
    // Regression gate for the token hash's bit quality: with an ideal
    // (md5) token hash the sf0.001 corpus has 12 pairs at Hamming <= 3;
    // the first portable hash (linear poly pack) silently inflated that
    // to 55 (and 18x at sf0.1) — correlated signature bits fatten every
    // pigeonhole bucket at scale. The quadratic-mix hash measures 20;
    // the bound leaves headroom but fails on any structural regression.
    val n = SimHash.dedupPairs(
      Tables.documents(spark, sfDir), "doc_id", "text", maxDist = 3).count()
    assert(n <= 36, s"Hamming<=3 pair density regressed: $n pairs (ideal ~12)")
    assert(n >= 5, s"suspiciously few pairs ($n) — hash or fixture changed?")
  }

  test("SimHash: identical texts collide exactly (distance 0)") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "a completely different sentence with other words entirely"))
      .toDF("doc_id", "text")
    val pairs = SimHash.dedupPairs(df, "doc_id", "text", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 2L)))
  }

  test("SimHash pigeonhole is exhaustive at maxDist 10 (vs brute force)") {
    // maxDist+1 chunks guarantee every pair within maxDist shares a
    // chunk (ADVICE r2: 4 fixed chunks only covered distance <= 3).
    val docs = Tables.documents(spark, sfDir).limit(200)
    val viaJoin = SimHash.dedupPairs(docs, "doc_id", "text", maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = SimHash.signatures(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 10
    } yield (ia, ib)).toSet
    assert(viaJoin === brute)
  }

  test("connected components merge pair chains into one cluster") {
    import spark.implicits._
    // edges: 1-2, 2-3 (chain → one component labeled 1); 10-11 separate
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = graft.dedup.ConnectedComponents.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: long path converges within maxIter") {
    import spark.implicits._
    // a 12-node path needs several propagation rounds
    val pairs = (0L until 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = graft.dedup.ConnectedComponents.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 12 && got.values.toSet === Set(0L))
  }

  test("connected components: 10k-node path converges in O(log n) rounds") {
    import spark.implicits._
    // Adversarial diameter: a 10,000-node path is the worst case for
    // label propagation (min label is 9999 hops from the far end).
    // Pointer jumping doubles reach per round, so convergence must be
    // logarithmic — ~log2(10000) ≈ 13.3 plus slack — not O(diameter).
    // This load-tests the O(log n) claim instead of asserting it.
    val n = 10000L
    val pairs = spark.range(n - 1)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    // driverGate = 0 forces the DISTRIBUTED fixpoint (the 100 TB
    // path): the default gate would union-find 10k edges driver-side
    val (labels, rounds) =
      graft.dedup.ConnectedComponents.componentsWithRounds(pairs,
        maxIter = 20, driverGate = 0L)
    val agg = labels.agg(
      count(lit(1)).as("n"),
      sum(when(col("label") === 0L, 1L).otherwise(0L)).as("zeros"))
      .collect()(0)
    assert(agg.getLong(0) === n && agg.getLong(1) === n,
      "every node must carry the component-min label 0")
    assert(rounds <= 17, s"expected ~log2(10000)+slack rounds, got $rounds")
  }

  test("connected components: driver union-find branch ≡ distributed " +
    "fixpoint on the same random graph") {
    // r11: components() gained a count-gated driver union-find
    // endpoint (≤5M symmetric edges). Force BOTH branches on one
    // 3k-edge random graph and assert identical labels — the kcore
    // both-branch discipline, so the gate can never silently diverge.
    val rnd = new scala.util.Random(7)
    val pairs = spark.createDataFrame(
      Seq.fill(3000)((rnd.nextInt(800).toLong, rnd.nextInt(800).toLong))
        .filter(p => p._1 != p._2)).toDF("id_a", "id_b")
    val viaDriver = graft.dedup.ConnectedComponents
      .componentsWithRounds(pairs, maxIter = 48)
    val viaRdd = graft.dedup.ConnectedComponents
      .componentsWithRounds(pairs, maxIter = 48, driverGate = 0L)
    assert(viaDriver._2 === 0, "gate should have taken the driver branch")
    assert(viaRdd._2 > 0, "driverGate=0 should have run the RDD fixpoint")
    val a = viaDriver._1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = viaRdd._1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("property: signature agreement estimates Jaccard within ±0.15") {
    import spark.implicits._
    // construct doc pairs with known shingle overlap by sharing a prefix
    val rnd = new scala.util.Random(11)
    def words(n: Int) = Seq.fill(n)("w" + rnd.nextInt(5000)).mkString(" ")
    val pairs = (0 until 10).map { i =>
      val shared = words(120)
      val a = shared + " " + words(30)
      val b = shared + " " + words(30)
      (i.toLong, a, b)
    }
    val df = spark.createDataFrame(
      pairs.map { case (i, a, _) => (i, a) } ++
        pairs.map { case (i, _, b) => (i + 1000L, b) })
      .toDF("doc_id", "text")
    val p = MinHashLSH.Params()
    val sigs = MinHashLSH.signatures(df, "doc_id", "text", p)
      .select(col("id"), col("shingles"), col("sig"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](1).toSet, r.getSeq[Long](2))).toMap
    pairs.foreach { case (i, _, _) =>
      val (shA, sigA) = sigs(i)
      val (shB, sigB) = sigs(i + 1000L)
      val trueJ = shA.intersect(shB).size.toDouble / shA.union(shB).size
      val estJ = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / p.numHashes
      assert(math.abs(trueJ - estJ) <= 0.15,
        s"pair $i: true=$trueJ est=$estJ")
    }
  }

  test("shingleSet produces token n-grams (distinct, short-doc safe)") {
    import spark.implicits._
    val out = Seq("a b c d", "a b", "x x x x")
      .toDF("text")
      .select(MinHashLSH.shingleSet(col("text"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq("a b"))
    assert(out(2) === Seq("x x x"))
  }

  test("bcubed_eval: B3 replays a naive union-find + per-doc average") {
    val row = graft.queries.DedupAnn.bcubedEval.run(spark, sfDir)
      .collect().head
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 80)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    def grams(ts: Array[String]): Set[String] = {
      val n = math.max(ts.length - 3, 0) + 1
      (1 to n).map(i => ts.slice(i - 1, i + 2).mkString(" ")).toSet
    }
    val g = docs.map { case (id, ts) => id -> grams(ts) }.toMap
    val ids = docs.map(_._1).sorted
    def clusters(pred: (Long, Long) => Boolean): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for (i <- ids; j <- ids if i < j && pred(i, j)) {
        val (a, b) = (find(i), find(j))
        if (a != b) parent(math.max(a, b)) = math.min(a, b)
      }
      ids.map(i => i -> find(i)).toMap
    }
    def jacEdge(mult: Int, umult: Int)(a: Long, b: Long): Boolean = {
      val inter = g(a).intersect(g(b)).size.toLong
      val uni = g(a).union(g(b)).size.toLong
      inter * mult >= uni * umult
    }
    val sys = clusters(jacEdge(50, 1))
    val gold = clusters(jacEdge(5, 4))
    val n = ids.length
    val bySys = ids.groupBy(sys)
    val byGold = ids.groupBy(gold)
    val p = ids.map { d =>
      val c = bySys(sys(d)); val gcl = byGold(gold(d)).toSet
      c.count(gcl).toDouble / c.length
    }.sum / n
    val r = ids.map { d =>
      val gcl = byGold(gold(d)); val c = bySys(sys(d)).toSet
      gcl.count(c).toDouble / gcl.length
    }.sum / n
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == bySys.size.toLong)
    assert(row.getLong(2) == byGold.size.toLong)
    assert(math.abs(row.getDouble(3) - p) < 1e-5, s"P ${row.getDouble(3)} vs $p")
    assert(math.abs(row.getDouble(4) - r) < 1e-5, s"R ${row.getDouble(4)} vs $r")
    assert(math.abs(row.getDouble(5) - 2 * p * r / (p + r)) < 1e-5)
  }
}
