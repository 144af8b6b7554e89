package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property / naive-replay pins for the round-10 operators and fixes,
  * at sf0.001 — the spec leg of the oracle+spec+plan discipline. Each
  * test recomputes the answer with an independent driver-side naive
  * algorithm over collected fixture rows, or pins a guard/branch the
  * oracle cannot see (the kcore fallback reachability, the loud
  * undersized-input failures, the SQL-literal escaping). */
class Round10OpsSuite extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  /** Naive energy-hash-64 replay straight from the WAV fixture
    * generation formula — no Spark, no codec: s(i) =
    * text[i % len]·257 − 16384, rendition 1 applies gain ×2 and the
    * +999 click on every 53rd sample, and bit b compares the time
    * block's |s| sum cross-multiplied against the clip total. */
  private def naiveEnergyHash(text: String, n: Int, rend: Int): Long = {
    val len = text.length
    val av = Array.tabulate(n) { i =>
      var s = text.charAt(i % len).toInt.toLong * 257 - 16384
      if (rend == 1) s = s * 2 + (if (i % 53 == 0) 999L else 0L)
      math.abs(s)
    }
    val t = av.sum
    var hash = 0L
    var b = 0
    while (b < 64) {
      val ilo = (b * n + 63) / 64
      val ihi = ((b + 1) * n + 63) / 64 - 1
      var s = 0L
      var i = ilo
      while (i <= ihi) { s += av(i); i += 1 }
      val nb = (ihi - ilo + 1).toLong
      if (s * n > t * nb) hash |= (1L << b)
      b += 1
    }
    hash
  }

  test("audio_dup_pairs: brute-force replay, planted recall, banding exhaustive") {
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty)
    val sigs = docs.flatMap { case (id, text) =>
      val n = (200 + id % 100).toInt
      Seq((id, 0, naiveEnergyHash(text, n, 0)),
        (id, 1, naiveEnergyHash(text, n, 1)))
    }
    // brute-force all-pairs scan — what the pigeonhole join must equal
    val expected = (for {
      a <- sigs; b <- sigs
      if a._1 * 2 + a._2 < b._1 * 2 + b._2
      dist = java.lang.Long.bitCount(a._3 ^ b._3)
      if dist <= 5
    } yield (a._1, a._2, b._1, b._2, dist))
      .sortBy(t => (t._1, t._2, t._3, t._4))
    val got = run("audio_dup_pairs").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(4)))
    assert(got.toSeq == expected.toSeq,
      s"banded join must equal the brute-force scan: got ${got.length}, " +
        s"expected ${expected.length}")
    // planted recall: every clip's (base, rendition) pair survives the
    // threshold — the gain part is distance-free (|2s| = 2|s|), so only
    // the sparse clicks can spend the 5-bit budget
    val planted = got.filter(t => t._1 == t._3 && t._2 == 0 && t._4 == 1)
    assert(planted.length == docs.length,
      s"all ${docs.length} planted rendition pairs must be within 5 bits, " +
        s"got ${planted.length}")
    // separation: at this SF no unrelated cross-clip pair sneaks under
    assert(got.length == planted.length,
      "no cross-clip pair may sit within the planted threshold")
  }

  test("energyHash64: bits exactly invariant under positive gain") {
    import spark.implicits._
    val base = Array.tabulate(200)(i => ((i * 37) % 251 - 125).toLong)
    val df = Seq((0L, base), (1L, base.map(_ * 3)), (2L, base.map(_ * 11)))
      .toDF("id", "sm")
      .select(col("id"), graft.dedup.PerceptualHash.energyHash64("sm").as("sh"))
    val hashes = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(0L) == hashes(1L) && hashes(1L) == hashes(2L),
      "energy hash must be exactly invariant under s -> g*s (g > 0)")
  }

  test("energyHash64 / aHash64: undersized inputs raise instead of mis-hashing") {
    import spark.implicits._
    val shortClip = Seq((1L, Array.tabulate(63)(_.toLong))).toDF("id", "sm")
      .select(graft.dedup.PerceptualHash.energyHash64("sm"))
    val eA = intercept[Exception] { shortClip.collect() }
    assert(eA.getMessage != null)
    assert(exceptionChain(eA).exists(_.contains("energyHash64 requires >= 64")),
      s"expected the energyHash64 guard, got: ${eA.getMessage}")
    val smallImg = Seq((1L, Array.tabulate(7 * 7 * 3)(_.toLong), 7, 7))
      .toDF("id", "px", "w", "h")
      .select(graft.dedup.PerceptualHash.aHash64("px", "w", "h"))
    val eB = intercept[Exception] { smallImg.collect() }
    assert(exceptionChain(eB).exists(_.contains("aHash64 requires w,h >= 8")),
      s"expected the aHash64 guard, got: ${eB.getMessage}")
  }

  private def exceptionChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq

  test("kcoreFilterAlive: shuffled semi-join fallback reachable, equals broadcast path") {
    val sc = spark.sparkContext
    val edges = sc.parallelize(for {
      u <- 0L until 40L; v <- (u + 1) until 40L
      if (u + v) % 3 != 0
    } yield (u, v))
    val alive = sc.parallelize((0L until 40L).filter(_ % 2 == 0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val nAlive = alive.count()
    val storage = org.apache.spark.storage.StorageLevel.MEMORY_ONLY
    // gate 0 ⇒ count >= gate ⇒ the shuffled semi-join branch runs,
    // with NO driver-side materialization of the alive set; gate ∞ ⇒
    // broadcast branch. Both must keep exactly the same edge set.
    val viaJoin = GraphOps.kcoreFilterAlive(spark, edges, alive, nAlive,
      broadcastGate = 0L, storage).collect().sorted.toSeq
    val viaBroadcast = GraphOps.kcoreFilterAlive(spark, edges, alive, nAlive,
      broadcastGate = Long.MaxValue, storage).collect().sorted.toSeq
    val expected = (for {
      u <- 0L until 40L; v <- (u + 1) until 40L
      if (u + v) % 3 != 0 && u % 2 == 0 && v % 2 == 0
    } yield (u, v)).sorted
    assert(viaJoin == expected, "semi-join branch must keep exactly the alive-alive edges")
    assert(viaBroadcast == expected, "broadcast branch must agree")
    alive.unpersist()
  }

  test("stream_left_join_parity: batch replay under the min-of-sides watermark rule") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("pu"),
        col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("cu"),
        col("ts").as("c_ts"))
    val m = p.join(c, col("pu") === col("cu")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
        && col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"))
    // the executed watermark is min over BOTH withWatermark nodes, each
    // tracking its own side's max event time — the semantics this suite
    // pins so the oracle's least(max_p, max_c) replica stays justified
    val wmRow = p.agg(max("p_ts")).crossJoin(c.agg(max("c_ts")))
      .select(least(col("max(p_ts)"), col("max(c_ts)"))
        - expr("INTERVAL 10 MINUTES")).head().getTimestamp(0)
    val nulls = p.join(m.select(col("p_id")).distinct(), Seq("p_id"),
        "left_anti")
      .filter(col("p_ts") < lit(wmRow))
      .select(col("p_id"), lit(null).cast("long").as("c_id"))
    val expected = m.unionAll(nulls).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted.toSeq
    val got = run("stream_left_join_parity").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted.toSeq
    assert(got == expected,
      s"streaming left join must equal batch join + watermark-gated nulls " +
        s"(got ${got.length} rows, expected ${expected.length})")
    assert(got.exists(_._2 == -1L), "at least one null row must have emitted")
    // and at least one unmatched purchase must be withheld (p_ts past the
    // final watermark) — the eviction gate is load-bearing, not vacuous
    val withheld = p.join(m.select("p_id").distinct(), Seq("p_id"), "left_anti")
      .filter(col("p_ts") >= lit(wmRow)).count()
    assert(withheld > 0, "fixture must leave state-resident unmatched purchases")
  }

  /** Naive temporally-pooled video aHash replay from the Y4M fixture
    * formula: pooled[j] = Σ_f y(f·256+j) with rendition 1 applying
    * y → 2y + 5 per frame plus +7 salt on every 97th pixel of frame 0,
    * then the 16×16 → 8×8 block aHash on the pooled plane. */
  private def naiveVideoHash(text: String, nf: Int, rend: Int): Long = {
    val len = text.length
    val g = Array.tabulate(256) { j =>
      var s = 0L
      var f = 0
      while (f < nf) {
        var v = text.charAt((f * 256 + j) % len).toInt.toLong
        if (rend == 1) v = v * 2 + 5 + (if (f == 0 && j % 97 == 0) 7L else 0L)
        s += v
        f += 1
      }
      s
    }
    val t = g.sum
    var hash = 0L
    var b = 0
    while (b < 64) {
      val r = b / 8; val c = b % 8
      var s = 0L
      var y = 2 * r
      while (y < 2 * r + 2) {
        var x = 2 * c
        while (x < 2 * c + 2) { s += g(y * 16 + x); x += 1 }
        y += 1
      }
      if (s * 256 > t * 4) hash |= (1L << b)
      b += 1
    }
    hash
  }

  test("video_dup_pairs: brute-force replay, planted recall, banding exhaustive") {
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty)
    val sigs = docs.flatMap { case (id, text) =>
      val nf = (1 + id % 8).toInt
      Seq((id, 0, naiveVideoHash(text, nf, 0)),
        (id, 1, naiveVideoHash(text, nf, 1)))
    }
    val expected = (for {
      a <- sigs; b <- sigs
      if a._1 * 2 + a._2 < b._1 * 2 + b._2
      dist = java.lang.Long.bitCount(a._3 ^ b._3)
      if dist <= 5
    } yield (a._1, a._2, b._1, b._2, dist))
      .sortBy(t => (t._1, t._2, t._3, t._4))
    val got = run("video_dup_pairs").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(4)))
    assert(got.toSeq == expected.toSeq,
      s"banded join must equal the brute-force scan: got ${got.length}, " +
        s"expected ${expected.length}")
    // planted recall: the pooled plane of rendition 1 is 2·pool + 5·nf
    // + sparse salt — affine part distance-free, ≤ 3 salt blocks
    val planted = got.filter(t => t._1 == t._3 && t._2 == 0 && t._4 == 1)
    assert(planted.length == docs.length,
      s"all ${docs.length} planted rendition pairs must be within 5 bits, " +
        s"got ${planted.length}")
    assert(planted.forall(_._5 <= 3),
      "salt touches at most 3 of the 64 pooled blocks")
  }

  test("stream_full_join_parity: batch replay — both null paths emit") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("pu"),
        col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("cu"),
        col("ts").as("c_ts"))
    val m = p.join(c, col("pu") === col("cu")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
        && col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"))
    val wmRow = p.agg(max("p_ts")).crossJoin(c.agg(max("c_ts")))
      .select(least(col("max(p_ts)"), col("max(c_ts)"))
        - expr("INTERVAL 10 MINUTES")).head().getTimestamp(0)
    val pNulls = p.join(m.select("p_id").distinct(), Seq("p_id"), "left_anti")
      .filter(col("p_ts") < lit(wmRow))
      .select(col("p_id"), lit(null).cast("long").as("c_id"))
    // the click's no-future-match point is c_ts + 1h (from the other
    // inequality of the range condition)
    val cNulls = c.join(m.select("c_id").distinct(), Seq("c_id"), "left_anti")
      .filter(col("c_ts") + expr("INTERVAL 1 HOUR") < lit(wmRow))
      .select(lit(null).cast("long").as("p_id"), col("c_id"))
    def key(r: org.apache.spark.sql.Row) =
      (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))
    val expected = m.unionAll(pNulls).unionAll(cNulls).collect()
      .map(key).sorted.toSeq
    val got = run("stream_full_join_parity").collect().map(key).sorted.toSeq
    assert(got == expected,
      s"full outer stream join must equal batch join + both watermark-" +
        s"gated null sets (got ${got.length}, expected ${expected.length})")
    assert(got.exists(_._1 == -1L), "at least one right-null row must emit")
    assert(got.exists(_._2 == -1L), "at least one left-null row must emit")
  }

  test("zorder_layout: Morton pruning beats linear on the off-axis dimension") {
    val rows = run("zorder_layout").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val (binsA, scanA, totalA, rowsScanA, matchA) = rows("a_linear_x")
    val (binsB, scanB, totalB, rowsScanB, matchB) = rows("b_zorder")
    assert(binsA == 32 && binsB == 32)
    assert(totalA == totalB, "both layouts bin the same table")
    assert(matchA == matchB, "the box predicate matches the same rows")
    // naive replay of the match count straight from the fixture
    val xd = expr("((l_partkey & 2147483647) * 2654435761L) % 1024")
    val yd = expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) % 1024")
    val naive = graft.Tables.lineitem(spark, sfDir)
      .filter(xd >= 256 && xd < 384 && yd >= 256 && yd < 384)
      .count()
    assert(matchA == naive, s"match count must replay: $matchA vs $naive")
    // the layout claim itself: Z-order prunes in BOTH dims, linear in
    // one — fewer rows scanned for the same answer
    assert(rowsScanB < rowsScanA,
      s"z-order must scan fewer rows than linear-x ($rowsScanB vs $rowsScanA)")
    assert(scanB < binsB, "z-order must actually prune some bins")
  }

  test("stream_semi_join_parity: emitted set = matched purchases, each once") {
    val got = run("stream_semi_join_parity").collect().map(_.getLong(0)).toSeq
    assert(got == got.distinct, "each purchase emits at most once")
    val ev = graft.Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("pu"),
        col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("c_ts"))
    val expected = p.join(c, col("pu") === col("cu")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
        && col("c_ts") <= col("p_ts"), "left_semi")
      .select("p_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got.sorted == expected)
  }

  test("kmv_set_ops: naive bottom-k replay of union/intersection estimates") {
    val M = 1000003L
    def h(w: String): Long = {
      var a = 0L
      var j = 0
      val n = math.min(w.length, 8)
      var p = 1L
      while (j < n) { a += w.charAt(j).toInt * p; p *= 31; j += 1 }
      ((a % M) * 2654435761L) % M
    }
    val bySrc = graft.Tables.documents(spark, sfDir)
      .select((col("doc_id") % 2).as("src"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
        .map(w => (r.getLong(0), h(w)))).distinct
    val hA = bySrc.collect { case (0L, v) => v }.toSet
    val hB = bySrc.collect { case (1L, v) => v }.toSet
    val ka = hA.toSeq.sorted.take(256)
    val kb = hB.toSeq.sorted.take(256)
    val ku = (ka ++ kb).distinct.sorted.take(256)
    val (kUsed, theta) = (ku.size.toLong, ku.max)
    val estU = if (kUsed < 256) kUsed
    else math.floor(255.0 * M / theta + 0.5).toLong
    val kaS = ka.toSet; val kbS = kb.toSet
    val kCommon = ku.count(v => kaS(v) && kbS(v)).toLong
    val estI = math.floor(kCommon.toDouble / kUsed * estU + 0.5).toLong
    val exU = (hA ++ hB).size.toLong
    val exI = (hA intersect hB).size.toLong
    val r = run("kmv_set_ops").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((kUsed, theta, estU, kCommon, estI, exU, exI)))
  }

  test("equidepth_histogram: naive sorted-decile replay") {
    val cents = graft.Tables.orders(spark, sfDir)
      .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
      .collect().map(_.getLong(0))
    val keyed = graft.Tables.orders(spark, sfDir)
      .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"),
        col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val n = keyed.length
    val (base, rem) = (n / 10, n % 10)
    val buckets = keyed.zipWithIndex.map { case ((c, _), i) =>
      val b = if (i < rem * (base + 1)) i / (base + 1)
      else rem + (i - rem * (base + 1)) / base
      (b + 1, c)
    }.groupBy(_._1).toSeq.sortBy(_._1)
    val (rlo, rhi) = (10000000L, 20000000L)
    val expected = buckets.map { case (b, vs) =>
      val cs = vs.map(_._2)
      val (lo, hi) = (cs.min, cs.max)
      val exact = cs.count(c => c >= rlo && c <= rhi).toLong
      val est = if (hi < rlo || lo > rhi) 0L
      else cs.length.toLong * (math.min(hi, rhi) - math.max(lo, rlo) + 1) /
        (hi - lo + 1)
      (b, cs.length.toLong, lo, hi, est, exact)
    }
    val got = run("equidepth_histogram").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.filter(_._1 != 99).toSeq == expected)
    assert(cents.length == n)
    val tot = got.find(_._1 == 99).get
    assert(tot._2 == n.toLong && tot._6 == expected.map(_._6).sum
      && tot._5 == expected.map(_._5).sum)
  }

  test("column_entropy: driver-side Shannon replay within rounding") {
    val got = run("column_entropy").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val flags = graft.Tables.lineitem(spark, sfDir)
      .select("l_returnflag").collect().map(_.getString(0))
    val counts = flags.groupBy(identity).map(_._2.length.toLong).toSeq
    val n = counts.sum.toDouble
    val h = math.log(n) / math.log(2) -
      counts.map(c => c * math.log(c.toDouble)).sum / (n * math.log(2))
    val (gn, gd, gh, gnorm) = got("l_returnflag")
    assert(gn == n.toLong && gd == counts.length.toLong)
    assert(math.abs(gh - math.floor(h * 1e6 + 0.5) / 1e6) < 2e-6)
    assert(gnorm <= 1.0 + 1e-9 && gnorm >= 0.0)
  }

  test("allen_intervals: driver-side relation ladder replay") {
    val spans = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("st"),
        (unix_timestamp(col("ts")) + floor(col("value")).cast("long"))
          .as("en")).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1)
      .map { case ((u, t), vs) =>
        (u, t, vs.map(_._2._1).min, vs.map(_._2._2).max) }.toSeq
    def rel(ast: Long, aen: Long, bst: Long, ben: Long): String =
      if (aen < bst) "before" else if (ben < ast) "after"
      else if (aen == bst && ast < bst) "meets"
      else if (ben == ast && bst < ast) "met_by"
      else if (ast == bst && aen == ben) "equals"
      else if (ast == bst && aen < ben) "starts"
      else if (ast == bst) "started_by"
      else if (aen == ben && ast > bst) "finishes"
      else if (aen == ben) "finished_by"
      else if (ast > bst && aen < ben) "during"
      else if (ast < bst && aen > ben) "contains"
      else if (ast < bst) "overlaps" else "overlapped_by"
    val expected = (for {
      a <- spans; b <- spans
      if a._1 == b._1 && a._2 < b._2
    } yield ((a._2, b._2, rel(a._3, a._4, b._3, b._4)), 1L))
      .groupBy(_._1).map { case (k, vs) => (k._1, k._2, k._3, vs.size.toLong) }
      .toSeq.sorted
    val got = run("allen_intervals").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).sorted.toSeq
    assert(got == expected)
  }

  /** SQL-standard ntile over already-sorted values: first (n mod k)
    * buckets take one extra row. */
  private def naiveNtile(count: Int, k: Int): Array[Int] = {
    val base = count / k; val rem = count % k
    val out = new Array[Int](count)
    var i = 0
    while (i < count) {
      out(i) = if (i < rem * (base + 1)) i / (base + 1) + 1
      else rem + (i - rem * (base + 1)) / base + 1
      i += 1
    }
    out
  }

  test("rfm_segments: driver-side quintile + ladder replay") {
    val o = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val maxDate = o.map(_._2).max
    def days(a: java.sql.Timestamp, b: java.sql.Timestamp): Long =
      java.time.temporal.ChronoUnit.DAYS.between(
        b.toLocalDateTime.toLocalDate, a.toLocalDateTime.toLocalDate)
    val cust = o.groupBy(_._1).map { case (ck, rows) =>
      (ck, days(maxDate, rows.map(_._2).max), rows.length.toLong,
        rows.map(_._3).sum)
    }.toSeq
    def quint(key: ((Long, Long, Long, Long)) => (Long, Long),
        desc: Boolean): Map[Long, Int] = {
      val sorted =
        if (desc) cust.sortBy(c => (-key(c)._1, c._1))
        else cust.sortBy(c => (key(c)._1, c._1))
      val nt = naiveNtile(sorted.length, 5)
      sorted.zipWithIndex.map { case (c, i) => c._1 -> nt(i) }.toMap
    }
    val r = quint(c => (c._2, c._1), desc = true)
    val f = quint(c => (c._3, c._1), desc = false)
    val m = quint(c => (c._4, c._1), desc = false)
    def seg(rs: Int, fs: Int, ms: Int): String =
      if (rs >= 4 && fs >= 4 && ms >= 4) "champions"
      else if (fs >= 4) "loyal" else if (ms >= 4) "big_spender"
      else if (rs <= 2 && fs >= 3) "at_risk"
      else if (rs <= 2) "hibernating" else "regular"
    val expected = cust.map(c => (seg(r(c._1), f(c._1), m(c._1)),
        (r(c._1).toLong, f(c._1).toLong, m(c._1).toLong)))
      .groupBy(_._1).map { case (sg, vs) =>
        def avg6(sel: ((Long, Long, Long)) => Long) =
          math.floor(vs.map(v => sel(v._2)).sum.toDouble / vs.size * 1e6
            + 0.5) / 1e6
        (sg, vs.size.toLong, avg6(_._1), avg6(_._2), avg6(_._3))
      }.toSeq.sortBy(_._1)
    val got = run("rfm_segments").collect()
      .map(rr => (rr.getString(0), rr.getLong(1), rr.getDouble(2),
        rr.getDouble(3), rr.getDouble(4))).toSeq
    assert(got == expected)
  }

  test("basket_rules: brute-force pair lift replay") {
    val b = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(graft.Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand")),
        col("p_partkey") === col("l_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nB = b.map(_._1).distinct.length.toLong
    val cnt = b.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val co = b.groupBy(_._1).values.flatMap { rows =>
      val brands = rows.map(_._2).sorted
      for (i <- brands.indices; j <- (i + 1) until brands.length)
        yield (brands(i), brands(j))
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = co.map { case (a, bb, n) =>
      (a, bb, n, r6(n.toDouble / nB),
        r6(n.toDouble / math.min(cnt(a), cnt(bb))),
        r6(n.toDouble * nB / (cnt(a) * cnt(bb))))
    }.toSeq.sortBy(t => (-t._6, t._1, t._2)).take(20)
    val got = run("basket_rules").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected)
  }

  test("revenue_gini: exact driver-side Gini replay") {
    val cents = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (ck, v) => (ck, v.map(_._2).sum) }.toSeq
      .sortBy(c => (c._2, c._1))
    val n = cents.length.toLong
    val tot = cents.map(_._2).sum
    val num = cents.zipWithIndex
      .map { case ((_, x), i0) => BigInt(2 * (i0 + 1) - n - 1) * x }.sum
    val gini = math.floor(num.toDouble / (n.toDouble * tot) * 1e6 + 0.5) / 1e6
    val topCents = cents.takeRight(((n + 9) / 10).toInt).map(_._2).sum
    val share = math.floor(topCents.toDouble / tot * 1e6 + 0.5) / 1e6
    val r = run("revenue_gini").head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      ((n, tot, gini, share)))
  }

  test("path_triples: driver-side consecutive-triple replay") {
    val byUser = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getLong(3)))
      .groupBy(_._1)
    val expected = byUser.values.flatMap { rows =>
      val ts = rows.sortBy(r => (r._3.getTime, r._4)).map(_._2)
      ts.sliding(3).filter(_.length == 3).map(w => (w(0), w(1), w(2)))
    }.toSeq.groupBy(identity)
      .map { case (k, v) => (k._1, k._2, k._3, v.size.toLong) }.toSeq
      .sortBy(t => (-t._4, t._1, t._2, t._3)).take(20)
    val got = run("path_triples").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("slo_burn_rate: driver-side burn/severity replay") {
    val days = graft.Tables.events(spark, sfDir)
      .select(to_date(date_trunc("day", col("ts"))).as("day"), col("value"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getDouble(1)))
      .groupBy(_._1).map { case (d, vs) =>
        (d, vs.length.toLong, vs.count(_._2 > 90).toLong) }.toSeq
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = days.map { case (d, n, nbad) =>
      val w = days.filter(o => !o._1.isAfter(d)
        && !o._1.isBefore(d.minusDays(6)))
      val (n7, nbad7) = (w.map(_._2).sum, w.map(_._3).sum)
      val b1 = r6(nbad.toDouble / n / 0.05)
      val b7 = r6(nbad7.toDouble / n7 / 0.05)
      val sev = if (b1 >= 14.4 && b7 >= 6) "page"
      else if (b7 >= 1) "ticket" else "ok"
      (d.toString, b1, b7, sev)
    }.sortBy(t => (-t._2, t._1)).take(15)
    val got = run("slo_burn_rate").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getString(3))).toSeq
    assert(got == expected)
    assert(got.exists(_._4 != "ok") || got.forall(_._4 == "ok"))
  }

  test("stream_chain_join_parity: batch 3-way replay, non-vacuous") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    def side(t: String, pfx: String) = ev.filter(col("event_type") === t)
      .select(col("event_id").as(s"${pfx}_id"), col("user_id").as(s"${pfx}u"),
        col("ts").as(s"${pfx}_ts"))
    val expected = side("purchase", "p")
      .join(side("click", "c"), col("pu") === col("cu")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 DAY")
        && col("c_ts") <= col("p_ts"))
      .join(side("view", "v"), col("vu") === col("cu")
        && col("v_ts") >= col("c_ts") - expr("INTERVAL 1 DAY")
        && col("v_ts") <= col("c_ts"))
      .select("v_id", "c_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val got = run("stream_chain_join_parity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == expected)
    assert(got.nonEmpty, "the chain gate must not be vacuous at sf0.001")
  }

  test("BPE sqlLit: backslash tokens survive the Spark literal splice") {
    assert(TextOps.sqlLit("""a\b""") == """a\\b""")
    assert(TextOps.sqlLit("it's") == "it''s")
    // executable proof: the spliced literal replaces the raw token
    val token = """x\y's"""
    val out = spark.sql(
      s"SELECT replace('pre ${TextOps.sqlLit(token)} post', " +
        s"'${TextOps.sqlLit(token)}', 'HIT') AS r").head().getString(0)
    assert(out == "pre HIT post",
      s"escaped splice must act on the literal token, got '$out'")
  }

  test("BPE topAdjacentPair: degenerate corpus fails loudly") {
    import spark.implicits._
    val degenerate = Seq((1L, "single"), (2L, "")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextOps.topAdjacentPair(degenerate)
    }
    assert(e.getMessage.contains("no adjacent token pair"))
  }
}
