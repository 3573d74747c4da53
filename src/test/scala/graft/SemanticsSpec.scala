package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DateTimeKit, Holidays}
import graft.operators.{Dedup, Relational, TextOps}
import graft.windows.TrailingFeatures

/** Golden-semantics unit fixtures from FIXTURES.md ("Golden semantics
  * cases to encode as unit fixtures") — each asserts the *reference*
  * behavior documented in SURVEY.md §2 against tiny in-line data.
  */
class SemanticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("trailing rolling mean is exclusive [t-w, t-1], null at group start") {
    // FIXTURES.md golden case 1 (reference HistGradientBoostingRegressor.py:74-87)
    val df = Seq.tabulate(8)(i => ("b1", i, (i + 1).toDouble))
      .toDF("g", "t", "v")
    val got = df.select($"t",
      TrailingFeatures.trailingMean($"v", 3, Seq("g"), Seq("t")).as("roll"))
      .orderBy("t").collect()
    assert(got(0).isNullAt(1)) // first row: empty frame -> null
    assert(got(1).getDouble(1) == 1.0) // mean(v0)
    assert(got(2).getDouble(1) == 1.5) // mean(v0,v1)
    assert(got(3).getDouble(1) == 2.0) // mean(v0,v1,v2)
    assert(got(7).getDouble(1) == 6.0) // mean(v4,v5,v6) = (5+6+7)/3
  }

  test("grouped lag never leaks across group boundary") {
    // FIXTURES.md golden case 2 (reference SegmentedModeling.py:238-239)
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 30.0), ("b", 2, 40.0))
      .toDF("g", "t", "v")
    val got = df.select($"g", $"t",
      TrailingFeatures.groupedLag($"v", 1, Seq("g"), Seq("t")).as("l"))
      .orderBy("g", "t").collect()
    assert(got(0).isNullAt(2) && got(1).getDouble(2) == 10.0)
    assert(got(2).isNullAt(2) && got(3).getDouble(2) == 30.0)
  }

  test("weekday convention: 2024-01-01 (Monday) -> 0, Sunday -> 6") {
    // FIXTURES.md golden case 4 (pandas dayofweek, Mon=0)
    val df = Seq("2024-01-01", "2024-01-07").toDF("d")
      .select(DateTimeKit.weekdayMon0(to_timestamp($"d")).as("wd"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 6))
  }

  test("rush-hour bucket boundaries") {
    // FIXTURES.md golden case 5 (reference backend/random_forest.py:153)
    val hours = Seq(6, 7, 9, 10, 15, 16, 18, 19)
    val got = hours.toDF("h")
      .select(DateTimeKit.rushHour($"h").as("r")).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 1, 1, 0, 0, 1, 1, 0))
  }

  test("log1p/expm1 inverse identity incl. zero") {
    // FIXTURES.md golden case 7
    val got = Seq(0.0, 1.0, 123.456).toDF("v")
      .select(expm1(log1p($"v")).as("rt")).collect().map(_.getDouble(0))
    assert(got.zip(Seq(0.0, 1.0, 123.456)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("holiday flags: 2023-07-04 true, 2023-07-05 false; NY-only under subdiv") {
    // FIXTURES.md golden case 8
    val fed2023 = Holidays.federal(2023).map(_._1.toString).toSet
    assert(fed2023.contains("2023-07-04"))
    assert(!fed2023.contains("2023-07-05"))
    val ny2023 = Holidays.nyState(2023).map(_._1.toString).toSet
    assert(ny2023.contains("2023-02-12")) // Lincoln's Birthday (NY)
    assert(ny2023.contains("2023-11-07")) // Election Day 2023
    assert(!fed2023.contains("2023-11-07"))
    // Observed shift: 2022-12-25 was a Sunday -> observed Mon 26th emitted too
    val fed2022 = Holidays.federal(2022).map(_._1.toString).toSet
    assert(fed2022.contains("2022-12-26"))
  }

  test("fan-out join multiplies rows on the coarser key (J2 vs J1)") {
    // FIXTURES.md golden case 3
    val traffic = Seq((1, 10, "bx"), (1, 10, "bk")).toDF("yr", "hh", "boro")
    val weather = Seq((1, 10, "bx", 50.0), (1, 10, "bk", 55.0)).toDF("yr", "hh", "boro", "temp")
    val j1 = traffic.join(weather, Seq("yr", "hh", "boro")).count() // 5-key analog
    val j2 = Relational.fanOutJoin(traffic, weather, Seq("yr", "hh")).count()
    assert(j1 == 2 && j2 == 4)
  }

  test("temporal split is deterministic and 80/20 by ceil") {
    val df = Seq.tabulate(10)(i => (i, i.toDouble)).toDF("t", "v")
    val split = Relational.temporalSplitFlag(df, Seq("t"), 0.8)
    val train = split.filter($"is_train" === 1).count()
    assert(train == 8 && split.count() == 10)
  }

  test("oversample replicates each row k times") {
    val df = Seq(1, 2, 3).toDF("x")
    assert(Relational.oversample(df, 5).count() == 15)
    assert(Relational.oversample(df, 5).groupBy("x").count()
      .collect().forall(_.getLong(1) == 5))
  }

  test("word shingles: n-grams, short docs give empty array") {
    val got = Seq("w1 w2 w3 w4", "w1 w2").toDF("t")
      .select(TextOps.wordShingles($"t", 3).as("sh"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got(0) == Seq("w1 w2 w3", "w2 w3 w4"))
    assert(got(1) == Seq.empty)
  }

  test("exact dedup keeps lowest id per text") {
    val df = Seq((3L, "a"), (1L, "a"), (2L, "b")).toDF("id", "text")
    val got = Dedup.exact(df, "text", "id").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L))
  }

  test("simhash: identical texts equal, token-permuted texts equal votes") {
    val df = Seq("alpha beta gamma", "alpha beta gamma", "gamma beta alpha", "zeta eta theta")
      .toDF("t").withColumn("h", Dedup.simhash($"t"))
    val hs = df.collect().map(_.getLong(1))
    assert(hs(0) == hs(1))
    assert(hs(0) == hs(2)) // bag-of-words: order-invariant
    assert(hs(0) != hs(3))
  }

  test("simhash near-dup pairs: near-identical docs pair, distant docs don't; exact hamming") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // 1-token edit
      (3L, "completely different subject matter about databases and distributed query engines"),
      (4L, "the quick brown fox jumps over the lazy dog again and again today")) // exact dup of 1
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(docs, "text", "doc_id", 60, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) == 0L) // exact dup: hamming 0
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) <= 8L) // near dup within budget
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L }) // distant doc unpaired
  }

  test("connected components resolve chains, singletons, and survivors") {
    val vertices = (1L to 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(vertices, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
    val survivors = Dedup.dedupByClusters(vertices,
        Dedup.connectedComponents(vertices, pairs, "doc_id"), "doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(survivors == Seq(1L, 4L, 5L, 7L))
  }

  test("frontier CC: chain converges to one cluster, frontier shrinks monotonically") {
    // 40-vertex chain — the deep-component case frontier propagation is
    // for. Converged vertices must leave the message join: frontier
    // sizes strictly decrease (after the all-vertices round 0) down to
    // the empty converged round.
    val n = 40L
    val vertices = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, frontiers) = Dedup.connectedComponentsWithStats(
      vertices, pairs, "doc_id", maxIter = 25)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to n).forall(got(_) == 1L), s"chain must collapse to min label: $got")
    assert(frontiers.last == 0L, "final round must report an empty frontier")
    val active = frontiers.dropRight(1)
    assert(active.zip(active.tail).forall { case (a, b) => b < a },
      s"frontier sizes must shrink monotonically on the chain: $frontiers")
    assert(active.head == n - 1, // round 1: everyone but the min changes
      s"round-1 frontier should be ${n - 1}, got ${active.head}")
  }

  test("capPerKey keeps at most n per key, hash-deterministic and partitioning-stable") {
    val df = (1L to 300L).map(i => (s"d${i % 3}", i)).toDF("dom", "id")
    val capped = Relational.capPerKey(df, col("dom"), col("id"), 10)
    val byDom = capped.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom.values.forall(_ == 10), byDom.toString)
    // stable under repartitioning (hash order, not first-seen order)
    val a = capped.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Relational.capPerKey(df.repartition(13), col("dom"), col("id"), 10)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("kfold: pure function of the id — partitioning-stable, growth-stable, balanced") {
    val df = (1L to 500L).map(i => (i, s"g${i % 4}")).toDF("id", "g")
    val folds = Relational.kfold(df, col("id"), 5)
    val got = folds.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.values.forall(f => f >= 0 && f < 5))
    // exact disjoint cover: train(i) ∪ eval(i) = all, for every fold
    val n = df.count()
    (0 until 5).foreach { i =>
      val ev = folds.filter(col("fold") === i).count()
      val tr = folds.filter(col("fold") =!= i).count()
      assert(ev + tr == n && ev > 0)
    }
    // balance: md5-uniform folds of 500 ids land near 100 each
    val sizes = folds.groupBy("fold").count().collect().map(_.getLong(1))
    assert(sizes.forall(s => s > 60 && s < 140), sizes.mkString(","))
    // partitioning-stable
    val re = Relational.kfold(df.repartition(13), col("id"), 5).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(re == got)
    // growth-stable: a row keeps its fold when the table doubles
    val grown = Relational.kfold(
      (1L to 1000L).map(i => (i, "g")).toDF("id", "g"), col("id"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.forall { case (id, f) => grown(id) == f })
  }

  test("mixtureSample hits the target mix; binding group kept whole") {
    // 600/300/100 rows; target 50/30/20 → src2 binds (100/0.2 = 500
    // total): expect ~250/150/100
    val rows = (1L to 600L).map(i => ("src0", i)) ++
      (601L to 900L).map(i => ("src1", i)) ++
      (901L to 1000L).map(i => ("src2", i))
    val df = rows.toDF("source", "doc_id")
    val out = Relational.mixtureSample(df, col("source"), col("doc_id"),
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
    val byS = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("src2") == 100, s"binding group must keep all rows: $byS")
    // hash sampling is approximate around the target: ±20% slack
    assert(math.abs(byS("src0") - 250.0) / 250.0 < 0.2, byS.toString)
    assert(math.abs(byS("src1") - 150.0) / 150.0 < 0.2, byS.toString)
    // groups outside the target mix are dropped
    val extra = df.union(Seq(("srcX", 5000L)).toDF("source", "doc_id"))
    assert(Relational.mixtureSample(extra, col("source"), col("doc_id"),
      Map("src0" -> 1.0)).filter(col("source") =!= "src0").count() == 0)
  }

  test("temperatureSample flattens a skewed mix toward uniform") {
    // 800 'a' vs 100 'b' vs 100 'c': natural mix 8:1:1; α=0.5 targets
    // ∝ √p ≈ 0.63 : 0.22 : 0.22 — the binding tail groups keep ~all
    // rows and the head is downsampled toward ~(0.63/0.22)·100 ≈ 283
    val rows = (Seq.fill(800)("a") ++ Seq.fill(100)("b") ++ Seq.fill(100)("c"))
      .zipWithIndex.map { case (g, i) => (i.toLong, g) }
    val df = rows.toDF("doc_id", "g")
    val kept = Relational.temperatureSample(df, col("g"), col("doc_id"), alpha = 0.5)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("b") > 85 && kept("c") > 85, kept.toString)
    assert(kept("a") > 150 && kept("a") < 400, kept.toString)
    // α=1 reproduces the natural mix: every group ~whole
    val nat = Relational.temperatureSample(df, col("g"), col("doc_id"), alpha = 1.0)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nat("a") > 700 && nat("b") > 85 && nat("c") > 85, nat.toString)
  }

  test("rolling hash matches hand-computed polynomial fold") {
    val got = Seq("ab").toDF("t")
      .select(TextOps.rollingHash($"t", 257L, 1000000007L)).collect()(0).getLong(0)
    assert(got == (97L * 257 + 98) % 1000000007L)
  }

  test("null profile counts per column") {
    val df = Seq((Some(1), Some("x")), (None, Some("y")), (Some(3), None))
      .toDF("a", "b")
    val r = Relational.nullProfile(df, Seq("a", "b")).collect()(0)
    assert(r.getLong(0) == 1 && r.getLong(1) == 1)
  }

  test("hash sampling is deterministic and stable under corpus growth") {
    val small = (1L to 500L).toDF("id")
    val big = (1L to 1000L).toDF("id")
    def keep(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Relational.hashSample(df, $"id", 0.3).collect().map(_.getLong(0)).toSet
    val fromSmall = keep(small)
    val fromBig = keep(big)
    // growing the corpus never flips an existing row's membership
    assert(fromBig.filter(_ <= 500L) == fromSmall)
    // repeated runs are identical (no RNG)
    assert(keep(big) == fromBig)
    // the kept fraction lands near the target
    assert(math.abs(fromBig.size / 1000.0 - 0.3) < 0.05)
    // stratified: per-stratum fractions respected
    val strat = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val s = Relational.stratifiedHashSample(strat, $"id", $"lang",
      Map("en" -> 0.8), defaultFraction = 0.1)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(s("en") / 1000.0 - 0.8) < 0.08)
    assert(math.abs(s.getOrElse("de", 0L) / 1000.0 - 0.1) < 0.05)
  }

  test("redactPii replaces every email/phone and counts match") {
    val df = Seq(
      "mail a.b+c@ex-ample.org then call 212-555-0101 or 917-555-0102",
      "no pii here",
      "two mails x@y.io z@w.ai").toDF("t")
    val (ne, np) = TextOps.piiCounts($"t")
    val got = df.select(TextOps.redactPii($"t").as("r"),
      ne.as("ne"), np.as("np")).collect()
    assert(got(0).getString(0) == "mail <EMAIL> then call <PHONE> or <PHONE>")
    assert(got(0).getInt(1) == 1 && got(0).getInt(2) == 2)
    assert(got(1).getString(0) == "no pii here" && got(1).getInt(1) == 0)
    assert(got(2).getString(0) == "two mails <EMAIL> <EMAIL>")
    assert(got(2).getInt(1) == 2 && got(2).getInt(2) == 0)
  }

  test("contaminatedDocs flags exactly the docs sharing an n-gram with the eval set") {
    val mkDoc = (id: Long, s: String) => (id, s)
    val evalSet = Seq(mkDoc(100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      mkDoc(1L, "noise words then alpha beta gamma delta epsilon zeta embedded here"),
      mkDoc(2L, "completely different content with no overlap at all whatsoever"),
      mkDoc(3L, "alpha beta gamma delta epsilon other tail words here")) // only 5 shared
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.contaminatedDocs(corpus, evalSet,
      "text", "doc_id", n = 6).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L), s"expected only doc 1 (full 6-gram overlap), got $got")
  }

  test("winsorize: clips into the group band, keeps in-band values bit-identical") {
    import org.apache.spark.sql.functions.col
    // group g: 0..10 → p(0.1)=1.0, p(0.9)=9.0 under linear interpolation
    val df = (0 to 10).map(i => ("g", i.toDouble)).toDF("k", "x")
    val got = graft.operators.Relational.winsorize(df, col("k"), col("x"),
        0.1, 0.9)
      .orderBy("x").collect().map(_.getAs[Double]("x_wins")).toSeq
    assert(got == Seq(1.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 9.0))
  }

  test("imputeByGroupMean: own-group mean first, global fallback for all-null groups") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("a", Some(10.0)), ("a", Some(20.0)), ("a", None),
      ("b", None), ("b", None)).toDF("k", "x")
    val got = graft.operators.Relational
      .imputeByGroupMean(df, col("k"), col("x"), "filled")
      .orderBy("k", "x").collect()
      .map(r => (r.getString(0), r.getAs[Double]("filled"))).toSeq
    // a's null → a-mean 15; b's nulls → global mean 15 (only a has values)
    assert(got.count { case (k, v) => k == "a" && v == 15.0 } == 1)
    assert(got.filter(_._1 == "b").forall(_._2 == 15.0))
    assert(got.contains(("a", 10.0)) && got.contains(("a", 20.0)))
  }

  test("globalRowNumber: contiguous 1..N, agrees with a single-partition row_number, any partition count") {
    import org.apache.spark.sql.functions.col
    val df = (1 to 97).map(i => (i.toLong * 7 % 97, i.toLong)).toDF("k", "id")
    for (parts <- Seq(1, 4, 32)) {
      val got = graft.operators.Relational
        .globalRowNumber(df, Seq(col("k"), col("id")), "rn", parts)
        .orderBy("rn")
        .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("id"),
          r.getAs[Long]("rn"))).toSeq
      val want = df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(identity).zipWithIndex
        .map { case ((k, id), i) => (k, id, i + 1L) }.toSeq
      assert(got == want, s"parts=$parts")
    }
  }

  test("globalRowNumber: empty input yields an empty frame with the rn column, no crash") {
    import org.apache.spark.sql.functions.col
    val df = Seq.empty[(Long, Long)].toDF("k", "id")
    val got = graft.operators.Relational
      .globalRowNumber(df, Seq(col("k"), col("id")), "rn")
    assert(got.columns.contains("rn"))
    assert(got.count() == 0)
    // downstream consumers must survive empty tables too
    assert(graft.operators.Relational
      .rankNormalize(df, col("id"), Seq(col("k")), "q").count() == 0)
  }

  test("snapshotDiff: added/removed/changed classes, null-safe compares, unchanged dropped") {
    import org.apache.spark.sql.functions.col
    val v1 = Seq((1L, Some("a")), (2L, Some("b")), (3L, Option.empty[String]),
      (4L, Some("keep")), (5L, Option.empty[String]))
      .toDF("id", "v")
    val v2 = Seq((2L, Some("B")), (3L, Some("now")), (4L, Some("keep")),
      (5L, Option.empty[String]), (6L, Some("new")))
      .toDF("id", "v")
    val got = Relational.snapshotDiff(v1, v2, Seq("id"), Seq("v"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // 1 removed; 2 changed (b->B); 3 changed (null->now, null-safe);
    // 4 identical -> dropped; 5 null==null -> dropped; 6 added.
    assert(got == Seq((1L, "removed"), (2L, "changed"), (3L, "changed"),
      (6L, "added")))
    // both snapshots empty -> empty diff, schema intact
    val e = v1.limit(0)
    val emptyDiff = Relational.snapshotDiff(e, e, Seq("id"), Seq("v"))
    assert(emptyDiff.columns.toSeq == Seq("id", "change", "v_old", "v_new"))
    assert(emptyDiff.count() == 0)
  }
}
