package graft

import graft.functions.TextAnalysis

/** Hand-computed fixtures for the retrieval/collocation operators (BM25,
  * conjunctive boolean retrieval, PMI collocations). The driver's DuckDB
  * oracle covers these at corpus scale; these pin the semantics on inputs
  * small enough to verify by hand.
  */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def half4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25TopDocs: hand-computed Okapi scores, zero-hit docs dropped") {
    val docs = Seq(
      (1L, "q w w"), //   dl 3, tf 1
      (2L, "q q x"), //   dl 3, tf 2
      (3L, "y y y y") //  dl 4, tf 0 -> excluded
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopDocs(docs, Seq("q"), k = 10).collect()
    // N=3, sum_dl=10, df=2: idf = ln(1 + 1.5/2.5); avgdl = 10/3
    val k1 = 1.2; val b = 0.75
    val idf = math.log(1.0 + (3L - 2L + 0.5) / (2L + 0.5))
    val avgdl = 10.0 / 3.0
    def s(tf: Long, dl: Long): Double =
      idf * (tf.toDouble * (k1 + 1.0)) /
        (tf.toDouble + k1 * (1.0 - b + b * dl.toDouble / avgdl))
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 1L)) // tf 2 outscores tf 1
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).getDouble(3) == half4(s(2, 3)))
    assert(byId(1L).getDouble(3) == half4(s(1, 3)))
    assert(byId(2L).getInt(2) == 1 && byId(1L).getLong(1) == 3L)
  }

  test("bm25TopDocs: multi-term scores add; k truncates on (score, doc_id)") {
    val docs = Seq(
      (1L, "q r"), (2L, "q x"), (3L, "r x"), (4L, "x x")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopDocs(docs, Seq("q", "r"), k = 2).collect()
    // doc 1 hits both terms — strictly above docs 2 and 3 (one term each,
    // same dl) which tie; doc_id breaks the tie for the k=2 cutoff.
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(got.head.getInt(2) == 2 && got(1).getInt(2) == 1)
  }

  test("booleanRetrieval: AND semantics, per-term tfs, doc order") {
    val docs = Seq(
      (3L, "a b c"), (1L, "a a b"), (2L, "b c"), (4L, "a c")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.booleanRetrieval(docs, Seq("a", "b")).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L)) // ordered by doc_id
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(2) == 2L && byId(1L).getLong(3) == 1L) // tf_a, tf_b
    assert(byId(3L).getLong(2) == 1L && byId(3L).getLong(3) == 1L)
    assert(byId(3L).getLong(1) == 3L) // dl
  }

  test("collocationsPmi: hand-computed marginals; ties order by (w1, w2)") {
    // pc: (a,b)=2 (b,a)=1 (c,a)=1; T=4; c1: a=2 b=1 c=1; c2: b=2 a=2.
    // pmi(a,b) = ln(2*4/(2*2)) = ln2; (b,a) = (c,a) = ln(1*4/(1*2)) = ln2.
    val docs = Seq((1L, "a b a b"), (2L, "c a")).toDF("doc_id", "text")
    val got = TextAnalysis.collocationsPmi(docs, minCount = 1L, k = 10).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b"), ("b", "a"), ("c", "a")))
    assert(got.forall(_.getDouble(5) == half4(math.log(2.0))))
    val ab = got.head
    assert(ab.getLong(2) == 2L && ab.getLong(3) == 2L && ab.getLong(4) == 2L)
  }

  test("collocationsPmi: the count floor prunes rows but not marginals") {
    val docs = Seq((1L, "a b a b a b"), (2L, "c a")).toDF("doc_id", "text")
    // (a,b)=3 survives minCount=2; (b,a)=2 survives; (c,a)=1 pruned, but
    // its occurrence still counts in T and in c2(a).
    val got = TextAnalysis.collocationsPmi(docs, minCount = 2L, k = 10).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b"), ("b", "a")))
    val ba = got.map(r => (r.getString(0), r.getString(1)) -> r)
      .toMap.apply(("b", "a"))
    assert(ba.getLong(4) == 3L) // c2(a) includes the pruned (c,a) pair
  }

  test("copurchasePairs: baskets dedup lines; lift from hand-computed marginals") {
    // Orders: 1 {10,20,30} (part 10 twice — dedups), 2 {10,20}, 3 {10,30},
    // 4 {40}. Pairs: (10,20)=2 (10,30)=2 (20,30)=1(<minSupport).
    // N=4, n(10)=3 n(20)=2 n(30)=2: lift(10,20) = 2*4/(3*2) = 4/3.
    val li = Seq(
      (1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (3L, 10L), (3L, 30L), (4L, 40L)
    ).toDF("l_orderkey", "l_partkey")
    val got = graft.queries.Analytics.copurchasePairs(li, minSupport = 2L, k = 10)
      .collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((10L, 20L), (10L, 30L))) // support ties order by pair key
    val p = got.head
    assert(p.getLong(2) == 2L && p.getLong(3) == 3L && p.getLong(4) == 2L)
    assert(p.getDouble(5) == half4(2.0 * 4.0 / (3.0 * 2.0)))
    assert(got(1).getDouble(5) == half4(2.0 * 4.0 / (3.0 * 2.0)))
  }

  test("chiSquareIndependence: 2x2 hand-computed expected counts and contribs") {
    // a\b   x  y | row
    //  p    3  1 |  4      N=10, col x=5, col y=5
    //  q    2  3 |  5      E(p,x) = 4*5/10 = 2 -> contrib (3-2)^2/2 = 0.5
    //  r    0  1 |  1      (r,x) cell absent: no zero-fill row emitted
    val df = (Seq.fill(3)(("p", "x")) ++ Seq(("p", "y")) ++
      Seq.fill(2)(("q", "x")) ++ Seq.fill(3)(("q", "y")) ++ Seq(("r", "y")))
      .toDF("source", "lang")
    val got = graft.operators.DataQuality
      .chiSquareIndependence(df, "source", "lang").collect()
    val byCell = got.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.length == 5) // observed cells only, no cartesian fill
    val px = byCell(("p", "x"))
    assert(px.getLong(2) == 3L && px.getLong(3) == 4L && px.getLong(4) == 5L)
    assert(px.getDouble(5) == 2.0 && px.getDouble(6) == 0.5)
    val ry = byCell(("r", "y"))
    assert(ry.getDouble(5) == 0.5) // E = 1*5/10
    assert(ry.getDouble(6) == half4((1.0 - 0.5) * (1.0 - 0.5) / 0.5))
  }

  test("sourceTokenEntropy: uniform=ln(k); single-token vocab norm is NULL") {
    val df = Seq(
      ("s1", 1L, "a b c d"), //   uniform over 4 -> H = ln 4, norm 1.0
      ("s2", 2L, "a a a a"), //   vocab 1 -> H = 0, norm NULL
      ("s3", 3L, "a a b b b c") // H = ln 6 - (2ln2 + 3ln3)/6
    ).toDF("source", "doc_id", "text")
    val got = graft.functions.TextAnalysis.sourceTokenEntropy(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("s1").getDouble(3) == half4(math.log(4.0)))
    assert(got("s1").getDouble(4) == 1.0)
    assert(got("s2").getDouble(3) == 0.0 && got("s2").isNullAt(4))
    val h3 = math.log(6.0) - (2 * math.log(2.0) + 3 * math.log(3.0)) / 6.0
    assert(got("s3").getDouble(3) == half4(h3))
    assert(got("s3").getLong(1) == 6L && got("s3").getLong(2) == 3L)
  }

  test("dsirWeights: target-exclusive text scores above raw-exclusive; " +
    "weight depends on content, not on the doc's own source") {
    val df = Seq(
      (1L, "tgt", "aaa aaa aaa aaa"),
      (2L, "raw", "bbb bbb bbb bbb"),
      (3L, "raw", "aaa aaa aaa aaa"), // same content as doc 1, raw source
      (4L, "raw", "bbb bbb bbb bbb")
    ).toDF("doc_id", "source", "text")
    val got = graft.functions.TextAnalysis
      .dsirWeights(df, targetSources = Seq("tgt"), buckets = 256)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 4 && got(1L).getLong(1) == 4L)
    // 'aaa' dominates the target model, 'bbb' never appears in it
    assert(got(1L).getDouble(2) > got(2L).getDouble(2))
    // the weight is a function of content: doc 3 scores exactly like doc 1
    assert(got(3L).getDouble(2) == got(1L).getDouble(2))
    assert(got(3L).getDouble(3) == got(1L).getDouble(3))
    // per-token normalization: log_weight / n_tokens on the same grid
    val lw = got(1L).getDouble(2)
    assert(math.abs(got(1L).getDouble(3) - lw / 4.0) < 2e-4)
  }

  // ---- randomized naive-reference properties ------------------------------
  // A seeded random corpus, checked against independent plain-Scala
  // implementations. The arithmetic is replicated in the operator's
  // evaluation order, so score comparisons are EXACT (same JVM doubles)
  // except where a fold's order is partition-dependent (DSIR — tolerance
  // one grid step).

  private val rnd = new scala.util.Random(42)
  private val vocabP = Vector("qq", "ww", "ee", "rr", "tt", "yy", "uu",
    "ii", "oo", "pp", "kk", "ff")
  private val corpus: Seq[(Long, String, String)] = (0 until 120).map { i =>
    val n = 1 + rnd.nextInt(40)
    val text = Seq.fill(n)(vocabP(rnd.nextInt(vocabP.size))).mkString(" ")
    (i.toLong, s"s${rnd.nextInt(5)}", text)
  }

  test("property: bm25TopDocs matches a naive reference on a random corpus") {
    val docs = corpus.toDF("doc_id", "source", "text")
    val terms = Seq("qq", "kk", "ff")
    val k1 = 1.2; val b = 0.75; val k = 15
    val toks = corpus.map { case (id, _, t) => id -> t.split(" ").toSeq }.toMap
    val nDocs = corpus.size.toLong
    val sumDl = corpus.map { case (id, _, _) => toks(id).size.toLong }.sum
    val avgdl = sumDl.toDouble / nDocs.toDouble
    val dfT = terms.map(t => t -> corpus.count { case (id, _, _) => toks(id).contains(t) }.toLong).toMap
    def score(id: Long): Double = terms.map { t =>
      val tf = toks(id).count(_ == t).toLong
      val idf = math.log(1.0 + (nDocs - dfT(t) + 0.5) / (dfT(t) + 0.5))
      idf * (tf.toDouble * (k1 + 1.0)) /
        (tf.toDouble + k1 * (1.0 - b + b * toks(id).size.toDouble / avgdl))
    }.sum
    val expect = corpus.map(_._1).map(id => (id, score(id)))
      .filter(_._2 > 0.0)
      .sortBy { case (id, s) => (-s, id) }.take(k)
      .map { case (id, s) => (id, half4(s)) }
      .sortBy { case (id, s) => (-s, id) }
    val got = graft.functions.TextAnalysis.bm25TopDocs(docs, terms, k = k)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(got == expect)
  }

  test("property: collocationsPmi matches a naive reference on a random corpus") {
    val docs = corpus.toDF("doc_id", "source", "text")
    val bigrams = corpus.flatMap { case (_, _, t) =>
      val w = t.split(" "); w.dropRight(1).zip(w.drop(1))
    }
    val c12 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val c2 = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val t = bigrams.size.toLong
    val expect = c12.toSeq.filter(_._2 >= 3L)
      .map { case ((a, bb), c) =>
        val pmi = math.log(c.toDouble * t.toDouble / (c1(a).toDouble * c2(bb).toDouble))
        (a, bb, c, c1(a), c2(bb), pmi)
      }
      .sortBy { case (a, bb, _, _, _, p) => (-p, a, bb) }.take(20)
      .map { case (a, bb, c, ca, cb, p) => (a, bb, c, ca, cb, half4(p)) }
      .sortBy { case (a, bb, _, _, _, p) => (-p, a, bb) }
    val got = graft.functions.TextAnalysis
      .collocationsPmi(docs, minCount = 3L, k = 20).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expect)
  }

  test("property: copurchasePairs matches a naive reference on random baskets") {
    val lines = (0 until 400).map { _ =>
      (rnd.nextInt(60).toLong + 1L, rnd.nextInt(25).toLong + 1L)
    }
    val li = lines.toDF("l_orderkey", "l_partkey")
    val baskets = lines.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nOrders = baskets.size.toLong
    val nOk = baskets.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val support = baskets.values.toSeq
      .flatMap(s => s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = support.toSeq.filter(_._2 >= 2L)
      .map { case ((a, bb), s) =>
        val lift = s.toDouble * nOrders.toDouble / (nOk(a).toDouble * nOk(bb).toDouble)
        (a, bb, s, nOk(a), nOk(bb), half4(lift))
      }
      .sortBy { case (a, bb, s, _, _, _) => (-s, a, bb) }.take(30)
    val got = graft.queries.Analytics.copurchasePairs(li, minSupport = 2L, k = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expect)
  }

  test("property: batch BM25 with one query == single-query bm25TopDocs") {
    val docs = corpus.toDF("doc_id", "source", "text")
    val terms = Seq("qq", "kk", "ff")
    val single = graft.functions.TextAnalysis.bm25TopDocs(docs, terms, k = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val batch = graft.functions.TextAnalysis
      .bm25BatchTopK(docs, Seq(7 -> terms), k = 12)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getInt(4), r.getDouble(5)))
    // same docs in the same order with the same rounded scores — the two
    // formulations (rescan vs postings join) must agree exactly on the grid
    assert(batch.toSeq == single.toSeq)
  }

  test("plan: batch BM25 top-k per query plans as WindowGroupLimit") {
    val docs = corpus.toDF("doc_id", "source", "text")
    val plan = graft.functions.TextAnalysis.bm25BatchTopK(docs)
      .queryExecution.optimizedPlan.treeString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("property: weightedReservoir — exact k, layout-invariant, mass-biased") {
    val docs = corpus.toDF("doc_id", "source", "text")
    val k = 30
    val got = graft.operators.Mixture.weightedReservoir(docs, k).collect()
    assert(got.length == k)
    // content-keyed: physical layout must not change the selection
    val reshuffled = graft.operators.Mixture
      .weightedReservoir(docs.repartition(13), k).collect()
    assert(got.map(_.getLong(0)).toSeq == reshuffled.map(_.getLong(0)).toSeq)
    // P(select) ∝ tokens: the sample's mean length must exceed the corpus'
    val corpusMean = corpus.map(_._3.split(" ").length).sum.toDouble / corpus.size
    val sampleMean = got.map(_.getLong(2)).sum.toDouble / k
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean <= corpus mean $corpusMean")
    // naive reference: same key formula, same selection
    def u(text: String): Double = {
      val h = graft.functions.Mix64.mix(
        graft.functions.SimHash64.fnv1a(text.getBytes("UTF-8")))
      (h >>> 11).toDouble / 9007199254740992.0
    }
    val expect = corpus.map { case (id, _, t) =>
      (id, math.log(u(t)) / t.split(" ").length.toDouble)
    }.sortBy { case (id, key) => (-key, id) }.take(k).map(_._1)
    // SELECTION must match the naive raw-key top-k exactly; emitted order
    // re-sorts on the rounded grid, so compare as sets plus sortedness
    assert(got.map(_.getLong(0)).toSet == expect.toSet)
    val emitted = got.map(r => (r.getDouble(3), r.getLong(0)))
    assert(emitted.sortBy { case (key, id) => (-key, id) }.toSeq == emitted.toSeq)
  }

  test("property: negativeSamples — k per anchor, never self, layout-invariant") {
    val docs = corpus.toDF("doc_id", "source", "text")
    val k = 3
    val got = graft.operators.Mixture.negativeSamples(docs, k).collect()
    assert(got.length == corpus.size * k)
    got.foreach(r => assert(r.getLong(0) != r.getLong(2), s"self-negative: $r"))
    assert(got.forall(r => r.getLong(2) >= 0 && r.getLong(2) < corpus.size))
    val reshuffled = graft.operators.Mixture
      .negativeSamples(docs.repartition(11), k).collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ==
      reshuffled.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq)
  }

  test("property: dsirWeights matches a naive reference within one grid step") {
    val docs = corpus.toDF("doc_id", "source", "text")
    val buckets = 64
    def bucket(tok: String): Long = {
      val h = graft.functions.SimHash64.fnv1a(tok.getBytes("UTF-8"))
      ((h % buckets) + buckets) % buckets
    }
    val occ = corpus.flatMap { case (id, src, t) =>
      t.split(" ").map(tok => (id, src, bucket(tok)))
    }
    val cAll = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cTgt = occ.filter(o => o._2 == "s0" || o._2 == "s1")
      .groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tAll = occ.size.toLong
    val tTgt = occ.count(o => o._2 == "s0" || o._2 == "s1").toLong
    def w(b: Long): Double =
      math.log((cTgt.getOrElse(b, 0L) + 1).toDouble / (tTgt + buckets).toDouble) -
        math.log((cAll(b) + 1).toDouble / (tAll + buckets).toDouble)
    val expect = occ.groupBy(_._1).view.mapValues { os =>
      (os.size.toLong, os.map(o => w(o._3)).sum)
    }.toMap
    val got = graft.functions.TextAnalysis
      .dsirWeights(docs, targetSources = Seq("s0", "s1"), buckets = buckets)
      .collect()
    assert(got.length == corpus.size)
    got.foreach { r =>
      val (n, lw) = expect(r.getLong(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - lw) < 1.01e-4, s"doc ${r.getLong(0)}")
    }
  }

  test("rrfFusion: hand-computed rank-space merge of two rankers") {
    // One query 'q r': doc 1 hits both terms (bm25 + coverage leader);
    // doc 2 hits q with high tf (bm25 strong, coverage rank by dl);
    // doc 3 hits r once in a long doc (bm25 weak, coverage ties dl).
    val docs = Seq(
      (1L, "q r x"),
      (2L, "q q q"),
      (3L, "r y z")
    ).toDF("doc_id", "text")
    val qs = Seq(1 -> Seq("q", "r"))
    val got = TextAnalysis.rrfFusion(docs, qs, kList = 10, kRrf = 60,
      kOut = 3).collect()
    assert(got.length == 3)
    // coverage ranking: doc1 (2 hits) then doc2/doc3 (1 hit, dl 3 tie ->
    // doc_id). bm25: doc1 hits both terms; its summed score leads.
    val byDoc = got.map(r => r.getLong(2) -> r).toMap
    assert(got.head.getLong(2) == 1L) // fused leader hits both rankers high
    val r1 = byDoc(1L)
    assert(r1.getInt(3) == 1 && r1.getInt(4) == 1)
    assert(r1.getDouble(5) ==
      BigDecimal(1.0 / 61 + 1.0 / 61)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // every fused score equals the sum of its two reciprocal terms
    got.foreach { r =>
      val e = (if (r.isNullAt(3)) 0.0 else 1.0 / (60 + r.getInt(3))) +
        (if (r.isNullAt(4)) 0.0 else 1.0 / (60 + r.getInt(4)))
      assert(r.getDouble(5) ==
        BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("rrfFusion: a doc outside one ranker's top-k still fuses") {
    // 12 docs hit 'q'; kList=3 keeps only 3 per ranker, fusion union <= 6
    val docs = (1L to 12L).map(i =>
      (i, ("q " * i.toInt).trim)).toDF("doc_id", "text")
    val got = TextAnalysis.rrfFusion(docs, Seq(1 -> Seq("q")), kList = 3,
      kRrf = 60, kOut = 12).collect()
    assert(got.length <= 6 && got.nonEmpty)
    // coverage prefers SHORT docs (dl asc), bm25 prefers high tf (long):
    // both contribute members the other ranker dropped
    assert(got.exists(r => r.isNullAt(3) && !r.isNullAt(4)))
    assert(got.exists(r => !r.isNullAt(3) && r.isNullAt(4)))
  }
}
