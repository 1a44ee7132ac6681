package graft

import graft.operators.Mixture
import org.apache.spark.sql.functions._

/** Invariants of the exact water-filling allocation ([[Mixture.optimalMixture]]):
  * token-exact budget, per-source caps, proportional shares among uncapped
  * sources, capped-set monotonicity in the budget, and partition
  * invariance. The closed form is verified two ways here: a pure-Scala
  * BigInt twin of the whole chain is differential-tested against the
  * iterative exact-rational reference over 50,000 randomized frames, and
  * the Spark spelling is pinned to that twin (alloc for alloc) by full
  * round-trip trials — plus bit-exactly against DuckDB by the driver
  * oracle.
  */
class OptimalMixtureSpec extends SparkTestBase {

  /** Pure-Scala BigInt twin of withWeightKey + allocateFromSupplies'
    * waterfill chain — every intermediate mirrors the SQL spelling
    * (truncating DIV on non-negative operands, Hamilton bump ordered by
    * (uncapped-first, remainder desc, source)). Returns
    * source -> (capped, alloc).
    */
  private def closedForm(
      sup: Seq[(String, Long)], ppm: Long): Map[String, (Boolean, BigInt)] = {
    case class K(src: String, s: BigInt, w: BigInt, skey: BigInt)
    val keyed = sup.map { case (src, s0) =>
      val w = (graft.functions.Mix64.mix(
        graft.functions.SimHash64.fnv1a(src.getBytes("UTF-8"))) & 7L) + 1L
      K(src, BigInt(s0), BigInt(w), BigInt(s0) * (840L / w))
    }.sortBy(k => (k.skey, k.src))
    val total = keyed.map(_.s).sum
    val budget = total * ppm / 1000000L
    val n = keyed.size
    val cumSBefore = keyed.scanLeft(BigInt(0))(_ + _.s).take(n)
    val remWFrom = keyed.scanRight(BigInt(0))(_.w + _).take(n)
    val capped = keyed.indices.map(i =>
      keyed(i).s * remWFrom(i) <= (budget - cumSBefore(i)) * keyed(i).w)
    val cappedS = keyed.indices.filter(capped).map(keyed(_).s).sum
    val remWStar = keyed.indices.filterNot(capped).map(keyed(_).w).sum
    val xRem = budget - cappedS
    val base = keyed.indices.map(i =>
      if (capped(i)) keyed(i).s else xRem * keyed(i).w / remWStar)
    val remn = keyed.indices.map(i =>
      if (capped(i)) BigInt(0) else (xRem * keyed(i).w) % remWStar)
    val leftover = if (remWStar > 0) remn.sum / remWStar else BigInt(0)
    val bumpOrder = keyed.indices.sortBy(i =>
      (capped(i), -remn(i), keyed(i).src))(
      Ordering.Tuple3(Ordering.Boolean, Ordering.BigInt, Ordering.String))
    val bumped = bumpOrder.take(leftover.toInt).filterNot(capped).toSet
    keyed.indices.map { i =>
      keyed(i).src ->
        (capped(i), base(i) + (if (bumped(i)) BigInt(1) else BigInt(0)))
    }.toMap
  }

  /** The iterative exact-rational water-filling reference — the textbook
    * fixed-point definition the closed form replaces.
    */
  private def iterativeCapped(
      sup: Seq[(String, Long, Long)], b: BigInt): Map[String, Boolean] = {
    val capped = scala.collection.mutable.Map(sup.map(s => s._1 -> false): _*)
    var changed = true
    while (changed) {
      changed = false
      val remB = b - sup.filter(s => capped(s._1)).map(s => BigInt(s._2)).sum
      val remW = sup.filterNot(s => capped(s._1)).map(s => BigInt(s._3)).sum
      if (remW > 0) sup.foreach { case (src, s, w) =>
        if (!capped(src) && BigInt(s) * remW <= remB * w) {
          capped(src) = true; changed = true
        }
      }
    }
    capped.toMap
  }

  private lazy val docs = Tables.documents(spark, sf)

  private case class Row2(
      source: String, supply: Long, w: Long, capped: Boolean, alloc: Long)

  private def rows(budgetPpm: Long): Seq[Row2] =
    Mixture.optimalMixture(docs, budgetPpm).collect().toSeq.map { r =>
      Row2(r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4))
    }

  test("allocation sums to the exact budget and respects supplies") {
    for (ppm <- Seq(0L, 300000L, 600000L, 900000L, 1000000L)) {
      val rs = rows(ppm)
      val total = rs.map(_.supply).sum
      val budget = BigInt(total) * ppm / 1000000
      assert(rs.map(r => BigInt(r.alloc)).sum == budget.min(BigInt(total)),
        s"ppm=$ppm")
      rs.foreach { r =>
        assert(r.alloc >= 0 && r.alloc <= r.supply, s"ppm=$ppm $r")
        if (r.capped) assert(r.alloc == r.supply, s"capped must take all: $r")
      }
    }
  }

  test("uncapped allocations are proportional to weights within 1 token") {
    val rs = rows(900000L)
    assert(rs.exists(_.capped) && rs.exists(!_.capped),
      "fixture must exercise both branches")
    val total = rs.map(_.supply).sum
    val budget = BigInt(total) * 900000 / 1000000
    val x = budget - rs.filter(_.capped).map(r => BigInt(r.supply)).sum
    val remW = rs.filterNot(_.capped).map(r => BigInt(r.w)).sum
    rs.filterNot(_.capped).foreach { r =>
      // |alloc - x*w/remW| < 1  <=>  |alloc*remW - x*w| < remW
      assert((BigInt(r.alloc) * remW - x * r.w).abs < remW, r.toString)
    }
  }

  test("raising the budget only grows the capped set") {
    val lo = rows(600000L).filter(_.capped).map(_.source).toSet
    val hi = rows(900000L).filter(_.capped).map(_.source).toSet
    assert(lo.subsetOf(hi))
    // and at 100% everything is capped (alloc == supply everywhere)
    assert(rows(1000000L).forall(_.capped))
  }

  test("result is invariant under input repartitioning") {
    val a = Mixture.optimalMixture(docs, 900000L)
    val b = Mixture.optimalMixture(docs.repartition(7), 900000L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("epoch allocation: budget in raw passes, repetition capped at maxEpochs") {
    val rs = Mixture.epochAllocation(docs, maxEpochs = 4, budgetPpm = 2500000L)
      .collect()
    val rawBySource = rows(1000000L).map(r => r.source -> r.supply).toMap
    val rawTotal = rawBySource.values.sum
    val budget = BigInt(rawTotal) * 2500000 / 1000000 // 2.5 raw passes
    val allocs = rs.map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(allocs.values.map(BigInt(_)).sum ==
      budget.min(BigInt(rawTotal) * 4))
    rs.foreach { r =>
      val (src, eff, alloc) = (r.getString(0), r.getLong(1), r.getLong(4))
      assert(eff == rawBySource(src) * 4, s"effective supply: $r")
      assert(alloc <= eff, r.toString)
      val epochs = r.getLong(8)
      assert(epochs <= 4000000L, s"over maxEpochs: $r")
      // capped sources are exactly the data-bound ones: 4.0 epochs
      if (r.getBoolean(3)) assert(epochs == 4000000L, r.toString)
    }
    // the 2.5x budget actually forces repetition somewhere
    assert(rs.exists(_.getLong(8) > 1000000L))
  }

  test("epoch allocation with maxEpochs=1 degenerates to the fresh solve") {
    val a = Mixture.epochAllocation(docs, maxEpochs = 1, budgetPpm = 900000L)
      .drop("epochs_ppm")
    val b = Mixture.optimalMixture(docs, budgetPpm = 900000L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("closed form == iterative exact-rational reference over 50,000 random frames") {
    // the pure-Scala twin makes the bulk differential cheap (no Spark
    // round-trip per trial); the next test pins the Spark spelling to
    // this same twin, closing the chain Spark == twin == reference
    val rng = new scala.util.Random(2026)
    var trial = 0
    while (trial < 50000) {
      trial += 1
      val n = 1 + rng.nextInt(10)
      val sup = (0 until n).map { i =>
        val src = s"s${trial}_$i"
        val mag = rng.nextInt(3) match {
          case 0 => 5L
          case 1 => 1000L
          case _ => 1000000000000L // 1e12: the 100-TB token-count regime
        }
        (src, math.abs(rng.nextLong()) % mag)
      }
      val supW = sup.map { case (src, s) =>
        val w = (graft.functions.Mix64.mix(
          graft.functions.SimHash64.fnv1a(src.getBytes("UTF-8"))) & 7L) + 1L
        (src, s, w)
      }
      val total = sup.map(s => BigInt(s._2)).sum
      val ppm = rng.nextInt(1000001).toLong
      val budget = total * ppm / 1000000
      val got = closedForm(sup, ppm)
      val wantCapped = iterativeCapped(supW, budget)
      sup.foreach { case (src, s) =>
        val (capped, alloc) = got(src)
        assert(capped == wantCapped(src), s"trial $trial src $src capped")
        assert(alloc >= 0 && alloc <= BigInt(s), s"trial $trial src $src range")
        if (capped) assert(alloc == BigInt(s), s"trial $trial src $src cap=supply")
      }
      assert(got.values.map(_._2).sum == budget.min(total), s"trial $trial sum")
    }
  }

  test("Spark spelling == the pure-Scala twin, alloc for alloc, on random frames") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 12) {
      val n = 2 + rng.nextInt(7)
      val sup = (0 until n).map { i =>
        val src = s"s${trial}_$i"
        (src, math.abs(rng.nextLong()) % (if (rng.nextBoolean()) 1000L else 5L))
      }
      val ppm = rng.nextInt(1000001).toLong
      val frame = sup.map(s => (s._1, BigDecimal(s._2))).toDF("source", "supply")
        .select(col("source"), col("supply").cast("decimal(38,0)").as("supply"))
      val got = Mixture.allocateFromSupplies(frame, ppm).collect()
        .map(r => (r.getString(0), r.getBoolean(3), BigInt(r.getLong(4))))
      val want = closedForm(sup, ppm)
      got.foreach { case (src, capped, alloc) =>
        assert((capped, alloc) == want(src), s"trial $trial src $src")
      }
    }
  }

  test("plan guards fail loudly: negative supply and duplicate source") {
    import spark.implicits._
    val neg = Seq(("a", BigDecimal(-5)), ("b", BigDecimal(3)))
      .toDF("source", "supply")
      .select(col("source"), col("supply").cast("decimal(38,0)").as("supply"))
    val e1 = intercept[Exception] {
      Mixture.allocateFromSupplies(neg, 500000L).collect()
    }
    assert(e1.getMessage.contains("negative supply"), e1.getMessage)
    val dup = Seq(("a", BigDecimal(5)), ("a", BigDecimal(3)))
      .toDF("source", "supply")
      .select(col("source"), col("supply").cast("decimal(38,0)").as("supply"))
    val e2 = intercept[Exception] {
      Mixture.allocateFromSupplies(dup, 500000L).collect()
    }
    assert(e2.getMessage.contains("duplicate source"), e2.getMessage)
  }

  test("hierarchical solve: per-domain sums hit domain budgets token-exactly") {
    val rs = Mixture.hierarchicalMixture(docs, budgetPpm = 900000L).collect()
    val total = rows(1000000L).map(_.supply).sum
    val budget = BigInt(total) * 900000 / 1000000
    // global: the two-level allocation spends the whole budget
    assert(rs.map(r => BigInt(r.getLong(6))).sum == budget)
    // per domain: inner allocations sum exactly to the domain budget
    // (level-1 allocations never exceed domain supply)
    rs.groupBy(_.getString(1)).foreach { case (dom, dr) =>
      val domBudget = dr.head.getLong(4)
      assert(dr.forall(_.getLong(4) == domBudget), s"domain $dom")
      assert(dr.map(r => BigInt(r.getLong(6))).sum == BigInt(domBudget),
        s"domain $dom")
      dr.foreach(r => assert(r.getLong(6) <= r.getLong(2), r.toString))
    }
    // the content-derived taxonomy actually fans out
    assert(rs.map(_.getString(1)).distinct.length >= 2)
    // weights match the flat solve's content-keyed draw
    val flatW = rows(900000L).map(r => r.source -> r.w).toMap
    rs.foreach(r => assert(r.getLong(3) == flatW(r.getString(0)), r.toString))
  }

  test("hierarchical level 2 equals independent flat solves per domain") {
    import spark.implicits._
    val hier = Mixture.hierarchicalMixture(docs, budgetPpm = 900000L).collect()
    hier.groupBy(_.getString(1)).foreach { case (dom, dr) =>
      // re-solve this domain ALONE with its level-1 budget at 100% of a
      // synthetic corpus whose total supply IS the budget: instead, feed
      // allocateFromSupplies the domain's sources and express the budget
      // as ppm of the domain supply scaled exactly (budget*1e6/supply is
      // not integral in general, so use budgetDen = domain supply and
      // budgetPpm = budget: floor(supply * budget / supply) = budget).
      val domBudget = dr.head.getLong(4)
      val supplies = dr.toSeq
        .map(r => (r.getString(0), BigDecimal(r.getLong(2)))).toDF("source", "supply")
        .select(col("source"), col("supply").cast("decimal(38,0)").as("supply"))
      val domSupply = dr.map(_.getLong(2)).sum
      val flat = Mixture.allocateFromSupplies(
        supplies, budgetPpm = domBudget, budgetDen = domSupply.max(1L))
        .collect().map(r => r.getString(0) ->
          ((r.getBoolean(3), r.getLong(4)))).toMap
      dr.foreach { r =>
        val (capped, alloc) = flat(r.getString(0))
        assert(capped == r.getBoolean(5) && alloc == r.getLong(6),
          s"domain $dom source ${r.getString(0)}")
      }
    }
  }

  test("train manifest packs exactly the admitted token mass") {
    val admitted = Mixture.admittedDocs(docs, 900000L)
    val total = admitted.agg(sum(col("tokens"))).head().getLong(0)
    val manifest = graft.operators.Pack.trainingBatchManifest(
      docs.join(admitted.select(col("doc_id")), Seq("doc_id")))
    val packed = manifest.agg(sum(col("fill_tokens"))).head().getLong(0)
    assert(packed == total, s"packed $packed vs admitted $total")
  }

  test("curate-then-budget solves over exactly the quality gate's kept set") {
    import spark.implicits._
    val stop = Seq("the", "a", "of", "and")
    val curated = Mixture.curatedMixture(docs, stop).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent derivation of the same supplies via the full gate
    val keptIds = graft.operators.Curation.perSourceQualityGate(docs, stop)
      .filter(col("kept")).select(col("doc_id"))
    val wantSupply = docs.join(keptIds, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.operators.DistributedRank.release(spark)
    assert(curated == wantSupply.map { case (s, t) => s -> t })
    // gating changes the solve's inputs (tails dropped non-uniformly), so
    // the curated allocation is not just a rescale of the ungated one
    val ungated = rows(900000L).map(r => r.source -> r.supply).toMap
    assert(curated.exists { case (s, t) => t < ungated(s) })
  }

  test("admission realizes each allocation within one straddling document") {
    val audit = Mixture.admissionAudit(docs, budgetPpm = 900000L).collect()
    val maxDocTokens = Tables.documents(spark, sf)
      .selectExpr("max(size(split(text, ' ')))").head().getInt(0)
    audit.foreach { r =>
      val (supply, alloc, capped, admitted) =
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(5))
      val overshoot = r.getLong(6)
      assert(admitted - alloc == overshoot, r.toString)
      if (capped) {
        // capped sources take their whole supply, exactly
        assert(admitted == supply && overshoot == 0L, r.toString)
      } else {
        // the budget is crossed by at most the straddling document
        assert(overshoot >= 0L && overshoot < maxDocTokens, r.toString)
      }
      assert(admitted <= supply, r.toString)
    }
    assert(audit.exists(_.getBoolean(3)) && audit.exists(!_.getBoolean(3)),
      "fixture must exercise both branches")
  }

  test("a source that cannot cover its share is capped and budget re-flows") {
    import spark.implicits._
    // tiny crafted corpus: heavy weight on a starving source
    val tiny = Seq(
      (1L, "x x x", "a"),            // 3 tokens
      (2L, "y y y y y y y y y y", "b"), // 10 tokens
      (3L, "z z z z z z z z z z", "c")  // 10 tokens
    ).toDF("doc_id", "text", "source")
    val rs = Mixture.optimalMixture(tiny, 1000000L).collect()
    // full budget: everyone capped at supply
    assert(rs.map(_.getLong(4)).sum == 23L)
    assert(rs.forall(r => r.getLong(4) == r.getLong(1)))
  }
}
