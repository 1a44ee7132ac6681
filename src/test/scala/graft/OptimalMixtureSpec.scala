package graft

import graft.operators.Mixture
import org.apache.spark.sql.functions._

/** Invariants of the exact water-filling allocation ([[Mixture.optimalMixture]]):
  * token-exact budget, per-source caps, proportional shares among uncapped
  * sources, capped-set monotonicity in the budget, and partition
  * invariance. The closed form itself is additionally verified against an
  * iterative exact-rational reference in the operator's development notes
  * and bit-exactly against DuckDB by the driver oracle.
  */
class OptimalMixtureSpec extends SparkTestBase {

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

  test("closed form matches an iterative exact-rational reference on random frames") {
    import spark.implicits._
    // Iterative water-filling in exact rationals: repeatedly cap every
    // source whose supply/weight ratio is <= the current fill level
    // lambda = remainingBudget / remainingWeight, until a fixed point.
    // This is the textbook definition the closed form replaces.
    def reference(sup: Seq[(String, Long, Long)], b: BigInt)
        : Map[String, Boolean] = {
      val capped = scala.collection.mutable.Map(
        sup.map(s => s._1 -> false): _*)
      var changed = true
      while (changed) {
        changed = false
        val remB = b - sup.filter(s => capped(s._1)).map(s => BigInt(s._2)).sum
        val remW = sup.filterNot(s => capped(s._1)).map(s => BigInt(s._3)).sum
        if (remW > 0) sup.foreach { case (src, s, w) =>
          // supply/w <= remB/remW  <=>  supply*remW <= remB*w
          if (!capped(src) && BigInt(s) * remW <= remB * w) {
            capped(src) = true; changed = true
          }
        }
      }
      capped.toMap
    }
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 12) {
      val n = 2 + rng.nextInt(7)
      val sup = (0 until n).map { i =>
        val src = s"s${trial}_$i"
        // weight must match the operator's content-keyed draw
        val w = (graft.functions.Mix64.mix(
          graft.functions.SimHash64.fnv1a(src.getBytes("UTF-8"))) & 7L) + 1L
        (src, math.abs(rng.nextLong()) % (if (rng.nextBoolean()) 1000L else 5L),
          w)
      }
      val total = sup.map(_._2).sum
      val ppm = rng.nextInt(1000001).toLong
      val b = BigInt(total) * ppm / 1000000
      val frame = sup.map(s => (s._1, BigDecimal(s._2))).toDF("source", "supply")
        .select(col("source"), col("supply").cast("decimal(38,0)").as("supply"))
      val got = Mixture.allocateFromSupplies(frame, ppm).collect()
        .map(r => (r.getString(0), r.getBoolean(3), BigInt(r.getLong(4))))
      val wantCapped = reference(sup, b)
      got.foreach { case (src, capped, _) =>
        assert(capped == wantCapped(src), s"trial $trial src $src")
      }
      assert(got.map(_._3).sum == b.min(BigInt(total)), s"trial $trial")
    }
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
