package graft

import graft.gen.EventGen
import graft.operators.{HourlyAggregation, Skew, Upsert}
import org.apache.spark.sql.functions._

/** SURVEY.md §5.3 property tests, over generator-synthesized frames. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val events = EventGen.batch(spark, 5000, userPool = 40, seed = 7L).cache()

  test("CMS heavy hitters: one-sided error bound holds on every row") {
    val docs = Tables.documents(spark, sf)
    val n = docs.select(explode(split(col("text"), " "))).count()
    val eps = math.E / graft.functions.TextAnalysis.CmsWidth
    val rows = graft.functions.TextAnalysis.tokenTopkCms(docs, k = 20)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2)
      // never-underestimates is STRUCTURAL (holds always); the eps*N
      // (eps = e/width) bound is probabilistic per depth row, so allow 3x
      // slack rather than pinning the suite to one lucky seed/dataset
      assert(est >= exact, s"CMS never underestimates: $r")
      assert(est <= exact + (3 * eps * n).toLong + 1, s"CMS 3*eps bound: $r (n=$n)")
    }
  }

  test("CMS counters from the histogram == counters from the raw token stream") {
    import graft.functions.{GraftColumns, TextAnalysis}
    // the scaladoc claim behind the relational build: summing exact
    // per-token counts into buckets is IDENTICAL to incrementing a
    // counter per token occurrence (addition commutes/associates). Build
    // both ways over the real corpus and compare cell-for-cell.
    val docs = Tables.documents(spark, sf)
    val seeds = TextAnalysis.cmsSeeds()
    val width = TextAnalysis.CmsWidth
    def bucketCol(d: Int) =
      GraftColumns.mix64(GraftColumns.fnv1a64(col("token")).bitwiseXOR(lit(seeds(d))))
        .bitwiseAND(lit((width - 1).toLong))
    // per-occurrence path: one counter increment per raw token row
    val raw = docs.select(explode(split(col("text"), " ")).as("token"))
    val perOccurrence = (0 until TextAnalysis.CmsDepth).map { d =>
      raw.select(lit(d).as("d"), bucketCol(d).as("bucket"))
        .groupBy("d", "bucket").agg(count(lit(1)).as("counter"))
    }.reduce(_ unionByName _)
    // histogram path: what tokenTopkCms builds internally — recover its
    // counters by probing every token's estimate... instead rebuild the
    // same way: exact counts then bucket-sum
    val hist = raw.groupBy("token").agg(count(lit(1)).as("exact_count"))
    val fromHistogram = (0 until TextAnalysis.CmsDepth).map { d =>
      hist.select(lit(d).as("d"), bucketCol(d).as("bucket"), col("exact_count"))
        .groupBy("d", "bucket").agg(sum("exact_count").as("counter"))
    }.reduce(_ unionByName _)
    assert(perOccurrence.exceptAll(fromHistogram).isEmpty
      && fromHistogram.exceptAll(perOccurrence).isEmpty,
      "histogram-built CMS counters diverged from per-occurrence counters")
  }

  test("relational HLL tracks exact distinct counts (sketch scale path for O4)") {
    val ev = Tables.events(spark, sf)
    // event_type groups: the larger-cardinality regime at this SF
    val byType = graft.operators.Hll.approxDistinctUsers(
      ev.select(col("event_type"), col("user_id")), Seq("event_type"), "user_id")
    val worst = byType
      .select(max(abs(col("approx_users") - col("users_exact")) / col("users_exact")))
      .as[Double].head
    // m=256 -> ~6.5% std error in the raw regime; linear counting is
    // tighter below 2.5m. 0.2 bounds both without seed-tuning.
    assert(worst < 0.2, s"HLL relative error $worst")
    // exact side of the same frame must agree with countDistinct exactly
    val exact = ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("cd"))
    val joined = byType.join(exact, "event_type")
      .filter(col("users_exact") =!= col("cd")).count()
    assert(joined == 0, "register-frame exact count != countDistinct")
  }

  test("window assignment is a partition: every event in exactly one window") {
    val agg = HourlyAggregation(events)
    assert(agg.agg(sum("event_count")).as[Long].head == events.count())
    // distinct (window, type) keys — no double-assignment
    assert(agg.groupBy("window_start", "event_type").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("per-window invariants: distinct <= count; value sum consistent") {
    val agg = HourlyAggregation(events)
    assert(agg.filter(col("unique_user_count") > col("event_count")).count() == 0)
    assert(agg.filter(col("event_count") <= 0).count() == 0)
    // total across windows equals the direct global sum (rounded per-group)
    val windowed = agg.agg(sum("total_value")).as[Double].head
    val direct = events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(round(sum("value"), 2).as("s")).agg(sum("s")).as[Double].head
    assert(math.abs(windowed - direct) < 1e-6)
  }

  test("upsert idempotence: applying last-write-wins twice == once") {
    val withVersions = events.withColumn("v", pmod(col("event_id"), lit(5L)))
    val once = Upsert.lastWriteWins(withVersions,
      Seq("user_id", "event_type"), Seq(col("v"), col("event_id")))
    val twice = Upsert.lastWriteWins(once,
      Seq("user_id", "event_type"), Seq(col("v"), col("event_id")))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val direct = events.groupBy("user_id")
      .agg(count(lit(1)).as("row_count"), sum("value").as("value_sum"))
    val salted = Skew.saltedCountSum(events, "user_id", "value")
    val joined = direct.as("d").join(salted.as("s"), "user_id")
    assert(joined.count() == direct.count())
    assert(joined.filter(col("d.row_count") =!= col("s.row_count")).count() == 0)
    assert(joined.filter(
      abs(col("d.value_sum") - col("s.value_sum")) > 1e-6).count() == 0)
  }

  test("stratified sample: exact quotas, monotone in quota, layout-invariant") {
    import graft.operators.Mixture
    val docs = Tables.documents(spark, sf)
    val groupSizes = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val q5 = Mixture.DriverQuotas.map { case (s, _) => s -> 5L }
    val out = Mixture.stratifiedSample(docs, Mixture.DriverQuotas).collect()
    // exactly min(quota, stratum size) survivors per source
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val want = math.min(Mixture.DriverQuotas(src), groupSizes(src))
      assert(rows.length == want, s"$src: ${rows.length} != $want")
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to want.toInt))
    }
    // monotone: the 5-quota selection is a subset of every driver quota (>=5)
    val small = Mixture.stratifiedSample(docs, q5).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val big = out.map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
    // content-keyed rank: physical layout cannot matter
    val re = Mixture.stratifiedSample(docs.repartition(7), Mixture.DriverQuotas)
    assert(re.exceptAll(Mixture.stratifiedSample(docs, Mixture.DriverQuotas)).isEmpty)
  }

  test("sequence packing: offsets are gapless per shard and layout-invariant") {
    val docs = Tables.documents(spark, sf)
    val out = graft.operators.Pack.chunkAssignments(docs, capacity = 64, shards = 8)
      .collect()
    assert(out.nonEmpty)
    // per shard, ordered by doc_id: offsets are exactly cumulative token
    // counts (gapless, overlap-free concatenation), chunk/straddle derived
    out.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      var expected = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        val (tokens, off) = (r.getLong(2), r.getLong(3))
        assert(off == expected, s"gap at doc ${r.getLong(0)}: $off != $expected")
        assert(r.getLong(4) == off / 64)
        assert(r.getBoolean(5) == (off % 64 + tokens > 64))
        expected = off + tokens
      }
    }
    // hash sharding + doc_id window order: physical layout cannot matter
    val re = graft.operators.Pack.chunkAssignments(docs.repartition(7), capacity = 64, shards = 8)
    assert(re.exceptAll(graft.operators.Pack.chunkAssignments(docs, 64, 8)).isEmpty)
  }

  test("training batch manifest: bins conserve tokens, agree with rendezvous, layout-invariant") {
    val docs = Tables.documents(spark, sf)
    val B = 64
    val out = graft.operators.Pack
      .trainingBatchManifest(docs, binTokens = B, shards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out.nonEmpty)
    // token conservation: per shard, Σ fill_tokens == Σ doc tokens of the
    // shard (shard derived by an INDEPENDENT Scala HRW fold), and every
    // bin except the shard's last is exactly full
    val shardTokens = docs.select(col("doc_id"), col("text")).collect()
      .map { r =>
        val h = graft.functions.SimHash64.fnv1a(
          r.getString(1).getBytes("UTF-8"))
        val shard = (0L until 8L).maxBy(s =>
          (graft.functions.Mix64.mix(h ^ s), -s))
        shard -> r.getString(1).split(" ", -1).length.toLong
      }
      .groupBy(_._1).map { case (s, ts) => s -> ts.map(_._2).sum }
    out.groupBy(_._1._1).foreach { case (shard, bins) =>
      val fills = bins.toSeq.sortBy(_._1._2)
      assert(fills.map(_._2._3).sum == shardTokens(shard),
        s"shard $shard fill sum")
      // gapless bin ids from 0
      assert(fills.map(_._1._2) == (0L until fills.size.toLong))
      fills.dropRight(1).foreach { case ((_, bin), (_, _, fill, _)) =>
        assert(fill == B.toLong, s"non-final bin $bin of shard $shard not full")
      }
      // every bin touches >= 1 doc; starting docs have a seek key
      fills.foreach { case ((_, bin), (nDocs, nStart, _, firstDoc)) =>
        assert(nDocs >= 1L)
        assert((nStart == 0L) == (firstDoc == -1L), s"bin $bin seek key")
      }
    }
    // content sharding + doc_id window order: layout cannot matter
    val re = graft.operators.Pack
      .trainingBatchManifest(docs.repartition(7), binTokens = B, shards = 8)
    assert(re.exceptAll(
      graft.operators.Pack.trainingBatchManifest(docs, B, 8)).isEmpty)
  }

  test("BMP real-codec round-trip: decoded pixels equal the encoding contract") {
    // every byte travels through the JDK's actual BMP container format —
    // a padding/channel-order/row-direction bug in either direction would
    // surface as a pixel mismatch
    import graft.multimodal.Multimodal
    for (id <- Seq(0L, 1L, 12L, 143L, 99991L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodeBmp(id)))
      assert(img.getWidth == 8 + (id % 13).toInt)
      assert(img.getHeight == 8 + (id % 11).toInt)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val g = Multimodal.bmpPixel(id, x, y)
        assert(img.getRGB(x, y) == (0xff << 24 | g << 16 | g << 8 | g),
          s"doc $id pixel ($x,$y)")
      }
    }
  }

  test("WAV real-codec round-trip: decoded samples equal the encoding contract") {
    // every byte travels through the JDK's actual RIFF/WAVE container —
    // an endianness/sign/chunk-offset bug in either direction would
    // surface as a sample mismatch
    import graft.multimodal.Multimodal
    for (id <- Seq(0L, 1L, 96L, 97L, 143L, 99991L)) {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Multimodal.encodeWav(id)))
      val n = Multimodal.wavSampleCount(id)
      assert(ais.getFrameLength == n.toLong)
      assert(ais.getFormat.getSampleRate == 8000f)
      assert(ais.getFormat.getChannels == 1)
      val buf = ais.readAllBytes()
      assert(buf.length == n * 2)
      for (i <- 0 until n) {
        val s = ((buf(i * 2) & 0xff) | (buf(i * 2 + 1).toInt << 8)).toShort.toInt
        assert(s == Multimodal.wavSample(id, i), s"doc $id sample $i")
      }
    }
  }

  test("generator determinism: same seed same frame, different seed different") {
    val a = EventGen.batch(spark, 1000, seed = 1L)
    val b = EventGen.batch(spark, 1000, seed = 1L)
    val c = EventGen.batch(spark, 1000, seed = 2L)
    assert(a.exceptAll(b).isEmpty)
    assert(c.exceptAll(a).count() > 0)
  }

  test("results are invariant to physical partitioning (determinism policy)") {
    val ev = Tables.events(spark, sf)
    val base = HourlyAggregation(ev).collect()
    for (parts <- Seq(1, 7, 64)) {
      val re = HourlyAggregation(ev.repartition(parts))
        .orderBy("window_start", "event_type").collect()
      assert(re.sameElements(base.sortBy(r =>
        (r.getAs[java.sql.Timestamp]("window_start").getTime, r.getAs[String]("event_type")))),
        s"partitioning $parts changed results")
    }
  }

  test("salted join equals the plain join") {
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = events.join(cust, Seq("user_id"))
      .groupBy("c_mktsegment").count()
    val salted = Skew.saltedJoin(events, cust, Seq("user_id"), salts = 8)
      .groupBy("c_mktsegment").count()
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("approx sketches track exact values within bounds (scale path for O4)") {
    val ev = Tables.events(spark, sf)
    val both = ev.groupBy("event_type").agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx"))
    val maxRelErr = both
      .select(max(abs(col("approx") - col("exact")) / col("exact")))
      .as[Double].head
    assert(maxRelErr < 0.05, s"HLL relative error $maxRelErr")
  }

  test("generator distributions: types roughly uniform, users within pool") {
    val byType = events.groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(byType.keySet == EventGen.eventTypes.toSet)
    val (mn, mx) = (byType.values.min, byType.values.max)
    assert(mx < mn * 2, s"type skew: $byType")
    assert(events.agg(max("user_id")).as[Long].head < 40)
  }
}
