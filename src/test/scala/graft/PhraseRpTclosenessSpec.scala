package graft

import java.sql.Timestamp

import graft.functions.TextAnalysis
import graft.operators.{FeatureEng, Privacy}

/** Hand-computed fixtures for phrase search (index-only evaluation),
  * the JL ±1 projection, and the t-closeness EMD audit.
  */
class PhraseRpTclosenessSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  test("phraseSearch: finds the top bigram and counts occurrences via the index") {
    // "b c" occurs 4 times total (more than any other bigram);
    // doc 1 has it twice, doc 2 twice, doc 3 zero times.
    val docs = Seq(
      (1L, t0, "a b c x b c", "s"),
      (2L, t0, "b c y b c", "s"),
      (3L, t0, "c b a", "s"))
      .toDF("doc_id", "ingest_ts", "text", "source")
    val got = TextAnalysis.phraseSearch(docs).collect()
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSeq ==
      Seq((1L, "b", "c", 2L), (2L, "b", "c", 2L)))
  }

  test("phraseSearch: bigram argmax tie-break is lexicographic") {
    // "a b" and "b a" both occur twice -> "a b" wins lexicographically
    val docs = Seq(
      (1L, t0, "a b a b a", "s"), // a b: 2, b a: 2
      (2L, t0, "z z", "s"))
      .toDF("doc_id", "ingest_ts", "text", "source")
    val got = TextAnalysis.phraseSearch(docs).collect()
    assert(got.length == 1)
    assert(got.head.getString(1) == "a" && got.head.getString(2) == "b")
    assert(got.head.getLong(3) == 2L)
  }

  test("phraseSearch: adjacent-identical phrase (w1 == w2) counts overlaps") {
    val docs = Seq((1L, t0, "z z z", "s"))
      .toDF("doc_id", "ingest_ts", "text", "source")
    val got = TextAnalysis.phraseSearch(docs).collect()
    // top bigram is (z, z); positions {0,1} shifted ∩ {0,1,2} = {1,2}
    assert(got.map(r => (r.getLong(0), r.getLong(3))).toSeq ==
      Seq((1L, 2L)))
  }

  test("rpProject: sign flips alone preserve the norm for a unit basis vector") {
    val e = Array.fill(FeatureEng.SrcDim)(0.0f); e(5) = 1.0f
    val df = Seq((1L, e.toSeq, 0)).toDF("vec_id", "embedding", "label")
    val r = FeatureEng.rpProject(df).collect().head
    // each p_d = ±1, so rp_norm_sq = 16 and distortion = 16/(16·1) = 1
    assert(r.getDouble(5) == 1.0)     // norm_sq
    assert(r.getDouble(6) == 16.0)    // rp_norm_sq
    assert(r.getDouble(7) == 1.0)     // distortion
    val s = FeatureEng.rpSigns
    assert(r.getDouble(1) == s(0)(5).toDouble)
    assert(r.getDouble(2) == s(1)(5).toDouble)
  }

  test("rpProject: distortion concentrates near 1 on random-ish vectors") {
    val vecs = (0 until 200).map { v =>
      (v.toLong,
        (0 until FeatureEng.SrcDim).map(i =>
          (graft.functions.Mix64.mix(v * 64L + i) % 1000L) / 1000.0f).toSeq,
        0)
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val rows = FeatureEng.rpProject(df).collect()
    val ds = rows.map(_.getDouble(7))
    val within = ds.count(d => d > 0.3 && d < 2.5)
    assert(within >= 190, s"only $within/200 inside the JL band")
    val mean = ds.sum / ds.length
    assert(math.abs(mean - 1.0) < 0.15, s"mean distortion $mean")
  }

  test("rpSigns: balanced-ish and deterministic") {
    val s = FeatureEng.rpSigns
    assert(s.length == FeatureEng.RpDim)
    assert(s.forall(_.length == FeatureEng.SrcDim))
    val plus = s.flatten.count(_ == 1)
    assert(plus > 400 && plus < 624, s"$plus of 1024 are +1")
    assert(s == FeatureEng.rpSigns)
  }

  test("tCloseness: identical-distribution groups have EMD 0; planted shift is exact") {
    // bands: group A all in bucket 0, group B all in bucket 1,
    // global = half/half, m = 2.
    // EMD(A) = |1 - 1/2| / 1 = 1/2 -> 500000 micros; same for B.
    val customers =
      (1 to 10).map(i => (i.toLong, 0L, "SEG_A", 500.0)) ++
        (11 to 20).map(i => (i.toLong, 1L, "SEG_A", 1500.0))
    val df = customers
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = Privacy.tCloseness(df).collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getLong(2) == 10L)
      assert(r.getLong(3) == 500000L, s"emd for nation ${r.getLong(0)}")
      assert(r.getBoolean(4)) // 0.5 > default t = 0.2
    }
    // one group mirroring the global mix exactly -> EMD 0
    val balanced =
      (1 to 4).map(i => (i.toLong, 0L, "S", 500.0)) ++
        (5 to 8).map(i => (i.toLong, 0L, "S", 1500.0))
    val b = Privacy.tCloseness(
      balanced.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"))
      .collect()
    assert(b.length == 1 && b.head.getLong(3) == 0L && !b.head.getBoolean(4))
  }

  test("tCloseness: one balance band (m = 1) is EMD 0, not an ANSI crash") {
    val df = (1 to 6).map(i => (i.toLong, (i % 2).toLong, "S", 500.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = Privacy.tCloseness(df).collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getLong(3) == 0L && !r.getBoolean(4))
    }
  }
}
