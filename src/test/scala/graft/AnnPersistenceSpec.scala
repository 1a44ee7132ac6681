package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** ANN index persistence: build-once/query-many. A fit persisted to
  * parquet must (a) round-trip the centroids/codebooks bit-exactly,
  * (b) produce IDENTICAL query results when loaded in place of a session
  * fit, and (c) actually be READ on the query-many side (not silently
  * refit) — proven by planting a model fit under a different seed and
  * observing the query pick it up.
  */
class AnnPersistenceSpec extends SparkTestBase {

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ann_$tag").toString + "/model"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("IVF: fit->save->load round-trips bit-exactly and reproduces results") {
    val emb = Tables.embeddings(spark, sf)
    val path = tempDir("ivf")
    val fromFit = rows(Similarity.ivfTopK(emb, indexPath = Some(path)))
    // the model landed on disk and matches the recorded fit exactly
    val (centers, books) = Similarity.loadIndexModel(spark, path)
    assert(books.isEmpty)
    val fit = Similarity.ivfFitFor(emb).get
    assert(centers.get.map(_.toSeq).toSeq == fit.centers.map(_.toSeq).toSeq)
    // query-many: the second call loads and reproduces identically,
    // and equals the path-less session-fit call
    val fromLoad = rows(Similarity.ivfTopK(emb, indexPath = Some(path)))
    val fromSession = rows(Similarity.ivfTopK(emb))
    assert(fromLoad == fromFit && fromSession == fromFit)
  }

  test("PQ: fit->save->load round-trips bit-exactly and reproduces results") {
    val emb = Tables.embeddings(spark, sf)
    val path = tempDir("pq")
    val fromFit = rows(Similarity.pqTopK(emb, indexPath = Some(path)))
    val (centers, books) = Similarity.loadIndexModel(spark, path)
    assert(centers.isEmpty)
    val fit = Similarity.pqFitFor(emb).get
    assert(books.get.map(_.map(_.toSeq).toSeq).toSeq ==
      fit.books.map(_.map(_.toSeq).toSeq).toSeq)
    val fromLoad = rows(Similarity.pqTopK(emb, indexPath = Some(path)))
    assert(fromLoad == fromFit)
  }

  test("IVF+PQ: one model file carries both parts") {
    val emb = Tables.embeddings(spark, sf)
    val path = tempDir("ivfpq")
    val fromFit = rows(Similarity.ivfPqTopK(emb, indexPath = Some(path)))
    val (centers, books) = Similarity.loadIndexModel(spark, path)
    assert(centers.isDefined && books.isDefined)
    val fromLoad = rows(Similarity.ivfPqTopK(emb, indexPath = Some(path)))
    assert(fromLoad == fromFit)
  }

  test("the load path is live: a planted different-seed model changes the fit used") {
    val emb = Tables.embeddings(spark, sf)
    // build a model under seed 7, then query with default seed 42 against
    // that path: the call must USE the planted centroids (load), not refit
    val path7 = tempDir("seed7")
    Similarity.ivfTopK(emb, seed = 7L, indexPath = Some(path7)).collect()
    val planted = Similarity.loadIndexModel(spark, path7)._1.get
    Similarity.ivfTopK(emb, indexPath = Some(path7)).collect()
    val used = Similarity.ivfFitFor(emb).get.centers
    assert(used.map(_.toSeq).toSeq == planted.map(_.toSeq).toSeq)
    // and the planted seed-7 quantizer differs from the session seed-42 one
    Similarity.ivfTopK(emb).collect()
    val s42 = Similarity.ivfFitFor(emb).get.centers
    assert(s42.map(_.toSeq).toSeq != planted.map(_.toSeq).toSeq)
  }

  test("append: arrivals probe a RELOADED corpus model identically to the fit") {
    val emb = Tables.embeddings(spark, sf)
    val path = tempDir("append")
    // build the standing index from the corpus half (the append call fits
    // on vec_id < splitId and persists that model)
    val fromFit = rows(Similarity.ivfAppendTopK(emb, indexPath = Some(path)))
    // the persisted model is the CORPUS-only quantizer
    val (centers, _) = Similarity.loadIndexModel(spark, path)
    val fit = Similarity.ivfAppendFitFor(emb).get
    assert(centers.get.map(_.toSeq).toSeq == fit.centers.map(_.toSeq).toSeq)
    // query-many: reload reproduces identically, as does a session fit
    val fromLoad = rows(Similarity.ivfAppendTopK(emb, indexPath = Some(path)))
    val fromSession = rows(Similarity.ivfAppendTopK(emb))
    assert(fromLoad == fromFit && fromSession == fromFit)
    // the arrivals never moved the quantizer: a corpus-only ivfTopK fit
    // under the same (nlist, seed) yields the SAME centroids
    Similarity.ivfTopK(emb.filter(col("vec_id") < 250), numQueries = 1)
      .collect()
    val corpusFit = Similarity
      .ivfFitFor(emb.filter(col("vec_id") < 250), numQueries = 1).get
    assert(corpusFit.centers.map(_.toSeq).toSeq ==
      fit.centers.map(_.toSeq).toSeq)
    // every query is an arrival, and arrival neighbors are reachable
    // (the grown index serves both sides)
    val got = Similarity.ivfAppendTopK(emb).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getLong(0) >= 250L))
    assert(got.exists(_.getLong(1) >= 250L) || got.length < 5,
      "no arrival ever surfaced as a neighbor — append is inert")
  }

  test("IVF+PQ append: reload parity and both model parts from the corpus fit") {
    val emb = Tables.embeddings(spark, sf)
    val path = tempDir("ivfpqappend")
    val fromFit = rows(Similarity.ivfPqAppendTopK(emb, indexPath = Some(path)))
    val (centers, books) = Similarity.loadIndexModel(spark, path)
    assert(centers.isDefined && books.isDefined)
    val fit = Similarity.ivfPqAppendFitFor(emb).get
    assert(centers.get.map(_.toSeq).toSeq == fit.centers.map(_.toSeq).toSeq)
    assert(books.get.map(_.map(_.toSeq).toSeq).toSeq ==
      fit.books.map(_.map(_.toSeq).toSeq).toSeq)
    val fromLoad = rows(Similarity.ivfPqAppendTopK(emb, indexPath = Some(path)))
    val fromSession = rows(Similarity.ivfPqAppendTopK(emb))
    assert(fromLoad == fromFit && fromSession == fromFit)
    // every query is an arrival
    val got = Similarity.ivfPqAppendTopK(emb).collect()
    assert(got.nonEmpty && got.forall(_.getLong(0) >= 250L))
  }

  test("structural mismatch fails loudly: IVF query against a PQ-only model") {
    val emb = Tables.embeddings(spark, sf)
    val path = tempDir("pqonly")
    Similarity.pqTopK(emb, indexPath = Some(path)).collect()
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(emb, indexPath = Some(path)).collect()
    }
    assert(e.getMessage.contains("no IVF centroids"))
  }
}
