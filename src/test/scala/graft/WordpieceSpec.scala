package graft

import graft.functions.TextAnalysis

/** Hand-computed greedy longest-match WordPiece fixtures. */
class WordpieceSpec extends SparkTestBase {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def counts(texts: String*): Map[String, Long] = {
    val docs = docsOf(texts: _*)
    val decl = TextAnalysis.wordpieceTokenCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every fixture doubles as an equality pin of the native expression
    val native = TextAnalysis.wordpieceTokenCountsNative(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(native == decl, "native WordpieceEncode vs declarative fold")
    decl
  }

  test("wordpiece: greedy longest match with ## continuations") {
    // sparkling -> spark ##l ##ing ; query -> qu ##ery ;
    // customer -> cust ##omer ; the -> th ##e
    val got = counts("sparkling query customer the")
    assert(got == Map(
      "spark" -> 1L, "##l" -> 1L, "##ing" -> 1L,
      "qu" -> 1L, "##ery" -> 1L,
      "cust" -> 1L, "##omer" -> 1L,
      "th" -> 1L, "##e" -> 1L))
  }

  test("wordpiece: longest piece beats a shorter one at every step") {
    // window -> wind ##ow (not w ##i ##n ##d ...)
    val got = counts("window")
    assert(got == Map("wind" -> 1L, "##ow" -> 1L))
  }

  test("wordpiece: unmatched remainder emits [UNK] and stops") {
    // 'x9': 'x' matches, '9' matches nothing -> x [UNK]
    val got = counts("x9")
    assert(got == Map("x" -> 1L, "[UNK]" -> 1L))
  }

  test("wordpiece: distinct words tokenize once, weighted by frequency") {
    val got = counts("spark spark spark", "spark query")
    assert(got("spark") == 4L)
    assert(got("qu") == 1L)
  }

  test("wordpiece: native expression equals the fold on the sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, sf)
    val decl = TextAnalysis.wordpieceTokenCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
    val native = TextAnalysis.wordpieceTokenCountsNative(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
    assert(native.nonEmpty && native == decl)
  }

  test("wordpiece: decl fold depth (16) covers every word at every harness SF") {
    // the declarative variant's contract: its 16-step fold truncates any
    // word needing >16 pieces where the native loop (and the DuckDB
    // oracle's recursive CTE) run to completion. Pin that the contract
    // holds for every corpus the driver actually runs the decl query on —
    // a future fixture with a longer word fails HERE, not as a latent
    // oracle hash-mismatch.
    import org.apache.spark.sql.functions._
    val base = new java.io.File(sf).getParentFile
    val sfDirs = base.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("sf")).map(_.toString).sorted
    assert(sfDirs.nonEmpty)
    sfDirs.foreach { dir =>
      val docs = graft.Tables.documents(spark, dir)
      val maxPieces = docs
        .select(explode(split(col("text"), " ")).as("w"))
        .distinct()
        .select(max(size(graft.functions.GraftColumns.wordpieceEncode(
          col("w"), TextAnalysis.wordpieceVocab))).as("m"))
        .head.getInt(0)
      assert(maxPieces <= 16, s"$dir: a word needs $maxPieces pieces; " +
        "the 16-step decl fold would truncate it — raise the fold depth")
    }
  }

  test("wordpiece native: no UDF object in the plan, encode stays codegen'd") {
    val p = TextAnalysis.wordpieceTokenCountsNative(docsOf("spark query"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p)
    assert(p.contains("wordpiece_encode"), p)
  }
}
