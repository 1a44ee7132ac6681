package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** BPE merge learning (Sennrich, Haddow & Birch, ACL 2016): learn the
  * top-N merge rules from corpus word frequencies — the TRAINING side of
  * subword tokenization (the applying side is the WordPiece encode).
  * Each round counts adjacent symbol pairs weighted by word frequency,
  * picks the most frequent pair (ties broken lexicographically), and
  * merges its leftmost non-overlapping occurrences in every word.
  *
  * Architecture (the same split production tokenizer trainers use): the
  * CORPUS pass is distributed — one scan folds to the (word, count)
  * frame with map-side combine — and the merge loop runs on that frame,
  * which is bounded by the LANGUAGE's vocabulary, not the corpus: at
  * 100 TB the scan is the only thing that grows. The loop itself is
  * exact integer arithmetic on the collected vocab (same
  * bounded-driver-frame pattern as the IVF k-means fit), so merges are
  * deterministic regardless of partitioning.
  *
  * The DuckDB oracle recomputes EVERYTHING from the raw documents —
  * pair counts, argmax with tie-break, and the leftmost-non-overlap
  * merge application as a per-stage recursive-CTE walk — so the learned
  * rules are cross-checked end to end, not just replayed.
  */
object BpeTrainer {

  /** Leftmost-non-overlapping merge of (l, r) -> l+r, as a left fold:
    * a merged symbol can never re-match `l` in the same pass (l+r != l),
    * so no skip flag is needed. The oracle's recursive walk and this
    * fold are the same automaton. (Reference spelling — the training
    * loop runs [[applyMergeArr]], equality-pinned in BpeTrainerSpec.)
    */
  private[graft] def applyMerge(
      syms: List[String], l: String, r: String): List[String] =
    syms.foldLeft(List.empty[String]) { (out, s) =>
      if (out.nonEmpty && out.last == l && s == r)
        out.init :+ (l + r)
      else out :+ s
    }

  /** Array form of [[applyMerge]] — same automaton, in-place-friendly. */
  private[graft] def applyMergeArr(
      syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out(out.length - 1) == l && syms(i) == r)
        out(out.length - 1) = l + r
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** Learn `numMerges` rules; emits (step, left, right, pair_count).
    *
    * `maxVocabRows` bounds the driver-side (word, count) collect: the
    * loop is vocab-bounded BY DESIGN (a natural language is a few
    * million word forms), and a corpus whose "vocabulary" outgrows the
    * bound means the input wasn't word-like (binary soup, unsegmented
    * text) — that must fail loudly here, not OOM the driver. The scan
    * collects at most `maxVocabRows + 1` rows, so the failure itself is
    * cheap. Merge-count scaling is measured in ScaleSmoke (`bpe_merges`:
    * 256 merges over 1k/10k/100k-word synthetic vocabularies).
    */
  def learnMerges(documents: DataFrame, numMerges: Int = 6,
      maxVocabRows: Int = 2000000): DataFrame = {
    val spark = documents.sparkSession
    val collected = documents
      .select(explode(graft.functions.TextAnalysis.tokens(col("text")))
        .as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
      .limit(maxVocabRows + 1)
      .collect() // language-bounded vocab frame (see scaladoc)
    require(collected.length <= maxVocabRows,
      s"learnMerges: corpus vocabulary exceeds maxVocabRows=$maxVocabRows; " +
        "the merge loop is driver-local and vocab-bounded by design — " +
        "pre-normalize the input (or raise the bound explicitly) instead " +
        "of collecting an unbounded frame")
    val wordCounts = collected.map(row => (row.getString(0), row.getLong(1)))
    // Incremental trainer (the structure real BPE trainers use): global
    // pair counts plus a pair -> containing-words index, maintained by
    // EXACT deltas as each merge rewrites only the words it touches — a
    // round costs O(|affected words| x len + |live pairs| for the argmax)
    // instead of re-scanning the whole vocabulary, which is what makes
    // realistic merge counts (256+; ScaleSmoke `bpe_merges_256`) cheap.
    // Semantics are IDENTICAL to the naive rescan-every-round loop
    // (BpeTrainerSpec pins equality on randomized corpora): counts are
    // exact integers, the argmax ordering is unchanged, and once (l, r)
    // is merged no new (l, r) adjacency can ever form (merges only fuse
    // neighbors — they never delete a symbol between two others — and no
    // later concatenation can equal the single merged string without
    // being this same pair), so dropping the pair's index entry is safe.
    val words: Array[Array[String]] = wordCounts.map(_._1.split("").toArray)
    val counts: Array[Long] = wordCounts.map(_._2)
    val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val pairWords = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    def adjacent(syms: Array[String]): Iterator[(String, String)] =
      if (syms.length < 2) Iterator.empty
      else (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1)))
    var idx = 0
    while (idx < words.length) {
      adjacent(words(idx)).foreach { p =>
        pairCounts.update(p, pairCounts.getOrElse(p, 0L) + counts(idx))
        pairWords.getOrElseUpdate(
          p, scala.collection.mutable.Set.empty[Int]) += idx
      }
      idx += 1
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      if (pairCounts.isEmpty) exhausted = true
      else {
        val ((l, r), cnt) = pairCounts.minBy { case ((a, b), n) =>
          (-n, a, b) // max count, then lexicographic (a, b)
        }
        merges += ((step, l, r, cnt))
        pairWords.remove((l, r)).foreach(_.foreach { wi =>
          val old = words(wi)
          val merged = applyMergeArr(old, l, r)
          if (merged.length != old.length) { // skip stale index entries
            val c = counts(wi)
            val delta = scala.collection.mutable.HashMap.empty[(String, String), Long]
            adjacent(old).foreach(p => delta.update(p, delta.getOrElse(p, 0L) - c))
            adjacent(merged).foreach(p => delta.update(p, delta.getOrElse(p, 0L) + c))
            delta.foreach { case (p, d) =>
              if (d != 0L) {
                val nv = pairCounts.getOrElse(p, 0L) + d
                if (nv <= 0L) pairCounts.remove(p)
                else pairCounts.update(p, nv)
                if (d > 0L) pairWords.getOrElseUpdate(
                  p, scala.collection.mutable.Set.empty[Int]) += wi
              }
            }
            words(wi) = merged
          }
        })
        pairCounts.remove((l, r))
        step += 1
      }
    }
    val schema = StructType(Seq(
      StructField("step", IntegerType, nullable = false),
      StructField("merge_left", StringType, nullable = false),
      StructField("merge_right", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.result().map { case (s, l, r, c) => Row(s, l, r, c) }, 1),
      schema)
      .orderBy(col("step"))
  }

  /** Apply the learned merges to the corpus and report per-source
    * encoding statistics (token counts after merging, chars/token) —
    * the fertility/compression report that decides whether a tokenizer
    * is worth its vocab budget.
    *
    * Shape: merges are learned once (bounded driver loop, see
    * [[learnMerges]]) and then applied DISTRIBUTED as `numMerges`
    * chained expression folds over the distinct-word frame — each
    * distinct word encodes once, then the per-source word-count frame
    * weights the totals (the wordpiece argument: encode cost is bounded
    * by the language). The oracle extends the recursive merge chain
    * with the same per-source weighting.
    */
  def encodeStats(documents: DataFrame, numMerges: Int = 6): DataFrame = {
    val merges = learnMerges(documents, numMerges).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val sw = documents
      .select(col("source"),
        explode(graft.functions.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
    val foldExpr = merges.foldLeft("split(w, '')") { case (prev, (l, r)) =>
      s"""aggregate($prev, slice(split(w, ''), 1, 0),
         |  (acc, s) -> if(size(acc) > 0 AND element_at(acc, -1) = '$l'
         |                 AND s = '$r',
         |    concat(slice(acc, 1, size(acc) - 1), array('$l$r')),
         |    concat(acc, array(s))))""".stripMargin
    }
    val enc = sw.select(col("w")).distinct()
      .withColumn("n_syms", size(expr(foldExpr)).cast("long"))
    sw.join(enc, Seq("w"))
      .groupBy(col("source"))
      .agg(
        sum(col("c")).as("n_words"),
        sum(col("c") * length(col("w")).cast("long")).as("n_chars"),
        sum(col("c") * col("n_syms")).as("n_tokens"))
      .select(col("source"), col("n_words"), col("n_chars"), col("n_tokens"),
        // RAW integer-ratio quotients (round() tie hazard)
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("tokens_per_word"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token"))
      .orderBy(col("source"))
  }

  /** Full recompute in DuckDB: per stage, pair counts over the current
    * symbolization, argmax with the same tie-break, and the merge as a
    * recursive position walk (the same leftmost-non-overlap automaton as
    * [[applyMerge]]).
    */
  def oracleSql(numMerges: Int = 6): String = {
    def stage(i: Int): String = {
      val prev = s"w${i - 1}"
      s"""p$i AS (
  SELECT syms[i] AS l, syms[i+1] AS r, CAST(sum(c) AS BIGINT) AS cnt
  FROM $prev, unnest(generate_series(1, len(syms) - 1)) AS t(i)
  GROUP BY 1, 2),
b$i AS MATERIALIZED (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
m$i(w, c, idx, out) AS (
  SELECT w, c, 0, CAST([] AS VARCHAR[]) FROM $prev
  UNION ALL
  SELECT m.w, m.c, m.idx + 1,
    CASE WHEN len(m.out) > 0 AND m.out[-1] = b.l
          AND s.syms[m.idx + 1] = b.r
         THEN list_append(m.out[1:len(m.out) - 1], b.l || b.r)
         ELSE list_append(m.out, s.syms[m.idx + 1]) END
  FROM m$i m JOIN $prev s ON s.w = m.w CROSS JOIN b$i b
  WHERE m.idx < len(s.syms)),
w$i AS MATERIALIZED (
  SELECT m.w, m.c, m.out AS syms
  FROM m$i m JOIN $prev s ON s.w = m.w
  WHERE m.idx = len(s.syms))"""
    }
    val stages = (1 to numMerges).map(stage).mkString(",\n")
    val unions = (1 to numMerges).map(i =>
      s"SELECT $i AS step, l AS merge_left, r AS merge_right, " +
        s"cnt AS pair_count FROM b$i")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH RECURSIVE w0 AS MATERIALIZED (
  SELECT w, c, string_split_regex(w, '') AS syms FROM (
    SELECT w, CAST(count(*) AS BIGINT) AS c
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY 1)),
$stages
SELECT CAST(step AS INTEGER) AS step, merge_left, merge_right, pair_count
FROM (
  $unions)
ORDER BY step"""
  }

  /** Oracle for [[encodeStats]]: the same merge chain, then per-source
    * weighting of the final symbolization.
    */
  def encodeStatsOracleSql(numMerges: Int = 6): String = {
    val chain = oracleSql(numMerges)
    val prefix = chain.substring(0, chain.indexOf("\nSELECT CAST(step"))
    s"""$prefix,
sw AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents)
  GROUP BY 1, 2)
SELECT source,
  CAST(sum(sw.c) AS BIGINT) AS n_words,
  CAST(sum(sw.c * length(w)) AS BIGINT) AS n_chars,
  CAST(sum(sw.c * len(syms)) AS BIGINT) AS n_tokens,
  CAST(CAST(sum(sw.c * len(syms)) AS BIGINT) AS DOUBLE)
    / CAST(CAST(sum(sw.c) AS BIGINT) AS DOUBLE) AS tokens_per_word,
  CAST(CAST(sum(sw.c * length(w)) AS BIGINT) AS DOUBLE)
    / CAST(CAST(sum(sw.c * len(syms)) AS BIGINT) AS DOUBLE)
    AS chars_per_token
FROM sw JOIN w$numMerges USING (w)
GROUP BY 1 ORDER BY 1"""
  }
}
