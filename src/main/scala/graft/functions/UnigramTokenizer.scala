package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword segmentation (Kudo, ACL 2018 — the SentencePiece
  * unigram model) — the third tokenizer family next to [[TextAnalysis]]'s
  * BPE ([[graft.operators.BpeTrainer]]) and WordPiece: instead of greedy
  * merge/longest-match, each word is segmented by the OPTIMAL path
  * through its substring lattice via dynamic programming (Kudo's Viterbi
  * decode).
  *
  * EXACT INTEGER OBJECTIVE. The float unigram log-probabilities that the
  * EM-trained model would use are replaced by a deterministic
  * MDL-flavored lexicographic objective on the exact integer lattice —
  * minimize, in order:
  *
  *   1. the number of pieces            (description length),
  *   2. −Σ corpus frequency of pieces   (prefer frequent pieces),
  *   3. the segmentation string         (total order ⇒ unique optimum).
  *
  * This keeps the decode bit-identical across engines (no log, no
  * float) while preserving the structure of the unigram decode: a
  * max-sum DP over the piece lattice, which is exactly what the Viterbi
  * pass of SentencePiece computes.
  *
  * Vocabulary: every substring of length 2..maxPieceLen ranked by
  * occurrence-weighted corpus frequency (each occurrence inside word w
  * counts f_w), top vocabTopK kept, PLUS every single character — the
  * coverage guarantee that makes the DP total (position j always has at
  * least the 1-char edge, so `array_min` never sees an empty lattice
  * column).
  *
  * Distributed shape: the corpus is scanned ONCE for the word-frequency
  * reduction; everything after is bounded by the DISTINCT-word frame
  * (substring explode ≤ len·maxPieceLen rows per word, vocab join on the
  * piece key, one collect_list per word ≤ ~96 edges) and the DP itself
  * is a row-local `aggregate` fold over ≤ maxWordLen positions — no
  * iteration over the cluster, no driver loop. At 100 TB the vocab-rank
  * sort is over the piece-type frame (≲ |distinct words|·maxPieceLen
  * rows), not corpus tokens.
  *
  * Oracle: the same lattice in DuckDB with the DP UNROLLED into
  * maxWordLen chained CTEs (the [[graft.operators.Similarity]]
  * unrolled-greedy convention) — position t's optimum is a min() of
  * DuckDB's lexicographic struct ordering, the mirror of Spark's
  * `array_min` on `struct(np, nsf, seg)`.
  */
object UnigramTokenizer {

  /** Top-k segmented words by corpus frequency: (word, f_w, word_len,
    * n_pieces, piece_freq_sum, segmentation), '|'-joined pieces.
    */
  def unigramSegment(
      documents: DataFrame,
      vocabTopK: Int = 256,
      maxWordLen: Int = 16,
      maxPieceLen: Int = 6,
      k: Int = 50): DataFrame = {
    // word-type frame (vocabulary-bounded) — materialized eagerly so the
    // two consumers below (substring lattice + final DP join) share ONE
    // corpus scan instead of re-running the token reduction
    val words = documents
      .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .filter(length(col("word")).between(1, maxWordLen))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("fw"))
      .localCheckpoint()
    val occs = words
      .select(col("word"), col("fw"),
        explode(expr(
          s"""flatten(transform(sequence(0, length(word) - 1),
             |  i -> transform(sequence(1, least($maxPieceLen, length(word) - i)),
             |    L -> named_struct('i', i, 'j', i + L,
             |                      'p', substring(word, i + 1, L)))))""".stripMargin))
          .as("o"))
      .select(col("word"), col("fw"),
        col("o.i").as("i"), col("o.j").as("j"), col("o.p").as("p"))
    val pf = occs.groupBy(col("p")).agg(sum(col("fw")).as("f"))
    val vocab = pf
      .filter(length(col("p")) >= 2)
      .orderBy(col("f").desc, col("p"))
      .limit(vocabTopK)
      .unionByName(pf.filter(length(col("p")) === 1))
    // (word, i, j) is unique by construction — no dedup needed before
    // the vocab equi-join on the piece key
    val ew = occs
      .select(col("word"), col("i"), col("j"), col("p"))
      .join(vocab, Seq("p"))
      .groupBy(col("word"))
      .agg(collect_list(struct(col("i"), col("j"), col("f"), col("p")))
        .as("edges"))
    val dp = words
      .join(ew, Seq("word"))
      .withColumn("wlen", length(col("word")))
      .withColumn("best", expr(
        """aggregate(
          |  sequence(1, wlen),
          |  array(named_struct('np', CAST(0 AS BIGINT),
          |                     'nsf', CAST(0 AS BIGINT), 'seg', '')),
          |  (acc, jj) -> concat(acc, array(
          |    array_min(transform(
          |      filter(edges, e -> e.j = jj),
          |      e -> named_struct(
          |        'np', element_at(acc, e.i + 1).np + CAST(1 AS BIGINT),
          |        'nsf', element_at(acc, e.i + 1).nsf - e.f,
          |        'seg', CASE WHEN e.i = 0 THEN e.p
          |               ELSE concat(element_at(acc, e.i + 1).seg, '|', e.p)
          |               END))))),
          |  acc -> element_at(acc, wlen + 1))""".stripMargin))
    dp.select(col("word"), col("fw").as("f_w"),
        col("wlen").cast("long").as("word_len"),
        col("best.np").as("n_pieces"),
        (-col("best.nsf")).as("piece_freq_sum"),
        col("best.seg").as("segmentation"))
      .orderBy(col("f_w").desc, col("word"))
      .limit(k)
      .orderBy(col("f_w").desc, col("word"))
  }

  def unigramSegmentOracleSql(
      vocabTopK: Int = 256,
      maxWordLen: Int = 16,
      maxPieceLen: Int = 6,
      k: Int = 50): String = {
    // every b{t} is referenced twice by b{t+1} (pass-through UNION ALL +
    // the DP join); without MATERIALIZED DuckDB inlines the chain into a
    // 2^maxWordLen-leaf plan tree (observed: "Too many open files")
    val steps = (1 to maxWordLen).map { t =>
      s"""b$t AS MATERIALIZED (
         |  SELECT * FROM b${t - 1}
         |  UNION ALL
         |  SELECT word, $t AS pos, s.np, s.nsf, s.seg FROM (
         |    SELECT e.word,
         |      min({'np': b.np + 1, 'nsf': b.nsf - e.f,
         |           'seg': CASE WHEN e.i = 0 THEN e.p
         |                  ELSE b.seg || '|' || e.p END}) AS s
         |    FROM edges e JOIN b${t - 1} b
         |      ON b.word = e.word AND b.pos = e.i
         |    WHERE e.j = $t
         |    GROUP BY e.word))""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |words AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS fw FROM toks
       |  WHERE length(word) BETWEEN 1 AND $maxWordLen GROUP BY 1),
       |occ1 AS (SELECT word, fw,
       |  unnest(flatten(list_transform(range(0, length(word)),
       |    i -> list_transform(
       |      range(1, least($maxPieceLen, length(word) - i) + 1),
       |      L -> {'i': i, 'j': i + L,
       |            'p': substr(word, (i + 1)::INT, L::INT)})))) AS o
       |  FROM words),
       |occs AS (SELECT word, fw, o.i AS i, o.j AS j, o.p AS p FROM occ1),
       |pf AS (SELECT p, CAST(sum(fw) AS BIGINT) AS f FROM occs GROUP BY 1),
       |vocab AS (
       |  SELECT p, f FROM (
       |    SELECT p, f FROM pf WHERE length(p) >= 2
       |    ORDER BY f DESC, p LIMIT $vocabTopK)
       |  UNION ALL
       |  SELECT p, f FROM pf WHERE length(p) = 1),
       |edges AS MATERIALIZED (
       |  SELECT o.word, o.i, o.j, o.p, v.f
       |  FROM occs o JOIN vocab v ON o.p = v.p),
       |b0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS pos,
       |  CAST(0 AS BIGINT) AS np, CAST(0 AS BIGINT) AS nsf, '' AS seg
       |  FROM words),
       |$steps
       |SELECT w.word, w.fw AS f_w,
       |  CAST(length(w.word) AS BIGINT) AS word_len,
       |  CAST(b.np AS BIGINT) AS n_pieces,
       |  CAST(-b.nsf AS BIGINT) AS piece_freq_sum,
       |  b.seg AS segmentation
       |FROM words w JOIN b$maxWordLen b
       |  ON b.word = w.word AND b.pos = length(w.word)
       |ORDER BY f_w DESC, w.word LIMIT $k""".stripMargin
  }
}
