package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: tokenization,
  * quality scoring, language ID, token statistics, fingerprinting.
  *
  * Everything here is per-row columnar computation (array functions inside
  * whole-stage codegen, no UDFs, no shuffle except the explicit global
  * histogram) — the shape that scans 100 TB at parquet speed.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count as BIGINT — THE tokenizer-count definition,
    * single-sourced because it must stay aligned with the DuckDB oracle
    * fragment `len(string_split(text, ' '))` at every call site.
    */
  def wsTokenCount(text: Column): Column = size(tokens(text)).cast("long")

  // ---- WordPiece (greedy longest-match subword tokenization) --------------

  /** Fixed WordPiece vocabulary (Wu et al. 2016 / BERT's tokenizer):
    * every lowercase letter (so no word is untokenizable) plus multi-char
    * pieces. Continuations emit with the `##` marker; the same piece set
    * serves both positions. Single-sourced: the Spark fold and the DuckDB
    * recursive-CTE oracle both derive from THIS list.
    */
  val wordpieceVocab: Seq[String] =
    ('a' to 'z').map(_.toString) ++ Seq(
      "spark", "data", "join", "merge", "stream", "batch", "wind", "ow",
      "qu", "ery", "cust", "omer", "tab", "le", "th", "er", "ing", "an",
      "ar", "or", "st", "ta", "sc", "row", "key", "val", "ue")

  /** Greedy longest-match encode of one word as a SQL-expression fold:
    * at each step take the LONGEST vocab piece prefixing the remainder
    * (unique — two same-length prefixes of the same string are equal),
    * mark continuations with `##`, emit `[UNK]` and stop if nothing
    * matches. The fold unrolls over sequence(1, maxLen); a finished word
    * passes through untouched. Pure codegen'd array expressions — no UDF.
    */
  private def wordpieceExpr(wordCol: String, maxLen: Int = 16): String = {
    val vocabArr = wordpieceVocab.map(v => s"'$v'").mkString("array(", ", ", ")")
    val best = s"aggregate(filter($vocabArr, v -> startswith(acc.rem, v)), " +
      "'', (b, v) -> if(length(v) > length(b), v, b))"
    // `best` (a 53-entry vocab scan) is bound ONCE per step by folding a
    // single-element array — the earlier inline form evaluated it 4x per
    // step (measured ~4x the whole query's cost at sf0.1)
    s"""aggregate(
       |  sequence(1, $maxLen),
       |  named_struct('rem', $wordCol, 'out',
       |               cast(array() as array<string>)),
       |  (acc, i) -> if(acc.rem = '', acc,
       |    aggregate(array($best), acc, (a, b) ->
       |      if(b = '',
       |        named_struct('rem', '',
       |                     'out', concat(a.out, array('[UNK]'))),
       |        named_struct(
       |          'rem', substr(a.rem, length(b) + 1),
       |          'out', concat(a.out, array(
       |            if(size(a.out) = 0, b, concat('##', b)))))))),
       |  acc -> acc.out)""".stripMargin
  }

  /** Corpus subword frequencies under the greedy WordPiece encode.
    *
    * Scale shape: tokenize each DISTINCT word once — the encode cost is
    * O(|corpus vocabulary| × word length × |piece vocab|), bounded by the
    * language, not the corpus — then weight by the word-frequency frame.
    * The corpus itself is touched once (the word-count explode); 100 TB
    * changes the weights, not the tokenization work.
    */
  def wordpieceTokenCounts(documents: DataFrame): DataFrame = {
    val wc = documents
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
    wc
      .withColumn("pieces", expr(wordpieceExpr("w")))
      .select(explode(col("pieces")).as("token"), col("c"))
      .groupBy(col("token"))
      .agg(sum(col("c")).as("n"))
      .orderBy(col("token"))
  }

  /** The hot-path variant: same word-count reduction, but the encode is
    * the native [[WordpieceEncode]] expression (one ≤|vocab| prefix scan
    * per piece) instead of the interpreted 16-step HOF fold — identical
    * output for words of ≤16 pieces (all real words; the fold truncates
    * past 16 where the native loop, like the oracle's recursive CTE,
    * runs to completion), equality-spec-pinned in WordpieceSpec.
    */
  def wordpieceTokenCountsNative(documents: DataFrame): DataFrame = {
    val wc = documents
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
    wc
      .select(explode(GraftColumns.wordpieceEncode(col("w"), wordpieceVocab))
        .as("token"), col("c"))
      .groupBy(col("token"))
      .agg(sum(col("c")).as("n"))
      .orderBy(col("token"))
  }

  /** DuckDB replay: recursive CTE peeling the longest matching piece per
    * step — the max-length prefix is recovered as substr(rem, 1, blen),
    * needing no argmax join (same-length prefix matches are identical).
    */
  def wordpieceOracleSql: String = {
    val vocabValues = wordpieceVocab.map(v => s"('$v')").mkString(", ")
    s"""WITH RECURSIVE
       |vocab(piece) AS (VALUES $vocabValues),
       |words AS (
       |  SELECT DISTINCT unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |wc AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY 1),
       |steps(w, rem, idx, piece) AS (
       |  SELECT w, w, 0, CAST(NULL AS VARCHAR) FROM words
       |  UNION ALL
       |  SELECT s.w,
       |    CASE WHEN s.blen IS NULL THEN '' ELSE substr(s.rem, s.blen + 1)
       |      END,
       |    s.idx + 1,
       |    CASE WHEN s.blen IS NULL THEN '[UNK]'
       |         WHEN s.idx = 0 THEN substr(s.rem, 1, s.blen)
       |         ELSE '##' || substr(s.rem, 1, s.blen) END
       |  FROM (SELECT st.w, st.rem, st.idx,
       |          CAST(max(length(v.piece)) AS INTEGER) AS blen
       |        FROM steps st
       |        LEFT JOIN vocab v ON starts_with(st.rem, v.piece)
       |        WHERE st.rem <> '' GROUP BY 1, 2, 3) s)
       |SELECT st.piece AS token, CAST(sum(wc.c) AS BIGINT) AS n
       |FROM steps st JOIN wc ON wc.w = st.w
       |WHERE st.piece IS NOT NULL
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Per-document stats + a composite quality score (length, lexical
    * diversity, stopword presence — the standard cheap quality heuristics).
    * All doubles are IEEE ops on integer-derived operands: bit-deterministic.
    */
  def docStats(documents: DataFrame, stopwords: Seq[String]): DataFrame = {
    val toks = tokens(col("text"))
    val tokenCount = size(toks).cast("long")
    val charCount = length(col("text")).cast("long")
    val distinctTokens = size(array_distinct(toks)).cast("long")
    val stopCount = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
    documents.select(
        col("doc_id"), col("lang"), col("source"),
        charCount.as("char_count"),
        tokenCount.as("token_count"),
        distinctTokens.as("distinct_token_count"),
        (distinctTokens / tokenCount).as("distinct_ratio"),
        (stopCount / tokenCount).as("stopword_ratio"),
        (least(tokenCount / lit(50.0), lit(1.0)) * lit(0.5)
          + (distinctTokens / tokenCount) * lit(0.3)
          + (stopCount / tokenCount) * lit(0.2)).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Count-Min sketch parameters and hash family — shared between the
    * Spark pipeline and the machine-generated DuckDB oracle
    * (graft.SketchOracles). Row d's bucket for token t is
    * mix64(fnv1a64(t) ^ seed(d)) & (width-1): ONE string hash per token,
    * then a splitmix64 mix per row — the same public, cross-engine-
    * emulatable family as the MinHash permutations.
    */
  val CmsDepth = 4
  val CmsWidth = 2048
  def cmsSeeds(depth: Int = CmsDepth): Array[Long] =
    Array.tabulate(depth)(d => Mix64.mix((d + 1) * 0x9E3779B97F4A7C15L))

  /** Heavy hitters via Count-Min sketch next to the exact counts: the
    * sketch path for corpus-scale token frequency (constant memory:
    * depth x width counters regardless of vocabulary) beside the exact
    * histogram it replaces. Output rows carry BOTH values, so every row
    * self-checks the CMS guarantee: exact <= estimate <= exact + eps*N,
    * eps = e/width (one-sided error; asserted in PropertySpec) — and the
    * whole sketch has a full DuckDB oracle.
    *
    * The counter table is built RELATIONALLY: bucket counts are summed
    * from the exact per-token histogram, which is IDENTICAL to
    * incrementing counters per token occurrence (counter addition
    * commutes and associates), so the depth x width frame below IS the
    * Count-Min sketch of the token stream — built distributed with
    * map-side combine. At production scale the counters would be built
    * straight from the token stream (same groupBy, no histogram); here
    * the histogram exists anyway for the exact self-check column.
    * Estimates attach to the top-k rows via a join against the bounded
    * counter frame and a min over depth rows — no driver-side collect
    * (the previous shape pulled k rows to the driver to probe a
    * driver-local sketch object).
    */
  def tokenTopkCms(
      documents: DataFrame,
      k: Int = 20,
      depth: Int = CmsDepth,
      width: Int = CmsWidth): DataFrame = {
    require(Integer.bitCount(width) == 1, s"width must be a power of two: $width")
    import graft.functions.GraftColumns.{fnv1a64, mix64}
    val seeds = cmsSeeds(depth)
    def bucketed(df: DataFrame): DataFrame = df
      .select(col("token"), col("exact_count"),
        explode(array((0 until depth).map(lit): _*)).as("d"))
      .withColumn("bucket",
        mix64(fnv1a64(col("token"))
            .bitwiseXOR(element_at(array(seeds.map(lit).toIndexedSeq: _*), col("d") + 1)))
          .bitwiseAND(lit((width - 1).toLong)))
    val counts = documents
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("exact_count"))
    val counters = bucketed(counts)
      .groupBy(col("d"), col("bucket"))
      .agg(sum(col("exact_count")).as("counter"))
    // top-k first (TakeOrdered, bounded), then re-bucket the k rows and
    // min-join the sketch — k*depth probe rows against depth*width cells
    val top = counts.orderBy(desc("exact_count"), asc("token")).limit(k)
    bucketed(top)
      .join(counters, Seq("d", "bucket"))
      .groupBy(col("token"), col("exact_count"))
      .agg(min(col("counter")).as("cms_estimate"))
      .orderBy(desc("exact_count"), asc("token"))
  }

  /** Repetition signals (Gopher-style quality filters, Rae et al. 2021
    * §A1.1): top-token fraction and duplicate n-gram fractions — the cheap
    * detectors for boilerplate/degenerate text that a curation pipeline
    * gates on before training.
    *
    * Distinct n-gram counts ride the native [[WordShingles]] expression
    * (codegen, per-row). The max token frequency is the one signal that
    * needs a frequency table, computed DISTRIBUTED (explode → two-level
    * aggregate with map-side combine, shuffle keyed on (doc_id, token) —
    * never a per-row quadratic loop and never driver state), then joined
    * back on doc_id. All fractions are IEEE ops on integer-derived
    * operands: bit-deterministic.
    */
  def repetitionStats(documents: DataFrame): DataFrame = {
    val base = documents.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("token_count"),
      size(GraftColumns.wordShingles(col("text"), 2)).cast("long").as("d2"),
      size(GraftColumns.wordShingles(col("text"), 3)).cast("long").as("d3"))
    val maxFreq = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("max_token_freq"))
    base.join(maxFreq, "doc_id")
      .select(
        col("doc_id"), col("token_count"), col("max_token_freq"),
        (col("max_token_freq") / col("token_count")).as("top_token_fraction"),
        when(col("token_count") > 1,
          lit(1.0) - col("d2") / (col("token_count") - 1))
          .otherwise(lit(0.0)).as("dup_2gram_fraction"),
        when(col("token_count") > 2,
          lit(1.0) - col("d3") / (col("token_count") - 2))
          .otherwise(lit(0.0)).as("dup_3gram_fraction"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID by marker-word counting (the classic cheap n-gram/stopword
    * heuristic): count hits from small per-language marker sets, take the
    * argmax with a fixed priority order, 'und' when no marker hits.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "y"))

  def langId(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    def hits(lang: String): Column =
      size(filter(toks, t => t.isin(langMarkers(lang): _*))).cast("long")
    val (en, de, fr, es) = (hits("en"), hits("de"), hits("fr"), hits("es"))
    val pred = when(en > 0 && en >= de && en >= fr && en >= es, "en")
      .when(de > 0 && de >= fr && de >= es, "de")
      .when(fr > 0 && fr >= es, "fr")
      .when(es > 0, "es")
      .otherwise("und")
    documents.select(
        col("doc_id"), col("lang"),
        pred.as("lang_pred"),
        (col("lang") === pred).cast("int").as("agrees"))
      .orderBy(col("doc_id"))
  }

  /** Confusion matrix + per-class recall for [[langId]] against the
    * labeled `lang` column — the eval table a language-filter stage
    * publishes before anyone trusts its routing (a 0.99-accuracy
    * classifier that shunts all Basque into 'es' looks fine in the
    * scalar, and indicts itself here). Exact integers; recall_ppm is a
    * floor DIV against the actual-class row total.
    *
    * Scale: [[langId]] is scan-shaped; the matrix is one hash aggregate
    * to |langs|² rows and a window over that bounded frame.
    */
  def langidConfusion(documents: DataFrame): DataFrame = {
    val cells = langId(documents)
      .groupBy(col("lang").as("actual"), col("lang_pred").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
    val byActual = org.apache.spark.sql.expressions.Window
      .partitionBy(col("actual"))
    cells
      .withColumn("actual_total", sum(col("n_docs")).over(byActual))
      .select(col("actual"), col("predicted"), col("n_docs"),
        col("actual_total"),
        expr("n_docs * 1000000 DIV actual_total").as("recall_ppm"),
        (col("actual") === col("predicted")).as("is_correct"))
      .orderBy(col("actual"), col("predicted"))
  }

  def langidConfusionOracleSql: String =
    """WITH h AS (SELECT doc_id, lang,
      |  len(list_filter(string_split(text,' '), x -> x IN ('the','and','of'))) AS en,
      |  len(list_filter(string_split(text,' '), x -> x IN ('der','die','und'))) AS de,
      |  len(list_filter(string_split(text,' '), x -> x IN ('le','la','et'))) AS fr,
      |  len(list_filter(string_split(text,' '), x -> x IN ('el','los','y'))) AS es
      |FROM documents),
      |p AS (SELECT doc_id, lang,
      |  CASE WHEN en > 0 AND en >= de AND en >= fr AND en >= es THEN 'en'
      |       WHEN de > 0 AND de >= fr AND de >= es THEN 'de'
      |       WHEN fr > 0 AND fr >= es THEN 'fr'
      |       WHEN es > 0 THEN 'es' ELSE 'und' END AS lang_pred
      |FROM h),
      |cells AS (
      |  SELECT lang AS actual, lang_pred AS predicted,
      |    CAST(count(*) AS BIGINT) AS n_docs
      |  FROM p GROUP BY 1, 2),
      |tot AS (
      |  SELECT *, CAST(sum(n_docs) OVER (PARTITION BY actual) AS BIGINT)
      |    AS actual_total
      |  FROM cells)
      |SELECT actual, predicted, n_docs, actual_total,
      |  n_docs * 1000000 // actual_total AS recall_ppm,
      |  (actual = predicted) AS is_correct
      |FROM tot ORDER BY actual, predicted""".stripMargin

  /** Corpus-level token histogram (the vocabulary-building step of a
    * BPE-style tokenizer pipeline). One explode + one hash aggregation;
    * partial aggregation makes the shuffle carry only per-partition
    * (token, count) pairs — bounded by vocabulary size, not corpus size.
    */
  def tokenHistogram(documents: DataFrame): DataFrame =
    documents
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("occurrences"))
      .orderBy(desc("occurrences"), asc("token"))

  /** Length-bucket packing audit — the padding-efficiency table a training
    * pipeline reviews when batching variable-length documents: docs are
    * assigned to power-of-two token-length buckets and each bucket reports
    * the token mass it would pad to. The bucket is an integer CASE chain
    * (never `ceil(log2(x))` — float log at exact powers of two is an
    * engine-dependent coin flip); `waste_frac` is one division of exact
    * BIGINTs, bit-deterministic cross-engine. Map-side combine bounds the
    * shuffle at partitions x buckets rows.
    */
  /** The padding length bucket of a token count — ONE spelling shared by
    * [[lengthBuckets]] and the distribution-matching samplers
    * ([[graft.operators.Mixture.distMatchedSample]] and its streaming
    * twin); the DuckDB CASE in SketchOracles.distMatchedCtes and the
    * length_buckets oracle mirror it boundary for boundary.
    */
  def lengthBucket(t: Column): Column =
    when(t <= 16, 16)
      .when(t <= 32, 32)
      .when(t <= 64, 64)
      .when(t <= 128, 128)
      .when(t <= 256, 256)
      .when(t <= 512, 512)
      .when(t <= 1024, 1024)
      .otherwise(2048)

  def lengthBuckets(documents: DataFrame): DataFrame = {
    val t = wsTokenCount(col("text"))
    val bucket = lengthBucket(t)
    documents
      .select(bucket.cast("int").as("bucket"), t.as("tokens"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("sum_tokens"))
      .withColumn("padded_tokens", col("bucket").cast("long") * col("n_docs"))
      .withColumn("waste_frac",
        (col("padded_tokens") - col("sum_tokens")).cast("double")
          / col("padded_tokens").cast("double"))
      .orderBy(col("bucket"))
  }

  /** Inverted-index construction: per token its document frequency, total
    * term frequency, and a capped posting list (top-`k` docs by tf, doc_id
    * tie-break) serialized as `doc:tf` pairs. Two keyed aggregations with
    * map-side combine — the (token, doc) frame is the explode bounded by
    * sum-of-doc-lengths, the token frame by vocabulary. The posting list is
    * collected UNORDERED (collect_list order is partition-dependent) and
    * totally ordered inside the row by array_sort on (-tf, doc_id) structs,
    * so the output is deterministic under any partitioning.
    */
  def tokenPostings(documents: DataFrame, k: Int = 5): DataFrame =
    documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        array_join(
          transform(
            slice(
              array_sort(collect_list(struct((-col("tf")).as("ntf"), col("doc_id").as("d")))),
              1, k),
            s => concat(
              s.getField("d").cast("string"), lit(":"),
              (-s.getField("ntf")).cast("string"))),
          ",").as("top_postings"))
      .orderBy(col("token"))

  /** Positional-postings phrase search — the IR split a search engine
    * actually runs: build a positional index once (token → doc →
    * sorted positions), then evaluate a phrase query INDEX-ONLY by
    * intersecting shifted position lists, never rescanning documents.
    * The query here is the corpus's most frequent word bigram (argmax
    * pinned by count DESC, then lexicographic), so the query itself is
    * data-derived and deterministic.
    *
    * Scale: the index build is one explode + groupBy (the same shuffle
    * any inverted index costs); query evaluation touches only the two
    * posting lists (filter pushed to the token key), joins them on
    * doc_id, and counts matches with one array intersect — work
    * proportional to the posting lists, not the corpus. The oracle
    * recomputes occurrences by direct adjacent-pair scan; index
    * evaluation and rescan must agree exactly.
    */
  def phraseSearch(documents: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    // query selection: ONE corpus pass folding bigrams into the
    // vocab²-bounded count frame; the argmax is a single row, resolved
    // to the driver (bounded by construction — same discipline as the
    // ANN sample fits) so the query terms prune the index build below
    val topRow = documents
      .select(explode(zip_with(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1"), col("w2")).limit(1)
      .select(col("w1"), col("w2"))
      .collect()
    if (topRow.isEmpty) return documents.sparkSession.emptyDataFrame
      .select(lit(0L).as("doc_id"), lit("").as("w1"), lit("").as("w2"),
        lit(0L).as("occurrences"))
    val (w1, w2) = (topRow.head.getString(0), topRow.head.getString(1))
    // index evaluation: the posting build is pruned to the two query
    // tokens BEFORE the groupBy (predicate on the explode output — at
    // scale this is the read path of a persisted inverted index)
    val postings = documents
      .select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "token")))
      .filter(col("token").isin(w1, w2))
      .groupBy(col("token"), col("doc_id"))
      .agg(array_sort(collect_list(col("pos"))).as("ps"))
    val h1 = postings.filter(col("token") === w1)
      .select(col("doc_id"), col("ps").as("ps1"))
    val h2 = postings.filter(col("token") === w2)
      .select(col("doc_id").as("doc_id2"), col("ps").as("ps2"))
    h1.join(h2, col("doc_id") === col("doc_id2"))
      .select(col("doc_id"), lit(w1).as("w1"), lit(w2).as("w2"),
        size(array_intersect(
          transform(col("ps1"), p => p + 1), col("ps2")))
          .cast("long").as("occurrences"))
      .filter(col("occurrences") > 0)
      .orderBy(col("doc_id"))
  }

  def phraseSearchOracleSql: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
      |              unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
      |       FROM tk),
      |cnt AS (SELECT w1, w2, count(*) AS n FROM bg GROUP BY 1, 2),
      |q AS (SELECT w1, w2 FROM cnt ORDER BY n DESC, w1, w2 LIMIT 1),
      |hits AS (SELECT tk.doc_id, q.w1, q.w2,
      |  CAST(len(list_filter(range(1, len(t)),
      |    i -> t[i] = q.w1 AND t[i+1] = q.w2)) AS BIGINT) AS occurrences
      |  FROM tk, q)
      |SELECT doc_id, w1, w2, occurrences FROM hits
      |WHERE occurrences > 0
      |ORDER BY doc_id""".stripMargin

  /** Document fingerprints via the native [[RollingHash]] expression.
    * Verified against an independent pure-SQL fold in the DuckDB oracle.
    */
  def fingerprints(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), GraftColumns.rollingHash(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** String-normalization pipeline: lower/trim/whitespace-collapse with a
    * fixed-length preview, plus a consonant count (regexp_replace is
    * replace-all in Spark; the DuckDB oracle needs the explicit 'g' flag).
    */
  def normalizePreview(documents: DataFrame): DataFrame =
    documents.select(
        col("doc_id"),
        substring(regexp_replace(lower(trim(col("text"))), " +", " "), 1, 40)
          .as("preview"),
        length(regexp_replace(col("text"), "[aeiou]", "")).cast("long")
          .as("consonant_chars"))
      .orderBy(col("doc_id"))

  /** Corpus-trained bigram-LM negative log-likelihood per document — the
    * CCNet-style (Wenzek et al. 2020) perplexity quality signal: documents
    * whose token transitions are improbable under the corpus's own bigram
    * statistics score high (degenerate/outlier text), low NLL means typical
    * text. Add-one smoothing over the observed vocabulary:
    * p(w2|w1) = (C(w1,w2) + 1) / (C(w1,·) + V), with C(w1,·) the count of
    * bigrams starting with w1 and V the corpus vocabulary size, so the
    * conditional sums to 1 over the vocabulary.
    *
    * Distributed shape: per-doc DISTINCT-bigram counts (multiplicity kept as
    * a count column, so the model join touches each (doc, bigram) once, not
    * once per occurrence), one equi-join to the corpus bigram counts and one
    * to the context counts — both map-side-combined aggregates bounded by
    * vocabulary², not corpus size. V rides a 1-row broadcast. The bigram
    * pairing is two array slices zipped per row (no per-element re-split,
    * no self-join on position). NLL is rounded to 4 decimals: the only
    * cross-engine float hazards are ln() (<=1 ulp) and the ~60-term
    * sum order, both ~1e-13 relative — far inside the rounding grid.
    */
  def bigramNll(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks)
    val bigrams = arrays_zip(
      slice(toks, lit(1), n - 1).as("w1"),
      slice(toks, lit(2), n - 1).as("w2"))
    val bi = documents
      .select(col("doc_id"), explode(bigrams).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // One explode pass, and the model counts as count-only WINDOWS over
    // the per-doc frame (sum of per-doc counts == count of occurrences)
    // instead of groupBy+join-back — the join formulation re-derives the
    // aggregate subtree per side (same reasoning as crossDocNgramOverlap
    // and tfidf df). Window sums of longs are integer-exact.
    val docBi = bi.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_doc"))
    val vocab = documents
      .select(explode(toks).as("w")).agg(countDistinct(col("w")).as("v"))
    import org.apache.spark.sql.expressions.Window
    docBi
      .withColumn("c12",
        sum(col("c_doc")).over(Window.partitionBy(col("w1"), col("w2"))))
      .withColumn("c1",
        sum(col("c_doc")).over(Window.partitionBy(col("w1"))))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c_doc")).as("n_bigrams"),
        count(lit(1)).as("distinct_bigrams"),
        sum(col("c_doc") * log((col("c1") + col("v")) / (col("c12") + 1)))
          .as("nll_sum"))
      .select(
        col("doc_id"), col("n_bigrams"), col("distinct_bigrams"),
        round(col("nll_sum") / col("n_bigrams"), 4).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF top terms per document (sklearn-style smooth idf:
    * ln((N+1)/(df+1)) + 1): the keyword-extraction / relevance-weighting
    * step of a curation pipeline. Term frequencies and document frequencies
    * are two map-side-combined aggregates (bounded by |vocab| and
    * |doc x distinct-term|); N rides a 1-row broadcast; top-k per doc is a
    * row_number window over the per-doc term list — partitioned by doc_id,
    * so no global sort and no skew (per-doc term counts are document-sized).
    * Ties broken by term ascending; distinct (tf, df) pairs give scores
    * separated far beyond the 1-ulp ln() cross-engine drift.
    */
  def tfidfTopTerms(documents: DataFrame, k: Int = 3): DataFrame = {
    val termCounts = graft.operators.Layout.widen(documents)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n"),
        explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("n"), col("term"))
      .agg(count(lit(1)).as("tf_count"))
    val total = documents.agg(count(lit(1)).as("n_docs"))
    // df via a count-only window over term (one shuffle), not
    // groupBy+join-back (which re-derives the explode+aggregate subtree
    // for the join side — same reasoning as Dedup.crossDocNgramOverlap)
    val scored = termCounts
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("term"))))
      .crossJoin(broadcast(total))
      .withColumn("score",
        (col("tf_count") / col("n")) *
          (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf_count"),
        col("df"), round(col("score"), 6).as("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** PII redaction: scrub emails / phone numbers / IPv4 addresses with typed
    * placeholders and count what was removed — the scrubbing pass every
    * training corpus goes through before release. Pure per-row regex work
    * (codegen'd string expressions, no shuffle, no UDF) — scans at parquet
    * speed at any corpus size.
    *
    * The harness corpus is synthetic word soup with no PII, so the query
    * plants deterministic doc_id-derived contact strings first (emails on
    * docs not divisible by 3, a second email on multiples of 5, phones on
    * multiples of 4, IPs on multiples of 7) — hit counts vary 0..2 per
    * category and the redaction path is exercised on every row. Patterns
    * stay in the Java-regex ∩ RE2 common subset so the DuckDB oracle runs
    * them verbatim (with the 'g' flag — DuckDB replaces first-match only
    * by default, Spark replaces all).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+1-\\d{3}-\\d{4}"
  val Ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"

  def piiRedact(documents: DataFrame): DataFrame = {
    val id = col("doc_id")
    def s(c: Column): Column = c.cast("string")
    val aug = concat(
      col("text"),
      when(id % 3 =!= 0,
        concat(lit(" reach me at user"), s(id), lit("@mail.example")))
        .otherwise(lit("")),
      when(id % 5 === 0,
        concat(lit(" backup bob.smith+"), s(id), lit("@corp.example.com")))
        .otherwise(lit("")),
      when(id % 4 === 0,
        concat(lit(" call +1-"), lpad(s(id % 1000), 3, "0"), lit("-"),
          lpad(s(id % 10000), 4, "0")))
        .otherwise(lit("")),
      when(id % 7 === 0,
        concat(lit(" node 10."), s(id % 256), lit(".0."), s((id * 7) % 256)))
        .otherwise(lit("")))
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(aug, EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]"),
        Ipv4Re, "[IP]")
    documents
      .select(col("doc_id"), aug.as("aug"), redacted.as("redacted"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("aug"), lit(EmailRe), lit(0)))
          .cast("long").as("email_hits"),
        size(regexp_extract_all(col("aug"), lit(PhoneRe), lit(0)))
          .cast("long").as("phone_hits"),
        size(regexp_extract_all(col("aug"), lit(Ipv4Re), lit(0)))
          .cast("long").as("ip_hits"),
        md5(col("redacted")).as("redacted_md5"),
        expr("right(redacted, 60)").as("redacted_tail"))
      .orderBy(col("doc_id"))
  }

  /** Per-language rollup over document metadata. */
  def langStats(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("doc_count"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")) / count(lit(1))).as("avg_chars"),
        countDistinct(col("source")).as("source_count"))
      .orderBy(col("lang"))

  /** Sequence packing (concat-and-chunk): the pretraining step that lays
    * documents head-to-tail per source (ordered by doc_id) and cuts the
    * token stream every `binTokens` tokens. Each document's token span
    * [cumsum - tokens, cumsum) is exploded over the bins it touches
    * (`sequence(first_bin, last_bin)` — a doc adds tokens/binTokens + 1
    * rows at most, so the explode is output-bounded, not input-bounded) and
    * per (source, bin) we report docs touching, docs starting, and the
    * exact token fill. Every interior bin must fill to exactly `binTokens`
    * — an invariant the spec asserts. The prefix sum is one
    * shuffle+sort per source; at cluster scale the same contract runs as a
    * two-pass range-partitioned prefix sum (per-partition subtotals
    * broadcast back), which SCALING.md files under embarrassingly-scalable
    * windows.
    */
  def tokenPackBins(documents: DataFrame, binTokens: Int = 2048): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = documents
      .select(col("source"), col("doc_id"), wsTokenCount(col("text")).as("tokens"))
      .withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("first_tok", col("cum") - col("tokens"))
      .withColumn("last_tok", col("cum") - 1)
    spans
      .withColumn("bin",
        explode(sequence(
          expr(s"first_tok DIV $binTokens"), expr(s"last_tok DIV $binTokens"))))
      .groupBy(col("source"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(expr(s"first_tok DIV $binTokens") === col("bin"), 1L)
          .otherwise(0L)).as("n_starting"),
        sum(
          least(col("last_tok"), (col("bin") + 1) * binTokens - 1) -
            greatest(col("first_tok"), col("bin") * binTokens) + 1
        ).as("fill_tokens"))
      .orderBy(col("source").asc_nulls_last, col("bin"))
  }

  /** BPE merge-candidate counting — the TRAINING step of byte-pair
    * encoding (Sennrich et al. 2016): corpus-weighted counts of adjacent
    * symbol pairs, whose argmax is the next merge rule
    * (`token_counts_bpe` is the inference side — applying fixed merges).
    *
    * Scale shape: the corpus collapses to the word-frequency table FIRST
    * (one token explode + one vocabulary-bounded aggregate — the only
    * corpus-sized work), and the character-pair explode runs on DISTINCT
    * words only, weighted by their frequencies. At 100 TB the pair
    * counting is vocabulary-side arithmetic, not corpus-side — the
    * standard map-reduce BPE formulation. The higher-order char-pair
    * lambda runs interpreted, which is fine precisely because its input is
    * the vocabulary, not the corpus (the inverse of the WordShingles
    * trade).
    */
  def bpePairCounts(documents: DataFrame, k: Int = 20): DataFrame = {
    val wordFreq = documents
      .select(explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    wordFreq
      .select(col("freq"), explode(
        transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("pair_count"))
      .orderBy(desc("pair_count"), asc("pair"))
      .limit(k)
  }

  /** Quality-classifier inference — a fixed-weight logistic model over the
    * cheap per-document features (length, stopword ratio, lexical
    * diversity), the fastText-style keep/drop gate of a curation pipeline
    * with the trained weights pinned as constants. Per-row codegen'd
    * arithmetic, zero shuffle. Determinism: features are exact rationals of
    * integer counts; z is a fixed short sequence of IEEE ops; exp() may
    * differ by 1 ulp across engines, so the score is rounded to 4 decimals
    * (same grid argument as [[bigramNll]]) and the keep flag compares the
    * ROUNDED score, never the raw one.
    */
  def qualityLogit(documents: DataFrame, stopwords: Seq[String]): DataFrame = {
    val toks = tokens(col("text"))
    val tokenCount = size(toks).cast("long")
    val stopRatio =
      size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / tokenCount
    val distinctRatio = size(array_distinct(toks)).cast("double") / tokenCount
    // w = (bias, tokens/100, stopword_ratio, distinct_ratio)
    val z = lit(-1.5) + (tokenCount / lit(100.0)) * lit(0.8) +
      stopRatio * lit(-3.0) + distinctRatio * lit(2.0)
    documents.select(
        col("doc_id"),
        tokenCount.as("token_count"),
        round(stopRatio, 6).as("stopword_ratio"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 4).as("quality_score"))
      .withColumn("keep", col("quality_score") >= 0.5)
      .orderBy(col("doc_id"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    * SIGMOD'03 — the MOSS algorithm): hash every character `k`-gram, then
    * in each sliding window of `w` consecutive hashes select the minimum,
    * ties to the RIGHTMOST position; the distinct selected (position,
    * hash) pairs are the document's fingerprints. Winnowing guarantees
    * any shared substring of length >= k+w-1 yields at least one shared
    * fingerprint — the local sampling property plain 0-mod-p hash
    * sampling lacks — which is why plagiarism/near-dup detectors sample
    * this way instead of keeping all k-gram hashes (density ~2/(w+1)).
    *
    * Declarative construction, no per-partition imperative scan:
    *   1. explode positions, hash each k-gram with the native
    *      [[GraftColumns.fnv1a64]] expression (codegen, public FNV-1a —
    *      the whole pipeline replays bit-exactly in the DuckDB oracle);
    *   2. per-window minimum = a frame window function (`ROWS CURRENT TO
    *      w-1 FOLLOWING`) evaluated at each window start `t <=
    *      max(m-w+1, 1)` (trailing partial windows are not starts; a doc
    *      with fewer than `w` grams gets one clipped window — it still
    *      fingerprints);
    *   3. rightmost-min selection = equi-join back on (doc_id, hash =
    *      window min) with the position-in-window residual, `max(pos)`
    *      per window, then distinct over selected pairs.
    * Everything shuffles on doc_id only and per-doc cost is O(len * w);
    * the checksum folds the selected hashes mod 1e9+7 so the whole
    * fingerprint SET is oracle-comparable as one value per doc.
    * Docs shorter than `k` characters have no k-gram and are excluded
    * (same filter in the oracle).
    *
    * POSITIONING: this declarative spelling is the oracle-replayable
    * REFERENCE implementation (every step is plain SQL an independent
    * engine re-executes); the production hot path is
    * [[winnowFingerprintsNative]] — the [[GraftColumns.winnowStats]]
    * one-pass deque expression, output-identical (equality spec) and
    * ~20x cheaper because nothing explodes and nothing joins. The same
    * declarative-verifier / native-scale-path split as
    * `Dedup.ngramJaccardPairs` vs the MinHash corpus path.
    */
  def winnowFingerprints(
      documents: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    val P = 1000000007L
    val docs = documents
      .filter(length(col("text")) >= k)
      .select(col("doc_id"), col("text"),
        (length(col("text")) - (k - 1)).cast("long").as("m"))
    val perDoc = winnowSelected(documents, k, w)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_fingerprints"),
        expr(s"sum((winmin % $P + $P) % $P) % $P").as("fp_checksum"))
    docs
      .select(col("doc_id"), col("m").as("n_grams"),
        greatest(col("m") - (w - 1), lit(1L)).as("n_windows"))
      .join(perDoc, Seq("doc_id"))
      .select(col("doc_id"), col("n_grams"), col("n_windows"),
        col("n_fingerprints"),
        col("fp_checksum"),
        expr("n_fingerprints * 1000000 DIV n_windows").as("density_ppm"))
      .orderBy(col("doc_id"))
  }

  /** [[winnowFingerprints]] through the NATIVE one-pass expression
    * ([[graft.functions.WinnowStats]]: monotonic-deque sliding minimum,
    * O(len) per doc, no explode/window/join) — identical output by
    * construction (equality spec + the same DuckDB oracle), kept beside
    * the declarative pipeline as the hot-path variant: a map-only scan
    * whose only shuffle is the final ORDER BY.
    */
  def winnowFingerprintsNative(
      documents: DataFrame, k: Int = 8, w: Int = 4): DataFrame =
    documents
      .filter(length(col("text")) >= k)
      .select(col("doc_id"),
        GraftColumns.winnowStats(col("text"), k, w).as("ws"))
      .select(
        col("doc_id"),
        col("ws").getItem(0).as("n_grams"),
        col("ws").getItem(1).as("n_windows"),
        col("ws").getItem(2).as("n_fingerprints"),
        col("ws").getItem(3).as("fp_checksum"),
        expr("ws[2] * 1000000 DIV ws[1]").as("density_ppm"))
      .orderBy(col("doc_id"))

  /** Winnowing-based near-dup candidate generation — the downstream the
    * fingerprints exist FOR: documents sharing at least one selected
    * fingerprint hash become candidate pairs, ranked by how many they
    * share. By the winnowing guarantee, any pair sharing a substring of
    * >= k+w-1 chars appears here (structural recall); the doc-frequency
    * cap on fingerprint hashes (the stop-fingerprint rule, same as the
    * shingle dfCap in `Dedup`) kills boilerplate hubs before the pair
    * join can go quadratic in them. Shuffle discipline: the join carries
    * (doc_id, 8-byte hash) only — positions are dropped and hashes
    * deduped per doc before the self-join. Fingerprinting itself is the
    * NATIVE [[GraftColumns.winnowHashes]] pass (one codegen loop per
    * doc), not the declarative selection pipeline — the hash sets are
    * identical by the [[winnowSelected]] equality spec.
    */
  def winnowCandidatePairs(
      documents: DataFrame, k: Int = 8, w: Int = 4,
      dfCap: Int = 50): DataFrame = {
    val dh = documents
      .filter(length(col("text")) >= k)
      .select(col("doc_id"),
        explode(GraftColumns.winnowHashes(col("text"), k, w)).as("winmin"))
      .distinct()
    val capped = dh
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("winmin"))))
      .filter(col("df").between(2, dfCap))
      .select(col("doc_id"), col("winmin"))
    capped.alias("a")
      .join(capped.alias("b"),
        col("a.winmin") === col("b.winmin") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .orderBy(desc("shared_fps"), col("doc_a"), col("doc_b"))
  }

  /** Cross-source vocabulary overlap matrix: exact Jaccard between the
    * DISTINCT token sets of every source pair — the corpus-composition
    * diagnostic (how lexically redundant are two ingest sources?) that
    * informs mixture weights before any model sees the data. The
    * (source, token) frame is distinct-reduced FIRST, so the pair join
    * is bounded by |vocabulary| x |source pairs|, never by document
    * volume; similarity is an exact ppm fixed point from integer
    * intersection/union counts (inclusion-exclusion on the per-source
    * vocab sizes). At open source counts the same frame feeds a MinHash
    * per source instead (the `Dedup` sketch machinery) — with the
    * harness's 20 sources the exact join IS the scale path.
    */
  def sourceVocabOverlap(documents: DataFrame): DataFrame = {
    val st = documents
      .select(col("source"),
        explode(array_distinct(tokens(col("text")))).as("token"))
      .distinct()
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("n"))
    st.alias("a")
      .join(st.alias("b"),
        col("a.token") === col("b.token") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("source").as("sa"), col("n").as("vocab_a")),
        col("source_a") === col("sa"))
      .join(sizes.select(col("source").as("sb"), col("n").as("vocab_b")),
        col("source_b") === col("sb"))
      .select(col("source_a"), col("source_b"), col("n_common"),
        col("vocab_a"), col("vocab_b"),
        (col("vocab_a") + col("vocab_b") - col("n_common")).as("vocab_union"),
        expr("n_common * 1000000 DIV (vocab_a + vocab_b - n_common)")
          .as("jaccard_ppm"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Train/val/test LEAKAGE audit — the eval-integrity question every
    * training pipeline must answer: how many near-duplicate pairs
    * STRADDLE split boundaries (a test doc with a near-dup in train is a
    * leaked eval). Composes the winnowing candidate pairs with the
    * content-hash split rule (same rolling-hash bucket as `doc_splits`;
    * identical duplicates land in the same split by construction, so
    * every row here is a NEAR-dup that content hashing alone cannot
    * catch — exactly the residual risk class). Output is the split-pair
    * leak matrix with pair counts and shared-fingerprint mass.
    */
  def splitLeakage(documents: DataFrame): DataFrame = {
    val bucket = GraftColumns.rollingHash(col("text")) % 100
    val split = when(bucket < 80, "train")
      .when(bucket < 90, "val").otherwise("test")
    val splits = documents.select(col("doc_id"), split.as("split"))
    winnowCandidatePairs(documents)
      .join(splits.select(col("doc_id").as("da"), col("split").as("split_a")),
        col("doc_a") === col("da"))
      .join(splits.select(col("doc_id").as("db"), col("split").as("split_b")),
        col("doc_b") === col("db"))
      .filter(col("split_a") =!= col("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("shared_fps")).as("total_shared_fps"),
        max(col("shared_fps")).as("max_shared_fps"))
      .orderBy(col("split_a"), col("split_b"))
  }

  /** The selected winnowing fingerprints themselves — one row per distinct
    * (doc, position, hash) selection (see [[winnowFingerprints]] for the
    * algorithm and shuffle shape). Exposed so the guarantee the scheme
    * exists FOR — any shared substring of length >= k+w-1 produces a
    * shared fingerprint hash — is directly testable on the pair frame.
    */
  def winnowSelected(documents: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    val grams = documents
      .filter(length(col("text")) >= k)
      .select(col("doc_id"),
        (length(col("text")) - (k - 1)).cast("long").as("m"),
        col("text"))
      .select(col("doc_id"), col("m"),
        explode(expr("sequence(1L, m)")).as("i"), col("text"))
      .withColumn("h",
        GraftColumns.fnv1a64(col("text").substr(col("i").cast("int"), lit(k))))
      .select(col("doc_id"), col("m"), col("i"), col("h"))
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(0, w - 1)
    val wins = grams
      .withColumn("winmin", min(col("h")).over(frame))
      .filter(col("i") <= greatest(col("m") - (w - 1), lit(1L)))
      .select(col("doc_id"), col("i").as("t"), col("winmin"))
    grams.alias("g")
      .join(wins.alias("tw"),
        col("g.doc_id") === col("tw.doc_id") &&
          col("g.h") === col("tw.winmin") &&
          col("g.i").between(col("tw.t"), col("tw.t") + (w - 1)))
      .groupBy(col("g.doc_id").as("doc_id"), col("tw.t"), col("tw.winmin"))
      .agg(max(col("g.i")).as("selpos"))
      .select(col("doc_id"), col("selpos"), col("winmin"))
      .distinct()
  }

  /** Per-term term frequency without exploding the corpus:
    * tf = |toks| - |toks with the term removed|. `array_remove` is a plain
    * collection expression (codegen, no lambda), so a fixed small query
    * term set costs one extra array traversal per term per row — the whole
    * scoring pass stays inside the document scan with zero shuffle.
    */
  private def tfOf(toks: Column, term: String): Column =
    (size(toks) - size(array_remove(toks, lit(term)))).cast("long")

  /** Okapi BM25 top-k retrieval for a fixed conjunctive-free query
    * (Robertson & Walker SIGIR'94; Lucene's non-negative idf variant
    * ln(1 + (N - df + 0.5)/(df + 0.5))).
    *
    * Distributed shape — the part that matters at 100 TB: corpus
    * statistics (N, sum(dl) for avgdl, per-term df) are ONE map-side-
    * combined aggregate over the scan (a single 1-row result broadcast
    * back), and scoring is a second stateless scan pass — per-term tf via
    * [[tfOf]] (no explode, no posting-list shuffle), top-k via
    * TakeOrderedAndProject (per-partition heaps, no global sort). Nothing
    * shuffles but one row of stats and k result rows.
    *
    * Scores are emitted rounded to 4 decimals; ordering uses the unrounded
    * double. Cross-engine drift is ~1 ulp in ln() — argument-identical on
    * both engines since all idf/tf/dl inputs are exact integers and avgdl
    * is an exact-integer ratio — far below the score separation of
    * distinct (tf*, dl) tuples (same argument as [[tfidfTopTerms]]).
    */
  def bm25TopDocs(
      documents: DataFrame,
      queryTerms: Seq[String] = Seq("dup", "key", "fast"),
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = tokens(col("text"))
    val perDoc = documents.select(
      col("doc_id") +: size(toks).cast("long").as("dl") +:
        queryTerms.zipWithIndex.map { case (t, i) => tfOf(toks, t).as(s"tf$i") }: _*)
    val statAggs =
      count(lit(1)).as("n_docs") +: sum(col("dl")).as("sum_dl") +:
        queryTerms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    def idf(i: Int): Column = log(
      lit(1.0) + (col("n_docs") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
    def termScore(i: Int): Column =
      idf(i) * (col(s"tf$i").cast("double") * lit(k1 + 1.0)) /
        (col(s"tf$i").cast("double") +
          lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    val score = queryTerms.indices.map(termScore).reduce(_ + _)
    val hits = queryTerms.indices.map(i => when(col(s"tf$i") > 0, 1).otherwise(0))
      .reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .withColumn("score_raw", score)
      .filter(col("score_raw") > 0.0)
      .orderBy(col("score_raw").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("dl"), hits.as("n_terms_hit"),
        round(col("score_raw"), 4).as("score"))
      // re-sort on the ROUNDED emitted value: the driver compares row
      // order, and the rounded grid is cross-engine-stable where the raw
      // double's last ulp is not
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** Batch BM25: score MANY queries in one pass — the repeated-query
    * regime where [[bm25TopDocs]]'s rescan-per-query shape loses. One
    * corpus explode produces (doc, term, tf, dl) pruned to the query
    * vocabulary FIRST (broadcast semi-join on the tiny distinct-term set,
    * so the shuffle carries only query-relevant postings); df and the
    * 1-row corpus stats ride broadcasts; scoring is one aggregate over
    * postings x query-terms and top-k per query plans as a row_number
    * window (WindowGroupLimit rank pushdown — per-partition bounded
    * heaps, no global sort).
    *
    * The per-(query, doc) score is an aggregate float sum (join order,
    * not term order) — order-dependent at ~1 ulp; the 4-decimal emission
    * grid absorbs it (same class as the other rounded folds).
    */
  def bm25BatchTopK(
      documents: DataFrame,
      queries: Seq[(Int, Seq[String])] = Seq(
        1 -> Seq("dup", "key"),
        2 -> Seq("fast", "merge", "join"),
        3 -> Seq("spark")),
      k: Int = 3,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val qterms = queries
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val qvocab = qterms.select(col("term")).distinct()
    val toks = tokens(col("text"))
    val postings = documents
      .select(col("doc_id"), size(toks).cast("long").as("dl"),
        explode(toks).as("term"))
      .join(broadcast(qvocab), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = documents.agg(
      count(lit(1)).as("n_docs"),
      sum(size(toks).cast("long")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val termScore =
      log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        (col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    // Deterministic score fold: sum(double) aggregates in partition order,
    // which can differ by 1 ulp run-to-run AND cross-engine — and rank
    // cuts on the raw value, where no rounding grid can absorb it. Fold
    // the per-term contributions in TERM order instead (sorted struct
    // array + left fold); the oracle mirrors with an ORDER BY term list
    // fold, so the sum is bit-identical on both engines.
    val scored = postings
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("doc_id"), col("dl"))
      .agg(
        aggregate(
          sort_array(collect_list(struct(col("term"), termScore.as("c")))),
          lit(0.0),
          (acc, x) => acc + x.getField("c")).as("score_raw"),
        count(lit(1)).as("n_terms_hit"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_raw").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("dl"),
        col("n_terms_hit").cast("int").as("n_terms_hit"),
        round(col("score_raw"), 4).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of
    * two rankers over the same query batch: BM25 and a coverage ranker
    * (terms hit desc, then shorter docs first) — the standard way to
    * merge lexical + secondary signals without score calibration:
    * rrf(d) = Σ_r 1/(kRrf + rank_r(d)) over the rankers that retrieved d
    * in their top-`kList`.
    *
    * Scale: both rankers derive from ONE pass over the query-pruned
    * postings (the scored frame is |queries|×|matching docs|, bounded by
    * the semi-join); fusion is a full-outer join of two top-k frames —
    * k·|queries| rows a side. Rank positions, not raw scores, cross the
    * fusion boundary, so the two rankers never need comparable scales.
    */
  def rrfFusion(
      documents: DataFrame,
      queries: Seq[(Int, Seq[String])] = Seq(
        1 -> Seq("dup", "key"),
        2 -> Seq("fast", "merge", "join"),
        3 -> Seq("spark")),
      kList: Int = 10,
      kRrf: Int = 60,
      kOut: Int = 5): DataFrame = {
    val scored = bm25BatchTopK(documents, queries, k = Integer.MAX_VALUE)
    val a = scored
      .filter(col("rank") <= kList)
      .select(col("query_id"), col("doc_id"), col("rank").as("rank_bm25"))
    val covW = Window.partitionBy(col("query_id"))
      .orderBy(col("n_terms_hit").desc, col("dl"), col("doc_id"))
    val b = scored
      .withColumn("rank_cov", row_number().over(covW))
      .filter(col("rank_cov") <= kList)
      .select(col("query_id"), col("doc_id"), col("rank_cov"))
    val contrib = (r: Column) =>
      coalesce(lit(1.0) / (lit(kRrf) + r).cast("double"), lit(0.0))
    val fusedW = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    a.join(b, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", contrib(col("rank_bm25")) + contrib(col("rank_cov")))
      .withColumn("fused_rank", row_number().over(fusedW))
      .filter(col("fused_rank") <= kOut)
      .select(col("query_id"), col("fused_rank"), col("doc_id"),
        col("rank_bm25"), col("rank_cov"),
        round(col("rrf"), 6).as("rrf_score"))
      .orderBy(col("query_id"), col("fused_rank"))
  }

  /** nDCG@k evaluation of the BM25 ranking (Järvelin & Kekäläinen, TOIS
    * 2002) with the coverage count as graded relevance: DCG =
    * Σ_pos (2^rel − 1)/ln(pos+1), IDCG from the same multiset sorted by
    * relevance, nDCG = DCG/IDCG. The log BASE cancels in the ratio, so
    * the ln spelling keeps both engines on identical expression trees
    * (log2 would pit Java's log(x)/log(2) against libm's log2 in the
    * last ulp).
    *
    * Numeric discipline: per-position contributions are exact-int-derived
    * doubles; both DCG folds are CUMULATIVE windows in position order
    * (sequential, engine-agnostic) finished with max() — never an
    * unordered SUM of irrational doubles.
    */
  def ndcgEval(
      documents: DataFrame,
      queries: Seq[(Int, Seq[String])] = Seq(
        1 -> Seq("dup", "key"),
        2 -> Seq("fast", "merge", "join"),
        3 -> Seq("spark")),
      k: Int = 10): DataFrame = {
    val ranked = bm25BatchTopK(documents, queries, k)
      .select(col("query_id"), col("rank"), col("n_terms_hit"))
    val contrib = (pos: Column) =>
      (pow(lit(2.0), col("n_terms_hit").cast("double")) - lit(1.0)) /
        log((pos + lit(1)).cast("double"))
    val byRank = Window.partitionBy(col("query_id")).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val idealOrder = Window.partitionBy(col("query_id"))
      .orderBy(col("n_terms_hit").desc, col("rank"))
    ranked
      .withColumn("ipos", row_number().over(idealOrder))
      .withColumn("cum_dcg", sum(contrib(col("rank"))).over(byRank))
      .withColumn("cum_idcg", sum(contrib(col("ipos"))).over(
        Window.partitionBy(col("query_id")).orderBy(col("ipos"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_retrieved"),
        max(col("cum_dcg")).as("dcg_raw"),
        max(col("cum_idcg")).as("idcg_raw"))
      .select(
        col("query_id"), col("n_retrieved"),
        round(col("dcg_raw"), 6).as("dcg"),
        round(col("idcg_raw"), 6).as("idcg"),
        round(col("dcg_raw") / col("idcg_raw"), 6).as("ndcg"))
      .orderBy(col("query_id"))
  }

  /** Conjunctive (AND-semantics) boolean retrieval: documents containing
    * EVERY query term, with per-term tfs. The inverted-index consumer
    * query — but evaluated as a pure scan+filter (tf per term via
    * [[tfOf]], conjunction of tf>0 predicates): zero shuffle, zero
    * explode, trivially parallel over 100 TB of parquet splits. An index
    * would only win when the query term set is rare AND the index already
    * exists; the scan shape is the right default for ad-hoc corpus audits.
    */
  def booleanRetrieval(
      documents: DataFrame,
      queryTerms: Seq[String] = Seq("dup", "key", "fast")): DataFrame = {
    // distinct: a repeated query term would mint two identically-named tf
    // columns and the filter would die on an ambiguous reference
    val terms = queryTerms.distinct
    val toks = tokens(col("text"))
    val withTf = documents.select(
      col("doc_id") +: size(toks).cast("long").as("dl") +:
        terms.map(t => tfOf(toks, t).as(s"tf_$t")): _*)
    withTf
      .filter(terms.map(t => col(s"tf_$t") > 0L).reduce(_ && _))
      .orderBy(col("doc_id"))
  }

  /** Collocation extraction by pointwise mutual information over adjacent
    * token pairs (Church & Hanks, Comp. Linguistics 1990):
    * pmi(w1,w2) = ln(c12 * T / (c1 * c2)) with c1/c2 the corpus counts of
    * w1-as-left / w2-as-right and T the total bigram count. A minimum
    * pair-count floor drops the unstable low-frequency tail (standard
    * practice — PMI explodes for hapax pairs).
    *
    * Distributed shape: ONE bigram explode pass feeding a map-side-combined
    * (w1,w2) count (bounded by vocab², not corpus size); the marginals are
    * count-only windows over that aggregate (two vocab²-bounded shuffles of
    * the counted frame, not of the corpus — same reasoning as
    * [[bigramNll]]); T rides a 1-row broadcast. All pmi inputs are exact
    * longs, so the double is argument-identical cross-engine; rounded to 4
    * decimals, ordered on the unrounded value.
    */
  def collocationsPmi(
      documents: DataFrame,
      minCount: Long = 5L,
      k: Int = 30): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks)
    val bigrams = arrays_zip(
      slice(toks, lit(1), n - 1).as("w1"),
      slice(toks, lit(2), n - 1).as("w2"))
    val pairCounts = documents
      .select(explode(bigrams).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val total = pairCounts.agg(sum(col("c12")).as("t_total"))
    pairCounts
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .withColumn("c2", sum(col("c12")).over(Window.partitionBy(col("w2"))))
      .filter(col("c12") >= minCount)
      .crossJoin(broadcast(total))
      .withColumn("pmi_raw",
        log(col("c12").cast("double") * col("t_total").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double"))))
      .orderBy(col("pmi_raw").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        round(col("pmi_raw"), 4).as("pmi"))
      // rounded-grid re-sort, same reasoning as [[bm25TopDocs]]
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
  }

  /** DSIR-style importance log-weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", 2023): score each
    * document by the log-likelihood ratio of a target-domain hashed-unigram
    * model against the raw-corpus model,
    * log w(d) = Σ_tokens [ln p̂_tgt(b(t)) - ln q̂_raw(b(t))], with
    * add-one-smoothed bucket probabilities over B fnv1a64 hash buckets.
    * Downstream, mixture sampling resamples ∝ exp(log w) — this emits the
    * per-doc weights plus a per-token normalization.
    *
    * Distributed shape: one token explode into a (doc, source, bucket)
    * map-side-combined count; the B-bounded bucket model (target + raw
    * counts in one pass over that frame — the two models share one
    * aggregate) and the 1-row totals ride broadcasts; the per-doc fold is
    * one aggregate over the (doc, bucket) frame joined to the broadcast
    * weight table. The doc-frame subtree feeds both branches — identical
    * Exchange, so AQE reuses it rather than re-scanning. The c·w double
    * sum is order-dependent (~1e-13, [[bigramNll]] hazard class); per-
    * bucket weights are ln() of exact-long rationals — argument-identical
    * cross-engine; emitted rounded.
    */
  def dsirWeights(
      documents: DataFrame,
      targetSources: Seq[String] = Seq("src0", "src1"),
      buckets: Int = 256): DataFrame = {
    // power-of-two only: the engine buckets pmod(SIGNED long, buckets)
    // while the oracle buckets the UNSIGNED u64 — the two agree exactly
    // when buckets divides 2^64 and silently diverge otherwise
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two (got $buckets)")
    val docBuckets = documents
      .select(col("doc_id"), col("source"),
        explode(tokens(col("text"))).as("token"))
      .withColumn("b",
        pmod(GraftColumns.fnv1a64(col("token")), lit(buckets.toLong)))
      .groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("c_db"))
    val isTarget = col("source").isInCollection(targetSources)
    val bucketCounts = docBuckets
      .groupBy(col("b"))
      .agg(
        sum(col("c_db")).as("c_all"),
        sum(when(isTarget, col("c_db")).otherwise(0L)).as("c_tgt"))
    val totals = bucketCounts
      .agg(sum(col("c_all")).as("t_all"), sum(col("c_tgt")).as("t_tgt"))
    val weights = bucketCounts
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("c_tgt") + 1L).cast("double") /
            (col("t_tgt") + buckets.toLong).cast("double")) -
          log((col("c_all") + 1L).cast("double") /
            (col("t_all") + buckets.toLong).cast("double"))).as("w"))
    docBuckets
      .join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c_db")).as("n_tokens"),
        sum(col("c_db").cast("double") * col("w")).as("lw"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("lw"), 4).as("log_weight"),
        round(col("lw") / col("n_tokens").cast("double"), 4)
          .as("log_weight_per_token"))
      .orderBy(col("doc_id"))
  }

  /** Shannon entropy of each source's token distribution (the corpus-
    * diversity audit a mixture designer reads before weighting sources):
    * H = ln(n) - (Σ c·ln c)/n over the source's token counts, plus the
    * normalized variant H/ln(vocab) in [0,1].
    *
    * Distributed shape: one token explode into a map-side-combined
    * (source, token) count — bounded by |sources|·|vocab|, not corpus
    * size — then one aggregate per source over that tiny frame. The
    * Σ c·ln c double sum is order-dependent at the ~1e-13 relative level
    * (same hazard class as [[bigramNll]]); emitted rounded to 4 decimals,
    * far above the drift.
    */
  def sourceTokenEntropy(documents: DataFrame): DataFrame = {
    val counts = documents
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c"))
    counts
      .groupBy(col("source"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(col("c").cast("double") * log(col("c").cast("double")))
          .as("clogc"))
      .withColumn("entropy_raw",
        log(col("n_tokens").cast("double")) -
          col("clogc") / col("n_tokens").cast("double"))
      .select(col("source"), col("n_tokens"), col("vocab_size"),
        round(col("entropy_raw"), 4).as("entropy"),
        // NULL for a single-token vocabulary: 0/0 is NaN on Spark but
        // NULL on DuckDB — make the degenerate case engine-agnostic
        when(col("vocab_size") > 1L,
          round(col("entropy_raw") / log(col("vocab_size").cast("double")), 4))
          .as("entropy_norm"))
      .orderBy(col("source"))
  }

  /** Per-source lexical-complexity audit on a fully integer path —
    * the readability-family signals (Flesch/SMOG inputs) that survive a
    * sentence-less corpus: word counts, vowel-group syllable
    * approximations, polysyllabic-word share, and micros-exact average
    * word length / syllables-per-word. The classic readability indices
    * divide these same numerators by sentence counts; this corpus has no
    * sentence punctuation (verified — the formula would be vacuous), so
    * the audit reports the complexity ratios a curation gate actually
    * thresholds on.
    *
    * Syllables ≈ maximal `[aeiouy]+` runs per word — the standard cheap
    * approximation; the pattern sits in the Java-regex ∩ RE2 subset so
    * DuckDB replays it verbatim (same discipline as pii_redact).
    *
    * Scale: one explode pass to (source, word-shape) counters with
    * map-side combine; report is |sources| rows.
    */
  def lexicalComplexity(documents: DataFrame): DataFrame = {
    val syl = size(regexp_extract_all(lower(col("w")), lit("[aeiouy]+"), lit(0)))
      .cast("long")
    documents
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .select(col("source"), length(col("w")).cast("long").as("wlen"),
        syl.as("syl"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("wlen")).as("n_chars"),
        sum(col("syl")).as("n_syllables"),
        sum((col("syl") >= 3L).cast("bigint")).as("n_polysyllabic"))
      .select(col("source"), col("n_words"), col("n_chars"),
        col("n_syllables"), col("n_polysyllabic"),
        expr("(n_chars * 1000000L) DIV n_words").as("avg_word_len_micros"),
        expr("(n_syllables * 1000000L) DIV n_words")
          .as("syllables_per_word_micros"),
        expr("(n_polysyllabic * 1000000L) DIV n_words").as("polysyllabic_ppm"))
      .orderBy(col("source"))
  }

  /** Pseudo-relevance-feedback query expansion (the RM3-family shape,
    * Lavrenko & Croft SIGIR'01 / Abdul-Jaleel TREC'04): take the BM25
    * top-`kDocs` for the seed query, rank the non-query terms of that
    * feedback set, and emit the top-`kTerms` expansion candidates with
    * their feedback mass (tf, df) and corpus df. Ranking is on EXACT
    * integer feedback counts (ties to the term), so the only floats in
    * the whole operator live inside the BM25 selection — per-row scalar
    * arithmetic with identical literal spelling cross-engine, hence
    * deterministic (same reasoning as [[bm25TopDocs]]'s top-k).
    *
    * Scale: the feedback set is k documents — the explode/aggregate
    * after selection is bounded by k·doclen, not the corpus; corpus df
    * is the usual distinct-(doc,term) count with map-side combine.
    */
  def prfExpansion(documents: DataFrame,
      queryTerms: Seq[String] = Seq("dup", "key", "fast"),
      kDocs: Int = 10, kTerms: Int = 15): DataFrame = {
    val fb = bm25TopDocs(documents, queryTerms, kDocs).select(col("doc_id"))
    val fbAgg = documents.join(broadcast(fb), Seq("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(!col("term").isin(queryTerms: _*))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf_feedback"),
        countDistinct(col("doc_id")).as("df_feedback"))
    val corpusDf = documents
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df_corpus"))
    fbAgg.join(corpusDf, Seq("term"))
      .orderBy(col("tf_feedback").desc, col("term"))
      .limit(kTerms)
      .select(col("term"), col("tf_feedback"), col("df_feedback"),
        col("df_corpus"))
      .orderBy(col("tf_feedback").desc, col("term"))
  }

  /** DuckDB replay: the verbatim BM25 scoring CTE selects the feedback
    * set, then exact-count aggregation.
    */
  def prfExpansionOracleSql(kDocs: Int = 10, kTerms: Int = 15): String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'dup'))
       |      AS BIGINT) AS tf0,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'key'))
       |      AS BIGINT) AS tf1,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'fast'))
       |      AS BIGINT) AS tf2
       |  FROM documents),
       |stats AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
       |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
       |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
       |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
       |  FROM d),
       |scored AS (
       |  SELECT doc_id,
       |    ln(CAST(1.0 AS DOUBLE) + (n_docs - df0 + CAST(0.5 AS DOUBLE))
       |        / (df0 + CAST(0.5 AS DOUBLE)))
       |      * (CAST(tf0 AS DOUBLE)
       |         * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
       |      / (CAST(tf0 AS DOUBLE) + CAST(1.2 AS DOUBLE)
       |         * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
       |            + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)
       |              / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
       |    + ln(CAST(1.0 AS DOUBLE) + (n_docs - df1 + CAST(0.5 AS DOUBLE))
       |        / (df1 + CAST(0.5 AS DOUBLE)))
       |      * (CAST(tf1 AS DOUBLE)
       |         * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
       |      / (CAST(tf1 AS DOUBLE) + CAST(1.2 AS DOUBLE)
       |         * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
       |            + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)
       |              / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
       |    + ln(CAST(1.0 AS DOUBLE) + (n_docs - df2 + CAST(0.5 AS DOUBLE))
       |        / (df2 + CAST(0.5 AS DOUBLE)))
       |      * (CAST(tf2 AS DOUBLE)
       |         * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
       |      / (CAST(tf2 AS DOUBLE) + CAST(1.2 AS DOUBLE)
       |         * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
       |            + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)
       |              / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
       |    AS score_raw
       |  FROM d, stats),
       |fb AS (
       |  SELECT doc_id FROM scored WHERE score_raw > CAST(0.0 AS DOUBLE)
       |  ORDER BY score_raw DESC, doc_id LIMIT $kDocs),
       |fbt AS (
       |  SELECT d.doc_id, unnest(d.toks) AS term
       |  FROM d JOIN fb ON d.doc_id = fb.doc_id),
       |fba AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS tf_feedback,
       |    CAST(count(DISTINCT doc_id) AS BIGINT) AS df_feedback
       |  FROM fbt WHERE term NOT IN ('dup', 'key', 'fast')
       |  GROUP BY term),
       |cdf AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df_corpus
       |  FROM (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM d) t
       |  GROUP BY term)
       |SELECT term, tf_feedback, df_feedback, df_corpus
       |FROM (SELECT fba.term, tf_feedback, df_feedback, df_corpus
       |      FROM fba JOIN cdf ON fba.term = cdf.term
       |      ORDER BY tf_feedback DESC, fba.term LIMIT $kTerms) t
       |ORDER BY tf_feedback DESC, term""".stripMargin

  /** Vocabulary-growth (Heaps'-law) audit: docs in doc_id order split
    * into exact deciles (range-partitioned ntile), each token attributed
    * to the decile of its FIRST occurrence — the curve of cumulative
    * distinct vocabulary vs cumulative token volume that says whether a
    * corpus is still contributing new types or re-treading (the
    * "is more data adding anything" question). All exact integers;
    * caller releases the pinned ranked frame (Verify/Bench do).
    *
    * Scale: one explode pass to (token, min doc) and per-doc token
    * counts (map-side combine); the decile assignment rides
    * [[graft.operators.DistributedRank]]; the report is 10 rows.
    */
  def vocabGrowth(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deciled = graft.operators.DistributedRank.withRankStats(
      documents.select(col("doc_id"), tokens(col("text")).as("toks")),
      Seq(col("doc_id")), 10, "decile", "__p", "__c")
      .select(col("doc_id"), col("toks"), col("decile"))
    val docTokens = deciled
      .select(col("decile"), size(col("toks")).cast("long").as("n_toks"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("docs"), sum(col("n_toks")).as("tokens"))
    val firstDoc = deciled
      .select(col("decile"), col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("tok"))
      .agg(min(struct(col("doc_id"), col("decile"))).as("first"))
      .groupBy(col("first.decile").as("decile"))
      .agg(count(lit(1)).as("vocab_new"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docTokens
      .join(firstDoc, Seq("decile"), "left")
      .select(col("decile"), col("docs"), col("tokens"),
        coalesce(col("vocab_new"), lit(0L)).as("vocab_new"))
      .withColumn("tokens_cum", sum(col("tokens")).over(w))
      .withColumn("vocab_cum", sum(col("vocab_new")).over(w))
      .orderBy(col("decile"))
  }

  def vocabGrowthOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    CAST(ntile(10) OVER (ORDER BY doc_id) AS INTEGER) AS decile
      |  FROM documents),
      |dt AS (
      |  SELECT decile, CAST(count(*) AS BIGINT) AS docs,
      |    CAST(sum(len(toks)) AS BIGINT) AS tokens
      |  FROM d GROUP BY 1),
      |fd AS (
      |  SELECT decile, CAST(count(*) AS BIGINT) AS vocab_new
      |  FROM (SELECT tok, min_by(decile, doc_id) AS decile
      |        FROM (SELECT doc_id, decile, unnest(toks) AS tok FROM d) t
      |        GROUP BY tok) f
      |  GROUP BY 1)
      |SELECT dt.decile, dt.docs, dt.tokens,
      |  CAST(coalesce(fd.vocab_new, 0) AS BIGINT) AS vocab_new,
      |  CAST(sum(dt.tokens) OVER (ORDER BY dt.decile
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tokens_cum,
      |  CAST(sum(coalesce(fd.vocab_new, 0)) OVER (ORDER BY dt.decile
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_cum
      |FROM dt LEFT JOIN fd ON dt.decile = fd.decile
      |ORDER BY dt.decile""".stripMargin

  /** Long-tail token profile per source: hapax legomena (count = 1)
    * and rare (count ≤ 5) type shares of the vocabulary, plus the token
    * MASS the rare types carry — the Zipf-tail numbers that predict how
    * a tokenizer's vocab budget and a dedup shingle index will behave
    * on this source. All exact integers/ppm; one explode pass to the
    * (source, token) counts.
    */
  def rareTokenShare(documents: DataFrame, rareMax: Long = 5L): DataFrame = {
    val counts = documents
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c"))
    counts
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("vocab"),
        sum(col("c")).as("tokens"),
        sum((col("c") === 1L).cast("bigint")).as("hapax_types"),
        sum((col("c") <= rareMax).cast("bigint")).as("rare_types"),
        sum(when(col("c") <= rareMax, col("c")).otherwise(0L))
          .as("rare_mass"))
      .select(col("source"), col("vocab"), col("tokens"),
        col("hapax_types"), col("rare_types"),
        expr("(hapax_types * 1000000L) DIV vocab").as("hapax_ppm"),
        expr("(rare_types * 1000000L) DIV vocab").as("rare_type_ppm"),
        expr("(rare_mass * 1000000L) DIV tokens").as("rare_mass_ppm"))
      .orderBy(col("source"))
  }

  def rareTokenShareOracleSql(rareMax: Long = 5L): String =
    s"""WITH t AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
       |      FROM t GROUP BY 1, 2),
       |a AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS vocab,
       |    CAST(sum(c) AS BIGINT) AS tokens,
       |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS hapax_types,
       |    CAST(sum(CASE WHEN c <= $rareMax THEN 1 ELSE 0 END) AS BIGINT)
       |      AS rare_types,
       |    CAST(sum(CASE WHEN c <= $rareMax THEN c ELSE 0 END) AS BIGINT)
       |      AS rare_mass
       |  FROM c GROUP BY 1)
       |SELECT source, vocab, tokens, hapax_types, rare_types,
       |  CAST(hapax_types * 1000000 // vocab AS BIGINT) AS hapax_ppm,
       |  CAST(rare_types * 1000000 // vocab AS BIGINT) AS rare_type_ppm,
       |  CAST(rare_mass * 1000000 // tokens AS BIGINT) AS rare_mass_ppm
       |FROM a ORDER BY source""".stripMargin

  /** Good-Turing frequency smoothing (Good, Biometrika 1953; the Gale &
    * Sampson 1995 simple-GT setting) over word-TRIGRAM counts — the
    * species-frequency table an LM-data pipeline reads to estimate
    * unseen-mass and discount rare-count estimates. Unigrams are useless
    * here (a closed 31-word vocabulary has no tail); trigram space is
    * large enough to keep singletons at every harness scale.
    *
    * For each count r (capped at `maxR` — the smoothing region; larger r
    * uses the MLE): N_r species, N_{r+1}, and the adjusted count
    * r* = (r+1)·N_{r+1}/N_r in floor-micros (NULL when N_{r+1} = 0,
    * where simple GT falls back to r).
    *
    * Scale: one explode → two nested map-side-combined GROUP BYs
    * (trigram counts, then count-of-counts — the second frame is at most
    * `maxR` rows after the cap).
    */
  def goodTuring(documents: DataFrame, maxR: Long = 100L): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks)
    val tris = arrays_zip(
      slice(toks, lit(1), n - 2).as("w1"),
      slice(toks, lit(2), n - 2).as("w2"),
      slice(toks, lit(3), n - 2).as("w3"))
    val counts = documents
      .select(explode(tris).as("t"))
      .groupBy(col("t.w1"), col("t.w2"), col("t.w3"))
      .agg(count(lit(1)).as("r"))
    val nr = counts.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
    val next = nr.select((col("r") - 1L).as("r"), col("n_r").as("n_next"))
    nr.join(next, Seq("r"), "left")
      .filter(col("r") <= maxR)
      .select(col("r"), col("n_r"),
        coalesce(col("n_next"), lit(0L)).as("n_next"),
        when(col("n_next").isNotNull,
          expr("((r + 1) * n_next * 1000000) DIV n_r"))
          .as("r_star_micros"))
      .orderBy(col("r"))
  }

  def goodTuringOracleSql(maxR: Long = 100L): String =
    s"""WITH tk AS (
       |  SELECT string_split(text, ' ') AS t FROM documents),
       |tri AS (
       |  SELECT unnest(list_transform(range(1, len(t) - 1), i -> t[i]))
       |      AS w1,
       |    unnest(list_transform(range(1, len(t) - 1), i -> t[i+1]))
       |      AS w2,
       |    unnest(list_transform(range(1, len(t) - 1), i -> t[i+2]))
       |      AS w3
       |  FROM tk),
       |c AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS r
       |      FROM tri GROUP BY 1, 2, 3),
       |nr AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r
       |       FROM c GROUP BY 1)
       |SELECT a.r, a.n_r,
       |  CAST(coalesce(b.n_r, 0) AS BIGINT) AS n_next,
       |  CASE WHEN b.n_r IS NOT NULL THEN
       |    CAST(((a.r + 1) * b.n_r * 1000000) // a.n_r AS BIGINT)
       |  END AS r_star_micros
       |FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
       |WHERE a.r <= $maxR
       |ORDER BY a.r""".stripMargin

  /** Dunning log-likelihood-ratio (G²) collocations (Dunning, CL 1993)
    * — the significance-based sibling of [[collocationsPmi]] (PMI
    * over-weights rare pairs; G² weighs evidence mass). The 2×2 bigram
    * contingency cells are exact longs from the SAME bigram/marginal
    * frames as PMI; G² = 2·Σ O·ln(O·N / (row·col)) over the four cells,
    * each term an identically-spelled IEEE expression on those integers
    * (zero cells contribute 0), rounded to 4 — the [[dsirWeights]]
    * ln-of-exact-rational discipline.
    */
  def collocationsG2(
      documents: DataFrame,
      minCount: Long = 5L,
      k: Int = 30): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks)
    val bigrams = arrays_zip(
      slice(toks, lit(1), n - 1).as("w1"),
      slice(toks, lit(2), n - 1).as("w2"))
    val pairCounts = documents
      .select(explode(bigrams).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val total = pairCounts.agg(sum(col("c12")).as("nn"))
    val cells = pairCounts
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .withColumn("c2", sum(col("c12")).over(Window.partitionBy(col("w2"))))
      .filter(col("c12") >= minCount)
      .crossJoin(broadcast(total))
    def term(o: org.apache.spark.sql.Column,
        row: org.apache.spark.sql.Column,
        colm: org.apache.spark.sql.Column) =
      when(o > 0L,
        o.cast("double") * log(
          o.cast("double") * col("nn").cast("double") /
            (row.cast("double") * colm.cast("double"))))
        .otherwise(lit(0.0))
    val o12 = col("c1") - col("c12")
    val o21 = col("c2") - col("c12")
    val o22 = col("nn") - col("c1") - col("c2") + col("c12")
    val g2 = lit(2.0) * (
      term(col("c12"), col("c1"), col("c2")) +
        term(o12, col("c1"), col("nn") - col("c2")) +
        term(o21, col("nn") - col("c1"), col("c2")) +
        term(o22, col("nn") - col("c1"), col("nn") - col("c2")))
    cells
      .withColumn("g2_raw", g2)
      .orderBy(col("g2_raw").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        round(col("g2_raw"), 4).as("g2"))
      // rounded-grid re-sort, same reasoning as [[collocationsPmi]]
      .orderBy(col("g2").desc, col("w1"), col("w2"))
  }

  def collocationsG2OracleSql(minCount: Long = 5L, k: Int = 30): String =
    s"""WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
       |bg AS (
       |  SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
       |    unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
       |  FROM tk),
       |pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
       |       FROM bg GROUP BY 1, 2),
       |tot AS (SELECT CAST(sum(c12) AS BIGINT) AS nn FROM pc),
       |cells AS (
       |  SELECT w1, w2, c12,
       |    CAST(sum(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1,
       |    CAST(sum(c12) OVER (PARTITION BY w2) AS BIGINT) AS c2
       |  FROM pc),
       |g AS (
       |  SELECT w1, w2, c12, c1, c2,
       |    2.0 * (
       |      (CASE WHEN c12 > 0 THEN CAST(c12 AS DOUBLE) *
       |        ln(CAST(c12 AS DOUBLE) * CAST(nn AS DOUBLE) /
       |           (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))
       |        ELSE 0.0 END) +
       |      (CASE WHEN c1 - c12 > 0 THEN CAST(c1 - c12 AS DOUBLE) *
       |        ln(CAST(c1 - c12 AS DOUBLE) * CAST(nn AS DOUBLE) /
       |           (CAST(c1 AS DOUBLE) * CAST(nn - c2 AS DOUBLE)))
       |        ELSE 0.0 END) +
       |      (CASE WHEN c2 - c12 > 0 THEN CAST(c2 - c12 AS DOUBLE) *
       |        ln(CAST(c2 - c12 AS DOUBLE) * CAST(nn AS DOUBLE) /
       |           (CAST(nn - c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))
       |        ELSE 0.0 END) +
       |      (CASE WHEN nn - c1 - c2 + c12 > 0
       |        THEN CAST(nn - c1 - c2 + c12 AS DOUBLE) *
       |        ln(CAST(nn - c1 - c2 + c12 AS DOUBLE) * CAST(nn AS DOUBLE) /
       |           (CAST(nn - c1 AS DOUBLE) * CAST(nn - c2 AS DOUBLE)))
       |        ELSE 0.0 END)) AS g2_raw
       |  FROM cells, tot
       |  WHERE c12 >= $minCount)
       |SELECT w1, w2, c12, c1, c2, round(g2_raw, 4) AS g2
       |FROM (SELECT * FROM g ORDER BY g2_raw DESC, w1, w2 LIMIT $k) t
       |ORDER BY g2 DESC, w1, w2""".stripMargin

  /** Per-source Flesch reading-ease profile (Flesch 1948; the classic
    * readability screen beside `lexical_complexity`'s type-token and
    * word-length signals): pooled words / sentences / syllable-group
    * counts per source, with the 206.835 − 1.015·(W/S) − 84.6·(Syl/W)
    * formula carried in exact micros — each rational term is a separate
    * floor DIV on integer sums, identically spelled in both engines.
    * Syllables use the standard vowel-group heuristic
    * (`regexp_extract_all('[aeiou]+')` over the lowercased text —
    * groups never span the space delimiter, so the text-level count
    * equals the per-word sum); sentences count terminal-punctuation
    * runs, floored at 1 per doc.
    *
    * Scale: pure per-row codegen'd regex/array work folded by ONE
    * map-side-combined groupBy to |sources| rows.
    */
  def readability(documents: DataFrame): DataFrame = {
    val perDoc = documents.select(
      col("source"),
      wsTokenCount(col("text")).as("w"),
      greatest(lit(1L),
        size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long"))
        .as("s"),
      size(expr("regexp_extract_all(lower(text), '[aeiou]+', 0)"))
        .cast("long").as("y"))
    perDoc
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).cast("decimal(38,0)").as("words"),
        sum(col("s")).cast("decimal(38,0)").as("sentences"),
        sum(col("y")).cast("decimal(38,0)").as("syllables"))
      .select(
        col("source"), col("n_docs"),
        col("words").cast("bigint").as("words"),
        col("sentences").cast("bigint").as("sentences"),
        col("syllables").cast("bigint").as("syllables"),
        expr("cast((words * 1000000) DIV sentences as bigint)")
          .as("words_per_sentence_micros"),
        expr("cast((syllables * 1000000) DIV words as bigint)")
          .as("syllables_per_word_micros"),
        expr("""cast(206835000 - (words * 1015000) DIV sentences
               |  - (syllables * 84600000) DIV words as bigint)"""
          .stripMargin).as("flesch_micros"))
      .orderBy(col("source"))
  }

  def readabilityOracleSql: String =
    """WITH pd AS (
      |  SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
      |    greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
      |      AS BIGINT)) AS s,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiou]+'))
      |      AS BIGINT) AS y
      |  FROM documents),
      |g AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(w) AS HUGEINT) AS words,
      |    CAST(sum(s) AS HUGEINT) AS sentences,
      |    CAST(sum(y) AS HUGEINT) AS syllables
      |  FROM pd GROUP BY source)
      |SELECT source, n_docs,
      |  CAST(words AS BIGINT) AS words,
      |  CAST(sentences AS BIGINT) AS sentences,
      |  CAST(syllables AS BIGINT) AS syllables,
      |  CAST((words * 1000000) // sentences AS BIGINT)
      |    AS words_per_sentence_micros,
      |  CAST((syllables * 1000000) // words AS BIGINT)
      |    AS syllables_per_word_micros,
      |  CAST(206835000 - (words * 1015000) // sentences
      |    - (syllables * 84600000) // words AS BIGINT) AS flesch_micros
      |FROM g ORDER BY source""".stripMargin

  def lexicalComplexityOracleSql: String =
    """WITH w AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |m AS (
      |  SELECT source, CAST(length(w) AS BIGINT) AS wlen,
      |    CAST(len(regexp_extract_all(lower(w), '[aeiouy]+')) AS BIGINT)
      |      AS syl
      |  FROM w),
      |a AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_words,
      |    CAST(sum(wlen) AS BIGINT) AS n_chars,
      |    CAST(sum(syl) AS BIGINT) AS n_syllables,
      |    CAST(sum(CASE WHEN syl >= 3 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_polysyllabic
      |  FROM m GROUP BY source)
      |SELECT source, n_words, n_chars, n_syllables, n_polysyllabic,
      |  CAST(n_chars * 1000000 // n_words AS BIGINT) AS avg_word_len_micros,
      |  CAST(n_syllables * 1000000 // n_words AS BIGINT)
      |    AS syllables_per_word_micros,
      |  CAST(n_polysyllabic * 1000000 // n_words AS BIGINT)
      |    AS polysyllabic_ppm
      |FROM a ORDER BY source""".stripMargin
}
