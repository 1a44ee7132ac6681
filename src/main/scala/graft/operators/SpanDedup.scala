package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Positional (substring-level) duplication operators — the span-granular
  * member of the dedup family (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better"): document-level dedup
  * ([[Dedup.exactGroups]], MinHash/SimHash) removes whole near-identical
  * documents, but the dominant residual duplication in web corpora is
  * REPEATED SPANS — boilerplate, licence blocks, templated paragraphs —
  * embedded inside otherwise-distinct documents. These operators find
  * them and plan around them.
  *
  * Distinct from [[Dedup.crossDocNgramOverlap]] (per-doc distinct shingle
  * SETS — how much of a doc's vocabulary-of-shingles is shared): here
  * windows are POSITIONAL, so the same span twice in one doc is two
  * occurrences, and the per-doc output is an exact interval-union token
  * coverage, not a set fraction.
  *
  * Scale notes:
  *   - Window extraction is one scan-shaped projection (transform over the
  *     token array, no joins, no window functions); total work is linear
  *     in corpus token count — the same bound as tokenization itself.
  *   - Corpus-frequency of a span needs one distinct + one aggregate
  *     shuffle keyed on the span; the per-doc coverage join is
  *     broadcast-sized only when the duplicated-span set is small, so it
  *     is written as a plain equi-join and left to AQE.
  *   - The interval-union fold is a per-document sorted walk (lag over a
  *     doc-partitioned window): partitions are bounded by document length,
  *     never by corpus size.
  *
  * Reference behavior: the reference dedups at document granularity only
  * (`processor/src/domain/` has no substring pass); this family is part of
  * the beyond-the-reference LLM-pipeline surface.
  */
object SpanDedup {

  /** One row per positional k-token window: (doc_id[, carry...], pos,
    * span), pos 1-based. Documents shorter than k tokens emit nothing.
    */
  private[graft] def positionalSpans(
      documents: DataFrame, k: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val keep = col("doc_id") +: carry.map(col)
    documents
      .select(keep :+ split(col("text"), " ").as("toks"): _*)
      .filter(size(col("toks")) >= k)
      .select(keep :+ expr(
        s"""transform(sequence(1, size(toks) - ${k - 1}),
           |  i -> struct(i as pos, concat_ws(' ', slice(toks, i, $k)) as span))"""
          .stripMargin).as("ws"): _*)
      .select(keep :+ explode(col("ws")).as("w"): _*)
      .select(keep ++ Seq(col("w.pos").as("pos"), col("w.span").as("span")): _*)
  }

  /** Spans (exact k-token substrings) appearing in ≥2 DISTINCT documents,
    * ranked by spread: the report that tells you which boilerplate to
    * strip before training. n_docs = distinct documents containing the
    * span, n_occ = total positional occurrences (intra-doc repeats count).
    */
  def duplicateSpans(documents: DataFrame, k: Int = 6, topN: Int = 30): DataFrame =
    positionalSpans(documents, k)
      .groupBy(col("span"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("span"))
      .limit(topN)

  /** Per-document duplicated-token coverage: the fraction of each doc's
    * token positions covered by at least one cross-doc duplicated k-window
    * — the per-doc decision signal (drop / trim / keep) that
    * [[duplicateSpans]]'s corpus-level report cannot give. Exact interval
    * union over the sorted window starts: a window at pos after a previous
    * one at prev adds min(k, pos − prev) new tokens, so one lag pass per
    * doc computes the union length with no position explode.
    */
  def spanCoverage(documents: DataFrame, k: Int = 6): DataFrame = {
    // Coverage never OUTPUTS a span, only compares them — so windows ride
    // as 8-byte xxhash64 keys over the token SLICE (structural array
    // hash: no span string is ever even built, let alone shuffled — the
    // same hash-as-equivalence-class discipline as Dedup.hashedShingleDf;
    // the oracle uses the strings themselves). The 100x smoke measured
    // 32.8 s with string windows; the allocations + string shuffles
    // dominated.
    val w = documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(toks) - ${k - 1}),
           |  i -> struct(i as pos, xxhash64(slice(toks, i, $k)) as sh))"""
          .stripMargin)).as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.sh").as("sh"))
    val dupSpans = w
      .select(col("sh"), col("doc_id")).distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("sh"))
    val dup = w.join(dupSpans, Seq("sh"))
      .select(col("doc_id"), col("pos"))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val perDoc = dup
      .withColumn("prev", lag(col("pos"), 1).over(byPos))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("dup_windows"),
        sum(when(col("prev").isNull, lit(k))
          .otherwise(least(lit(k), col("pos") - col("prev"))))
          .as("covered_tokens"),
        // maximal contiguous covered runs: a window at pos extends the
        // previous run iff pos ≤ prev + k (overlap or adjacency)
        sum(when(col("prev").isNull || col("pos") - col("prev") > k, lit(1))
          .otherwise(lit(0))).as("dup_islands"))
    documents
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens").cast("bigint").as("n_tokens"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        coalesce(col("dup_islands"), lit(0L)).as("dup_islands"),
        expr("coalesce(covered_tokens, 0) * 1000000 DIV n_tokens")
          .as("coverage_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Default phrase blocklist the driver query runs with (terms chosen
    * from the harness vocabulary so hit counts are non-trivial; a phrase
    * with zero matches simply emits no row).
    */
  val DriverBlocklist: Seq[String] =
    Seq("spark", "table scan", "batch batch", "stream spark window")

  /** Multi-token phrase blocklist filter — the "bad content" screen of a
    * curation pipeline (licence fragments, boilerplate markers, banned
    * phrases): exact positional phrase matches per (phrase, source).
    *
    * Scale shape: one positional-window pass PER DISTINCT PHRASE LENGTH
    * (not per phrase — lengths are few, phrases can be thousands), each a
    * scan-shaped projection filtered by an In predicate (codegen'd set
    * probe; for very large lists this would become a broadcast join, same
    * plan shape). No self-joins, no regex backtracking.
    */
  def blocklistHits(
      documents: DataFrame,
      phrases: Seq[String] = DriverBlocklist): DataFrame = {
    val byLen = phrases.groupBy(_.split(" ").length).toSeq.sortBy(_._1)
    val matches = byLen.map { case (l, ps) =>
      // first-token prefilter INSIDE the lambda: the span string (the
      // expensive part — one concat_ws allocation per window) is built
      // only at positions whose first token can start a phrase, which
      // kills ~97% of the allocations on a natural corpus (measured
      // 43 s → the string build dominated the 100x smoke).
      val firsts = ps.map(_.split(" ").head).distinct.sorted
        .map(w => s"'${w.replace("'", "''")}'").mkString(", ")
      documents
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= l)
        .select(col("doc_id"), col("source"), explode(expr(
          s"""transform(
             |  filter(sequence(1, size(toks) - ${l - 1}),
             |    i -> element_at(toks, i) IN ($firsts)),
             |  i -> concat_ws(' ', slice(toks, i, $l)))""".stripMargin))
          .as("span"))
        .filter(col("span").isin(ps: _*))
    }.reduce(_ unionByName _)
    matches
      .groupBy(col("span").as("phrase"), col("source"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .orderBy(col("phrase"), col("source"))
  }

  /** Deterministic T5-style span-corruption plan (Raffel et al., JMLR
    * 2020 §3.1.4): every token position draws a seeded coin —
    * mix64(doc_id·P + pos) low bits, a 1/16 start rate — and each hit
    * masks a spanLen-token span clipped at the document end; overlapping
    * or adjacent spans merge, and each merged run is one sentinel. The
    * plan (per-doc masked-token counts, sentinel counts, corruption ppm)
    * is what a distributed pretraining data loader needs to size batches
    * BEFORE materializing corrupted text — and because the draw is a pure
    * function of (doc_id, pos), any executor can regenerate exactly the
    * same masks with no coordination or stored RNG state.
    *
    * Exactness: the splitmix64 draw is the library-wide [[graft.functions.Mix64]]
    * fixed point (DuckDB replays it in HUGEINT mod-2^64 limbs); the gate
    * is `& 15` — low bits, not pmod — because 16 divides 2^64, so the
    * signed-long view and the oracle's unsigned view agree. The interval
    * union is the same lag fold as [[spanCoverage]] with end-of-doc
    * clipping.
    */
  def spanMaskPlan(documents: DataFrame, spanLen: Int = 3): DataFrame = {
    val L = spanLen
    val base = documents
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val starts = base
      .select(col("doc_id"), col("n"),
        explode(expr("sequence(1, n)")).as("pos"))
      .filter((graft.functions.GraftColumns.mix64(
        col("doc_id") * lit(1000003L) + col("pos"))
        .bitwiseAND(lit(15L))) === lit(0L))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val perDoc = starts
      .withColumn("prev", lag(col("pos"), 1).over(byPos))
      .withColumn("add",
        when(col("prev").isNull,
          least(col("pos") + (L - 1), col("n")) - col("pos") + 1)
          .otherwise(greatest(lit(0),
            least(col("pos") + (L - 1), col("n")) -
              greatest(least(col("prev") + (L - 1), col("n")),
                col("pos") - 1))))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_mask_starts"),
        sum(col("add")).as("masked_tokens"),
        sum(when(col("prev").isNull || col("pos") - col("prev") > L, lit(1))
          .otherwise(lit(0))).as("n_sentinel_spans"))
    base.join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n").cast("bigint").as("n_tokens"),
        coalesce(col("n_mask_starts"), lit(0L)).as("n_mask_starts"),
        coalesce(col("masked_tokens"), lit(0L)).cast("bigint")
          .as("masked_tokens"),
        coalesce(col("n_sentinel_spans"), lit(0L)).as("n_sentinel_spans"),
        expr("coalesce(masked_tokens, 0) * 1000000 DIV n").as("mask_ppm"))
      .orderBy(col("doc_id"))
  }

  def blocklistHitsOracleSql(
      phrases: Seq[String] = DriverBlocklist): String = {
    val byLen = phrases.groupBy(_.split(" ").length).toSeq.sortBy(_._1)
    val blocks = byLen.map { case (l, ps) =>
      val inList = ps.sorted.map(p => s"'${p.replace("'", "''")}'")
        .mkString(", ")
      val upper = if (l >= 2) s"len(toks) - ${l - 2}" else "len(toks) + 1"
      s"""SELECT doc_id, source, span FROM (
         |  SELECT doc_id, source, unnest(list_transform(
         |    range(1, $upper),
         |    i -> array_to_string(toks[i:i+${l - 1}], ' '))) AS span
         |  FROM tk WHERE len(toks) >= $l)
         |WHERE span IN ($inList)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS toks
       |            FROM documents),
       |m AS (
       |$blocks)
       |SELECT span AS phrase, source,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_occ
       |FROM m GROUP BY 1, 2
       |ORDER BY phrase, source""".stripMargin
  }

  def spanMaskPlanOracleSql(spanLen: Int = 3): String = {
    val L = spanLen
    s"""WITH d AS (SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
       |p AS (SELECT doc_id, n, unnest(range(1, n + 1)) AS pos FROM d),
       |z AS (SELECT doc_id, n, pos,
       |  ((doc_id * 1000003 + pos)::HUGEINT + 11400714819323198485::HUGEINT)
       |    % 18446744073709551616::HUGEINT AS z0
       |  FROM p),
       |${graft.SketchOracles.mixChain("sm", "z", Seq("doc_id", "n", "pos"), "z0")},
       |c AS (SELECT doc_id, n, pos FROM sm4 WHERE mx % 16 = 0),
       |lagd AS (
       |  SELECT doc_id, n, pos,
       |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |  FROM c),
       |perdoc AS (
       |  SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS n_mask_starts,
       |    CAST(sum(CASE WHEN prev IS NULL
       |      THEN least(pos + ${L - 1}, n) - pos + 1
       |      ELSE greatest(0, least(pos + ${L - 1}, n)
       |        - greatest(least(prev + ${L - 1}, n), pos - 1)) END)
       |      AS BIGINT) AS masked_tokens,
       |    CAST(sum(CASE WHEN prev IS NULL OR pos - prev > $L
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_sentinel_spans
       |  FROM lagd GROUP BY 1)
       |SELECT d.doc_id, d.n AS n_tokens,
       |  COALESCE(p.n_mask_starts, 0) AS n_mask_starts,
       |  COALESCE(p.masked_tokens, 0) AS masked_tokens,
       |  COALESCE(p.n_sentinel_spans, 0) AS n_sentinel_spans,
       |  COALESCE(p.masked_tokens, 0) * 1000000 // d.n AS mask_ppm
       |FROM d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Trim plan — the ACTION member of the span family (detect:
    * [[duplicateSpans]]; quantify: [[spanCoverage]]; act: this): per
    * document, the longest contiguous token stretch NOT covered by any
    * cross-doc duplicated window, as (keep_from, keep_len). This is the
    * Lee-et-al. remediation shaped for a pipeline: rather than dropping
    * whole documents over embedded boilerplate, keep each doc's largest
    * clean stretch and publish exactly how many tokens the trim costs.
    *
    * Ties: the EARLIEST longest gap wins (deterministic). Docs with no
    * duplicated window keep everything; fully-covered docs publish
    * keep_len 0.
    *
    * Scale: the same hashed-window frame as [[spanCoverage]], then
    * doc-partitioned island/gap windows (partitions bounded by doc
    * length) and one row_number pick per doc.
    */
  def spanTrimPlan(documents: DataFrame, k: Int = 6): DataFrame = {
    val w = documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(toks) - ${k - 1}),
           |  i -> struct(i as pos, xxhash64(slice(toks, i, $k)) as sh))"""
          .stripMargin)).as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.sh").as("sh"))
    val dupSpans = w
      .select(col("sh"), col("doc_id")).distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("sh"))
    val dup = w.join(dupSpans, Seq("sh"))
      .select(col("doc_id"), col("pos"))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val isl = dup
      .withColumn("prev", lag(col("pos"), 1).over(byPos))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") - col("prev") > k, 1L)
          .otherwise(0L))
      .withColumn("iid", sum(col("brk")).over(byPos))
      .groupBy(col("doc_id"), col("iid"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (k - 1)).as("e"))
    val byIsland = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val before = isl
      .withColumn("pe", lag(col("e"), 1).over(byIsland))
      .select(col("doc_id"),
        coalesce(col("pe") + 1, lit(1)).as("gs"),
        (col("s") - 1).as("ge"))
    val nTok = documents
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
    val after = isl.groupBy(col("doc_id")).agg(max(col("e")).as("le"))
      .join(nTok, Seq("doc_id"))
      .select(col("doc_id"), (col("le") + 1).as("gs"),
        col("n_tokens").as("ge"))
    val gaps = before.unionByName(after)
      .filter(col("ge") >= col("gs"))
      .withColumn("len", col("ge") - col("gs") + 1)
    val best = gaps
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("len").desc, col("gs"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("gs"), col("len"))
    val dupDocs = dup.select(col("doc_id")).distinct()
      .withColumn("has_dup", lit(true))
    nTok
      .join(dupDocs, Seq("doc_id"), "left")
      .join(best, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        when(col("has_dup").isNull, lit(1L))
          .otherwise(coalesce(col("gs"), lit(0L))).cast("bigint")
          .as("keep_from"),
        when(col("has_dup").isNull, col("n_tokens"))
          .otherwise(coalesce(col("len"), lit(0L))).cast("bigint")
          .as("keep_len"))
      .withColumn("dropped_tokens", col("n_tokens") - col("keep_len"))
      .orderBy(col("doc_id"))
  }

  /** Apply the [[spanTrimPlan]] and EMIT the edited corpus — the final
    * step of the Lee et al. loop (exact-substring removal actually
    * changing the training text, not just planning to): per document,
    * `cleaned_text` is the kept stretch `[keep_from, keep_from +
    * keep_len)` re-joined, with the plan's bookkeeping columns riding
    * along so the edit is auditable row by row.
    *
    * Scale: the plan join is by doc_id; the slice+concat is a map-only
    * projection over the token array — no new shuffle beyond the plan's
    * own. Fully-covered docs (keep_len 0) emit an empty cleaned_text,
    * which a downstream funnel stage then drops as zero-token.
    */
  def spanTrimApply(documents: DataFrame, k: Int = 6): DataFrame =
    documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .join(spanTrimPlan(documents, k), Seq("doc_id"))
      .select(
        col("doc_id"), col("n_tokens"), col("keep_from"), col("keep_len"),
        col("dropped_tokens").as("removed_tokens"),
        concat_ws(" ", slice(col("toks"),
          greatest(col("keep_from"), lit(1L)).cast("int"),
          col("keep_len").cast("int"))).as("cleaned_text"))
      .orderBy(col("doc_id"))

  def spanTrimApplyOracleSql(k: Int = 6, table: String = "documents"): String =
    s"""WITH plan AS MATERIALIZED (
       |${spanTrimPlanOracleSql(k, table)}
       |),
       |tk AS (SELECT doc_id, string_split(text, ' ') AS toks
       |       FROM $table)
       |SELECT p.doc_id, p.n_tokens, p.keep_from, p.keep_len,
       |  p.dropped_tokens AS removed_tokens,
       |  COALESCE(array_to_string(
       |    tk.toks[CAST(greatest(p.keep_from, 1) AS INT) :
       |            CAST(greatest(p.keep_from, 1) + p.keep_len - 1 AS INT)],
       |    ' '), '') AS cleaned_text
       |FROM plan p JOIN tk USING (doc_id)
       |ORDER BY p.doc_id""".stripMargin

  /** Apply the [[spanMaskPlan]] and emit the masked corpus: every token
    * covered by a gated L-token span is replaced by the `sentinel`
    * (PII-redaction shape: positions are derived, text is rewritten).
    *
    * Because the mask starts are a PURE function of (doc_id, pos) — the
    * splitmix64 gate — the apply needs NO join with the plan at all:
    * token j is masked iff some start s in [max(1, j+1-L+1), j+1]
    * passes the gate, so the whole rewrite is one map-only projection
    * (an exists() over at most L gate evaluations per token) — the
    * 100-TB shape is a scan, zero shuffles. masked_tokens is recomputed
    * from the same predicate and equals the PLAN's interval-union count
    * by construction (spec-pinned in SpanDedupSpec).
    */
  def spanMaskApply(
      documents: DataFrame, spanLen: Int = 3,
      sentinel: String = "<mask>"): DataFrame =
    spanMaskProjection(documents, spanLen, sentinel).orderBy(col("doc_id"))

  /** The rewrite itself, sort-free — stateless per-row, so the SAME code
    * runs under `readStream` unchanged (batch ≡ streaming parity pinned
    * in StreamingMaskSpec); [[spanMaskApply]] adds only the
    * presentation sort for the driver compare.
    */
  def spanMaskProjection(
      documents: DataFrame, spanLen: Int = 3,
      sentinel: String = "<mask>"): DataFrame = {
    val L = spanLen
    def gate(s: Column): Column =
      graft.functions.GraftColumns.mix64(
        col("doc_id") * lit(1000003L) + s)
        .bitwiseAND(lit(15L)) === lit(0L)
    def maskedAt(j: Column): Column = {
      val pos = (j + lit(1)).cast("long")
      exists(
        sequence(greatest(pos - lit((L - 1).toLong), lit(1L)), pos),
        s => gate(s))
    }
    documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("bigint").as("n_tokens"),
        size(filter(col("toks"), (_, j) => maskedAt(j))).cast("bigint")
          .as("masked_tokens"),
        concat_ws(" ", transform(col("toks"),
          (t, j) => when(maskedAt(j), lit(sentinel)).otherwise(t)))
          .as("cleaned_text"))
  }

  def spanMaskApplyOracleSql(
      spanLen: Int = 3, sentinel: String = "<mask>"): String = {
    val L = spanLen
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
       |           FROM documents),
       |nn AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM d),
       |p AS (SELECT doc_id, n, unnest(range(1, n + 1)) AS pos FROM nn),
       |z AS (SELECT doc_id, n, pos,
       |  ((doc_id * 1000003 + pos)::HUGEINT + 11400714819323198485::HUGEINT)
       |    % 18446744073709551616::HUGEINT AS z0
       |  FROM p),
       |${graft.SketchOracles.mixChain("sm", "z", Seq("doc_id", "n", "pos"), "z0")},
       |c AS (SELECT doc_id, n, pos FROM sm4 WHERE mx % 16 = 0),
       |mp AS (SELECT DISTINCT doc_id, i FROM (
       |  SELECT doc_id, unnest(range(pos, least(pos + ${L - 1}, n) + 1)) AS i
       |  FROM c)),
       |ml AS (SELECT doc_id, list(i) AS ml FROM mp GROUP BY 1)
       |SELECT nn.doc_id, nn.n AS n_tokens,
       |  CAST(COALESCE(len(ml.ml), 0) AS BIGINT) AS masked_tokens,
       |  array_to_string(list_transform(range(1, nn.n + 1),
       |    i -> CASE WHEN COALESCE(list_contains(ml.ml, i), false)
       |         THEN '$sentinel' ELSE nn.toks[i] END), ' ') AS cleaned_text
       |FROM nn LEFT JOIN ml USING (doc_id)
       |ORDER BY nn.doc_id""".stripMargin
  }

  def spanTrimPlanOracleSql(k: Int = 6, table: String = "documents"): String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
       |            FROM $table),
       |w AS (
       |  SELECT doc_id, unnest(list_transform(
       |    range(1, len(toks) - ${k - 2}),
       |    i -> struct_pack(pos := i,
       |      span := array_to_string(toks[i:i+${k - 1}], ' ')))) AS s
       |  FROM tk WHERE len(toks) >= $k),
       |wf AS (SELECT doc_id, s.pos AS pos, s.span AS span FROM w),
       |ds AS (SELECT span FROM (SELECT DISTINCT span, doc_id FROM wf)
       |       GROUP BY span HAVING count(*) >= 2),
       |dup AS (SELECT doc_id, pos FROM wf JOIN ds USING (span)),
       |lagd AS (
       |  SELECT doc_id, pos,
       |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |  FROM dup),
       |brks AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN prev IS NULL OR pos - prev > $k THEN 1 ELSE 0 END
       |      AS brk
       |  FROM lagd),
       |iids AS (
       |  SELECT doc_id, pos,
       |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid
       |  FROM brks),
       |isl AS (
       |  SELECT doc_id, iid, CAST(min(pos) AS BIGINT) AS s,
       |    CAST(max(pos) + ${k - 1} AS BIGINT) AS e
       |  FROM iids GROUP BY 1, 2),
       |ntok AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
       |    AS n_tokens
       |  FROM $table),
       |bef AS (
       |  SELECT doc_id,
       |    COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY s) + 1, 1)
       |      AS gs,
       |    s - 1 AS ge
       |  FROM isl),
       |aft AS (
       |  SELECT i.doc_id, max(i.e) + 1 AS gs, max(n.n_tokens) AS ge
       |  FROM isl i JOIN ntok n ON i.doc_id = n.doc_id
       |  GROUP BY 1),
       |gaps AS (
       |  SELECT doc_id, gs, ge, ge - gs + 1 AS len
       |  FROM (SELECT * FROM bef UNION ALL SELECT * FROM aft)
       |  WHERE ge >= gs),
       |best AS (
       |  SELECT doc_id, gs, len FROM (
       |    SELECT *, row_number() OVER (PARTITION BY doc_id
       |      ORDER BY len DESC, gs) AS rk
       |    FROM gaps)
       |  WHERE rk = 1),
       |dd AS (SELECT DISTINCT doc_id FROM dup)
       |SELECT n.doc_id, n.n_tokens,
       |  CAST(CASE WHEN dd.doc_id IS NULL THEN 1
       |    ELSE COALESCE(b.gs, 0) END AS BIGINT) AS keep_from,
       |  CAST(CASE WHEN dd.doc_id IS NULL THEN n.n_tokens
       |    ELSE COALESCE(b.len, 0) END AS BIGINT) AS keep_len,
       |  n.n_tokens - CAST(CASE WHEN dd.doc_id IS NULL THEN n.n_tokens
       |    ELSE COALESCE(b.len, 0) END AS BIGINT) AS dropped_tokens
       |FROM ntok n
       |LEFT JOIN dd ON n.doc_id = dd.doc_id
       |LEFT JOIN best b ON n.doc_id = b.doc_id
       |ORDER BY n.doc_id""".stripMargin

  def duplicateSpansOracleSql(k: Int = 6, topN: Int = 30): String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
       |            FROM documents),
       |w AS (
       |  SELECT doc_id, unnest(list_transform(
       |    range(1, len(toks) - ${k - 2}),
       |    i -> struct_pack(pos := i,
       |      span := array_to_string(toks[i:i+${k - 1}], ' ')))) AS s
       |  FROM tk WHERE len(toks) >= $k)
       |SELECT s.span AS span,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_occ
       |FROM w GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY n_docs DESC, n_occ DESC, span
       |LIMIT $topN""".stripMargin

  def spanCoverageOracleSql(k: Int = 6): String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
       |            FROM documents),
       |w AS (
       |  SELECT doc_id, unnest(list_transform(
       |    range(1, len(toks) - ${k - 2}),
       |    i -> struct_pack(pos := i,
       |      span := array_to_string(toks[i:i+${k - 1}], ' ')))) AS s
       |  FROM tk WHERE len(toks) >= $k),
       |wf AS (SELECT doc_id, s.pos AS pos, s.span AS span FROM w),
       |ds AS (SELECT span FROM (SELECT DISTINCT span, doc_id FROM wf)
       |       GROUP BY span HAVING count(*) >= 2),
       |dup AS (SELECT doc_id, pos FROM wf JOIN ds USING (span)),
       |lagd AS (
       |  SELECT doc_id, pos,
       |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |  FROM dup),
       |perdoc AS (
       |  SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS dup_windows,
       |    CAST(sum(CASE WHEN prev IS NULL THEN $k
       |      ELSE least($k, pos - prev) END) AS BIGINT) AS covered_tokens,
       |    CAST(sum(CASE WHEN prev IS NULL OR pos - prev > $k
       |      THEN 1 ELSE 0 END) AS BIGINT) AS dup_islands
       |  FROM lagd GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |  COALESCE(p.dup_windows, 0) AS dup_windows,
       |  COALESCE(p.covered_tokens, 0) AS covered_tokens,
       |  COALESCE(p.dup_islands, 0) AS dup_islands,
       |  COALESCE(p.covered_tokens, 0) * 1000000
       |    // len(string_split(d.text, ' ')) AS coverage_ppm
       |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
