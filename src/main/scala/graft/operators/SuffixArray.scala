package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction by PREFIX DOUBLING — the exact
  * substring-duplication primitive behind suffix-array corpus dedup
  * (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
  * Better", arXiv:2107.06499, which builds a suffix array over the
  * corpus to find verbatim repeated spans; distributed construction
  * follows the prefix-doubling family of Flick & Aluru, SC'15,
  * "Parallel distributed memory construction of suffix and longest
  * common prefix arrays").
  *
  * Suffixes live WITHIN documents (a training-dedup span never crosses a
  * document boundary); the ORDER is global across the corpus. Level
  * ranks r_b(i) order every suffix by its first b characters; doubling
  * combines (r_b(i), r_b(i + b) | 0 past end) into r_{2b}. The 0
  * end-sentinel sorts a proper prefix before its extensions, matching
  * binary string order ("ab" < "abc").
  *
  * Cost shape, and the two optimizations over naive doubling:
  *   - the BASE level ranks 8-char blocks directly (one distinct +
  *     global rank over substr(text, pos, 8)), skipping the three
  *     cheapest-but-jobful single-char rounds;
  *   - each doubling round needs only an EQUALITY-and-ORDER-preserving
  *     combine, not a dense rank — so rounds alternate between a pure
  *     ARITHMETIC encode r*(D+1)+r2 (a map-only projection over the
  *     per-doc `lead` window; valid while D^2 < 2^63, i.e. rank bound
  *     D < ~3e9) and a true densify ([[DistributedRank]] global rank
  *     over the distinct pair frame — range-partitioned, offset
  *     broadcast, never a single-partition window). Beyond ~3e9
  *     distinct ranks the encode step is skipped automatically and
  *     every round densifies — the 100-TB fallback is the plain
  *     algorithm, not an overflow.
  *
  * Rounds are bounded by ceil(log2(maxLen / 8)) + 1 (5 for the harness
  * corpus); each level is localCheckpointed so plan depth stays
  * constant. Rows = corpus CHARACTERS — the rank representation keeps
  * the O(n^2)-character suffix universe at O(n) rows per level, which
  * is the entire point; the brute-force alternative (sort all suffix
  * STRINGS) is exactly what the DuckDB oracle does at test scale.
  *
  * Character semantics: byte-wise ordering on ASCII text (the harness
  * corpus is verified ASCII; Spark UTF8String comparison and DuckDB's
  * default binary collation agree there).
  */
object SuffixArray {

  private val BaseBlock = 8L
  /** Encode r*(D+1)+r2 stays in a signed long while D < ~3e9. */
  private val MaxEncodableRank = 3000000000L

  /** Per-level rank frames (doc_id, pos [1-based], rem [suffix chars
    * remaining], r): `levels(i)` ranks by the first `blocks(i)` chars
    * (equality-exact; order-preserving). The last level is the full
    * suffix order. Every frame is localCheckpointed.
    */
  final case class Ranks(
      documents: DataFrame,
      levels: IndexedSeq[DataFrame],
      blocks: IndexedSeq[Long],
      n: Long, maxLen: Long,
      private val dupAtLastThunk: () => Boolean) {
    /** duplicates (rem-filtered, cnt >= 2) exist at the LAST level's
      * block — false means the chain stopped because LRS < last block
      * (no deeper level can ever be probed), true means it stopped at
      * the maxLen bound. Lazily evaluated: builds whose caller never
      * probes past the stop block (e.g. [[suffixArrayHead]]'s base-only
      * build) skip the grouped-count job entirely.
      */
    lazy val dupAtLast: Boolean = dupAtLastThunk()
  }

  /** Session-scoped Ranks cache: the suffix index is derived once per
    * corpus and consumed by several span queries (head, LRS,
    * contamination, span plans) — exactly the production pattern of
    * "build the index once, run span queries against it". Same caveats
    * as the [[Dedup]] cluster-label cache: LocalRelation plans are
    * never cached (canonicalization prints only their schema, so two
    * in-memory fixtures would collide), the applicationId keys out
    * frames whose localCheckpoint blocks died with a previous context,
    * and computation runs outside the lock. Value = (stopBlock the
    * build was requested with, the Ranks).
    */
  private val ranksCache =
    scala.collection.mutable.Map.empty[(String, String, String), (Long, Ranks)]

  /** Cache key for a corpus frame. The canonicalized plan alone is NOT
    * sufficient: Spark canonicalization normalizes relation output to
    * positional ids, so two parquet reads of DIFFERENT datasets with the
    * same schema canonicalize to the same string (caught by the
    * SuffixArraySpec cache test — a 36-char fixture served a 96-char
    * corpus's request). The backing files join the key to pin the
    * actual data.
    */
  private[graft] def corpusKey(df: DataFrame): (String, String, String) = (
    df.sparkSession.sparkContext.applicationId,
    df.queryExecution.logical.canonicalized.toString,
    df.inputFiles.sorted.mkString(","))

  /** Release the block-manager storage behind a localCheckpoint'd frame
    * when a session cache evicts it: walk the plan for LogicalRDD leaves
    * (what localCheckpoint compiles to) and unpersist their RDDs
    * (non-blocking). Without this, every evicted or race-discarded cache
    * entry leaks its checkpoint blocks for the SparkContext lifetime.
    * Callers only free frames whose results prior consumers have already
    * materialized (session caches evict wholesale between corpora).
    */
  private[graft] def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false): Unit
      case _ => ()
    }

  /** A cached build serves a request iff it was built at least as deep
    * (builtStop >= requested), or its chain terminated for a reason a
    * deeper build could not change: the maxLen stop (blocks.last·2 >
    * maxLen — the chain is already complete) or duplicates exhausted
    * (!dupAtLast — LRS < last block, so every deeper probe is provably
    * empty and [[sharedPrefixGroups]] returns empty from the duplicate-
    * free last level).
    */
  private def satisfies(builtStop: Long, r: Ranks, requested: Long): Boolean =
    builtStop >= requested || r.blocks.last * 2 > r.maxLen || !r.dupAtLast

  /** Cached entry point: [[computeBuild]] behind the session-scoped
    * [[ranksCache]].
    */
  def build(documents: DataFrame, stopBlock: Long = Long.MaxValue): Ranks = {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val uncacheable =
      documents.queryExecution.logical.exists(_.isInstanceOf[LocalRelation])
    if (uncacheable) return computeBuild(documents, stopBlock)
    val key = corpusKey(documents)
    ranksCache.synchronized(ranksCache.get(key)) match {
      case Some((builtStop, r)) if satisfies(builtStop, r, stopBlock) => r
      case _ =>
        val computed = computeBuild(documents, stopBlock)
        ranksCache.synchronized {
          // a concurrent build may have landed a satisfying entry: keep
          // it, free OUR discarded levels (nobody has seen them)
          ranksCache.get(key) match {
            case Some((builtStop, r)) if satisfies(builtStop, r, stopBlock) =>
              computed.levels.foreach(freeCheckpoint)
              r
            case replaced =>
              if (ranksCache.size >= 4) {
                ranksCache.valuesIterator
                  .foreach(_._2.levels.foreach(freeCheckpoint))
                ranksCache.clear()
              } else replaced.foreach(_._2.levels.foreach(freeCheckpoint))
              ranksCache.update(key, (stopBlock, computed))
              computed
          }
        }
    }
  }

  /** Run prefix doubling to completion (or to `stopBlock`, for callers
    * that only ever probe a fixed prefix length). Driver loop is
    * bounded by log2(maxLen) rounds; the only driver-side data are
    * per-round scalar counts.
    */
  private def computeBuild(
      documents: DataFrame, stopBlock: Long = Long.MaxValue): Ranks = {
    val spark = documents.sparkSession
    val base = documents
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"),
        explode(sequence(lit(1), length(col("text")))).as("pos"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        (col("len") - col("pos") + 1).cast("long").as("rem"),
        expr(s"substr(text, pos, $BaseBlock)").as("b8"))
      .localCheckpoint()
    val stats = base.agg(count(lit(1)), max(col("rem"))).head()
    val n = stats.getLong(0)
    val maxLen = stats.getLong(1)
    // base level: global rank of the 8-char block strings (substr of a
    // short suffix is the full suffix — equality and order match the
    // sentinel semantics: a proper prefix sorts before its extensions)
    val blockRank = DistributedRank.withGlobalRank(
      base.select(col("b8")).distinct(), Seq(col("b8")), rankCol = "r")
    var cur = base.join(blockRank, Seq("b8"))
      .select(col("doc_id"), col("pos"), col("rem"), col("r"))
      .localCheckpoint()
    var dBound = blockRank.count() // exact distinct count (dense rank)
    DistributedRank.release(spark)
    var distinctKnown = dBound // == n terminates (all suffixes resolved)
    // duplicate check at the current block: two suffixes (rem >= b)
    // sharing a rank == a repeated b-char substring exists. The moment
    // this turns false the chain STOPS — LRS < b, so no deeper level is
    // ever probed (LRS-driven early termination; for a corpus whose
    // longest repeat is r, the chain costs log2(r), not log2(maxLen),
    // rounds).
    def hasDup(lev: DataFrame, b: Long): Boolean =
      !lev.filter(col("rem") >= b).groupBy(col("r"))
        .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 2).isEmpty
    val levels = scala.collection.mutable.ArrayBuffer(cur)
    val blocks = scala.collection.mutable.ArrayBuffer(BaseBlock)
    var block = BaseBlock
    // hasDup of the current last level, evaluated only when the block
    // bound would allow another round — base-only builds (stopBlock =
    // BaseBlock) and the final maxLen-stopped level skip the grouped-
    // count job; Ranks.dupAtLast computes it lazily if a caller probes.
    var lastDup: Option[Boolean] = None
    // the maxLen stop: once 2*block > maxLen, a probe at l <= maxLen
    // only ever uses the largest block <= l, and the dyadic chain
    // already guarantees 2*block > l there
    while (block * 2 <= math.min(maxLen, stopBlock) && distinctKnown < n
        && { val d = hasDup(cur, block); lastDup = Some(d); d }) {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val paired = cur
        .withColumn("r2", coalesce(lead(col("r"), block.toInt).over(w), lit(0L)))
      if (dBound <= MaxEncodableRank) {
        // map-only combine: equality/order-preserving, no shuffle
        cur = paired
          .select(col("doc_id"), col("pos"), col("rem"),
            (col("r") * (dBound + 1L) + col("r2")).as("r"))
          .localCheckpoint()
        dBound = dBound * (dBound + 2L)
        // distinctKnown unknown on encoded rounds; next densify learns it
      } else {
        val pairRank = DistributedRank.withGlobalRank(
          paired.select(col("r"), col("r2")).distinct(),
          Seq(col("r"), col("r2")), rankCol = "nr")
        cur = paired.join(pairRank, Seq("r", "r2"))
          .select(col("doc_id"), col("pos"), col("rem"), col("nr").as("r"))
          .localCheckpoint()
        DistributedRank.release(spark)
        dBound = cur.agg(max(col("r"))).head().getLong(0) // dense => max==count
        distinctKnown = dBound
      }
      block *= 2
      levels += cur
      blocks += block
      lastDup = None
    }
    val (lastLevel, lastBlock, known) = (cur, block, lastDup)
    Ranks(documents, levels.toIndexedSeq, blocks.toIndexedSeq, n, maxLen,
      () => known.getOrElse(hasDup(lastLevel, lastBlock)))
  }

  /** The head of the suffix array: the `k` lexicographically smallest
    * suffixes as (suffix_rank [dense], doc_id, pos) — ties (equal full
    * suffixes) share a rank and order by (doc_id, pos).
    *
    * Top-k does NOT need the full doubling chain: a suffix can only
    * reach the global top-k if its 8-char block rank is <= k (each
    * distinct block contributes >= 1 suffix), and that candidate set is
    * DOWNWARD-CLOSED in suffix order (anything smaller than a candidate
    * has a smaller-or-equal block rank), so dense ranks computed within
    * it equal the global dense ranks for the head. One block-rank pass
    * prunes the corpus to O(k) blocks' worth of suffixes; only those
    * few materialize their suffix STRINGS for the final exact ordering.
    * ([[longestRepeatedSubstring]] is the query that exercises the full
    * doubling chain; this one exercises the base ranking + the pruning
    * argument.)
    */
  def suffixArrayHead(documents: DataFrame, k: Int = 100): DataFrame = {
    // the base level's r IS the dense 8-char block rank, so the shared
    // (cached) base-only build replaces the standalone distinct+rank
    // pass; only the <= k smallest blocks' suffixes rejoin `documents`
    // to materialize their suffix strings.
    val ranks = build(documents, stopBlock = BaseBlock)
    val cand = ranks.levels(0)
      .filter(col("r") <= k)
      .join(documents.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("doc_id"), col("pos"),
        expr("substr(text, CAST(pos AS INT))").as("s"))
      .localCheckpoint() // bounded: <= k distinct blocks' suffixes
    val strRank = DistributedRank.withGlobalRank(
      cand.select(col("s")).distinct(), Seq(col("s")), rankCol = "suffix_rank")
    val out = cand.join(strRank, Seq("s"))
      .select(col("suffix_rank"), col("doc_id"), col("pos"))
      .orderBy(col("suffix_rank"), col("doc_id"), col("pos"))
      .limit(k)
      .localCheckpoint()
    DistributedRank.release(documents.sparkSession)
    out
  }

  /** Grouped frame of suffixes (rem >= l) sharing their first `l`
    * characters, >= 2 members per group: (cnt, m = min (doc_id, pos)).
    * For l below the base block the groups come straight from
    * substr(text, pos, l); otherwise from the level rank pair
    * (r_b(i), r_b(i + l - b)) with b the largest block <= l — the two
    * b-blocks overlap-cover [0, l) since the dyadic chain gives 2b > l.
    * (If doubling terminated early with all ranks distinct, larger-l
    * probes correctly return empty: a shared-l-prefix pair would have
    * collided at the distinct level.)
    */
  private def sharedPrefixGroups(ranks: Ranks, l: Long): DataFrame = {
    require(l >= 1 && l <= ranks.maxLen)
    val grouped =
      if (l < BaseBlock) {
        ranks.documents
          .filter(length(col("text")) >= l)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(1), length(col("text")) - lit(l) + 1))
              .as("pos"))
          .select(col("doc_id"), col("pos").cast("long").as("pos"),
            expr(s"substr(text, pos, $l)").as("v1"), lit(0L).as("v2"))
      } else {
        val i = ranks.blocks.lastIndexWhere(_ <= l)
        val b = ranks.blocks(i)
        val lev = ranks.levels(i)
        val off = (l - b).toInt
        if (off == 0)
          lev.filter(col("rem") >= l)
            .select(col("doc_id"), col("pos"),
              col("r").as("v1"), col("r").as("v2"))
        else {
          val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          lev.withColumn("v2", lead(col("r"), off).over(w))
            .filter(col("rem") >= l)
            .select(col("doc_id"), col("pos"), col("r").as("v1"), col("v2"))
        }
      }
    grouped
      .groupBy(col("v1"), col("v2"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("m"))
      .filter(col("cnt") >= 2)
  }

  /** Exact longest repeated substring over the corpus: binary search on
    * the length using [[sharedPrefixGroups]] (log2(maxLen) existence
    * probes, each one grouped count over the character frame — no
    * suffix strings, no quadratic pair scan), then one final pass at
    * the maximum for the witness row:
    * (lrs_len, n_suffixes [members of any >= 2 group at lrs_len],
    *  witness_doc_id, witness_pos [smallest such suffix]).
    * Precondition: some character repeats (any real corpus), so
    * lrs_len >= 1.
    */
  def longestRepeatedSubstring(documents: DataFrame): DataFrame = {
    val ranks = build(documents)
    def exists(l: Long): Boolean =
      !sharedPrefixGroups(ranks, l).isEmpty
    // the build already bracketed the answer: every level up to the
    // second-to-last has duplicates (so exists(block) held), and either
    // the LAST block does not (LRS in [prevBlock, lastBlock)) or the
    // chain hit the maxLen stop (LRS in [lastBlock, maxLen]); only the
    // remaining interval is bisected with lead-window probes
    var lo = 1L // assumed feasible (repeated character)
    var hi = ranks.maxLen + 1 // exclusive upper bound
    if (ranks.dupAtLast) {
      lo = ranks.blocks.last
      if (exists(ranks.maxLen)) lo = ranks.maxLen
      else hi = ranks.maxLen
    } else {
      if (ranks.blocks.size >= 2) lo = ranks.blocks(ranks.blocks.size - 2)
      hi = math.min(ranks.blocks.last, ranks.maxLen + 1)
    }
    while (lo + 1 < hi) { // invariant: exists(lo), !exists(hi)
      val mid = (lo + hi) / 2
      if (exists(mid)) lo = mid else hi = mid
    }
    sharedPrefixGroups(ranks, lo).agg(
      sum(col("cnt")).as("n_suffixes"),
      min(col("m")).as("mm"))
      .select(lit(lo).as("lrs_len"), col("n_suffixes"),
        col("mm.doc_id").as("witness_doc_id"),
        col("mm.pos").as("witness_pos"))
  }

  /** Cross-split VERBATIM contamination at `l`-character granularity —
    * the decontamination check of Lee et al. 2021 §4 applied to the
    * repo's own content-hash split rule (doc_splits: rollingHash(text)
    * % 100 → 80/10/10): for every TEST document, count its suffixes
    * (rem >= l) whose first l characters also open a suffix of some
    * train/val document. Exact, not sketched: equality of block-l
    * ranks IS equality of the l-char prefix (both blocks full under
    * the rem filter).
    *
    * Output: (doc_id [test], n_suffixes [contaminated positions],
    * n_prefixes [distinct shared l-grams]), ordered by doc_id.
    * `l` must be a dyadic block (8·2^k); the build stops at that block
    * — log2(l/8) rounds, never the full chain. If the corpus has no
    * repeated l/2-prefix at all the chain stops early and the result
    * is correctly empty.
    */
  def splitContamination(documents: DataFrame, l: Long = 64L): DataFrame = {
    require(l >= BaseBlock && java.lang.Long.bitCount(l / BaseBlock) == 1
      && l % BaseBlock == 0, s"l must be ${BaseBlock}*2^k")
    val ranks = build(documents, stopBlock = l)
    val bucket = graft.functions.GraftColumns.rollingHash(col("text")) % 100
    val split = when(bucket < 80, "train").when(bucket < 90, "val")
      .otherwise("test")
    val splits = documents.select(col("doc_id"), split.as("split"))
    val i = ranks.blocks.lastIndexWhere(_ <= l)
    if (ranks.blocks(i) != l) {
      // duplicate-free below l: nothing can be contaminated at l
      val spark = documents.sparkSession
      import spark.implicits._
      Seq.empty[(Long, Long, Long)]
        .toDF("doc_id", "n_suffixes", "n_prefixes")
    } else {
      val lev = ranks.levels(i).filter(col("rem") >= l)
        .join(splits, Seq("doc_id"))
      val corpusPre = lev.filter(col("split") =!= "test")
        .select(col("r")).distinct()
      lev.filter(col("split") === "test")
        .join(corpusPre, Seq("r"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_suffixes"),
          countDistinct(col("r")).as("n_prefixes"))
        .orderBy(col("doc_id"))
    }
  }

  /** DuckDB replay of [[splitContamination]]: substr l-grams grouped
    * directly, split assignment via the doc_splits list_reduce hash.
    */
  def splitContaminationOracleSql(l: Long = 64L): String =
    s"""WITH f AS (
      |  SELECT doc_id, text,
      |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM (
      |    SELECT doc_id, text,
      |      list_reduce(
      |        list_prepend(CAST(0 AS BIGINT),
      |          list_transform(range(1, length(text) + 1),
      |                         i -> CAST(ascii(text[i]) AS BIGINT))),
      |        (a, b) -> (a * 31 + b) % 1000000007) % 100 AS b
      |    FROM documents)),
      |p AS (
      |  SELECT doc_id, split,
      |    unnest(list_transform(range(1, length(text) - ${l - 1} + 1),
      |      i -> substr(text, CAST(i AS INT), $l))) AS pre
      |  FROM f WHERE length(text) >= $l),
      |corpus AS (
      |  SELECT DISTINCT pre FROM p WHERE split <> 'test')
      |SELECT p.doc_id,
      |  CAST(count(*) AS BIGINT) AS n_suffixes,
      |  CAST(count(DISTINCT p.pre) AS BIGINT) AS n_prefixes
      |FROM p JOIN corpus USING (pre)
      |WHERE p.split = 'test'
      |GROUP BY 1
      |ORDER BY doc_id""".stripMargin

  /** DuckDB replay of [[suffixArrayHead]]: materialize every suffix
    * STRING and sort — the brute-force formulation the rank chain
    * avoids, which is exactly what makes it an independent oracle.
    */
  def suffixArrayHeadOracleSql(k: Int = 100): String =
    s"""WITH p AS (
      |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS pos
      |  FROM documents WHERE length(text) >= 1),
      |sfx AS (
      |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |    substr(text, CAST(pos AS INT)) AS s
      |  FROM p)
      |SELECT CAST(dense_rank() OVER (ORDER BY s) AS BIGINT) AS suffix_rank,
      |  doc_id, pos
      |FROM sfx
      |ORDER BY suffix_rank, doc_id, pos
      |LIMIT $k""".stripMargin

  /** DuckDB replay of [[longestRepeatedSubstring]]: adjacent-LCP over
    * the sorted suffix strings (max adjacent LCP == max pairwise shared
    * prefix, the defining suffix-array property), then one group-by on
    * the lrs_len-prefix.
    */
  def lrsOracleSql: String =
    """WITH p AS (
      |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS pos
      |  FROM documents WHERE length(text) >= 1),
      |sfx AS (
      |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |    substr(text, CAST(pos AS INT)) AS s
      |  FROM p),
      |srt AS (
      |  SELECT s, lead(s) OVER (ORDER BY s, doc_id, pos) AS s2 FROM sfx),
      |lcps AS (
      |  -- array_position yields 0/NULL (version-dependent) when no
      |  -- mismatch exists => the common prefix is the full min length
      |  SELECT CASE WHEN s2 IS NULL THEN 0
      |    WHEN COALESCE(array_position(list_transform(
      |        range(1, least(length(s), length(s2)) + 1),
      |        j -> substr(s, CAST(j AS INT), 1)
      |           = substr(s2, CAST(j AS INT), 1)), false), 0) = 0
      |      THEN least(length(s), length(s2))
      |    ELSE array_position(list_transform(
      |        range(1, least(length(s), length(s2)) + 1),
      |        j -> substr(s, CAST(j AS INT), 1)
      |           = substr(s2, CAST(j AS INT), 1)), false) - 1
      |    END AS lcp
      |  FROM srt),
      |mx AS (SELECT CAST(max(lcp) AS BIGINT) AS lrs_len FROM lcps),
      |grp AS (
      |  SELECT substr(s, 1, (SELECT CAST(lrs_len AS INT) FROM mx)) AS pre,
      |    doc_id, pos
      |  FROM sfx WHERE length(s) >= (SELECT lrs_len FROM mx)),
      |big AS (SELECT pre FROM grp GROUP BY pre HAVING count(*) >= 2),
      |mem AS (SELECT g.doc_id, g.pos FROM grp g JOIN big USING (pre))
      |SELECT m.lrs_len,
      |  (SELECT CAST(count(*) AS BIGINT) FROM mem) AS n_suffixes,
      |  w.doc_id AS witness_doc_id, w.pos AS witness_pos
      |FROM mx m,
      |  (SELECT doc_id, pos FROM mem ORDER BY doc_id, pos LIMIT 1) w""".stripMargin
}
