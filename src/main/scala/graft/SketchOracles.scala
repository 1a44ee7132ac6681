package graft

import graft.functions.TextAnalysis
import graft.operators.Hll

/** Machine-generated DuckDB oracle SQL for the sketch queries whose hash
  * families are public and cross-engine-emulatable: the Count-Min token
  * sketch and the relational HyperLogLog. Unlike the hand-embedded
  * minhash/simhash oracles (kept verbatim, guarded by
  * tools/check_mix_oracles.py), these are EMITTED from one Scala
  * fragment generator, so the 5-stage splitmix64 chain exists in exactly
  * one place per query and cannot drift by a typo.
  *
  * Shared HUGEINT-mod-2^64 conventions (proven bit-exact by the minhash /
  * ann_lsh oracles at 3 SFs): wrapping 64-bit multiplies decompose into
  * 32-bit limbs; `xor` on < 2^64 HUGEINTs matches two's-complement Long
  * XOR; `// 2^s` is the unsigned right shift; `% 2^s` the low-bit mask.
  */
object SketchOracles {

  private[graft] val U64 = "18446744073709551616::HUGEINT"

  /** Unsigned-decimal literal of a JVM Long's two's-complement bits. */
  private def ulit(x: Long): String =
    (BigInt(x) & ((BigInt(1) << 64) - 1)).toString + "::HUGEINT"

  private def dlit(d: Double): String = {
    require(!d.isNaN && !d.isInfinite, s"non-finite oracle constant: $d")
    java.lang.Double.toString(d)
  }

  /** CTE stages computing `mx` = Mix64.mix(x) GIVEN z0 = x + golden-ratio
    * increment: Mix64.mix DOES start with `x + 0x9E3779B97F4A7C15L`, and
    * each CALLER emits that pre-add when it builds `xExpr` (so the add can
    * fuse with the caller's seed xor in one CTE). Dropping the caller-side
    * `+ 11400714819323198485::HUGEINT` breaks bit-exactness. The stages
    * here are the three avalanche rounds: multiplier limbs are
    * 0xBF58476D1CE4E5B9 and 0x94D049BB133111EB split at 2^32.
    */
  private[graft] def mixChain(p: String, from: String, carry: Seq[String], xExpr: String): String = {
    val c = carry.mkString(", ")
    s"""${p}0 AS (SELECT $c, xor(($xExpr), ($xExpr) // 1073741824) AS a1x FROM $from),
${p}1 AS (SELECT $c, ((a1x * 484763065::HUGEINT) % $U64 + ((a1x * 3210233709::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % $U64 AS z1 FROM ${p}0),
${p}2 AS (SELECT $c, xor(z1, z1 // 134217728) AS a2 FROM ${p}1),
${p}3 AS (SELECT $c, ((a2 * 321982955::HUGEINT) % $U64 + ((a2 * 2496678331::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % $U64 AS z2 FROM ${p}2),
${p}4 AS (SELECT $c, xor(z2, z2 // 2147483648) AS mx FROM ${p}3)"""
  }

  /** FNV-1a 64 of a string column's bytes (ASCII-only corpora: ord() of a
    * character == its UTF-8 byte only below 0x80 — guarded by
    * [[asciiGuard]]).
    */
  private[graft] def fnvExpr(tok: String): String =
    s"""list_reduce(
      list_prepend(14695981039346656037::HUGEINT,
        list_transform(range(1, length($tok)+1), i -> ord(substr($tok, i, 1))::HUGEINT)),
      (h, b) -> (xor(h, b) * 1099511628211::HUGEINT) % $U64)"""

  /** Scalar subquery = 0 iff every document is pure ASCII; otherwise the
    * oracle run fails loudly (error()) instead of hashing ord(codepoint)
    * where the engine hashed UTF-8 bytes — divergence must never surface
    * as a quietly wrong oracle. THE single definition: SparkEntry's
    * hand-embedded byte-fold oracles append `= 0` to this same fragment.
    */
  /** [[asciiGuard]] generalized to any documents column the byte-fold
    * oracles hash (text for the content gates, source for the mixture
    * weights).
    */
  private[graft] def asciiGuardOn(column: String): String =
    s"(SELECT CASE WHEN count(*) = 0 THEN 0 ELSE error('non-ASCII $column: " +
      "byte-fold oracle invalid') END FROM documents " +
      s"WHERE strlen($column) <> length($column))"

  val asciiGuard: String = asciiGuardOn("text")

  /** token_topk_cms: the full Count-Min sketch — counters summed from the
    * exact histogram (identical to per-occurrence increments), top-k by
    * exact count, estimate = min over depth rows of the probed buckets.
    * Mirrors TextAnalysis.tokenTopkCms stage for stage.
    */
  def cmsSql(k: Int = 20,
             depth: Int = TextAnalysis.CmsDepth,
             width: Int = TextAnalysis.CmsWidth): String = {
    val seedRows = TextAnalysis.cmsSeeds(depth).zipWithIndex
      .map { case (s, d) => s"    ($d, ${ulit(s)})" }.mkString(",\n")
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
cnt AS (SELECT token, count(*) AS exact_count FROM toks GROUP BY token),
fh AS (SELECT token, exact_count, ${fnvExpr("token")} AS hu FROM cnt),
sd(d, su) AS (VALUES
$seedRows),
hx AS (SELECT token, exact_count, d, (xor(hu, su) + 11400714819323198485::HUGEINT) % $U64 AS z0 FROM fh, sd),
${mixChain("cm", "hx", Seq("token", "exact_count", "d"), "z0")},
hb AS (SELECT token, exact_count, d, mx % $width AS bucket FROM cm4),
counters AS (SELECT d, bucket, sum(exact_count) AS counter FROM hb GROUP BY 1, 2),
top AS (SELECT token, exact_count FROM cnt ORDER BY exact_count DESC, token LIMIT $k),
est AS (
  SELECT h.token, h.exact_count, min(c.counter) AS cms_estimate
  FROM hb h JOIN top t ON h.token = t.token
  JOIN counters c ON h.d = c.d AND h.bucket = c.bucket
  GROUP BY 1, 2)
SELECT token, exact_count, CAST(cms_estimate AS BIGINT) AS cms_estimate
FROM est
WHERE $asciiGuard = 0
ORDER BY exact_count DESC, token"""
  }

  /** dsir_weights: hashed-unigram importance log-weights (DSIR). Each
    * DISTINCT token is FNV-hashed ONCE (vocab-bounded) and joined back;
    * bucket models, totals, per-bucket ln-ratio weights and the per-doc
    * fold mirror TextAnalysis.dsirWeights stage for stage.
    */
  def dsirSql(
      targetSources: Seq[String] = Seq("src0", "src1"),
      buckets: Int = 256): String = {
    val tgt = targetSources.map(s => s"'$s'").mkString(", ")
    s"""WITH toks AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
  FROM documents),
vocab AS (SELECT DISTINCT token FROM toks),
vh AS (SELECT token,
  CAST((${fnvExpr("token")}) % ${buckets}::HUGEINT AS BIGINT) AS b FROM vocab),
tb AS (SELECT t.doc_id, t.source, vh.b FROM toks t JOIN vh USING (token)),
db AS (SELECT doc_id, source, b, CAST(count(*) AS BIGINT) AS c_db
       FROM tb GROUP BY 1, 2, 3),
bc AS (SELECT b, CAST(sum(c_db) AS BIGINT) AS c_all,
         CAST(sum(CASE WHEN source IN ($tgt) THEN c_db ELSE 0 END)
           AS BIGINT) AS c_tgt
       FROM db GROUP BY 1),
tot AS (SELECT CAST(sum(c_all) AS BIGINT) AS t_all,
               CAST(sum(c_tgt) AS BIGINT) AS t_tgt FROM bc),
w AS (SELECT b,
        ln(CAST(c_tgt + 1 AS DOUBLE) / CAST(t_tgt + $buckets AS DOUBLE))
      - ln(CAST(c_all + 1 AS DOUBLE) / CAST(t_all + $buckets AS DOUBLE)) AS w
      FROM bc, tot)
SELECT d.doc_id, CAST(sum(d.c_db) AS BIGINT) AS n_tokens,
  round(sum(CAST(d.c_db AS DOUBLE) * w.w), 4) AS log_weight,
  round(sum(CAST(d.c_db AS DOUBLE) * w.w) / CAST(sum(d.c_db) AS DOUBLE), 4)
    AS log_weight_per_token
FROM db d JOIN w USING (b)
WHERE $asciiGuard = 0
GROUP BY 1 ORDER BY 1"""
  }

  /** source_mixture_sample: the deterministic mixture gate — FNV+mix64 of
    * each text, top-53-bits/2^53 uniform, CASE rate per source, then the
    * before/after audit aggregation. Mirrors
    * graft.operators.Mixture.mixtureStats; rates come from the SAME map
    * (Mixture.DriverRates), so engine and oracle cannot disagree on a
    * tier.
    */
  def mixtureSql(
      rates: Map[String, Double] = graft.operators.Mixture.DriverRates,
      defaultRate: Double = graft.operators.Mixture.DriverDefaultRate): String = {
    // keys are escaped ('' doubling) and the CASE is cast to DOUBLE: a
    // bare decimal literal would type the column DECIMAL in DuckDB while
    // Spark writes DOUBLE (0.35000000000000003 vs Decimal('0.35...')),
    // surviving only by the checker's float-coercion tolerance
    val rateCase = rates.toSeq.sortBy(_._1)
      .map { case (s, r) => s"WHEN source = '${s.replace("'", "''")}' THEN ${dlit(r)}" }
      .mkString("CAST(CASE ", " ", s" ELSE ${dlit(defaultRate)} END AS DOUBLE)")
    s"""WITH d AS (
  SELECT source, len(string_split(text, ' ')) AS tokens,
    ((${fnvExpr("text")}) + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM documents WHERE $asciiGuard = 0),
${mixChain("mg", "d", Seq("source", "tokens"), "z0")},
g AS (SELECT source, tokens,
  CAST(mx // 2048 AS BIGINT)::DOUBLE / 9007199254740992.0 < ($rateCase) AS keep
  FROM mg4),
agg AS (SELECT source,
  count(*) AS docs_before,
  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS docs_after,
  CAST(sum(tokens) AS BIGINT) AS tokens_before,
  CAST(sum(CASE WHEN keep THEN tokens ELSE 0 END) AS BIGINT) AS tokens_after
  FROM g GROUP BY source)
SELECT source, docs_before, docs_after, tokens_before, tokens_after,
  CAST(docs_after AS DOUBLE) / CAST(docs_before AS DOUBLE) AS realized_rate,
  ($rateCase) AS target_rate
FROM agg ORDER BY source"""
  }

  /** mixture_optimal_alloc: the exact water-filling allocation replayed
    * end-to-end — per-source token supplies, fnv+mix64 weights, the exact
    * integer ratio sort key (supply * (840 // w), 840 = lcm(1..8)), the
    * prefix capping inequality, and Hamilton largest-remainder
    * apportionment, all in HUGEINT. Mirrors
    * [[graft.operators.Mixture.optimalMixture]] stage for stage; DIV/%
    * appear only with non-negative operands so DuckDB's floor `//` and
    * Spark's truncating DIV agree.
    */
  /** The water-filling chain as machine-emitted CTE text — the ONE SQL
    * spelling of the solve (same discipline as [[mixChain]]: a single
    * emitter, never hand-copied). `from` must carry (`key`, supply, w,
    * skey, budget [+ any carry columns — SELECT * rides them through]);
    * `part` set makes every window per-partition (the hierarchical
    * level-2 form). Ends in `${p}fin` with capped/alloc added.
    */
  private def waterfillChain(
      p: String, from: String, key: String, part: Option[String]): String = {
    val pb = part.map(c => s"PARTITION BY $c ").getOrElse("")
    val pw = part.map(c => s"PARTITION BY $c").getOrElse("")
    s"""${p}wfw AS (SELECT *,
  coalesce(sum(supply) OVER (${pb}ORDER BY skey, $key
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0::HUGEINT)
    AS cum_s_before,
  sum(w) OVER (${pb}ORDER BY skey, $key
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rem_w_from
  FROM $from),
${p}wfc AS (SELECT *,
  supply * rem_w_from <= (budget - cum_s_before) * w AS capped FROM ${p}wfw),
${p}wfg AS (SELECT *,
  coalesce(sum(CASE WHEN capped THEN supply END) OVER ($pw), 0::HUGEINT)
    AS capped_s,
  coalesce(sum(CASE WHEN NOT capped THEN w END) OVER ($pw), 0::HUGEINT)
    AS rem_w_star
  FROM ${p}wfc),
${p}wfx AS (SELECT *, budget - capped_s AS x_rem FROM ${p}wfg),
${p}wfb AS (SELECT *,
  CASE WHEN capped THEN supply ELSE (x_rem * w) // rem_w_star END AS base,
  CASE WHEN capped THEN 0::HUGEINT ELSE (x_rem * w) % rem_w_star END AS remn
  FROM ${p}wfx),
${p}wfr AS (SELECT *,
  CASE WHEN rem_w_star > 0 THEN sum(remn) OVER ($pw) // rem_w_star
       ELSE 0::HUGEINT END AS leftover,
  row_number() OVER (${pb}ORDER BY capped, remn DESC, $key) AS bump_rank
  FROM ${p}wfb),
${p}fin AS (SELECT *,
  base + (CASE WHEN NOT capped AND bump_rank <= leftover
          THEN 1 ELSE 0 END)::HUGEINT AS alloc
  FROM ${p}wfr)"""
  }

  /** The flat solve's CTE chain (ends in `fin` carrying source, supply,
    * w, capped, alloc, budget, w_total) — shared by [[optimalMixtureSql]]
    * and the composed [[admissionAuditSql]].
    */
  private def optimalMixtureCtes(
      budgetPpm: Long,
      maxEpochs: Long,
      docsRel: String = "documents"): String = {
    val den = 1000000L * maxEpochs
    s"""srcs AS (
  SELECT source,
    CAST(sum(len(string_split(text, ' '))) AS HUGEINT) * $maxEpochs AS supply
  FROM $docsRel WHERE ${asciiGuardOn("source")} = 0
  GROUP BY source),
omz AS (SELECT source, supply,
  ((${fnvExpr("source")}) + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM srcs),
${mixChain("omw", "omz", Seq("source", "supply"), "z0")},
wt AS (SELECT source, supply, (mx % 8) + 1::HUGEINT AS w FROM omw4),
k AS (SELECT source, supply, w, supply * (840::HUGEINT // w) AS skey FROM wt),
tot AS (SELECT *, sum(supply) OVER () AS t_total, sum(w) OVER () AS w_total
  FROM k),
bgt AS (SELECT *, (t_total * ${budgetPpm}::HUGEINT) // $den AS budget
  FROM tot),
${waterfillChain("", "bgt", "source", None)}"""
  }

  def optimalMixtureSql(
      budgetPpm: Long = 600000L,
      maxEpochs: Long = 1L,
      docsRel: String = "documents",
      prefixCtes: String = ""): String = {
    val den = 1000000L * maxEpochs
    val epochCol =
      if (maxEpochs == 1L) ""
      else s""",
  CASE WHEN supply > 0 THEN CAST((alloc * $den) // supply AS BIGINT)
       END AS epochs_ppm"""
    s"""WITH $prefixCtes${optimalMixtureCtes(budgetPpm, maxEpochs, docsRel)}
SELECT source,
  CAST(supply AS BIGINT) AS supply_tokens,
  CAST(w AS BIGINT) AS weight,
  capped,
  CAST(alloc AS BIGINT) AS alloc_tokens,
  CAST((w * 1000000) // w_total AS BIGINT) AS target_share_ppm,
  CASE WHEN budget > 0 THEN CAST((alloc * 1000000) // budget AS BIGINT)
       END AS achieved_share_ppm,
  CASE WHEN supply > 0 THEN CAST((alloc * 1000000) // supply AS BIGINT)
       END AS utilization_ppm$epochCol
FROM fin ORDER BY source"""
  }

  /** curated_mixture_alloc: curate-then-budget — the per-source quality
    * keep rule (same IEEE score expression and ceiling as
    * per_source_quality_gate) materialized as a CTE, then the SAME solve
    * chain over the surviving documents. Mirrors
    * [[graft.operators.Mixture.curatedMixture]].
    */
  def curatedMixtureSql(
      stopwordsSqlList: String,
      keepPpm: Long = 500000L,
      budgetPpm: Long = 900000L): String = {
    val q =
      s"""least(CAST(len(toks) AS BIGINT) / 50.0, 1.0) * 0.5
      + (CAST(len(list_distinct(toks)) AS BIGINT) / CAST(len(toks) AS BIGINT)) * 0.3
      + (CAST(len(list_filter(toks, x -> x IN ($stopwordsSqlList))) AS BIGINT) / CAST(len(toks) AS BIGINT)) * 0.2"""
    s"""WITH gsc AS (
  SELECT doc_id, source, text, $q AS q
  FROM (SELECT doc_id, source, text, string_split(text, ' ') AS toks
        FROM documents)),
grk AS (SELECT *,
  row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS r,
  count(*) OVER (PARTITION BY source) AS n
  FROM gsc),
gkept AS (SELECT doc_id, source, text FROM grk
  WHERE r <= ($keepPpm * n + 999999) // 1000000),
${optimalMixtureCtes(budgetPpm, 1L, "gkept")}
SELECT source,
  CAST(supply AS BIGINT) AS supply_tokens,
  CAST(w AS BIGINT) AS weight,
  capped,
  CAST(alloc AS BIGINT) AS alloc_tokens,
  CAST((w * 1000000) // w_total AS BIGINT) AS target_share_ppm,
  CASE WHEN budget > 0 THEN CAST((alloc * 1000000) // budget AS BIGINT)
       END AS achieved_share_ppm,
  CASE WHEN supply > 0 THEN CAST((alloc * 1000000) // supply AS BIGINT)
       END AS utilization_ppm
FROM fin ORDER BY source"""
  }

  /** mixture_hierarchical: the two-level solve — level-1 chain over
    * domains (domain = bits 3-4 of the source mix; weight from the domain
    * NAME's own fnv+mix), then the identical level-2 chain with every
    * window `PARTITION BY domain` and the domain allocation as budget.
    * Mirrors [[graft.operators.Mixture.hierarchicalMixture]].
    */
  def hierarchicalMixtureSql(budgetPpm: Long = 900000L): String =
    s"""WITH l1src AS (
  SELECT source, CAST(sum(len(string_split(text, ' '))) AS HUGEINT) AS supply
  FROM documents WHERE ${asciiGuardOn("source")} = 0
  GROUP BY source),
hz AS (SELECT source, supply,
  ((${fnvExpr("source")}) + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM l1src),
${mixChain("hs", "hz", Seq("source", "supply"), "z0")},
hsrc AS (SELECT source, supply, (mx % 8) + 1::HUGEINT AS w,
  'dom' || CAST((mx // 8) % 4 AS VARCHAR) AS domain FROM hs4),
dsup AS (SELECT domain, sum(supply) AS supply FROM hsrc GROUP BY domain),
dz AS (SELECT domain, supply,
  ((${fnvExpr("domain")}) + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM dsup),
${mixChain("hd", "dz", Seq("domain", "supply"), "z0")},
dwt AS (SELECT domain, supply, (mx % 8) + 1::HUGEINT AS w FROM hd4),
dk AS (SELECT domain, supply, w, supply * (840::HUGEINT // w) AS skey
  FROM dwt),
dtot AS (SELECT *, sum(supply) OVER () AS t_total FROM dk),
dbgt AS (SELECT *, (t_total * ${budgetPpm}::HUGEINT) // 1000000 AS budget
  FROM dtot),
${waterfillChain("d", "dbgt", "domain", None)},
k2 AS (SELECT h.source, h.domain, h.supply, h.w,
  h.supply * (840::HUGEINT // h.w) AS skey, dfin.alloc AS budget
  FROM hsrc h JOIN dfin ON h.domain = dfin.domain),
${waterfillChain("h", "k2", "source", Some("domain"))}
SELECT source, domain,
  CAST(supply AS BIGINT) AS supply_tokens,
  CAST(w AS BIGINT) AS weight,
  CAST(budget AS BIGINT) AS domain_budget_tokens,
  capped,
  CAST(alloc AS BIGINT) AS alloc_tokens
FROM hfin ORDER BY source"""

  /** mixture_admission_audit: the solve ACTUATED — each source admits
    * documents in the content-keyed priority order of tokenBudgetSample
    * until its allocated token budget is crossed (the straddling document
    * is admitted, the standard semantic), then the per-source rollup
    * audits realized vs allocated mass. Composes [[optimalMixtureCtes]]
    * with the tokenBudget admission chain; admission CTEs are
    * `ad*`-prefixed to avoid colliding with the solve's names.
    */
  /** Solve + per-document admission chain: ends in `fin` (allocations)
    * and `ac` (per-doc source-ordered cumulative tokens) — shared by
    * [[admissionAuditSql]] and [[mixtureTrainManifestSql]].
    */
  private def admissionCtes(budgetPpm: Long): String =
    s"""${optimalMixtureCtes(budgetPpm, 1L)},
ad AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS tokens,
    ((${fnvExpr("text")}) + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM documents WHERE $asciiGuard = 0),
${mixChain("adm", "ad", Seq("doc_id", "source", "tokens"), "z0")},
au AS (SELECT doc_id, source, tokens,
      CAST(mx // 2048 AS BIGINT) AS pri FROM adm4),
ac AS (SELECT doc_id, source, tokens,
  CAST(sum(tokens) OVER (PARTITION BY source ORDER BY pri, doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum_tokens
  FROM au)"""

  def admissionAuditSql(budgetPpm: Long = 900000L): String =
    s"""WITH ${admissionCtes(budgetPpm)},
adm_rollup AS (
  SELECT ac.source,
    count(*) AS admitted_docs,
    CAST(sum(ac.tokens) AS BIGINT) AS admitted_tokens
  FROM ac JOIN fin ON ac.source = fin.source
  WHERE ac.cum_tokens - ac.tokens < CAST(fin.alloc AS BIGINT)
  GROUP BY ac.source)
SELECT fin.source,
  CAST(fin.supply AS BIGINT) AS supply_tokens,
  CAST(fin.alloc AS BIGINT) AS alloc_tokens,
  fin.capped,
  coalesce(adm_rollup.admitted_docs, 0) AS admitted_docs,
  coalesce(adm_rollup.admitted_tokens, 0) AS admitted_tokens,
  coalesce(adm_rollup.admitted_tokens, 0) - CAST(fin.alloc AS BIGINT)
    AS overshoot_tokens
FROM fin LEFT JOIN adm_rollup ON fin.source = adm_rollup.source
ORDER BY fin.source"""

  /** mixture_train_manifest: the full budget→batches loop — the admitted
    * corpus (solve + admission chains) fed through the training-batch
    * manifest pipeline (HRW shard, per-shard cumsum, bin rollup) in ONE
    * statement. Mirrors Pack.trainingBatchManifest over
    * Mixture.admittedDocs.
    */
  def mixtureTrainManifestSql(
      budgetPpm: Long = 900000L,
      binTokens: Int = 2048,
      shards: Int = 32): String =
    trainingBatchManifestSql(binTokens, shards, source = "madm",
      prefixCtes = s"""${admissionCtes(budgetPpm)},
adm_kept AS (SELECT ac.doc_id FROM ac JOIN fin ON ac.source = fin.source
  WHERE ac.cum_tokens - ac.tokens < CAST(fin.alloc AS BIGINT)),
madm AS (SELECT dd.doc_id, dd.text FROM documents dd
  JOIN adm_kept ON dd.doc_id = adm_kept.doc_id),
""")

  /** quality_weighted_sample: the per-document-rate gate — same fnv+mix64
    * text uniform as the mixture gate, but the rate is computed from the
    * document (inverse token length, `LEAST(1.0, target/tokens)`) instead
    * of a per-source CASE. Mirrors graft.operators.Mixture.weightedSample;
    * `targetTokens` comes from the same default.
    */
  /** rendezvous_shards: both shard assignments (N and N+1) replayed from
    * the same fnv+mix64 weights — per (doc, shard) candidate rows, the
    * mix chain, a signed view of each weight (the engine ranks JVM
    * longs), and rank windows picking argmax(w) with ties to the smallest
    * shard id. The final rollup proves the HRW minimal-movement
    * guarantee: n_illegal_moves (old-to-old relocations) must be zero.
    */
  def rendezvousSql(shards: Int = 32): String =
    s"""WITH d AS (
  SELECT doc_id, (${fnvExpr("text")}) AS hu
  FROM documents WHERE $asciiGuard = 0),
e AS (SELECT doc_id, unnest(range(0, ${shards + 1})) AS s, hu FROM d),
z AS (SELECT doc_id, s,
  (xor(hu, CAST(s AS HUGEINT)) + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM e),
${mixChain("rz", "z", Seq("doc_id", "s"), "z0")},
sg AS (SELECT doc_id, s,
  CAST(CASE WHEN mx >= 9223372036854775808::HUGEINT
       THEN mx - 18446744073709551616::HUGEINT ELSE mx END AS BIGINT) AS w
  FROM rz4),
a_now AS (
  SELECT doc_id, s AS shard_now FROM (
    SELECT doc_id, s,
      row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, s) AS rn
    FROM sg WHERE s < $shards) WHERE rn = 1),
a_grown AS (
  SELECT doc_id, s AS shard_grown FROM (
    SELECT doc_id, s,
      row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, s) AS rn
    FROM sg) WHERE rn = 1)
SELECT shard_now AS shard, count(*) AS n_docs,
  CAST(sum(CASE WHEN shard_grown = $shards THEN 1 ELSE 0 END) AS BIGINT)
    AS n_moving_to_new,
  CAST(sum(CASE WHEN shard_grown <> shard_now AND shard_grown <> $shards
    THEN 1 ELSE 0 END) AS BIGINT) AS n_illegal_moves
FROM a_now JOIN a_grown USING (doc_id)
GROUP BY 1 ORDER BY 1"""

  /** training_batch_manifest: the composed output-side pipeline — the
    * SAME HRW pick as [[rendezvousSql]] (fnv1a64 text hash, per-shard
    * splitmix64 weight, argmax with smallest-id ties), then the
    * per-shard concatenate-then-chunk interval fold of tokenPackBins
    * and a per-(shard, bin) rollup with the first starting doc as the
    * loader seek key (-1 for pure continuation bins).
    */
  def trainingBatchManifestSql(
      binTokens: Int = 2048, shards: Int = 32,
      source: String = "documents", prefixCtes: String = ""): String =
    s"""WITH ${prefixCtes}d AS (
  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS tokens,
    (${fnvExpr("text")}) AS hu
  FROM $source WHERE $asciiGuard = 0),
e AS (SELECT doc_id, tokens, unnest(range(0, $shards)) AS s, hu FROM d),
z AS (SELECT doc_id, tokens, s,
  (xor(hu, CAST(s AS HUGEINT)) + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM e),
${mixChain("tb", "z", Seq("doc_id", "tokens", "s"), "z0")},
sg AS (SELECT doc_id, tokens, s,
  CAST(CASE WHEN mx >= 9223372036854775808::HUGEINT
       THEN mx - 18446744073709551616::HUGEINT ELSE mx END AS BIGINT) AS w
  FROM tb4),
a AS (
  SELECT doc_id, tokens, s AS shard FROM (
    SELECT doc_id, tokens, s,
      row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, s) AS rn
    FROM sg) WHERE rn = 1),
spans AS (
  SELECT doc_id, shard, tokens,
    CAST(sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM a),
sp AS (SELECT doc_id, shard, cum - tokens AS first_tok, cum - 1 AS last_tok
  FROM spans),
b AS (SELECT doc_id, shard, first_tok, last_tok,
    unnest(range(first_tok // $binTokens, last_tok // $binTokens + 1)) AS bin
  FROM sp)
SELECT shard, CAST(bin AS BIGINT) AS bin,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN first_tok // $binTokens = bin THEN 1 ELSE 0 END)
    AS BIGINT) AS n_starting,
  CAST(sum(least(last_tok, (bin + 1) * $binTokens - 1)
         - greatest(first_tok, bin * $binTokens) + 1) AS BIGINT)
    AS fill_tokens,
  COALESCE(min(CASE WHEN first_tok // $binTokens = bin THEN doc_id END), -1)
    AS first_doc
FROM b GROUP BY 1, 2 ORDER BY 1, 2"""

  def weightedSampleSql(targetTokens: Double = 40.0): String =
    s"""WITH d AS (
  SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS tokens,
    ((${fnvExpr("text")}) + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM documents WHERE $asciiGuard = 0),
${mixChain("ws", "d", Seq("doc_id", "source", "tokens"), "z0")},
g AS (SELECT doc_id, source, tokens,
  LEAST(CAST(1.0 AS DOUBLE), CAST(${dlit(targetTokens)} AS DOUBLE) / tokens::DOUBLE) AS rate,
  CAST(mx // 2048 AS BIGINT)::DOUBLE / 9007199254740992.0 AS u
  FROM ws4)
SELECT doc_id, source, tokens, rate, u FROM g
WHERE u < rate ORDER BY doc_id"""

  /** weighted_reservoir: the A-ES log-domain key — same fnv+mix64 text
    * uniform, ln(u)/tokens, top-k by the raw key with doc_id ties,
    * rounded-grid re-sort. Mirrors graft.operators.Mixture
    * .weightedReservoir.
    */
  def weightedReservoirSql(k: Int = 100): String =
    s"""WITH d AS (
  SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS n_tokens,
    ((${fnvExpr("text")}) + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM documents WHERE $asciiGuard = 0),
${mixChain("es", "d", Seq("doc_id", "source", "n_tokens"), "z0")},
g AS (SELECT doc_id, source, n_tokens,
  ln(GREATEST(CAST(mx // 2048 AS BIGINT)::DOUBLE / 9007199254740992.0,
              CAST(1.0 AS DOUBLE) / CAST(9007199254740992.0 AS DOUBLE)))
    / n_tokens::DOUBLE AS es_key_raw
  FROM es4)
SELECT doc_id, source, n_tokens, round(es_key_raw, 6) AS es_key
FROM (SELECT * FROM g ORDER BY es_key_raw DESC, doc_id LIMIT $k) t
ORDER BY es_key DESC, doc_id"""

  /** negative_samples: the (anchor, rank) mix64 draw reduced by the TRUE
    * unsigned u64 % N in HUGEINT (the engine reconstructs the same value
    * from the signed long via the 2^64-mod-N correction), self-hit shift,
    * metadata join. Mirrors graft.operators.Mixture.negativeSamples.
    */
  def negativeSamplesSql(k: Int = 4): String =
    s"""WITH n AS (SELECT count(*)::HUGEINT AS n_docs FROM documents),
c AS (SELECT doc_id, unnest(range(1, ${k + 1})) AS neg_rank FROM documents),
z AS (SELECT doc_id, neg_rank,
  (((CAST(doc_id AS HUGEINT) * 1000003) % $U64
    + CAST(neg_rank AS HUGEINT)) % $U64
   + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM c),
${mixChain("ng", "z", Seq("doc_id", "neg_rank"), "z0")},
g AS (SELECT doc_id, neg_rank, CAST(mx % n_docs AS BIGINT) AS u FROM ng4, n),
s AS (SELECT doc_id, neg_rank,
  CASE WHEN u = doc_id
       THEN CAST(CAST(u + 1 AS HUGEINT) % n_docs AS BIGINT) ELSE u
  END AS neg_doc_id
  FROM g, n)
SELECT s.doc_id, CAST(s.neg_rank AS INTEGER) AS neg_rank, s.neg_doc_id,
  d2.source AS neg_source
FROM s JOIN documents d2 ON s.neg_doc_id = d2.doc_id
ORDER BY s.doc_id, s.neg_rank"""

  /** stratified_sample: the exact-quota selection — same fnv+mix64 text
    * uniform as the mixture gate (ordering by the 53-bit integer is the
    * same order as the engine's dyadic double: the map is monotone),
    * row_number per source with doc_id tie-break, CASE quota cutoff.
    * Mirrors graft.operators.Mixture.stratifiedSample; quotas come from
    * the SAME map (Mixture.DriverQuotas).
    */
  def stratifiedSql(
      quotas: Map[String, Long] = graft.operators.Mixture.DriverQuotas,
      defaultQuota: Long = graft.operators.Mixture.DriverDefaultQuota): String = {
    val quotaCase = quotas.toSeq.sortBy(_._1)
      .map { case (s, q) => s"WHEN source = '${s.replace("'", "''")}' THEN $q" }
      .mkString("CASE ", " ", s" ELSE $defaultQuota END")
    s"""WITH d AS (
  SELECT doc_id, source,
    ((${fnvExpr("text")}) + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM documents WHERE $asciiGuard = 0),
${mixChain("st", "d", Seq("doc_id", "source"), "z0")},
u AS (SELECT doc_id, source, CAST(mx // 2048 AS BIGINT) AS pri FROM st4),
r AS (SELECT doc_id, source,
  CAST(row_number() OVER (PARTITION BY source ORDER BY pri, doc_id) AS INTEGER)
    AS pick_rank
  FROM u)
SELECT doc_id, source, pick_rank FROM r
WHERE pick_rank <= ($quotaCase)
ORDER BY source, pick_rank"""
  }

  /** dist_matched_sample: full replay of [[graft.operators.Mixture.distMatchedSample]]
    * — length buckets, the Hamilton largest-remainder quota apportionment
    * over the reference histogram (all HUGEINT), and the content-keyed
    * per-bucket rank admission (the same fnv+mix chain as [[stratifiedSql]];
    * the engine's integer 53-bit priority is `mx // 2048` verbatim).
    */
  /** The dist-matched CTE chain through `dmkept` (the admitted rows) —
    * shared by [[distMatchedSql]] and [[distMatchedManifestSql]] (which
    * chains a packing run on top). CTE names carry a `dm` prefix so the
    * chain composes with [[trainingBatchManifestSql]]'s own names.
    */
  private def distMatchedCtes(refSource: String, samplePpm: Long): String = {
    val esc = refSource.replace("'", "''")
    s"""dmt0 AS (
  SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS t,
    ((${fnvExpr("text")}) + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM documents WHERE $asciiGuard = 0),
dmd AS (
  SELECT doc_id, source,
    CASE WHEN t <= 16 THEN 16 WHEN t <= 32 THEN 32 WHEN t <= 64 THEN 64
      WHEN t <= 128 THEN 128 WHEN t <= 256 THEN 256 WHEN t <= 512 THEN 512
      WHEN t <= 1024 THEN 1024 ELSE 2048 END AS bucket, z0
  FROM dmt0),
${mixChain("dq", "dmd", Seq("doc_id", "source", "bucket"), "z0")},
dmu AS (SELECT doc_id, source, bucket, mx // 2048 AS pri FROM dq4),
dmrefh AS (SELECT bucket, count(*)::HUGEINT AS ref_n FROM dmu
  WHERE source = '$esc' GROUP BY 1),
dmnt AS (SELECT (count(*)::HUGEINT * $samplePpm) // 1000000 AS n_target
  FROM dmu WHERE source <> '$esc'),
dmq1 AS (SELECT bucket, ref_n, n_target,
    (n_target * ref_n) // (SELECT sum(ref_n) FROM dmrefh) AS fl,
    (n_target * ref_n) % (SELECT sum(ref_n) FROM dmrefh) AS rem
  FROM dmrefh, dmnt),
dmq AS (SELECT bucket,
    CAST(fl + CASE WHEN row_number() OVER (ORDER BY rem DESC, bucket)
      <= n_target - (SELECT sum(fl) FROM dmq1) THEN 1 ELSE 0 END AS BIGINT)
      AS quota
  FROM dmq1),
dmr AS (SELECT doc_id, bucket,
    CAST(row_number() OVER (PARTITION BY bucket ORDER BY pri, doc_id)
      AS BIGINT) AS pick_rank
  FROM dmu WHERE source <> '$esc'),
dmkept AS (SELECT r.doc_id, r.bucket, r.pick_rank, q.quota
  FROM dmr r JOIN dmq q USING (bucket)
  WHERE r.pick_rank <= q.quota)"""
  }

  /** dist_matched_token_sample: the TOKEN-MASS matcher — same chain as
    * [[distMatchedCtes]] but the histograms are per-bucket token sums and
    * admission is the fill-until-reached running-sum gate (`cum − tokens
    * < quota`, [[tokenBudgetSql]]'s spelling per bucket).
    */
  def distMatchedTokenSql(
      refSource: String = "src0",
      samplePpm: Long = 400000L): String = {
    val esc = refSource.replace("'", "''")
    s"""WITH dmt0 AS (
  SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS t,
    ((${fnvExpr("text")}) + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM documents WHERE $asciiGuard = 0),
dmd AS (
  SELECT doc_id, source, t AS tokens,
    CASE WHEN t <= 16 THEN 16 WHEN t <= 32 THEN 32 WHEN t <= 64 THEN 64
      WHEN t <= 128 THEN 128 WHEN t <= 256 THEN 256 WHEN t <= 512 THEN 512
      WHEN t <= 1024 THEN 1024 ELSE 2048 END AS bucket, z0
  FROM dmt0),
${mixChain("dq", "dmd", Seq("doc_id", "source", "bucket", "tokens"), "z0")},
dmu AS (SELECT doc_id, source, bucket, tokens, mx // 2048 AS pri FROM dq4),
dmrefh AS (SELECT bucket, sum(tokens)::HUGEINT AS ref_n FROM dmu
  WHERE source = '$esc' GROUP BY 1),
dmnt AS (SELECT (sum(tokens)::HUGEINT * $samplePpm) // 1000000 AS n_target
  FROM dmu WHERE source <> '$esc'),
dmq1 AS (SELECT bucket, ref_n, n_target,
    (n_target * ref_n) // (SELECT sum(ref_n) FROM dmrefh) AS fl,
    (n_target * ref_n) % (SELECT sum(ref_n) FROM dmrefh) AS rem
  FROM dmrefh, dmnt),
dmq AS (SELECT bucket,
    CAST(fl + CASE WHEN row_number() OVER (ORDER BY rem DESC, bucket)
      <= n_target - (SELECT sum(fl) FROM dmq1) THEN 1 ELSE 0 END AS BIGINT)
      AS quota
  FROM dmq1),
dmr AS (SELECT doc_id, bucket, tokens,
    CAST(sum(tokens) OVER (PARTITION BY bucket ORDER BY pri, doc_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM dmu WHERE source <> '$esc')
SELECT r.doc_id, CAST(r.bucket AS INT) AS bucket, r.tokens,
  r.cum AS cum_tokens, q.quota AS quota_tokens
FROM dmr r JOIN dmq q USING (bucket)
WHERE r.cum - r.tokens < q.quota
ORDER BY bucket, cum_tokens"""
  }

  def distMatchedSql(
      refSource: String = "src0",
      samplePpm: Long = 400000L): String =
    s"""WITH ${distMatchedCtes(refSource, samplePpm)}
SELECT doc_id, CAST(bucket AS INT) AS bucket, pick_rank, quota
FROM dmkept
ORDER BY bucket, pick_rank"""

  /** dist_matched_manifest: the matched sample packed into training
    * batches — [[distMatchedCtes]] chained straight into the HRW-shard +
    * bin-span packing replay, the distribution-matched twin of
    * [[mixtureTrainManifestSql]].
    */
  def distMatchedManifestSql(
      refSource: String = "src0",
      samplePpm: Long = 400000L,
      binTokens: Int = 2048,
      shards: Int = 32): String =
    trainingBatchManifestSql(binTokens, shards, source = "dmm",
      prefixCtes = s"""${distMatchedCtes(refSource, samplePpm)},
dmm AS (SELECT dd.doc_id, dd.text FROM documents dd
  JOIN dmkept ON dd.doc_id = dmkept.doc_id),
""")

  /** gen_events_audit: replay the splitmix64 event generator itself —
    * three mix chains (user/type/value streams, inputs id*8+k+(seed<<40))
    * over a plain range(), then the same per-type aggregate the engine
    * computes. The ORACLE generates the events independently: the engine
    * matches only if its distributed generation is exactly the documented
    * function of the row id. Mirrors graft.gen.EventGen.batch.
    */
  def genEventsSql(
      n: Long,
      userPool: Int,
      seed: Long,
      eventTypes: Seq[String]): String = {
    val s = seed << 40
    val typeList = eventTypes.map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (
  SELECT id,
    ((id * 8 + ${s + 1})::HUGEINT + 11400714819323198485::HUGEINT) % $U64 AS xu,
    ((id * 8 + ${s + 2})::HUGEINT + 11400714819323198485::HUGEINT) % $U64 AS xt,
    ((id * 8 + ${s + 3})::HUGEINT + 11400714819323198485::HUGEINT) % $U64 AS xv
  FROM range(0, $n) t(id)),
${mixChain("gu", "d", Seq("id", "xt", "xv"), "xu")},
ru AS (SELECT id, xt, xv, CAST(mx // 2048 AS BIGINT) % $userPool AS user_id
       FROM gu4),
${mixChain("gt", "ru", Seq("id", "user_id", "xv"), "xt")},
rt AS (SELECT id, user_id, xv,
         [$typeList][CAST(CAST(mx // 2048 AS BIGINT)
                          % ${eventTypes.size} AS INTEGER) + 1] AS event_type
       FROM gt4),
${mixChain("gv", "rt", Seq("id", "user_id", "event_type"), "xv")},
rv AS (SELECT id, user_id, event_type,
         round(CAST(mx // 2048 AS BIGINT)::DOUBLE
               / 9007199254740992.0 * 200.0, 2) AS value
       FROM gv4)
SELECT event_type, count(*) AS n,
  count(DISTINCT user_id) AS distinct_users,
  round(sum(value), 2) AS value_sum
FROM rv GROUP BY event_type ORDER BY event_type"""
  }

  /** curation_funnel: the staged loss curve — the same CTE chain as
    * graft.operators.Curation.funnel, stage for stage: lang-marker argmax
    * gate, docStats quality score, md5 keep-lowest-id, shingle-df span
    * fraction, fnv+mix64 mixture gate. Constants (stopword list, marker
    * sets, thresholds, rates) are parameters so engine and oracle can only
    * move together.
    */
  def funnelSql(
      stopwordsSqlList: String,
      qualityMin: Double,
      spanMax: Double,
      spanK: Int = 8,
      rates: Map[String, Double] = graft.operators.Mixture.DriverRates,
      defaultRate: Double = graft.operators.Mixture.DriverDefaultRate): String = {
    val rateCase = rates.toSeq.sortBy(_._1)
      .map { case (s, r) => s"WHEN source = '${s.replace("'", "''")}' THEN ${dlit(r)}" }
      .mkString("CAST(CASE ", " ", s" ELSE ${dlit(defaultRate)} END AS DOUBLE)")
    val kgram = (0 until spanK).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    def hits(markers: Seq[String]): String =
      s"len(list_filter(toks, x -> x IN (${markers.map(m => s"'$m'").mkString(", ")})))"
    val m = graft.functions.TextAnalysis.langMarkers
    val (en, de, fr, es) = (hits(m("en")), hits(m("de")), hits(m("fr")), hits(m("es")))
    s"""WITH d0 AS (
  SELECT doc_id, source, text, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
  FROM documents WHERE $asciiGuard = 0),
d1 AS (SELECT * FROM d0 WHERE
  CASE WHEN $en > 0 AND $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
       WHEN $de > 0 AND $de >= $fr AND $de >= $es THEN 'de'
       WHEN $fr > 0 AND $fr >= $es THEN 'fr'
       WHEN $es > 0 THEN 'es' ELSE 'und' END <> 'und'),
d2 AS (SELECT * FROM d1 WHERE
  least(CAST(len(toks) AS BIGINT) / 50.0, 1.0) * 0.5
    + (CAST(len(list_distinct(toks)) AS BIGINT) / CAST(len(toks) AS BIGINT)) * 0.3
    + (CAST(len(list_filter(toks, x -> x IN ($stopwordsSqlList))) AS BIGINT)
       / CAST(len(toks) AS BIGINT)) * 0.2 >= ${dlit(qualityMin)}),
d3 AS (SELECT d2.* FROM d2
  JOIN (SELECT md5(text) AS h, min(doc_id) AS keeper FROM d2 GROUP BY 1) k
    ON md5(d2.text) = k.h AND d2.doc_id = k.keeper),
sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
         range(1, len(toks) - ${spanK - 2}),
         i -> $kgram))) AS shingle
       FROM d3),
dfq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
frac AS (SELECT sh.doc_id,
           count(*) FILTER (WHERE dfq.df >= 2) / count(*) AS shared_fraction
         FROM sh JOIN dfq USING (shingle) GROUP BY 1),
d4 AS (SELECT d3.* FROM d3 LEFT JOIN frac USING (doc_id)
       WHERE coalesce(shared_fraction, 0.0) <= ${dlit(spanMax)}),
g AS (SELECT doc_id, source, tokens,
        ((${fnvExpr("text")}) + 11400714819323198485::HUGEINT) % $U64 AS z0
      FROM d4),
${mixChain("cf", "g", Seq("doc_id", "source", "tokens"), "z0")},
d5 AS (SELECT doc_id, source, tokens FROM cf4
       WHERE CAST(mx // 2048 AS BIGINT)::DOUBLE / 9007199254740992.0 < ($rateCase))
SELECT * FROM (
  SELECT CAST(0 AS INTEGER) AS stage_id, 'ingested' AS stage,
         count(*) AS docs, CAST(coalesce(sum(tokens), 0) AS BIGINT) AS tokens FROM d0
  UNION ALL SELECT CAST(1 AS INTEGER), 'lang_id', count(*),
         CAST(coalesce(sum(tokens), 0) AS BIGINT) FROM d1
  UNION ALL SELECT CAST(2 AS INTEGER), 'quality', count(*),
         CAST(coalesce(sum(tokens), 0) AS BIGINT) FROM d2
  UNION ALL SELECT CAST(3 AS INTEGER), 'exact_dedup', count(*),
         CAST(coalesce(sum(tokens), 0) AS BIGINT) FROM d3
  UNION ALL SELECT CAST(4 AS INTEGER), 'span_dedup', count(*),
         CAST(coalesce(sum(tokens), 0) AS BIGINT) FROM d4
  UNION ALL SELECT CAST(5 AS INTEGER), 'sampled', count(*),
         CAST(coalesce(sum(tokens), 0) AS BIGINT) FROM d5)
ORDER BY stage_id"""
  }

  /** token_budget_sample: same content-keyed priority pipeline as
    * [[stratifiedSql]], with a per-source running token sum and the
    * admitted-iff-started-under-budget cut. Mirrors
    * graft.operators.Mixture.tokenBudgetSample.
    */
  def tokenBudgetSql(
      budgets: Map[String, Long] = graft.operators.Mixture.DriverTokenBudgets,
      defaultBudget: Long = graft.operators.Mixture.DriverDefaultTokenBudget): String = {
    val budgetCase = budgets.toSeq.sortBy(_._1)
      .map { case (s, b) => s"WHEN source = '${s.replace("'", "''")}' THEN $b" }
      .mkString("CASE ", " ", s" ELSE $defaultBudget END")
    s"""WITH d AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS tokens,
    ((${fnvExpr("text")}) + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM documents WHERE $asciiGuard = 0),
${mixChain("tb", "d", Seq("doc_id", "source", "tokens"), "z0")},
u AS (SELECT doc_id, source, tokens,
      CAST(mx // 2048 AS BIGINT) AS pri FROM tb4),
c AS (SELECT doc_id, source, tokens,
  CAST(sum(tokens) OVER (PARTITION BY source ORDER BY pri, doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum_tokens
  FROM u)
SELECT doc_id, source, CAST(tokens AS BIGINT) AS tokens, cum_tokens
FROM c WHERE cum_tokens - tokens < ($budgetCase)
ORDER BY source, cum_tokens"""
  }

  /** doc_chunk_assignments: the sequence-packing shard + offset pipeline —
    * splitmix64 of doc_id (with the caller-side golden pre-add, matching
    * Mix64.mix), unsigned `% shards` (== engine pmod: shards is a power of
    * two), per-shard running token offset, integer-division chunk id.
    * Mirrors graft.operators.Pack.chunkAssignments.
    */
  def packSql(capacity: Int = 2048, shards: Int = 32): String = {
    require(shards > 0 && (shards & (shards - 1)) == 0)
    s"""WITH d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS tokens,
    ((doc_id::HUGEINT) + 11400714819323198485::HUGEINT) % $U64 AS z0
  FROM documents),
${mixChain("pk", "d", Seq("doc_id", "tokens"), "z0")},
s AS (SELECT doc_id, tokens, CAST(mx % $shards AS INTEGER) AS shard FROM pk4),
o AS (SELECT doc_id, shard, tokens,
  CAST(sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens AS BIGINT)
    AS start_offset
  FROM s)
SELECT doc_id, shard, CAST(tokens AS BIGINT) AS tokens, start_offset,
  start_offset // $capacity AS chunk_id,
  (start_offset % $capacity) + tokens > $capacity AS straddles
FROM o ORDER BY doc_id"""
  }

  /** daily_agg_approx_merged: the DIRECT daily relational HLL — valid as
    * the oracle for the engine's hourly-register MERGE because max(rho)
    * is associative: merging hourly registers into daily ones yields
    * bit-identical register rows to building daily registers directly
    * (the engine-side equality is separately spec-asserted).
    */
  def hllDailySql: String = {
    val m = Hll.M
    val lcList = Hll.LinearCounting.map(dlit).mkString("[", ", ", "]")
    s"""WITH l1 AS (
  SELECT CAST(ts AS DATE) AS day, event_type, user_id
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2, 3),
ux AS (SELECT day, event_type,
  ((CASE WHEN user_id < 0 THEN CAST(user_id AS HUGEINT) + $U64
         ELSE CAST(user_id AS HUGEINT) END)
   + 11400714819323198485::HUGEINT) % $U64 AS z0 FROM l1),
${mixChain("md", "ux", Seq("day", "event_type"), "z0")},
rw AS (SELECT day, event_type,
  CAST(mx % $m AS BIGINT) AS bucket, CAST(mx // $m AS BIGINT) AS w FROM md4),
t1 AS (SELECT day, event_type, bucket, w | (w >> 1) AS v FROM rw),
t2 AS (SELECT day, event_type, bucket, v | (v >> 2) AS v FROM t1),
t3 AS (SELECT day, event_type, bucket, v | (v >> 4) AS v FROM t2),
t4 AS (SELECT day, event_type, bucket, v | (v >> 8) AS v FROM t3),
t5 AS (SELECT day, event_type, bucket, v | (v >> 16) AS v FROM t4),
t6 AS (SELECT day, event_type, bucket, v | (v >> 32) AS v FROM t5),
rh AS (SELECT day, event_type, bucket,
  least(52, ${64 - Hll.P + 1} - bit_count(v)) AS rho FROM t6),
regs AS (SELECT day, event_type, bucket, max(rho) AS rho
  FROM rh GROUP BY 1, 2, 3),
agg AS (SELECT day, event_type,
  count(rho) AS present,
  CAST(sum(1::BIGINT << (52 - rho)) AS BIGINT) AS sum_present
  FROM regs GROUP BY 1, 2),
calc AS (SELECT day, event_type, $m - present AS v,
  ${dlit(Hll.EstNumerator)}
    / CAST(sum_present + ($m - present) * 4503599627370496::BIGINT AS DOUBLE)
    AS eraw
  FROM agg),
ex AS (SELECT CAST(ts AS DATE) AS day, event_type,
  CAST(count(DISTINCT user_id) AS BIGINT) AS users_exact
  FROM events GROUP BY 1, 2)
SELECT ex.day, ex.event_type, ex.users_exact,
  CASE WHEN v > 0 AND eraw <= ${dlit(2.5 * m)} THEN ($lcList)[v] ELSE eraw END
    AS approx_users
FROM ex JOIN calc ON ex.day = calc.day AND ex.event_type = calc.event_type
ORDER BY ex.day, ex.event_type"""
  }

  /** hourly_agg_approx: the relational HLL — mix64 of each distinct user,
    * bucket/rho split, per-bucket max registers, exact fixed-point
    * harmonic fold, JVM-shared linear-counting literals. Mirrors
    * graft.operators.Hll.approxDistinctUsers on (hour window, event_type)
    * groups.
    */
  def hllHourlySql: String = {
    val m = Hll.M
    val lcList = Hll.LinearCounting.map(dlit).mkString("[", ", ", "]")
    s"""WITH l1 AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type, user_id,
    count(*) AS user_events
  FROM events GROUP BY 1, 2, 3),
ux AS (SELECT window_start, event_type, user_events,
  ((CASE WHEN user_id < 0 THEN CAST(user_id AS HUGEINT) + $U64
         ELSE CAST(user_id AS HUGEINT) END)
   + 11400714819323198485::HUGEINT) % $U64 AS z0 FROM l1),
${mixChain("mh", "ux", Seq("window_start", "event_type", "user_events"), "z0")},
rw AS (SELECT window_start, event_type, user_events,
  CAST(mx % $m AS BIGINT) AS bucket, CAST(mx // $m AS BIGINT) AS w FROM mh4),
s1 AS (SELECT window_start, event_type, user_events, bucket, w | (w >> 1) AS v FROM rw),
s2 AS (SELECT window_start, event_type, user_events, bucket, v | (v >> 2) AS v FROM s1),
s3 AS (SELECT window_start, event_type, user_events, bucket, v | (v >> 4) AS v FROM s2),
s4 AS (SELECT window_start, event_type, user_events, bucket, v | (v >> 8) AS v FROM s3),
s5 AS (SELECT window_start, event_type, user_events, bucket, v | (v >> 16) AS v FROM s4),
s6 AS (SELECT window_start, event_type, user_events, bucket, v | (v >> 32) AS v FROM s5),
rh AS (SELECT window_start, event_type, user_events, bucket,
  CASE WHEN bucket IS NULL THEN NULL
       ELSE least(52, ${64 - Hll.P + 1} - bit_count(v)) END AS rho FROM s6),
regs AS (SELECT window_start, event_type, bucket,
  max(rho) AS rho, count(bucket) AS bu, sum(user_events) AS events
  FROM rh GROUP BY 1, 2, 3),
agg AS (SELECT window_start, event_type,
  CAST(sum(events) AS BIGINT) AS event_count,
  CAST(sum(bu) AS BIGINT) AS users_exact,
  count(rho) AS present,
  CAST(sum(1::BIGINT << (52 - rho)) AS BIGINT) AS sum_present
  FROM regs GROUP BY 1, 2),
calc AS (SELECT window_start, event_type, event_count, users_exact,
  $m - present AS v,
  ${dlit(Hll.EstNumerator)}
    / CAST(sum_present + ($m - present) * 4503599627370496::BIGINT AS DOUBLE) AS eraw
  FROM agg),
appx AS (SELECT window_start, event_type, event_count, users_exact,
  CASE WHEN v > 0 AND eraw <= ${dlit(2.5 * m)} THEN ($lcList)[v] ELSE eraw END AS approx_users
  FROM calc)
SELECT window_start, event_type, event_count, approx_users, users_exact,
  abs(approx_users - users_exact) / users_exact AS hll_rel_err
FROM appx
ORDER BY window_start, event_type"""
  }

  /** join_cardinality_est: Count-Min inner-product join-size estimate.
    * Key hash = mix64(key), bucket_d = mix64(kh ^ seed_d) % width —
    * mirrors graft.operators.TableStats.joinCardinalityEst stage for
    * stage (the double mix chain; the same seed table as the token CMS).
    */
  def joinCardSql(depth: Int = graft.functions.TextAnalysis.CmsDepth,
      width: Int = graft.functions.TextAnalysis.CmsWidth): String = {
    val seedRows = graft.functions.TextAnalysis.cmsSeeds(depth).zipWithIndex
      .map { case (s, d) => s"    ($d, ${ulit(s)})" }.mkString(",\n")
    def side(p: String, table: String, key: String): String =
      s"""c$p AS (SELECT $key AS key, CAST(count(*) AS BIGINT) AS c
  FROM $table GROUP BY 1),
u$p AS (SELECT key, c,
  ((CASE WHEN key < 0 THEN CAST(key AS HUGEINT) + $U64
         ELSE CAST(key AS HUGEINT) END)
   + 11400714819323198485::HUGEINT) % $U64 AS z0 FROM c$p),
${mixChain(s"k$p", s"u$p", Seq("key", "c"), "z0")},
x$p AS (SELECT key, c, d, (xor(mx, su) + 11400714819323198485::HUGEINT) % $U64
  AS z0 FROM k${p}4, sd),
${mixChain(s"b$p", s"x$p", Seq("key", "c", "d"), "z0")},
ctr$p AS (SELECT d, mx % $width AS bucket, CAST(sum(c) AS BIGINT) AS counter
  FROM b${p}4 GROUP BY 1, 2)"""
    s"""WITH sd(d, su) AS (VALUES
$seedRows),
${side("a", "orders", "o_custkey")},
${side("b", "events", "user_id")},
estd AS (
  SELECT a.d, CAST(sum(a.counter * b.counter) AS BIGINT) AS est_d
  FROM ctra a JOIN ctrb b ON a.d = b.d AND a.bucket = b.bucket
  GROUP BY 1),
est AS (SELECT CAST(min(est_d) AS BIGINT) AS cms_estimate FROM estd),
ex AS (SELECT CAST(COALESCE(sum(a.c * b.c), 0) AS BIGINT)
    AS exact_join_rows
  FROM ca a JOIN cb b ON a.key = b.key),
sa AS (SELECT CAST(sum(c) AS BIGINT) AS n_a,
  CAST(count(*) AS BIGINT) AS distinct_a FROM ca),
sb AS (SELECT CAST(sum(c) AS BIGINT) AS n_b,
  CAST(count(*) AS BIGINT) AS distinct_b FROM cb)
SELECT n_a, n_b, distinct_a, distinct_b, exact_join_rows, cms_estimate,
  cms_estimate - exact_join_rows AS overestimate
FROM sa, sb, ex, est"""
  }

  /** hll_set_algebra: per-type registers (same mix64/smear pipeline),
    * pair-merged union registers, inclusion–exclusion intersection, and
    * the exact counts in-row. Mirrors graft.operators.Hll.setAlgebra.
    */
  def hllSetAlgebraSql: String = {
    val m = Hll.M
    val lcList = Hll.LinearCounting.map(dlit).mkString("[", ", ", "]")
    /** Estimator from (present, sum_present) — shared by both folds. */
    def estSelect(keys: String, from: String, out: String): String =
      s"""SELECT $keys,
  CASE WHEN ($m - present) > 0
        AND ${dlit(Hll.EstNumerator)}
          / CAST(sum_present + ($m - present) * 4503599627370496::BIGINT
                 AS DOUBLE) <= ${dlit(2.5 * m)}
       THEN ($lcList)[$m - present]
       ELSE ${dlit(Hll.EstNumerator)}
          / CAST(sum_present + ($m - present) * 4503599627370496::BIGINT
                 AS DOUBLE) END AS $out
  FROM $from"""
    s"""WITH l1 AS (
  SELECT event_type, user_id FROM events GROUP BY 1, 2),
ux AS (SELECT event_type,
  ((CASE WHEN user_id < 0 THEN CAST(user_id AS HUGEINT) + $U64
         ELSE CAST(user_id AS HUGEINT) END)
   + 11400714819323198485::HUGEINT) % $U64 AS z0 FROM l1),
${mixChain("mh", "ux", Seq("event_type"), "z0")},
rw AS (SELECT event_type, CAST(mx % $m AS BIGINT) AS bucket,
  CAST(mx // $m AS BIGINT) AS w FROM mh4),
s1 AS (SELECT event_type, bucket, w | (w >> 1) AS v FROM rw),
s2 AS (SELECT event_type, bucket, v | (v >> 2) AS v FROM s1),
s3 AS (SELECT event_type, bucket, v | (v >> 4) AS v FROM s2),
s4 AS (SELECT event_type, bucket, v | (v >> 8) AS v FROM s3),
s5 AS (SELECT event_type, bucket, v | (v >> 16) AS v FROM s4),
s6 AS (SELECT event_type, bucket, v | (v >> 32) AS v FROM s5),
rh AS (SELECT event_type, bucket,
  least(52, ${64 - Hll.P + 1} - bit_count(v)) AS rho FROM s6),
regs AS (SELECT event_type, bucket, max(rho) AS rho FROM rh GROUP BY 1, 2),
agg1 AS (SELECT event_type, count(rho) AS present,
  CAST(sum(1::BIGINT << (52 - rho)) AS BIGINT) AS sum_present
  FROM regs GROUP BY 1),
est1 AS (${estSelect("event_type", "agg1", "est")}),
types AS (SELECT DISTINCT event_type FROM events),
pairs AS (SELECT a.event_type AS t_a, b.event_type AS t_b
  FROM types a JOIN types b ON a.event_type < b.event_type),
members AS (SELECT t_a, t_b, unnest([t_a, t_b]) AS m FROM pairs),
pregs AS (SELECT t_a, t_b, bucket, max(rho) AS rho
  FROM members JOIN regs ON regs.event_type = members.m GROUP BY 1, 2, 3),
aggu AS (SELECT t_a, t_b, count(rho) AS present,
  CAST(sum(1::BIGINT << (52 - rho)) AS BIGINT) AS sum_present
  FROM pregs GROUP BY 1, 2),
estu AS (${estSelect("t_a, t_b", "aggu", "est_u")}),
u AS (SELECT DISTINCT event_type, user_id FROM events),
ex1 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1),
exi AS (SELECT a.event_type AS t_a, b.event_type AS t_b,
  CAST(count(*) AS BIGINT) AS exact_inter
  FROM u a JOIN u b ON a.user_id = b.user_id
    AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT p.t_a, p.t_b, xa.n AS exact_a, xb.n AS exact_b,
  COALESCE(exi.exact_inter, 0) AS exact_inter,
  xa.n + xb.n - COALESCE(exi.exact_inter, 0) AS exact_union,
  round(ea.est, 4) AS approx_a, round(eb.est, 4) AS approx_b,
  round(eu.est_u, 4) AS approx_union,
  round(ea.est + eb.est - eu.est_u, 4) AS approx_inter,
  round((ea.est + eb.est - eu.est_u) / eu.est_u, 4) AS jaccard_approx
FROM pairs p
JOIN ex1 xa ON xa.event_type = p.t_a
JOIN ex1 xb ON xb.event_type = p.t_b
LEFT JOIN exi ON exi.t_a = p.t_a AND exi.t_b = p.t_b
JOIN est1 ea ON ea.event_type = p.t_a
JOIN est1 eb ON eb.event_type = p.t_b
JOIN estu eu ON eu.t_a = p.t_a AND eu.t_b = p.t_b
ORDER BY p.t_a, p.t_b"""
  }
}
