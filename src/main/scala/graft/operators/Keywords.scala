package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose, Engel, Cramer, Cowley — "Automatic
  * keyword extraction from individual documents", 2010): candidate
  * phrases are maximal stopword-free token runs; each word scores
  * deg(w)/freq(w) over the phrase corpus (deg counts co-occurring phrase
  * length, freq counts occurrences) and a phrase scores the sum of its
  * words' scores. The corpus-level top-k keyword list is the summary a
  * curation pipeline puts beside `tfidf_top_terms` (unigram relevance)
  * and `collocations_pmi` (pair association) — RAKE surfaces WHOLE
  * multi-word phrases.
  *
  * Exactness: word scores are floor-micros of integer deg/freq; phrase
  * scores are integer sums of those micros (identical floors both
  * engines, duplicate words count per occurrence, per Rose et al.).
  *
  * Scale: the phrase build is one per-doc window (partitioned by
  * doc_id — parallel across docs) + the gaps-and-islands grouping; word
  * scores fold to a vocabulary-bounded frame that broadcasts back; the
  * top-k is a TakeOrdered, never a global sort.
  */
object Keywords {

  def rakeKeywords(documents: DataFrame, stopwords: Seq[String],
      k: Int = 25, maxPhraseWords: Int = 8): DataFrame = {
    val toks = documents.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("idx", "w")))
    val ns = toks
      .filter(!col("w").isin(stopwords: _*))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("idx"))))
      .select(col("doc_id"), col("idx"), col("w"),
        (col("idx") - col("rn")).as("island"))
    val ph = ns.groupBy(col("doc_id"), col("island"))
      .agg(
        concat_ws(" ",
          expr("transform(sort_array(collect_list(struct(idx, w)))," +
            " s -> s.w)")).as("phrase"),
        count(lit(1)).as("plen"))
      // Rose et al. §1.2.1: overlong candidates are adjoining artifacts,
      // not keywords — drop them BEFORE scoring (deg/freq computed over
      // the retained candidate set only, both engines)
      .filter(col("plen") <= maxPhraseWords)
    val occ = ns.join(ph, Seq("doc_id", "island"))
    // deg·10^6 DIV freq — widened before the multiply (deg is
    // O(tokens·phrase_len) and a long·10^6 overflows near 10^13 tokens)
    val ws = occ.groupBy(col("w"))
      .agg(expr("(cast(sum(plen) as decimal(38,0)) * 1000000)" +
        " DIV count(1)").as("score"))
    val psc = occ.join(broadcast(ws), Seq("w"))
      .groupBy(col("doc_id"), col("island"), col("phrase"))
      .agg(sum(col("score")).cast("decimal(38,0)").as("sc"))
    psc.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        max(col("sc")).cast("bigint").as("score_micros"))
      .select(col("phrase"),
        size(split(col("phrase"), " ")).cast("long").as("n_words"),
        col("n_occurrences"), col("score_micros"))
      .orderBy(col("score_micros").desc, col("phrase"))
      .limit(k)
  }

  def rakeOracleSql(stopwordsSqlList: String, k: Int = 25,
      maxPhraseWords: Int = 8): String =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |pos AS (
       |  SELECT doc_id, unnest(range(1, len(t) + 1)) AS idx, t FROM tk),
       |wtab AS (SELECT doc_id, idx, t[idx] AS w FROM pos),
       |ns AS (
       |  SELECT doc_id, idx, w,
       |    idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx)
       |      AS island
       |  FROM wtab WHERE w NOT IN ($stopwordsSqlList)),
       |ph AS (
       |  SELECT doc_id, island,
       |    string_agg(w, ' ' ORDER BY idx) AS phrase,
       |    CAST(count(*) AS BIGINT) AS plen
       |  FROM ns GROUP BY 1, 2
       |  HAVING count(*) <= $maxPhraseWords),
       |occ AS (
       |  SELECT ns.doc_id, ns.island, ns.w, ph.plen, ph.phrase
       |  FROM ns JOIN ph USING (doc_id, island)),
       |ws AS (
       |  SELECT w,
       |    (CAST(sum(plen) AS HUGEINT) * 1000000) // count(*) AS score
       |  FROM occ GROUP BY 1),
       |psc AS (
       |  SELECT o.doc_id, o.island, o.phrase,
       |    CAST(sum(ws.score) AS HUGEINT) AS sc
       |  FROM occ o JOIN ws USING (w) GROUP BY 1, 2, 3)
       |SELECT phrase,
       |  CAST(len(string_split(phrase, ' ')) AS BIGINT) AS n_words,
       |  CAST(count(*) AS BIGINT) AS n_occurrences,
       |  CAST(max(sc) AS BIGINT) AS score_micros
       |FROM psc GROUP BY phrase
       |ORDER BY score_micros DESC, phrase LIMIT $k""".stripMargin

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) — the
    * graph-centrality sibling of [[rakeKeywords]]' frequency statistics:
    * words vote for their co-occurrence neighbors through 3 rounds of
    * damped PageRank over the adjacency graph (window 2, undirected,
    * distinct edges), so a word that co-occurs with OTHER central words
    * outranks an equally frequent word in a peripheral clique. Same
    * integer fixed-point recurrence as
    * [[graft.operators.Centrality.docPagerank]] (10⁶ scale, 15/85
    * damping, floor DIVs) — the walk is bit-exact in the oracle.
    *
    * Scale: edge extraction is one scan-shaped projection; each round is
    * an (edge ⋈ rank) equi-join + keyed aggregate on word keys — shuffle
    * bounded by |vocabulary|, the usual text-graph discipline.
    */
  def textrankKeywords(documents: DataFrame, topK: Int = 20): DataFrame = {
    val adj = documents
      .select(split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> struct(element_at(toks, i) as a,
          |              element_at(toks, i + 1) as b))""".stripMargin))
        .as("e"))
      .filter(col("e.a") =!= col("e.b"))
      .select(
        least(col("e.a"), col("e.b")).as("lo"),
        greatest(col("e.a"), col("e.b")).as("hi"))
      .distinct()
    val edges = adj.select(col("lo").as("src"), col("hi").as("dst"))
      .union(adj.select(col("hi"), col("lo")))
      .localCheckpoint() // driven by 3 pagerank rounds + degree
    val degW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
    val edgesDeg = edges.withColumn("deg", count(lit(1)).over(degW))
    var rank = edges.select(col("src").as("w")).distinct()
      .withColumn("rank", lit(1000000L))
    for (_ <- 1 to 3) {
      rank = edgesDeg
        .join(rank, edgesDeg("src") === rank("w"))
        .select(col("dst"), expr("rank DIV deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("inflow"))
        .select(col("dst").as("w"),
          (lit(150000L) + expr("85 * inflow DIV 100")).as("rank"))
    }
    val degrees = edges.groupBy(col("src").as("w"))
      .agg(count(lit(1)).as("degree"))
    degrees.join(rank, Seq("w"))
      .select(col("w").as("word"), col("degree"), col("rank").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("word"))
      .limit(topK)
  }

  def textrankOracleSql(topK: Int = 20): String =
    s"""WITH tk AS (SELECT string_split(text, ' ') AS toks FROM documents
       |            WHERE len(string_split(text, ' ')) >= 2),
       |pe AS (
       |  SELECT unnest(list_transform(range(1, len(toks)),
       |    i -> struct_pack(a := toks[i], b := toks[i+1]))) AS e
       |  FROM tk),
       |ad AS (
       |  SELECT DISTINCT least(e.a, e.b) AS lo, greatest(e.a, e.b) AS hi
       |  FROM pe WHERE e.a <> e.b),
       |ed AS (SELECT lo AS src, hi AS dst FROM ad
       |       UNION ALL SELECT hi, lo FROM ad),
       |dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
       |       FROM ed GROUP BY 1),
       |r0 AS (SELECT src AS w, CAST(1000000 AS BIGINT) AS rank FROM dg),
       |c1 AS (SELECT e.dst, CAST(sum(r.rank // d.deg) AS BIGINT) AS inflow
       |       FROM ed e JOIN r0 r ON e.src = r.w
       |       JOIN dg d ON e.src = d.src GROUP BY 1),
       |r1 AS (SELECT dst AS w,
       |       CAST(150000 + (85 * inflow) // 100 AS BIGINT) AS rank FROM c1),
       |c2 AS (SELECT e.dst, CAST(sum(r.rank // d.deg) AS BIGINT) AS inflow
       |       FROM ed e JOIN r1 r ON e.src = r.w
       |       JOIN dg d ON e.src = d.src GROUP BY 1),
       |r2 AS (SELECT dst AS w,
       |       CAST(150000 + (85 * inflow) // 100 AS BIGINT) AS rank FROM c2),
       |c3 AS (SELECT e.dst, CAST(sum(r.rank // d.deg) AS BIGINT) AS inflow
       |       FROM ed e JOIN r2 r ON e.src = r.w
       |       JOIN dg d ON e.src = d.src GROUP BY 1),
       |r3 AS (SELECT dst AS w,
       |       CAST(150000 + (85 * inflow) // 100 AS BIGINT) AS rank FROM c3)
       |SELECT d.src AS word, d.deg AS degree, r3.rank AS rank_micro
       |FROM dg d JOIN r3 ON d.src = r3.w
       |ORDER BY rank_micro DESC, word LIMIT $topK""".stripMargin
}
