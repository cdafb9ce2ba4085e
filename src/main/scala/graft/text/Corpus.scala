package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Corpus-curation operators above the single-column [[TextOps]] layer:
  * Gopher-style repetition signals and deterministic content-hash
  * sampling. Everything is codegen'd Column arithmetic over
  * explode/groupBy shapes — no higher-order lambdas (interpreted) and no
  * UDFs in any path, so the plans survive a 1000-executor scale-up on
  * shuffle size alone.
  */
object Corpus {

  /** Per-document repetition signals in the style of the Gopher quality
    * rules (Rae et al. 2021, "Scaling Language Models", appendix A1.1):
    *
    *   - `n_lines`: non-empty (after space-trim) line count
    *   - `dup_line_frac`: fraction of lines whose exact text occurs more
    *     than once in the document
    *   - `dup_line_char_frac`: fraction of line characters inside those
    *     duplicated lines
    *   - `top_bigram_frac`: fraction of word-bigram occurrences taken by
    *     the document's most frequent bigram
    *
    * Null fraction when the denominator is empty (no lines / <2 tokens).
    * Scale shape: one explode per signal family feeding hash
    * aggregations keyed by (doc, line|bigram) — high-cardinality keys
    * that spread evenly; the only windows are partitioned by document id.
    * All ratios are exact-long IEEE divisions, bit-reproducible across
    * engines (the DuckDB oracle recomputes them from scratch).
    */
  def repetitionSignals(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val id = col(idCol)

    val lineGroups = df
      .select(id, explode(split(col(textCol), "\n")).as("__line"))
      .withColumn("__line", trim(col("__line")))
      .filter(length(col("__line")) > 0)
      .groupBy(id, col("__line"))
      .agg(count(lit(1)).as("__cnt"))
    val lineStats = lineGroups
      .groupBy(id)
      .agg(
        sum(col("__cnt")).as("n_lines"),
        sum(when(col("__cnt") > 1, col("__cnt")).otherwise(0L)).as("__dup"),
        sum(col("__cnt") * length(col("__line"))).as("__chars"),
        sum(when(col("__cnt") > 1, col("__cnt") * length(col("__line")))
          .otherwise(0L)).as("__dupChars"))
      .select(id,
        col("n_lines"),
        (col("__dup").cast("double") / col("n_lines")).as("dup_line_frac"),
        (col("__dupChars").cast("double") / col("__chars"))
          .as("dup_line_char_frac"))

    val w = Window.partitionBy(id).orderBy(col("__pos"))
    val bigramCounts = df
      .select(id, posexplode(TextOps.tokens(col(textCol)))
        .as(Seq("__pos", "__w")))
      .withColumn("__w2", lead(col("__w"), 1).over(w))
      .filter(col("__w2").isNotNull)
      .groupBy(id, concat_ws(" ", col("__w"), col("__w2")).as("__bigram"))
      .agg(count(lit(1)).as("__c"))
    val bigramStats = bigramCounts
      .groupBy(id)
      .agg(max(col("__c")).as("__top"), sum(col("__c")).as("__total"))
      .select(id,
        (col("__top").cast("double") / col("__total")).as("top_bigram_frac"))

    df.select(id)
      .join(lineStats, Seq(idCol), "left")
      .join(bigramStats, Seq(idCol), "left")
      .withColumn("n_lines", coalesce(col("n_lines"), lit(0L)))
  }

  /** Doc-level quality rules in the style of Gopher appendix A1 (Rae et
    * al. 2021) / C4 heuristics: word-count band, mean word length band,
    * bullet-line and ellipsis-line fraction caps, alphabetic-word floor,
    * and a stopword floor, combined into a `keep` verdict alongside the
    * individual signals (so a pipeline can re-threshold without
    * recomputing).
    *
    * Scale shape: a single narrow projection — every signal is a
    * `regexp_count`/`length` expression over the text column, so the
    * whole operator is one codegen'd map stage with ZERO shuffle and no
    * line explode; at 100 TB it is scan-bound. All patterns are
    * RE2-compatible (no lookaround, ASCII classes only) so external
    * engines can verify bit-identically; fractions are IEEE divisions of
    * exact longs.
    */
  def gopherQuality(df: DataFrame, idCol: String, textCol: String,
                    minWords: Long = 50L, maxWords: Long = 100000L,
                    minMeanWordLen: Double = 3.0,
                    maxMeanWordLen: Double = 10.0,
                    maxBulletFrac: Double = 0.5,
                    maxEllipsisFrac: Double = 0.5,
                    minAlphaFrac: Double = 0.9,
                    minStopwords: Long = 2L): DataFrame = {
    val t = col(textCol)
    val nWords = regexp_count(t, lit("\\S+")).cast(LongType)
    // non-whitespace characters / words = mean word length
    val nChars = length(regexp_replace(t, "\\s+", "")).cast(LongType)
    val nLines = (length(t) - length(regexp_replace(t, "\n", "")) + 1)
      .cast(LongType)
    // a match = one token start whose token contains >=1 ASCII letter;
    // [^A-Za-z\s]* cannot cross whitespace, so matches never span tokens
    val nAlpha = regexp_count(t, lit("(^|\\s)[^A-Za-z\\s]*[A-Za-z]"))
      .cast(LongType)
    val nBullet = regexp_count(t, lit("(?m)^\\s*[-*]")).cast(LongType)
    val nEllipsis = regexp_count(t, lit("(?m)\\.\\.\\.$")).cast(LongType)
    val nStop = TextOps.stopwordCount(t).cast(LongType)

    val out = df.select(col(idCol),
      nWords.as("n_words"), nLines.as("n_lines"),
      when(nWords > 0, nChars.cast("double") / nWords).otherwise(0.0)
        .as("mean_word_len"),
      (nBullet.cast("double") / nLines).as("frac_bullet_lines"),
      (nEllipsis.cast("double") / nLines).as("frac_ellipsis_lines"),
      when(nWords > 0, nAlpha.cast("double") / nWords).otherwise(0.0)
        .as("frac_alpha_words"),
      nStop.as("n_stop"))
    out.withColumn("keep",
      col("n_words").between(minWords, maxWords) &&
        col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
        col("frac_bullet_lines") <= maxBulletFrac &&
        col("frac_ellipsis_lines") <= maxEllipsisFrac &&
        col("frac_alpha_words") >= minAlphaFrac &&
        col("n_stop") >= minStopwords)
  }

  /** Corpus-WIDE paragraph-level exact dedup in the style of the C4
    * pipeline (Raffel et al. 2020: drop repeated three-sentence spans
    * corpus-wide, keeping one occurrence): every newline-delimited,
    * space-trimmed, non-empty paragraph keeps only its first occurrence
    * across the whole corpus, "first" = smallest (document id, position).
    *
    * Returns the line-level relation `(id, pos, para_md5, keep)` so
    * callers can filter/reconstruct or aggregate removal stats; the
    * ordering contract is the single arithmetic key
    * `id << 20 | pos` (documented bound: < 2^20 paragraphs per document,
    * ids < 2^43 — checked nowhere, stated here), which makes "first"
    * engine-portable without struct-ordering semantics.
    *
    * Scale shape: paragraphs are keyed by md5 so the wide exchanges
    * carry a 32-char key, never the text; first-occurrence is a
    * map-side-combinable `min` groupBy on that high-cardinality key, and
    * the instance↔first join re-uses the same key (co-partitioned
    * hash join, no broadcast of anything unbounded). No windows, no
    * higher-order lambdas, no driver collection.
    */
  def dedupParagraphs(df: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val id = col(idCol)
    val lines = df
      .select(id, posexplode(split(col(textCol), "\n")).as(Seq("pos", "__p")))
      .withColumn("__p", trim(col("__p")))
      .filter(length(col("__p")) > 0)
      .select(id, col("pos"),
        md5(col("__p").cast("binary")).as("para_md5"),
        (shiftleft(id.cast(LongType), 20) + col("pos")).as("__k"))
    val first = lines.groupBy(col("para_md5"))
      .agg(min(col("__k")).as("__first"))
    lines.join(first, Seq("para_md5"))
      .select(id, col("pos"), col("para_md5"),
        (col("__k") === col("__first")).as("keep"))
  }

  /** Corpus-WIDE line-level dedup in the style of RefinedWeb's line-wise
    * filtering (Penedo et al. 2023): any line whose space-trimmed form
    * occurs MORE than `maxOccurrences` times across the whole corpus is
    * removed from every document that carries it (frequency-threshold
    * semantics — unlike [[dedupParagraphs]]' keep-first). Whitespace-only
    * lines are document structure, never counted or removed.
    *
    * Returns `(id, text, n_lines, n_removed)` with `text` REBUILT from
    * the surviving original (untrimmed) lines in original order — the
    * reconstructive variant a production pipeline actually ships, not
    * just a keep mask. A document losing every line keeps its row with
    * empty text; a null-text document keeps its row with NULL text and
    * zero counts (null in, null out — never silently "").
    *
    * Scale shape: the corpus-wide frequency count exchanges a 32-char
    * md5 of the trimmed line, never the text (map-side combinable hash
    * agg on a high-cardinality key); the instance<->count join reuses
    * that key co-partitioned. Reconstruction is a per-document
    * `collect_list` bounded by document size — the one exchange that
    * carries text, which the output must carry anyway. No windows, no
    * driver collection. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 maxOccurrences: Long = 1L): DataFrame = {
    val id = col(idCol)
    val lines = df
      .select(id, posexplode(split(col(textCol), "\n")).as(Seq("pos", "__l")))
      .withColumn("__t", trim(col("__l")))
      .withColumn("__blank", length(col("__t")) === 0)
      .withColumn("__k", md5(col("__t").cast("binary")))
    val counts = lines.filter(!col("__blank"))
      .groupBy(col("__k")).agg(count(lit(1)).as("__c"))
    val kept = lines.join(counts, Seq("__k"), "left")
      .withColumn("keep",
        col("__blank") || coalesce(col("__c"), lit(0L)) <= maxOccurrences)
    val rebuilt = kept.groupBy(id)
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        array_join(transform(
          sort_array(collect_list(when(col("keep"),
            struct(col("pos").as("p"), col("__l").as("l"))))),
          x => x.getField("l")), "\n").as(textCol))
    // null text passes through as null (with zero counts) — a null doc
    // must stay visibly null downstream, not silently become ""
    df.select(id, col(textCol).isNull.as("__was_null"))
      .join(rebuilt, Seq(idCol), "left")
      .select(id,
        when(col("__was_null"), lit(null).cast("string"))
          .otherwise(coalesce(col(textCol), lit(""))).as(textCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }

  /** Training-sequence packing, concat-and-chunk style: documents are
    * laid end-to-end in ascending-`idCol` order into one global token
    * stream, which is then cut into fixed `seqLen`-token training
    * sequences. Per document the returned relation gives its stream
    * position and sequence span:
    * `(id, n_tokens, token_offset, seq_first, seq_first_off, seq_last)` —
    * everything a writer needs to emit each doc's slices into its
    * sequences (a doc crossing a boundary contributes to
    * `seq_last - seq_first + 1` consecutive sequences). Zero-token docs
    * occupy no stream space and are omitted.
    *
    * Scale shape: the only non-local step is the global exclusive prefix
    * sum of token counts, computed with the bucket-parallel two-level
    * scan ([[graft.ops.Scan.prefixSum]], buckets of `idBucketWidth` ids)
    * — no single-partition window over the corpus, no join wider than the
    * broadcast bucket-carry relation. All chunk arithmetic is codegen'd
    * floor-div/mod on the offset.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    seqLen: Long, idBucketWidth: Long = 1L << 16): DataFrame = {
    require(seqLen > 0, "seqLen must be > 0")
    import graft.ops.Scan
    val in = df
      .select(col(idCol), col(tokensCol).cast(LongType).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("__b", Scan.bucketOf(col(idCol).cast(LongType), idBucketWidth))
    Scan.prefixSum(in, Nil, "__b", Seq(col(idCol)), col("n_tokens"),
        inclusive = false, outCol = "token_offset")
      .select(col(idCol), col("n_tokens"), col("token_offset"),
        Scan.bucketOf(col("token_offset"), seqLen).as("seq_first"),
        pmod(col("token_offset"), lit(seqLen)).as("seq_first_off"),
        Scan.bucketOf(col("token_offset") + col("n_tokens") - 1, seqLen)
          .as("seq_last"))
  }

  /** PII scrubbing for corpus curation: emails, dotted-quad IPs, and
    * 7+-digit runs (account/phone-shaped numbers) replaced by stable
    * tokens. A chain of codegen'd `regexp_replace` projections — no UDF,
    * no shuffle; the pattern set is deliberately minimal, deterministic,
    * and RE2-compatible (portable to other engines for verification).
    * Order matters: emails first, so their digit-bearing local parts
    * aren't partially eaten by the number rule. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
      "\\b\\d{7,}\\b", "<NUM>")

  /** Benchmark decontamination: corpus documents sharing at least
    * `minHits` distinct token `n`-grams with any document of `evalSet`
    * (the held-out benchmark whose prompts/answers must not leak into
    * training data). Returns one row per contaminated corpus document:
    * `(idCol, n_hit_grams, n_eval_docs)` — how many distinct grams leak
    * and how many eval documents they touch; callers left-anti-join the
    * corpus against it to drop. Gram semantics are DISTINCT-per-doc
    * lowercase word n-grams, same normalization as the dedup family
    * (reference-scale pipelines use n≈13; pick n to the eval set's
    * prompt length).
    *
    * Scale shape: the eval side is benchmark-sized (1e3–1e6 grams) while
    * the corpus side is the 100 TB side — eval grams dedupe to a slim
    * `(gram, eval_id)` relation that is broadcast (hint only; Spark
    * falls back to a shuffled hash join if a giant eval set exceeds the
    * broadcast threshold), the corpus streams through one exploded
    * shingle scan with no self-join, and the per-doc aggregation is a
    * hash aggregate keyed by document id. No step is quadratic in
    * corpus size. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
                    textCol: String, n: Int = 8, minHits: Long = 1L,
                    broadcastEval: Boolean = true): DataFrame = {
    val c = graft.dedup.Dedup.shingleRel(corpus, idCol, textCol, n)
    val e0 = graft.dedup.Dedup.shingleRel(evalSet, idCol, textCol, n)
      .select(col("__id").as("__eval_id"), col("__sh"))
    val e = if (broadcastEval) broadcast(e0) else e0
    c.join(e, Seq("__sh"))
      .groupBy(col("__id"))
      .agg(count_distinct(col("__sh")).as("n_hit_grams"),
        count_distinct(col("__eval_id")).as("n_eval_docs"))
      .filter(col("n_hit_grams") >= minHits)
      .select(col("__id").as(idCol), col("n_hit_grams"),
        col("n_eval_docs"))
  }

  /** FUZZY benchmark decontamination — the near-duplicate complement of
    * [[decontaminate]]'s exact-gram overlap: flag corpus documents whose
    * shingle-set Jaccard against ANY eval document reaches `threshold`,
    * found by MinHash+LSH banding (never a corpus x eval cross product)
    * and certified by exact Jaccard on the surviving candidates. Catches
    * the paraphrased/reformatted benchmark leakage exact grams miss.
    *
    * Scale shape: the corpus side streams once through signature +
    * banding (the [[graft.dedup.Dedup.minhashLshPairs]] kernels); the
    * eval side is benchmark-sized, so its banded keys BROADCAST and
    * candidate generation is a map-side hash join — the only exchanges
    * are the two signature aggregations and the candidate verify joins,
    * each bounded by true-candidate volume, not corpus^2. Returns
    * `(idCol, eval_id, jaccard)` (a corpus doc present verbatim in the
    * eval set self-flags at jaccard 1.0). */
  def decontaminateFuzzy(corpus: DataFrame, evalSet: DataFrame,
                         idCol: String, textCol: String, n: Int = 3,
                         numHashes: Int = 48, bands: Int = 16,
                         threshold: Double = 0.6): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    import graft.dedup.Dedup.{bandedRel, minhashSigRel, shingleRel}
    val bandC = bandedRel(
      minhashSigRel(corpus, idCol, textCol, n, numHashes), bands, r)
    val bandE = bandedRel(
        minhashSigRel(evalSet, idCol, textCol, n, numHashes), bands, r)
      .select(col("__id").as("__eid"), col("__band"), col("__bh"))
    val cand = bandC.join(broadcast(bandE), Seq("__band", "__bh"))
      .select(col("__id"), col("__eid")).distinct()
    // exact cross-relation Jaccard: composite (id, shingle) join keys,
    // so the plan pays true intersection cost — never an id-only fanout
    val shC = shingleRel(corpus, idCol, textCol, n)
    val shE = shingleRel(evalSet, idCol, textCol, n)
      .select(col("__id").as("__eid2"), col("__sh").as("__she"))
    val nC = shC.groupBy(col("__id")).agg(count(lit(1)).as("__n1"))
    val nE = shE.groupBy(col("__eid2")).agg(count(lit(1)).as("__n2"))
      .withColumnRenamed("__eid2", "__eid")
    cand
      .join(shC, Seq("__id"))
      .join(shE,
        col("__eid") === col("__eid2") && col("__sh") === col("__she"))
      .groupBy(col("__id"), col("__eid"))
      .agg(count(lit(1)).as("__nc"))
      .join(nC, Seq("__id")).join(nE, Seq("__eid"))
      .withColumn("jaccard", col("__nc").cast("double") /
        (col("__n1") + col("__n2") - col("__nc")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("__id").as(idCol), col("__eid").as("eval_id"),
        col("jaccard"))
  }

  /** Per-document top-`k` salient terms — the keyword-extraction shape of
    * TF-IDF. Returns `(idCol, term, tf, df_docs, tfidf, rank)`: term
    * frequency in the doc, document frequency across the corpus, the
    * conventional log-damped score `tf * ln(N / df)`, and the 1-based
    * salience rank.
    *
    * The RANKING key is deliberately integer/string-only —
    * `(tf DESC, df_docs ASC, term ASC)`: most frequent first, rarest
    * breaking ties — NOT the float `tfidf` column. `ln` is not required
    * to be correctly rounded, so a float rank could legitimately differ
    * across engines/libm versions; the integer key makes the output
    * bit-reproducible (and DuckDB-verifiable) while ordering comparably
    * in practice. `tfidf` rides along for consumers that want the score.
    *
    * Scale shape: one token explode → (doc, term) hash count (map-side
    * combinable), a vocabulary-sized df aggregate, an equi-join back on
    * term (each (doc, term) row matches exactly one df row — hot
    * stopwords fan out no further than their true row count), and a
    * per-document window for the top-k. N is a scalar dimension
    * (broadcast). */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
               k: Int = 10): DataFrame = {
    val id = col(idCol)
    val tf = df
      .select(id, explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(id, col("term")).agg(count(lit(1)).as("tf"))
    val dfDocs = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df_docs")) // tf rows are distinct (doc, term)
    val n = df.select(count(lit(1)).as("__n"))
    val w = Window.partitionBy(id)
      .orderBy(col("tf").desc, col("df_docs").asc, col("term").asc)
    tf.join(dfDocs, Seq("term"))
      .join(broadcast(n))
      .withColumn("tfidf",
        col("tf") * log(col("__n").cast("double") / col("df_docs")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(id, col("term"), col("tf"), col("df_docs"), col("tfidf"),
        col("rank"))
  }

  /** Global corpus vocabulary, top-`topN` tokens: one row per token with
    * its total occurrence count, document frequency, and a deterministic
    * global rank over the integer/string-only key
    * `(n_occurrences DESC, df_docs ASC, term ASC)` — the vocabulary
    * primitive behind tokenizer training and frequency-floor filtering.
    *
    * Scale shape: token explode → (doc, term) hash count (map-side
    * combinable before the only corpus-sized exchange) → vocabulary-sized
    * term aggregate. The top-N itself is `orderBy(...).limit(topN)`,
    * which Spark executes as TakeOrderedAndProject — each task keeps a
    * local N-row heap and only N rows per partition ever move, so no
    * global sort of the vocabulary happens anywhere. The final
    * `row_number` window runs over the already-limited N-row relation
    * (bounded by the caller's `topN`, the same dimension-only posture as
    * `Ops.withOrd`). */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
                 topN: Int = 50000): DataFrame = {
    val tf = df
      .select(col(idCol).as("__doc"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col("__doc"), col("term")).agg(count(lit(1)).as("__cnt"))
    val key = Seq(col("n_occurrences").desc, col("df_docs").asc,
      col("term").asc)
    tf.groupBy(col("term"))
      .agg(sum(col("__cnt")).as("n_occurrences"),
        count(lit(1)).as("df_docs"))
      .orderBy(key: _*)
      .limit(topN)
      .withColumn("rank", row_number().over(Window.orderBy(key: _*)).cast(LongType))
  }

  /** Per-stratum corpus profile with EXACT discrete quantiles of an
    * integer measure (doc length, token count): `n_docs`, `total`,
    * `min`/`max`, `mean`, and for each requested p the smallest value
    * whose cumulative count reaches `ceil(p * n)` — the classic
    * `percentile_disc` definition, integer-valued and therefore
    * bit-reproducible across engines.
    *
    * Exact quantiles normally need a per-stratum sort of all rows — a
    * scale hazard. This computes them from the VALUE HISTOGRAM instead:
    * one hash aggregation to (stratum, value, count) — map-side
    * combinable, cardinality = distinct values (doc lengths), orders of
    * magnitude below row count — then a cumulative sum windowed over the
    * histogram (partition size = distinct values per stratum, bounded),
    * and one conditional-min aggregate per quantile. No row-level sort,
    * no approximation. */
  def profile(df: DataFrame, strataCol: String, measure: Column,
              ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(ps.forall(p => p > 0.0 && p <= 1.0), s"quantiles out of (0,1]: $ps")
    val strata = col(strataCol)
    val hist = df.select(strata, measure.cast(LongType).as("__v"))
      .groupBy(strata, col("__v")).agg(count(lit(1)).as("__c"))
    // running + whole-partition sums share one exchange/sort over the
    // HISTOGRAM (partition rows = distinct values per stratum) — the
    // per-stratum totals come from the unbounded frame, not a second
    // scan-and-join of the input
    val w = Window.partitionBy(strata).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(strata)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__tot", sum(col("__v") * col("__c")).over(wAll))
    val qs = ps.map { p =>
      val tag = math.round(p * 100).toInt
      min(when(col("__cum") >= ceil(lit(p) * col("__n")).cast(LongType),
        col("__v"))).as(s"p${tag}")
    }
    val aggs = Seq(
      first(col("__n")).as("n_docs"),
      first(col("__tot")).as("total"),
      min(col("__v")).as("min_v"),
      max(col("__v")).as("max_v"),
      (first(col("__tot")).cast(DoubleType) /
        first(col("__n")).cast(DoubleType)).as("mean_v")) ++ qs
    cum.groupBy(strata).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-document n-gram novelty: the fraction of a document's distinct
    * word n-grams whose corpus-wide FIRST owner (minimum doc id) is the
    * document itself — the "how much of this doc is new text" signal
    * behind dedup-aware mixing and crawl-snapshot triage. Documents with
    * fewer than `n` tokens have no n-grams and no output row.
    *
    * Scale shape (same posture as the C4 paragraph dedup): the gram
    * relation exchanges on the md5 of the gram — a fixed-width 32-char
    * key, never the text — through one min-groupBy for first owners and
    * one co-partitioned join back; per-doc counts are a hash aggregation
    * on doc id. No windows, no lambdas. */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    val sh = graft.dedup.Dedup.shingleRel(df, idCol, textCol, n)
      .select(col("__id"), md5(col("__sh").cast("binary")).as("__k"))
    val firsts = sh.groupBy(col("__k")).agg(min(col("__id")).as("__first"))
    sh.join(firsts, Seq("__k"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col("__id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast(DoubleType) / col("n_grams").cast(DoubleType))
      .withColumnRenamed("__id", idCol)
  }

  /** Bucket in [0, 2^32) from the md5 of `salt|key` — the deterministic,
    * engine-independent selector behind [[sampleByHash]]. md5 (not
    * xxhash64) so an external system — or the DuckDB oracle — can
    * reproduce the exact selection without Spark. */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(md5(concat_ws("|", lit(salt), key)), 1, 8), 16, 10)
      .cast(LongType)

  /** Deterministic global shuffle-and-shard — the training-export last
    * mile. Every row gets a 60-bit md5 permutation key from
    * `salt|idCol` ([[hashBucket]]'s engine-independent idiom, widened to
    * 15 hex chars so ordering collisions are ~impossible at corpus
    * scale), a `shard` in `[0, nShards)` from the key, and a 1-based
    * `shard_pos` giving its position in the shard's shuffled read
    * order. Properties a training loader needs, none of which
    * `df.sample`/`rand()` give:
    *
    *   - reproducible across runs, engines, partitionings, and task
    *     retries (no RNG state — the permutation is content-addressed);
    *   - different `salt` = independent epoch orders from the same data;
    *   - any shard subset is itself an unbiased sample of the corpus.
    *
    * Scale shape: one hash exchange on `shard` and a per-shard sort —
    * exactly the shuffle a global permutation inherently costs, and no
    * global window: parallelism is `nShards`, so size shards to your
    * target file size (e.g. 100 TB / 10k shards = 10 GB sorts, each
    * spillable independently). Ordering ties broken by `idCol`.
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
                    salt: String = "graft"): DataFrame = {
    require(nShards > 0, s"nShards=$nShards")
    val key = conv(substring(
        md5(concat_ws("|", lit(salt), col(idCol))), 1, 15), 16, 10)
      .cast(LongType)
    df.withColumn("__shuffle_key", key)
      .withColumn("shard", pmod(col("__shuffle_key"), lit(nShards.toLong))
        .cast("int"))
      .withColumn("shard_pos",
        row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col("__shuffle_key"), col(idCol))).cast(LongType))
      .drop("__shuffle_key")
  }

  /** Materialize [[shuffleShards]] as a shard-partitioned parquet layout:
    * `path/shard=N/...`, rows inside each shard file in shuffled
    * (`shard_pos`) order, so a training loader streams each shard
    * sequentially and reads the corpus in the permuted order with zero
    * seek/sort work at load time. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, path: String,
                  salt: String = "graft"): Unit =
    shuffleShards(df, idCol, nShards, salt)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** Deterministic content-addressed sample: keeps rows where the md5
    * bucket of `salt|key` falls under `fraction` of the 2^32 bucket
    * space. Unlike `df.sample()` this is reproducible across runs,
    * partitionings, engines, and retries (no RNG state), stable under
    * re-execution of failed tasks, and composable: disjoint salts give
    * independent samples; the same salt at a larger fraction is a
    * superset (so train/eval splits can grow monotonically). One
    * codegen'd expression in the filter — pushes to the scan like any
    * predicate. */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double,
                   salt: String = "graft"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction")
    df.filter(hashBucket(col(keyCol), salt) <
      lit((fraction * 4294967296.0).toLong))
  }

  /** Corpus-wide duplicated-substring spans — the scalable approximation
    * of exact-substring training-data dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better", which
    * removes every repeated 50-token substring via a suffix array; a
    * suffix array is not a shuffle-friendly structure, so the accepted
    * distributed approximation slides an `n`-token window instead):
    *
    *  1. every position `p` of every document contributes the md5 of its
    *     `n`-token window (per-doc `lead` windows over exploded tokens —
    *     codegen'd, no lambdas; the exchange carries 32-char keys, never
    *     text),
    *  2. an occurrence is REMOVABLE iff it is not the corpus-wide first
    *     (smallest `doc_id<<20 | p` arithmetic key — the
    *     [[dedupParagraphs]] convention; every copy of a duplicated
    *     window except one is marked, so dedup never erases a string
    *     from the corpus entirely),
    *  3. removable windows become token-coordinate intervals
    *     `[p, p + n)` and the ENGINE'S OWN genomic merge
    *     ([[graft.ops.Ops.merge]], range-partitioned sweep, doc id as
    *     the chromosome) collapses them into maximal spans.
    *
    * Output: (idCol, span_start, span_end, n_dup_windows) — one row per
    * maximal duplicated span, token coordinates, `n_dup_windows` = how
    * many removable windows the span absorbed. Docs shorter than `n`
    * tokens contribute nothing. Scale shape: per-doc windows, one
    * hash-keyed exchange for first-owner resolution, and the merge's
    * range partitioning — no corpus-sized window, no driver state. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 8): DataFrame = {
    require(n >= 1, s"window must be >= 1 token, got $n")
    val w = Window.partitionBy(col("__id")).orderBy(col("__p"))
    val rest = (1 until n).map(j => lead(col("__t"), j).over(w))
    val full = if (n > 1) rest.last.isNotNull else lit(true)
    val grams = df
      .select(col(idCol).cast(LongType).as("__id"), col(textCol).as("__text"))
      .repartition(graft.core.Par.width(df), col("__id"))
      .select(col("__id"),
        posexplode(TextOps.tokens(col("__text"))).as(Seq("__p", "__t")))
      .select(col("__id"), col("__p").cast(LongType).as("__p"),
        md5(concat_ws(" ", (col("__t") +: rest): _*).cast("binary")).as("__k"),
        full.as("__full"))
      .filter(col("__full"))
      .withColumn("__inst", shiftleft(col("__id"), 20) + col("__p"))
    // first-owner in ONE pass: a min window over the hash key costs the
    // same single exchange a groupBy would, without the self-join that
    // re-runs the whole tokenize+lead pipeline for the aggregate branch
    // (measured 4.0s -> 1.15s at sf0.01; a per-key partition holds the
    // occurrence count of one 8-gram — bounded in any real corpus)
    val removable = grams
      .withColumn("__f",
        min(col("__inst")).over(Window.partitionBy(col("__k"))))
      .filter(col("__inst") =!= col("__f"))
      .select(col("__id").as("__doc"), col("__p").as("start"),
        (col("__p") + n).as("end"))
    graft.ops.Ops.merge(removable, minDist = Some(0),
        cols = graft.core.ColSpec("__doc", "start", "end"))
      .select(col("__doc").as(idCol), col("start").as("span_start"),
        col("end").as("span_end"), col("n_intervals").as("n_dup_windows"))
  }

  /** Linear bag-of-words text classifier scoring — the execution shape of
    * the fastText-style quality filters behind DCLM / FineWeb-Edu style
    * curation (a learned model assigns each doc a quality score; docs
    * below a margin are dropped). The ENGINE side is what matters here:
    * tokens explode once, per-(doc, term) counts hash-aggregate map-side,
    * term weights arrive as a BROADCAST relation (the model is dimension
    * data — a few hundred thousand rows for any real vocabulary), and the
    * per-doc margin is one more hash aggregate. Weights are integer
    * (fixed-point millis, the convention real exported linear models
    * quantize to anyway) so the margin is an exact long — deterministic,
    * engine-portable, no float-sum ordering anywhere.
    *
    * `weights`: (term, weight) rows; `bias` adds to every margin; a term
    * absent from the table scores 0. Output: (idCol, n_terms, margin,
    * keep = margin > 0). */
  def scoreLinear(df: DataFrame, idCol: String, textCol: String,
                  weights: DataFrame, bias: Long = 0L): DataFrame = {
    val id = col(idCol)
    val tf = df
      .select(id, explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(id, col("term")).agg(count(lit(1)).as("__tf"))
    df.select(id).join(
        tf.join(broadcast(weights.select(col("term"),
            col("weight").cast(LongType).as("__w"))),
          Seq("term"), "left")
          .groupBy(id)
          .agg(sum(col("__tf")).as("n_terms"),
            sum(col("__tf") * coalesce(col("__w"), lit(0L))).as("__dot")),
        Seq(idCol), "left")
      .select(id, coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        (coalesce(col("__dot"), lit(0L)) + bias).as("margin"))
      .withColumn("keep", col("margin") > 0L)
  }

  /** Hash-derived stand-in weight table for [[scoreLinear]] over a given
    * vocabulary: weight(term) = signed md5 bucket in [-1000, 1000] —
    * deterministic and engine-reproducible, so gates can exercise the
    * full scoring plumbing without shipping a real model. */
  def hashWeights(vocab: DataFrame, termCol: String = "term",
                  salt: String = "graft-w1"): DataFrame =
    vocab.select(col(termCol).as("term"),
      (hashBucket(col(termCol), salt) % 2001L - 1000L).as("weight"))

  /** Per-key document quota (the C4 / RefinedWeb per-domain cap): keep at
    * most `cap` rows per key, chosen in deterministic content-hash order
    * (`md5(salt|id)` — unbiased, retry-stable, engine-portable) with the
    * id as the tiebreak. Spark plans the `row_number <= cap` filter as a
    * WindowGroupLimit: every map task pre-prunes to `cap` rows per key
    * BEFORE the exchange, so a 100 TB crawl with a million-page domain
    * ships at most `cap` rows of it per task — the shuffle is bounded by
    * cap x keys, not by the skewed domain. */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, cap: Int,
                salt: String = "graft"): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashBucket(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** C4-style line/page quality verdicts (Raffel et al. 2020, §2.2 —
    * the cleaning pass behind the C4 corpus). Per document:
    *
    *  - a LINE (newline-split, space-trimmed, empties ignored) is kept
    *    iff it ends in a terminal punctuation mark (`. ! ? "`), has at
    *    least `minWords` whitespace words, and does not mention
    *    "javascript" (case-insensitive),
    *  - the PAGE is kept iff at least `minKeptLines` lines survive
    *    (C4's >= 3-sentence floor, with kept lines as the sentence
    *    proxy) and no line contains "lorem ipsum" or a curly brace.
    *
    * Output: (idCol, n_lines, n_kept, page_keep). Containment checks are
    * per-line (a marker spanning a newline is not detected — C4's rules
    * are line-scoped anyway). One explode feeding a per-doc hash
    * aggregate; every predicate is a codegen'd expression, no lambdas,
    * no UDFs, nothing corpus-wide. Docs whose every line is empty (or
    * empty docs) produce n_lines = 0 and page_keep = false. */
  def c4QualityFilter(df: DataFrame, idCol: String, textCol: String,
                      minWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val id = col(idCol)
    val lines = df
      .select(id, posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__raw")))
      .withColumn("__l", trim(col("__raw")))
      .filter(length(col("__l")) > 0)
      .withColumn("__keep",
        col("__l").rlike("[.!?\"]$") &&
          regexp_count(col("__l"), lit("\\S+")) >= minWords &&
          !lower(col("__l")).contains("javascript"))
    df.select(id).join(
        lines.groupBy(id).agg(
          count(lit(1)).as("n_lines"),
          sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
          max(when(lower(col("__l")).contains("lorem ipsum"), 1L)
            .otherwise(0L)).as("__lorem"),
          max(when(col("__l").contains("{"), 1L).otherwise(0L)).as("__curly")),
        Seq(idCol), "left")
      .select(id,
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("n_kept"), lit(0L)) >= minKeptLines &&
          coalesce(col("__lorem"), lit(0L)) === 0 &&
          coalesce(col("__curly"), lit(0L)) === 0).as("page_keep"))
  }

  /** Per-stratum deterministic sampling — the data-mixing primitive: one
    * pass, one when-chain on the stratum column, no shuffle at all.
    * Strata absent from `fractions` are dropped (rate 0). */
  def sampleStratified(df: DataFrame, keyCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       salt: String = "graft"): DataFrame = {
    fractions.values.foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction=$f"))
    val threshold = fractions.foldLeft(lit(0L)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit((f * 4294967296.0).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), salt) < threshold)
  }

  /** Overlapping fixed-size character chunks — the RAG / long-context
    * splitting primitive: chunk `i` covers characters
    * `[i*stride, i*stride + size)` with `stride = size - overlap`, the
    * last chunk being the first one whose window reaches the end of the
    * text (an empty document still yields one empty chunk, so no row is
    * silently dropped). Pure codegen'd arithmetic: the chunk count is
    * exact integer math (`(len - size + stride - 1) div stride`, clamped
    * at zero — truncating and flooring division agree after the clamp),
    * one `explode(sequence(...))` per document, and a `substring`
    * projection; no shuffle at all, so it scales as a map-only pass. */
  def chunk(df: DataFrame, size: Int, overlap: Int,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size > 0, s"size=$size")
    require(overlap >= 0 && overlap < size, s"overlap=$overlap vs size=$size")
    val stride = size - overlap
    df.select(col(idCol), col(textCol),
        explode(sequence(lit(0L), greatest(lit(0L),
          expr(s"(length($textCol) - $size + ${stride - 1}) div $stride")
            .cast(LongType)))).as("chunk_id"))
      .withColumn("chunk_start", col("chunk_id") * stride)
      .withColumn("chunk_text",
        expr(s"substring($textCol, chunk_start + 1, $size)"))
      .select(col(idCol), col("chunk_id"), col("chunk_start"),
        col("chunk_text"))
  }

  /** Deterministic source-weighted data mixing with epoch repetition —
    * the Pile/Dolma-style mixture primitive: a source with weight `w`
    * contributes `floor(w)` full copies of each document (epochs
    * `0..floor(w)-1`) plus one fractionally sampled epoch at rate
    * `w - floor(w)`; sources absent from `weights` are dropped.
    * Fractional selection is the [[hashBucket]] md5 rule over
    * `epoch|doc_id`, so each epoch's sample is independent, the mixture
    * is reproducible across engines/partitionings/retries, and a larger
    * fractional rate keeps the smaller rate's rows (monotone growth).
    * Scale shape: one codegen'd when-chain + `explode(sequence)` +
    * filter — rows multiply by at most `ceil(max weight)` and the
    * predicate runs map-side; no shuffle. Returns (idCol, srcCol, epoch)
    * plus the input's other columns. */
  /** Per-source multiplicities for TEMPERATURE mixing (the XLM-R/mT5
    * multilingual-rebalancing rule): source sampling mass ∝ `n_s^alpha`
    * with `alpha < 1` upweighting small sources, scaled so the
    * expected output row count is `targetRows`. Per-document
    * multiplicity `m_s = mass_s / n_s * targetRows`.
    *
    * Determinism/engine-exactness: `n_s^alpha` is quantized to an
    * exact BIGINT (`round(pow * 1e6)`) BEFORE the normalizing sum, so
    * the sum is order-free integer arithmetic and every multiplicity
    * is a fixed-operand-order IEEE expression a SQL oracle replays
    * bit for bit. At `alpha = 0.5` the power is `sqrt` — correctly
    * rounded by IEEE, hence portable; other alphas go through
    * `math.pow`, whose cross-engine agreement is typical but not
    * guaranteed (the gate pins alpha = 0.5). Source count collection
    * is dimension-sized (#sources), the centroid-collect posture. */
  def temperatureWeights(df: DataFrame, srcCol: String = "source",
                         alpha: Double = 0.5,
                         targetRows: Long): Map[String, Double] = {
    require(alpha > 0.0 && targetRows > 0)
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val qs = counts.map { case (s, n) =>
      val p = if (alpha == 0.5) math.sqrt(n.toDouble)
              else math.pow(n.toDouble, alpha)
      (s, n, math.round(p * 1e6))
    }
    val sumQ = qs.map(_._3).sum
    qs.map { case (s, n, q) =>
      s -> (q.toDouble * targetRows.toDouble / sumQ.toDouble / n.toDouble)
    }.toMap
  }

  /** [[mixBySource]] with [[temperatureWeights]] computed from the
    * data — one call from corpus to temperature-rebalanced mixture. */
  def mixByTemperature(df: DataFrame, targetRows: Long,
                       alpha: Double = 0.5,
                       idCol: String = "doc_id",
                       srcCol: String = "source",
                       salt: String = "mix"): DataFrame =
    mixBySource(df, temperatureWeights(df, srcCol, alpha, targetRows),
      idCol, srcCol, salt)

  def mixBySource(df: DataFrame, weights: Map[String, Double],
                  idCol: String = "doc_id", srcCol: String = "source",
                  salt: String = "mix"): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    weights.values.foreach(w => require(w >= 0.0, s"weight=$w"))
    val wcol = weights.foldLeft(lit(null).cast(DoubleType)) {
      case (acc, (k, w)) => when(col(srcCol) === k, lit(w)).otherwise(acc)
    }
    df.withColumn("__w", wcol)
      .filter(col("__w").isNotNull && col("__w") > 0.0)
      .withColumn("__nfull", floor(col("__w")).cast(LongType))
      .withColumn("__thresh",
        ((col("__w") - floor(col("__w"))) * 4294967296.0).cast(LongType))
      .withColumn("epoch",
        explode(sequence(lit(0L), col("__nfull"))))
      .filter(col("epoch") < col("__nfull") ||
        hashBucket(concat_ws("|", col("epoch"), col(idCol)), salt) <
          col("__thresh"))
      .drop("__w", "__nfull", "__thresh")
  }

  /** Leakage-guarded train/eval split: every row sharing the same group
    * key (URL host, source domain, author — whatever near-duplicates
    * cluster under) lands in the same split, so paraphrases of one page
    * can never straddle train and eval. `fractions` is an ordered list
    * of (label, fraction) summing to <= 1 (a remainder falls into the
    * LAST label, so 0.8/0.1/0.1 is exactly exhaustive); assignment is
    * the cumulative-cut test on the content-addressed [[hashBucket]] of
    * the GROUP (not the row), making the split
    *
    *   - group-atomic by construction (the hash has no row input),
    *   - reproducible across runs, engines, partitionings, and retries,
    *   - stable under fraction growth: widening a prefix label's
    *     fraction only MOVES groups across the one affected cut,
    *
    * all as one codegen'd when-chain in a map-only pass — no shuffle,
    * no group materialization, pushes to the scan like any projection.
    * A NULL group key is coalesced to the sentinel `__graft_null__`
    * before hashing (concat_ws would silently SKIP the null, collapsing
    * all null-group rows into md5(salt)); nulls thus form one explicit
    * atomic group that any external replay can reproduce with the same
    * COALESCE. Output: input columns + `split`. */
  def splitByGroup(df: DataFrame, groupCol: String,
                   fractions: Seq[(String, Double)],
                   salt: String = "graft-split"): DataFrame = {
    require(fractions.nonEmpty, "fractions must be non-empty")
    fractions.foreach { case (l, f) =>
      require(f > 0.0 && f <= 1.0, s"fraction $l=$f") }
    val total = fractions.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"fractions sum to $total > 1")
    val bucket = hashBucket(
      coalesce(col(groupCol).cast(StringType), lit("__graft_null__")), salt)
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(c => (c * 4294967296.0).toLong)
    val chain = fractions.init.zip(cuts.init).foldRight(
        lit(fractions.last._1)) { case (((label, _), cut), acc) =>
      when(bucket < cut, label).otherwise(acc)
    }
    df.withColumn("split", chain)
  }

  /** Join-key skew profile — the pre-flight diagnosis for the 100 TB
    * shuffle: per-key row counts for the `topK` heaviest keys plus the
    * integer skew statistics a planner acts on (salt factor, AQE skew
    * thresholds). Per returned key:
    *
    *   - `cnt`: exact row count,
    *   - `share_ppm`: `cnt * 1e6 div total` — parts-per-million of the
    *     relation carried by this key,
    *   - `skew_x100`: `cnt * 100 * n_keys div total` — how many times
    *     the MEAN key's load this key carries, x100 (a uniform key
    *     reads 100; a key reading 10_000 needs ~100-way salting),
    *
    * all exact BIGINT arithmetic (no floats to drift across engines).
    * Scale shape: ONE map-side-combinable groupBy pass over the data
    * (the counts relation is materialized via localCheckpoint so the
    * 1-row total and the topK limit both read the key-cardinality-sized
    * result instead of re-scanning the input twice), then a broadcast
    * total and a TakeOrdered on (cnt desc, key asc) — output is
    * topK-sized however large the input. */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK=$topK")
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val totals = counts.agg(sum(col("cnt")).as("__total"),
      count(lit(1)).as("__n_keys"))
    // `div` (exact integer division) rather than `/`+cast: a double
    // intermediate truncates on Spark but rounds on DuckDB-style CASTs
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("cnt"),
        expr("cnt * 1000000 div __total").as("share_ppm"),
        expr("cnt * 100 * __n_keys div __total").as("skew_x100"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topK)
  }

  /** Content-defined chunking (CDC) — the storage-dedup primitive
    * (Rabin-style, the recipe behind LBFS/restic/borg and block-level
    * crawl dedup): chunk boundaries are decided by the CONTENT of a
    * sliding `window`-char hash, not by fixed offsets, so two documents
    * sharing a long substring produce identical chunks for it even
    * when surrounding edits SHIFT its position — exactly what
    * fixed-size chunking cannot do. A boundary falls after character
    * `p` (1-based) iff `p >= window`, `p < length`, and the polynomial
    * rolling fingerprint of `text[p-window+1 .. p]` is divisible by
    * `divisor` (see [[CdcKernel]] for the exact hash — replayable by
    * any engine with exact 64-bit integers, including the DuckDB
    * oracle); chunk k spans `(b_k, b_{k+1}]` with implicit boundaries
    * at 0 and at the text end. Expected chunk length ~ `divisor`
    * chars.
    *
    * Output: `(idCol, chunk_start, chunk_len, chunk_md5)` — group by
    * `chunk_md5` downstream for cross-corpus block dedup (the
    * [[graft.dedup.Dedup.exact]] posture at chunk granularity).
    *
    * Scale shape: ZERO shuffles — one codegen'd projection computes
    * each document's full boundary array in a single rolling code-point
    * walk ([[CdcBoundaries]]; r11's explode + md5-per-position scan was
    * the suite's heaviest sf1 query), a `zip_with` over the
    * 0/len-extended array pairs consecutive bounds, and one explode
    * emits the chunk rows map-side. The text never crosses an exchange.
    * Empty documents emit nothing; docs shorter than `window` emit one
    * whole-document chunk (their boundary array is empty — which also
    * closes r11's phantom-candidate edge where `sequence(window, len)`
    * DESCENDED for sub-window docs). */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                window: Int = 16, divisor: Int = 64): DataFrame = {
    require(window >= 2 && divisor >= 2, s"window=$window divisor=$divisor")
    import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
    val id = col(idCol)
    val base = df.select(id, coalesce(col(textCol), lit("")).as("__t"))
      .filter(length(col("__t")) > 0)
    base
      .select(id, col("__t"),
        explode(column(CdcSpans(expression(col("__t")), window, divisor)))
          .as("sp"))
      .select(id, col("sp.s").as("chunk_start"),
        (col("sp.e") - col("sp.s")).as("chunk_len"),
        md5(expr("substring(__t, sp.s + 1, sp.e - sp.s)")).as("chunk_md5"))
  }

  /** Corpus snapshot delta — the incremental-pipeline primitive: which
    * documents changed between two corpus versions, by CONTENT, not by
    * file layout. One row per difference:
    *
    *   - `added`: the id exists only in `newDf`
    *   - `removed`: the id exists only in `oldDf`
    *   - `changed`: both sides have the id but the text's md5 differs
    *
    * Unchanged docs emit nothing, so the output is delta-sized — the
    * downstream incremental dedup/index/tokenize passes (the engine's
    * `appendMinhashIndex` / streaming-ingest family) re-process only
    * these rows instead of the corpus. Scale shape: texts collapse to
    * 32-char md5s in the scan projection, so the one full-outer
    * id-join shuffles hashes, never documents. */
  def snapshotDelta(oldDf: DataFrame, newDf: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    // coalesce: a null text must read as presence-with-empty-content,
    // not as the id being absent from that side
    val o = oldDf.select(col(idCol),
      md5(coalesce(col(textCol), lit(""))).as("__h_old"))
    val n = newDf.select(col(idCol),
      md5(coalesce(col(textCol), lit(""))).as("__h_new"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") =!= col("__h_new"), "changed"))
      .filter(col("status").isNotNull)
      .select(col(idCol), col("status"))
  }

  /** Per-group adaptive quality filter: keep the best `keepPpm/1e6`
    * fraction of each group (language, source) by `scoreCol`, so a
    * corpus-wide threshold can't silently delete a low-resource
    * language whose score distribution sits lower. Rank-based, not
    * value-based — `rank * 1e6 <= keepPpm * n_group` in exact BIGINT
    * (so the kept count per group is `floor(keepPpm * n / 1e6)`,
    * engine-portable, no float quantile to disagree on). Ties broken
    * by `idCol` ascending, so the kept set is deterministic. Output:
    * input columns + `q_rank` (1-based within group, best first) +
    * `n_group`. Scale shape: one exchange on the group column; the
    * rank filter plans as a running window over each group's sorted
    * run — no second pass, no global sort. */
  def adaptiveQualityFilter(df: DataFrame, groupCol: String,
                            scoreCol: String, idCol: String,
                            keepPpm: Long): DataFrame = {
    require(keepPpm >= 0 && keepPpm <= 1000000L, s"keepPpm=$keepPpm")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val wn = Window.partitionBy(col(groupCol))
    df.withColumn("q_rank", row_number().over(w).cast(LongType))
      .withColumn("n_group", count(lit(1)).over(wn))
      .filter(col("q_rank") * 1000000L <= lit(keepPpm) * col("n_group"))
  }
}
