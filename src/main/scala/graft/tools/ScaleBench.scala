package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sensitivity bench: replicate sf0.1 ×FACTOR with content-disjoint
  * replicas and check the most expensive queries scale ~linearly in rows
  * (the sub-sf regimes never stress bucket joins, skew caps, or shuffle
  * sizing — this does, one order of magnitude up).
  *
  * Replication is NOT naive duplication — that would plant `FACTOR`
  * exact copies of every document/vector, turning the near-dup queries
  * into quadratic duplicate-cluster workloads that measure a different
  * algorithm. Instead each replica is made content-disjoint while
  * preserving every distribution the operators are sensitive to:
  *  - documents: every token gets a replica suffix (`tok` → `tok_rI`) —
  *    token counts, doc lengths, df shape, and within-replica duplicate
  *    structure are preserved; across replicas no shingle collides.
  *  - embeddings: dimensions rotate by 6·I positions — norms and
  *    within-replica geometry are preserved; rotated random vectors are
  *    ~orthogonal across replicas, so no cross-replica near-dups.
  *  - orders: keys offset per replica; value columns untouched.
  *
  * Verdict criterion (round 4 item 6): per-row time at ×10 must stay
  * within 2× of linear scaling from sf0.1, per query.
  *
  * usage: ScaleBench [outJsonPath] (env SPARK_GRAFT_SCALE_FACTOR, default
  * 10; SPARK_GRAFT_SCALE_QUERIES to override the query list). Prints one
  * JSON line and writes it to outJsonPath (default bench_scale10x.json).
  *
  * MEASUREMENT PROTOCOL (BASELINE.md §2 applies here too): the machine
  * must be otherwise idle — a concurrent sbt/Spark job on the same cores
  * inflates individual rows by >30× (a contaminated run once reported
  * q106 at 3.18× per-row; the clean serial rerun measures 0.23×).
  */
object ScaleBench {

  /** The 10 most expensive bench queries — except q31, which appears as
    * the auto-sized operator (q90's `nearDupPairsAuto`) at its
    * PRODUCTION threshold: q31/q90 declare threshold 0.4 only because
    * the synthetic corpus is near-random (max cosine ≈ 0.51) and the
    * ground-truth oracle needs nonempty pairs — at 0.4 LSH is
    * near-brute-force by theory (ρ → 1; q31's fixed 4-bit tables
    * measured 2.1× per-row here at ×10, and no parameterization beats
    * n^ρ). Real near-dup dedup runs ≥ ~0.8, where auto-sized
    * (bits, tables) keeps per-row cost ~flat (ρ ≈ 0.28). */
  val DefaultQueries: Seq[String] = Seq(
    "q51_curate_corpus", "q62_dedup_increment", "q63_profile",
    "q90_embed_neardup_auto@0.85", "q86_repeated_spans", "q83_ngram_novelty",
    "q85_cluster_sizes", "q84_editdist_neardup", "q40_neardup_corpus",
    "q82_cooccurrence",
    // round-5 additions: the BPE counting pass — explode-heaviest of the
    // new queries (pair axis ∝ corpus tokens; replicas' _rN-suffixed
    // tokens make the pair key space content-disjoint, the worst case
    // for the count shuffle) — and the token-budget cap, whose per-group
    // distributed prefix sum is exactly the shape that must not
    // degenerate when each source grows 10x
    "q94_bpe_pairs", "q96_token_budget",
    // late round-5 additions: the distributed GLOBAL rank (q99's ntile —
    // the range-bucketed prefix-sum machinery under a 10x-wider total
    // order) and the centroid argmin (q100 — posexplode melt is the
    // row-heaviest frame in the suite at 64 dims per vector)
    "q99_length_buckets", "q100_group_centroid",
    // round-6 coverage: every round-5 query over ~0.8 s at sf0.1 plus the
    // cheap q98/q101 (their machinery — heap selection, digest diff — is
    // the part that must stay linear)
    "q93_merge_upsert", "q95_mad_outliers", "q97_expire_history",
    "q98_stratified_sample", "q101_corpus_diff",
    // ANN under the production workload model: probe COUNT held constant
    // (queries/sec is a workload property — it does not grow because the
    // corpus did), so the ratio measures the corpus-side scan. q102's
    // cell-pruned ADC scan must beat q91's full-codes scan per row.
    "q91_cosine_topk_pq@probes", "q92_pq_recall@probes",
    "q102_cosine_topk_ivfpq@probes",
    // round-6 additions. q104 runs its own auto-sizing (cells = n/256 —
    // the honest row for the operator as shipped); q105 holds the QUERY
    // count fixed like the ANN rows (the retrieval workload does not
    // grow because the corpus did) so the ratio measures the posting-
    // frame side; q106/q107 are whole-corpus LM passes whose model
    // frames (vocab, bigram types) grow linearly under the content-
    // disjoint replicas — the worst case for the model join-back.
    "q103_ivfpq_recall@probes", "q104_semantic_dedup",
    "q105_bm25_topk@queries", "q106_perplexity_filter", "q107_dsir_weights",
    // q108: the forced-hierarchical cell assignment — its O(√k)-per-row
    // claim is exactly a scale-sensitivity claim (k grows with n here).
    // Round-7 additions: q109's docs×labels scoring join, q110's
    // digest-keyed winner agg over ALL corpus tiles (the row-heaviest
    // new frame), q112's count→isqrt-targets→bounded-heap pick.
    "q108_semantic_dedup_hier", "q109_nb_classify", "q110_span_dedup",
    "q112_temperature_mix",
    // q113 at its PRODUCTION shape: the declared query mines over exact
    // brute-force candidate lists because its oracle recomputes them —
    // deliberately quadratic; at scale the candidate lists come from the
    // IVF-PQ index per side and the margin algebra is unchanged. q114's
    // row is the operator as shipped (edges grow linearly under the
    // content-disjoint replicas; 5 join+agg iterations).
    "q113_mutual_margin@ivfpq", "q114_dup_pagerank",
    // round-7 stragglers: q111's bottom-k-by-hash sample (the TakeOrdered
    // heap must stay O(k) per partition as rows ×10) and q117's
    // distinct-(group, value) collapse under a 10x-deeper value column.
    "q111_sample_quantiles", "q117_weighted_median",
    // round-8 additions: q118's prefix-sum + bounded explode (the span
    // axis grows with tokens), q119's O(n·dim²) covariance melt — the
    // row-heaviest per-row constant in the suite, the ratio proves it
    // stays a CONSTANT — q120's bloom-pruned shingle stream (the probe
    // must keep the pre-shuffle cut as the corpus grows), and q121's
    // cluster argmax over the ×10 minhash clusters.
    "q118_pack_sequences", "q119_pca_project", "q120_decontaminate_bloom",
    // q122 at the fixed-probe regime (recall monitoring is a workload
    // property; the ratio measures the corpus-side reduced scan)
    "q121_cluster_representatives", "q122_pca_recall@probes",
    // q124's docs×labels scoring join under ×10 docs (labels constant);
    // q125's token-grain first-doc min-agg — the widest-key shuffle of
    // the analysis family (every distinct type is a group)
    "q124_nb_pr_curve", "q125_vocab_growth",
    // round-9 additions: q126's corpus shingle stream under a ×10 corpus
    // (its benchmark set grows with it — the honest row for the declared
    // query); q127's KMV register pass over ×10 documents (the sketch
    // algebra itself is O(groups²·k), corpus-size-free — the row
    // measures the one pass that does scale, the per-group bottom-k);
    // q128's byte-code ADC scan at fixed probes (4× the bytes of raw
    // floats saved; must track q91's fixed-probe regime); q130's
    // distributed global rank under a ×10-wider permutation (the same
    // staged machinery as q99, now keyed by hash instead of length).
    "q126_contamination_profile", "q127_source_overlap@docs",
    "q128_cosine_topk_sq@probes", "q130_epoch_shuffle",
    // round-8 tail: q129 at fixed probes (the SQ recall monitor's
    // corpus-side brute-force truth is the scan under test); q131's
    // one-pass re-aggregated lattice (the cell frame stays 12 rows while
    // the corpus ×10 — the whole point of the shape); q132's all-corpus
    // knn join with auto-sized cells (query side = corpus, so constant
    // occupancy is a REQUIREMENT for linearity, not a nicety); q133's
    // MG-prefiltered heavy hitters (candidate superset stays O(1/freq)
    // while the token stream ×10); q134's tagged-union gram shuffle
    // (token-grain, the widest frame of the round); q135's Morton ntile
    // (the distributed global rank under a ×10-wider z order); q136's
    // map-only O(n·k) dot scan; q137's block-sampled exact-vs-LSH audit
    // (the inverted-index exact join must stay sample-bounded); q138's
    // corpus term count under ×10 tokens (the top-200 cut is constant);
    // q139's two map-side bucket counts (shuffle = 10 rows per side).
    "q129_sq_recall@probes", "q131_groupingsets_reagg", "q132_knn_join",
    "q133_heavy_tokens", "q134_repetition", "q135_zorder_layout",
    "q136_cluster_quality", "q137_lsh_recall", "q138_zipf_fit",
    "q139_quality_drift",
    // q140 at fixed probes (the multi-probe expansion is query-side —
    // the row measures the 4-table corpus index scan staying linear);
    // q141's per-band ring (rank window + one (bucket, pos) equi-join)
    // under ×10-deep length bands.
    "q140_cosine_topk_mplsh@probes", "q141_ring_negatives",
    // q142: the fused row-rule scans + two key anti-joins under ×10 rows
    // (rule count must never multiply corpus passes).
    "q142_dq_audit",
    // q143's bigram-count + two unigram joins (the pair key space is
    // content-disjoint across replicas — worst case for the count
    // shuffle, same regime as q94); q144 rides q109/q124's docs×labels
    // scoring join with labels constant.
    "q143_pmi_collocations", "q144_nb_reliability",
    // q145 at fixed probes: the greedy steps are bounded (n, n² per
    // query) — the row measures the exact top-n candidate scan.
    "q145_mmr_rerank@probes",
    // q146 at ~fixed query count (retrieval workload is a property of
    // the queries, not the corpus): the row measures the two channel
    // scans; the fusion itself is O(queries × k) regardless of corpus.
    // q147 as shipped: the inverted-index self-join under ×10 docs —
    // content-disjoint replicas keep postings short, so pair work must
    // stay ∝ rows (the uncapped regime the oracle pins). q148 as
    // shipped: cells re-fit at n/256 occupancy, so the per-cell window
    // depth is constant while cell count ×10. q149 as shipped: map-side
    // key + bounded per-stratum heaps — the flattest shape in the suite.
    "q146_rrf_fusion@probes", "q147_containment", "q148_density_prune",
    "q149_weighted_sample",
    // q150 as shipped: q147's index join + the idf join-back — the df
    // frame grows with the ×10 content-disjoint vocabulary, the worst
    // case for the weight join.
    "q150_weighted_jaccard",
    // round-8 continuation: q151 as shipped — the minhash pair list +
    // star-contraction components + one docs×clusters equi-join (the
    // edge set grows linearly under content-disjoint replicas, so the
    // components loop must stay edge-bounded); q153's distributed rank
    // + window×n candidate explode (candidate count ∝ rows — the
    // blocking promise IS the linearity claim); q154's (group, value)
    // histogram walk (distinct values barely grow under replication —
    // the flattest possible quantile shape, and the row proves the
    // per-doc clamp join stays map-only).
    "q151_leakage_split", "q153_sorted_neighborhood", "q154_winsorize",
    // q155: three (pair-count + map-only rewrite) rounds — each round is
    // token-grain work ∝ rows, argmax is a 1-row TakeOrdered; the row
    // proves the sequential recurrence adds rounds, not superlinearity.
    "q155_bpe_merges",
    // q156: two hash counts, the second over the (type, freq) frame —
    // vocabulary ×10 under content-disjoint replicas, the worst case
    // for the second shuffle. q157: per-user lead windows with USER
    // CARDINALITY ×10 and per-user depth constant (the events replica's
    // design axis) — the window must parallelize across users.
    "q156_token_spectrum", "q157_event_paths",
    // q158: one pk lag window (key cardinality ×10, per-key depth
    // constant — the orders replica axis) + one fused melt. q159: the
    // q154 histogram skeleton with a broadcast rank join-back.
    "q158_column_churn", "q159_ecdf_normalize",
    // q160 at a FIXED benchmark (an eval suite does not grow because
    // the corpus did — the declared %97 slice would make the map-only
    // scan quadratic under replication): the row measures the corpus
    // scan against the same ~120 broadcast bench vectors.
    "q160_semantic_decontaminate@bench",
    // q161: map-only BMP synth+decode+hash per doc, then the 4-chunk
    // pigeonhole join — content-disjoint replicas give disjoint pixel
    // streams, so chunk buckets stay small and pair work ∝ rows.
    "q161_image_hash_dedup",
    // q162: the PLAIN-SQL range join through the optimizer rewrite
    // (ScaleBench loads GraftExtensions) — granule equi-join work is
    // points + interval-granules, both ∝ rows.
    "q162_range_join_sql",
    // q163: the trainer loop + one counts join — rides q155's rounds.
    "q163_bpe_encode",
    // q164: q151's machinery at k-fold shape — same edge-bounded join.
    "q164_leakage_folds",
    // q165: the composed dedup passes + two bounded loser joins.
    "q165_dedup_rates",
    // round-9 additions. q166: the batched deep trainer — per-window
    // pair counts are token-grain ∝ rows, the driver greedy is
    // corpus-size-free (a bounded spectrum slice per window); the row
    // proves depth batching doesn't trade away linearity. q167: three
    // Scd2Maintainer folds over the ×10 orders changelog — fold work
    // must stay ∝ touched pk-buckets + batch, and the interval
    // re-derivation is bucket-local (key cardinality ×10, per-key
    // depth constant — the orders replica axis). q169: the exact
    // substring pass — gram frame ∝ tokens, coverage marks ∝ duplicate
    // mass (content-disjoint replicas keep within-replica duplicate
    // structure, so both axes grow exactly ×10).
    "q166_bpe_deep", "q167_scd2_maintained", "q169_span_dedup_exact",
    // q181: the rank-routing indexed ENCODE over the q166-trained table.
    // q166Train memoizes per dir, and q166's own row (above) runs first
    // on every dir this row sees — so the training cost is billed to the
    // q166 row and THIS row times the encode kernel alone: one map-only
    // pass whose routing work is a hash probe per adjacent token pair,
    // ∝ tokens ×10 and independent of table depth by design.
    "q181_bpe_encode_deep",
    // q168 at ~fixed query count (the q105 discipline — a retrieval
    // workload does not grow because the corpus did): three maintained
    // folds + compaction over ×10 documents, topK over ~50 queries;
    // the row measures the store build + the posting-side scan.
    "q168_bm25_maintained@queries",
    // the rest of the maintained-store gate family (q167's regime: the
    // row measures fold work staying ∝ touched buckets + batch while
    // key cardinality ×10 — the orders replica axis). q170 snapshot,
    // q171 agg deltas (group cardinality constant, the delta frame
    // stays tiny), q173 both-sides join folds incl. the key-change
    // relocation path.
    "q170_snapshot_maintained", "q171_agg_maintained", "q173_join_maintained",
    // q182: the FULL streaming loop (JSONL render + file-source stream +
    // three fold triggers with snapshot/SCD2/agg all on) — every stage
    // ∝ changelog rows; the row proves the loop's per-trigger cost is
    // O(touched buckets + batch) like the direct-fold rows above, with
    // the decode/route/append plumbing included. (q183/q184 read the
    // same memoized store — one row measures the build.)
    "q182_stream_loop_snapshot",
    // q185: the streaming decontamination registry — suite folds append
    // ∝ bench tokens (n/97 docs × 15 tokens), the compaction distinct is
    // ∝ the digest set, and the cut is q172's semi-join ∝ corpus tokens;
    // every axis grows ×10 under content-disjoint replicas.
    "q185_decontam_maintained",
    // q172: bench grams ∝ n/97 and train grams ∝ tokens — BOTH sides of
    // the one digest semi-join grow ×10 under content-disjoint replicas
    // (the honest row for the declared query, q126's discipline); marks
    // ∝ contamination mass, which replicates ×10 exactly.
    "q172_substr_decontaminate",
    // q174: phrases ∝ n/163, postings ∝ tokens; `_rN`-suffixed replica
    // terms keep posting lists content-disjoint, so the term equi-join's
    // output keeps within-replica structure — anchor work ×10 exactly.
    "q174_phrase_search",
    // q186: the MAINTAINED positional index — three O(batch tokens)
    // append folds + one compaction merge, then q174's anchor algebra
    // over the store; every axis ∝ tokens ×10 (same disjointness note).
    "q186_phrase_maintained",
    // q175–q178: the remaining maintained stores as declared — builds
    // go through WorkDirs.ensureStore, memoized per (store, JVM), and
    // the store name embeds the data-dir hash, so each timed call here
    // still performs exactly one fresh build for its data dir (base and
    // ×10 hash to different stores); the fold path itself is measured.
    // q175: hash-index folds + one corpus join-back, both ∝ rows.
    // q176: per-stratum min-k — reservoir stays k×strata while input
    // ×10 (the bounded-state claim IS the row). q177: map-side decile
    // histograms (shuffle = 10 rows per batch); the PSI algebra is
    // corpus-size-free. q178: digest-keyed tile winner agg ∝ tokens.
    "q175_dedup_maintained", "q176_sample_maintained",
    "q177_drift_maintained", "q178_span_maintained",
    // q180: the streaming dedup corpus — per-batch work is the banded
    // LSH self-join (capped buckets) + the presigged cross pass against
    // the ACCUMULATED signature store (sigs ∝ survivors, ~0.5 KB/doc;
    // corpus text read back only for docs that became candidates), so a
    // fold is O(batch + touched buckets), never O(corpus). Replicas'
    // `_rN`-suffixed tokens keep shingle buckets content-disjoint —
    // within-replica dup structure replicates, the worst case for the
    // band shuffle.
    "q180_doc_maintained",
    // q179 at fixed probes (the q91/q102 regime — the ADC scan against
    // the maintained codes store is the corpus-side axis under test;
    // the declared query's % 50 probe set would grow with n and measure
    // workload growth, not the store). Fresh store per run: codebook
    // fit on the base third + two encode-appends with an in-stream
    // compaction — the encode path is the linear claim.
    "q179_ann_maintained@probes",
    // round-11 additions — the last custom-kernel queries without a
    // row. q87: map-side copy explode, output ∝ rows × mean weight.
    // q89/q152 ride q151's minhash-pair machinery (edges ∝ rows under
    // content-disjoint replicas) plus the split arithmetic / cluster
    // contraction on top — q152 runs the pair list through BOTH split
    // schemes and the star-contraction components.
    "q87_upsample_mix", "q89_split_leakage", "q152_split_leakage",
    // q115: Catalyst-decorrelated EXISTS / NOT EXISTS / scalar-agg —
    // one aggregate and two semi/anti joins over ×10 orders (customers
    // constant — the fact-side axis). q116: the lateral top-2 as a rank
    // window whose per-customer DEPTH grows ×10 while the partition
    // count stays fixed — the per-partition sort is the axis under test.
    "q115_correlated_exists", "q116_lateral_topn",
    // q88 at fixed probes (the q92/q103 discipline — recall monitoring
    // is a workload property; the declared %50 probe set would grow
    // with n and measure workload growth): per-query exact truth scan
    // and the 16-table LSH candidate path are both ∝ corpus.
    "q88_ann_recall@probes",
    // q187: the TWO-TABLE streaming loop with the maintained join view
    // — JSONL render for both changelogs, multi-table routing with a
    // mid-stream registry refresh, per-trigger JoinMaintainer folds,
    // dead-letter replay + manual fold; every stage ∝ changelog rows
    // (the orders replica axis; the customer side is copied as-is, so
    // the view's join-key buckets deepen ×10 — the relocation path's
    // worst case).
    "q187_stream_loop_join",
    // q188: vocab training (one word-count aggregation, ∝ tokens; the
    // replica corpus ×10s the word-key cardinality) + the greedy encode
    // (map-only, hash probes per char against the bounded broadcast
    // vocabulary — ∝ tokens, independent of vocabulary size). Cache
    // note: q188Vocab memoizes per dir, so of a dir's repeated timed
    // runs the FIRST bills the training; min-of-runs then times the
    // encode alone, identically on both dirs.
    "q188_wordpiece_encode",
    // q189: the quality rule card — pure map-only array folds per
    // document (the dominance scan is O(len log len) in-row), output
    // one row per doc; time must track rows ×10 exactly.
    "q189_gopher_rules",
    // q190: q161's regime for the gradient hash — map-only BMP
    // synth+decode+dHash per doc, then the 4-chunk pigeonhole pair
    // join over 8-byte fingerprints (bucket population ∝ rows).
    "q190_image_dhash_dedup",
    // q191: inventory training (one substring-weight aggregation,
    // O(tokens·maxLen) pre-combine rows) + the Viterbi DP (map-only,
    // O(chars·maxLen) hash probes per doc). q188's cache-billing note
    // applies verbatim (q191Pieces memoizes per dir).
    "q191_unigram_viterbi",
    // q192: pure hash arithmetic + array slices per row, map-only;
    // output bytes ∝ input bytes — the flattest possible scale row.
    "q192_fim_transform",
    // q193: the three trained kernels in one projection — per-doc cost
    // is the SUM of the q181/q188/q191 kernels' costs, all ∝ tokens;
    // table training bills to those rows' caches (q188's note).
    "q193_tokenizer_bakeoff",
    // q194/q195: the maintained vocabulary store — build = three
    // per-batch count aggregations + a generational fold (∝ batch
    // tokens; vocabulary-sized outputs), read = derive + encode/DP
    // (map-only). q195 reuses q194's memoized store, so its row times
    // the derive+DP read path alone.
    "q194_wordpiece_maintained", "q195_unigram_maintained",
    // round-13 additions. q196: EM training — per iteration one
    // segment+usage aggregation over the DISTINCT-WORD frame (corpus
    // scan only for the word counts; the E-step is vocabulary-sized),
    // then the per-doc segmentation pass ∝ tokens. q197/q198: the
    // maintained BPE path — store build ∝ batch tokens, training over
    // the vocabulary-sized count frame (per-row cost should be FLAT in
    // corpus rows: the trainer's frame is the vocabulary, which the
    // _rN-suffixed replicas grow ×FACTOR — the honest worst case);
    // encode is one map-only projection ∝ tokens. q199: BFD — one
    // bucket shuffle + per-bucket O(n log n) packing, buckets ∝ rows.
    // q200: per-(source, rule) additive folds ∝ batch rows, read ∝
    // sources × 7.
    "q196_unigram_em", "q197_bpe_maintained", "q198_bpe_encode_maintained",
    "q199_bfd_pack", "q200_gopher_drift_maintained",
    // q201: Kneser-Ney scoring — same shape as q106 (bigram-vocab model
    // frames with map-side partials, count-frame equi-joins back), one
    // extra broadcast row (count-of-counts → D). q202: the maintained
    // twin — store build ∝ batch bigram vocab, read = the q201 scoring
    // over the summed count frame.
    // q203: trigram KN — trigram-type-table aggregations, the widest
    // count frames in the LM family (the pair axis ∝ corpus tokens at
    // trigram width; ×10 replicas make the type space content-disjoint)
    "q201_kn_loglik", "q202_kn_maintained", "q203_kn3_loglik",
    // round-14 additions. q204: the maintained trigram store — build ∝
    // batch trigram vocab (one shuffle per fold, doc-axis-free
    // partials), read = q203's scoring over the summed count frame.
    // q205: pruned KN — q201's frames + one filter over the type table
    // + one more vocab-sized aggregate (γ); the loss table itself is
    // the type table, so the prune adds no wider frame. q206/q208: the
    // maintained pruned compositions (store read + the prune, both
    // vocab-sized). q207: the trigram prune — q203's frames + the
    // per-(w1,w2) integer γ3 aggregate.
    "q204_kn3_maintained", "q205_kn_pruned", "q206_kn_pruned_maintained",
    "q207_kn3_pruned", "q208_kn3_pruned_maintained")

  /** Deterministic hash sample of ~`target` probe vectors at ANY corpus
    * size — the fixed query batch the ANN scale rows run against. */
  private def fixedProbes(emb: DataFrame, target: Long = 120L): DataFrame = {
    val n = math.max(1L, emb.count())
    val oneIn = math.max(1L, n / target)
    emb.filter(pmod(xxhash64(col("vec_id"), lit(3L)), lit(oneIn)) === 0)
  }

  private def pqFit(s: SparkSession, d: String): graft.ext.PQ.Codebooks =
    graft.ext.PQ.fit(graft.core.Tables.embeddings(s, d), "vec_id", "embedding",
      dim = 64, m = 8, k = 16, iterations = 3, seed = 42L)

  private def ivfPqFit(s: SparkSession, d: String): graft.ext.IvfPq.Index =
    graft.ext.IvfPq.fit(graft.core.Tables.embeddings(s, d), "vec_id", "embedding",
      dim = 64, numCells = 32, m = 8, k = 16, iterations = 3, seed = 42L)

  /** Rows not in SparkEntry.queries: the production-regime variants. */
  def customQuery(name: String): Option[(SparkSession, String) => DataFrame] =
    name match {
      case "q90_embed_neardup_auto@0.85" => Some((s, d) =>
        graft.ext.Similarity.nearDupPairsAuto(
            graft.core.Tables.embeddings(s, d), threshold = 0.85,
            targetRecall = 0.999)
          .orderBy("id1", "id2"))
      case "q91_cosine_topk_pq@probes" => Some((s, d) => {
        val emb = graft.core.Tables.embeddings(s, d)
        graft.ext.PQ.topKPq(emb, fixedProbes(emb), k = 10, pqFit(s, d),
            refine = 4)
          .orderBy("query_id", "rank")
      })
      case "q102_cosine_topk_ivfpq@probes" => Some((s, d) => {
        val emb = graft.core.Tables.embeddings(s, d)
        graft.ext.IvfPq.topKIvfPq(emb, fixedProbes(emb), k = 10,
            ivfPqFit(s, d), nProbe = 8, refine = 4)
          .orderBy("query_id", "rank")
      })
      case "q92_pq_recall@probes" => Some((s, d) => {
        val emb = graft.core.Tables.embeddings(s, d)
        val probes = fixedProbes(emb)
        val exact = graft.ext.Similarity.topKBruteForce(emb, probes, k = 10)
        val approx = graft.ext.PQ.topKPq(emb, probes, k = 10, pqFit(s, d),
          refine = 4)
        val hits = exact.select("query_id", "neighbor_id")
          .join(approx.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("recall_hits"))
        probes.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("recall_hits"), lit(0L)).as("recall_hits"),
            lit(10L).as("k"))
          .orderBy("query_id")
      })
      case "q103_ivfpq_recall@probes" => Some((s, d) => {
        val emb = graft.core.Tables.embeddings(s, d)
        val probes = fixedProbes(emb)
        val exact = graft.ext.Similarity.topKBruteForce(emb, probes, k = 10)
        val approx = graft.ext.IvfPq.topKIvfPq(emb, probes, k = 10,
          ivfPqFit(s, d), nProbe = 8, refine = 4)
        val hits = exact.select("query_id", "neighbor_id")
          .join(approx.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("recall_hits"))
        probes.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("recall_hits"), lit(0L)).as("recall_hits"),
            lit(10L).as("k"))
          .orderBy("query_id")
      })
      case "q105_bm25_topk@queries" => Some((s, d) => {
        val docs = graft.core.Tables.documents(s, d)
        // ~50 queries at any corpus size (q105 declares every=100 over
        // 5000 sf0.1 docs); doc_id % every keeps the sample deterministic
        val every = math.max(1L, docs.count() / 50L).toInt
        graft.ext.Retrieval.bm25TopK(docs,
            graft.ext.Retrieval.probeQueries(docs, every = every, width = 8),
            k = 5)
          .orderBy("query_id", "rank")
      })
      case "q122_pca_recall@probes" => Some((s, d) => {
        val emb = graft.core.Tables.embeddings(s, d)
        val probes = fixedProbes(emb)
        val m = graft.ext.PCA.fit(emb, "embedding", dim = 64, nComponents = 8)
        val red = graft.ext.PCA.projectVectors(emb, "vec_id", "embedding", m)
        val redQ = red.join(probes.select("vec_id"), Seq("vec_id"))
        val exact = graft.ext.Similarity.topKBruteForce(emb, probes, k = 10)
        val approx = graft.ext.Similarity.topKBruteForceD(red, redQ, k = 10)
        val hits = exact.select("query_id", "neighbor_id")
          .join(approx.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("recall_hits"))
        probes.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("recall_hits"), lit(0L)).as("recall_hits"),
            lit(10L).as("k"))
          .orderBy("query_id")
      })
      case "q113_mutual_margin@ivfpq" => Some((s, d) => {
        val emb = graft.core.Tables.embeddings(s, d)
        val a = emb.filter(col("vec_id") % 2 === 0)
        val b = emb.filter(col("vec_id") % 2 =!= 0)
        // mutual mining queries with HALF THE CORPUS, so unlike the
        // @probes rows the query count grows with n — cells must grow
        // too (the q104/q108 auto-sizing discipline) or the per-query
        // scan is ∝ n and the whole pass ∝ n². Cell TARGET is 64 here
        // (not 256): sf0.1 has only 1,000 vectors per side, and a 256
        // target puts BOTH measurement points under the cell-count
        // floor — the base then probes ~25% of its corpus per query
        // while ×10 probes the designed nProbe×256 slice, and the
        // per-row ratio measures that floor distortion instead of the
        // plan (round-8's noisy 0.43–0.90 row). With n/64 both scales
        // sit in the constant-work-per-query regime the linearity
        // claim is actually about.
        def fit(side: DataFrame, seed: Long) = {
          val cells = math.max(16L, side.count() / 64L).toInt
          graft.ext.IvfPq.fit(side, "vec_id", "embedding", dim = 64,
            numCells = cells, m = 8, k = 16, iterations = 3, seed = seed)
        }
        val ab = graft.ext.IvfPq.topKIvfPq(b, a, k = 8, fit(b, 42L),
          nProbe = 8, refine = 4)
        val ba = graft.ext.IvfPq.topKIvfPq(a, b, k = 8, fit(a, 43L),
          nProbe = 8, refine = 4)
        graft.ext.Similarity.mutualMarginPairsFrom(ab, ba, minMargin = 1.05)
          .orderBy("id_a")
      })
      case "q127_source_overlap@docs" => Some((s, d) => {
        // the declared q127 sketches `events` (not replicated here);
        // same operator over ×10 documents: group = lang, value = text
        // hash — the register pass is what must stay linear
        val docs = graft.core.Tables.documents(s, d)
        val reg = graft.ext.Sketches.kmvRegisters(docs, "lang",
          xxhash64(col("text")), k = 128)
        graft.ext.Sketches.overlapMatrix(reg, "lang", k = 128)
          .orderBy("group_a", "group_b")
      })
      case "q128_cosine_topk_sq@probes" => Some((s, d) => {
        val emb = graft.core.Tables.embeddings(s, d)
        val probes = fixedProbes(emb)
        val m = graft.ext.SQ.fit(emb, "embedding", dim = 64)
        graft.ext.SQ.topKSq(emb, probes, k = 10, m, refine = 4)
          .orderBy("query_id", "rank")
      })
      case "q140_cosine_topk_mplsh@probes" => Some((s, d) => {
        val emb = graft.core.Tables.embeddings(s, d)
        graft.ext.Similarity.topKLshMultiProbe(emb, fixedProbes(emb), k = 10,
            numTables = 4, bitsPerTable = 8)
          .orderBy("query_id", "rank")
      })
      case "q160_semantic_decontaminate@bench" => Some((s, d) => {
        val emb = graft.core.Tables.embeddings(s, d)
        val bench = fixedProbes(emb)
        graft.ext.Similarity.semanticDecontaminate(
            emb.join(bench.select("vec_id"), Seq("vec_id"), "left_anti"),
            bench, threshold = 0.35)
          .orderBy("vec_id")
      })
      case "q145_mmr_rerank@probes" => Some((s, d) => {
        val emb = graft.core.Tables.embeddings(s, d)
        graft.ext.Similarity.mmrRerank(emb, fixedProbes(emb), k = 5,
            nCandidates = 20, lambda = 0.7, mu = 0.3)
          .orderBy("query_id", "mmr_rank")
      })
      case "q146_rrf_fusion@probes" => Some((s, d) => {
        val docs = graft.core.Tables.documents(s, d)
        val emb = graft.core.Tables.embeddings(s, d)
        // ~50 queries at any corpus size, ids aligned across channels
        // (doc_id ≡ vec_id ≡ 0 mod every)
        val every = math.max(1L, docs.count() / 50L)
        val lex = graft.ext.Retrieval.bm25TopK(docs,
            graft.ext.Retrieval.probeQueries(docs, every = every.toInt,
              width = 8), k = 20)
          .select("query_id", "doc_id", "rank")
        val den = graft.ext.Similarity.topKBruteForce(emb,
            emb.filter(pmod(col("vec_id"), lit(every)) === 0), k = 20)
          .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
        graft.ext.Retrieval.rrfFuse(Seq(lex, den), k = 10)
          .orderBy("query_id", "rank")
      })
      case "q129_sq_recall@probes" => Some((s, d) => {
        val emb = graft.core.Tables.embeddings(s, d)
        val probes = fixedProbes(emb)
        val m = graft.ext.SQ.fit(emb, "embedding", dim = 64)
        val exact = graft.ext.Similarity.topKBruteForce(emb, probes, k = 10)
        val approx = graft.ext.SQ.topKSq(emb, probes, k = 10, m, refine = 4)
        val hits = exact.select("query_id", "neighbor_id")
          .join(approx.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("recall_hits"))
        probes.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("recall_hits"), lit(0L)).as("recall_hits"),
            lit(10L).as("k"))
          .orderBy("query_id")
      })
      case "q168_bm25_maintained@queries" => Some((s, d) => {
        val docs = graft.core.Tables.documents(s, d)
        val every = math.max(1L, docs.count() / 50L).toInt
        val st = graft.core.WorkDirs.streamGate(s"idx_scale_${Integer.toHexString(d.hashCode)}")
        graft.queries.Extended.deleteDirForBench(st)
        val cfg = graft.streaming.IndexStreamConfig(
          s"$st/_in_unused", st, s"$st/_ck_unused", docs.schema)
        graft.streaming.IndexStream.processBatch(
          docs.filter(col("doc_id") % 3 === 0), 0L, cfg)
        graft.streaming.IndexStream.processBatch(
          docs.filter(col("doc_id") % 3 === 1), 1L, cfg)
        graft.streaming.IndexStream.compact(s, st)
        graft.streaming.IndexStream.processBatch(
          docs.filter(col("doc_id") % 3 === 2), 2L, cfg)
        graft.streaming.IndexStream.topK(s, st,
            graft.ext.Retrieval.probeQueries(docs, every = every, width = 8),
            k = 5)
          .orderBy("query_id", "rank")
      })
      case "q88_ann_recall@probes" => Some((s, d) => {
        val emb = graft.core.Tables.embeddings(s, d)
        val probes = fixedProbes(emb)
        val exact = graft.ext.Similarity.topKBruteForce(emb, probes, k = 10)
        val approx = graft.ext.Similarity.topKLsh(emb, probes, k = 10,
          numTables = 16, bitsPerTable = 8)
        val hits = exact.select("query_id", "neighbor_id")
          .join(approx.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("recall_hits"))
        probes.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("recall_hits"), lit(0L)).as("recall_hits"),
            lit(10L).as("k"))
          .orderBy("query_id")
      })
      case "q179_ann_maintained@probes" => Some((s, d) => {
        val emb = graft.core.Tables.embeddings(s, d)
        val st = graft.core.WorkDirs.streamGate(s"ann_scale_${Integer.toHexString(d.hashCode)}")
        graft.queries.Extended.deleteDirForBench(st)
        val cfg = graft.streaming.AnnStreamConfig(
          s"$st/_in_unused", st, s"$st/_ck_unused", dim = 64,
          compactEveryNBatches = 1)
        val cb = graft.streaming.AnnStream.initialize(
          s, emb.filter(col("vec_id") % 3 === 0), cfg)
        graft.streaming.AnnStream.processBatch(
          emb.filter(col("vec_id") % 3 === 1), 0L, cb, cfg)
        graft.streaming.AnnStream.processBatch(
          emb.filter(col("vec_id") % 3 === 2), 1L, cb, cfg)
        graft.streaming.AnnStream.topK(s, st, emb, fixedProbes(emb), k = 10)
          .orderBy("query_id", "rank")
      })
      case _ => None
    }

  /** doc/vec/order key offset between replicas — far above any sf0.1 id. */
  private val IdOffset = 100000000L

  def replicate(spark: SparkSession, srcDir: String, outDir: String,
                factor: Int): Unit = {
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val orders = spark.read.parquet(s"$srcDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$srcDir/lineitem.parquet")

    def replicaDocs(i: Int): DataFrame =
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i * IdOffset))
        .withColumn("text", array_join(
          transform(split(col("text"), " "), t => concat(t, lit(s"_r$i"))), " "))
        .withColumn("n_chars", length(col("text")))
    def replicaEmb(i: Int): DataFrame = {
      if (i == 0) emb
      else {
        val rot = (i * 6) % 64
        emb
          .withColumn("vec_id", col("vec_id") + lit(i * IdOffset))
          .withColumn("embedding",
            concat(slice(col("embedding"), rot + 1, 64 - rot),
              slice(col("embedding"), 1, rot)))
      }
    }
    def replicaOrders(i: Int): DataFrame =
      if (i == 0) orders
      else orders.withColumn("o_orderkey", col("o_orderkey") + lit(i * IdOffset))

    (0 until factor).map(replicaDocs).reduce(_ unionByName _)
      .repartition(64).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/documents.parquet")
    (0 until factor).map(replicaEmb).reduce(_ unionByName _)
      .repartition(16).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/embeddings.parquet")
    (0 until factor).map(replicaOrders).reduce(_ unionByName _)
      .repartition(32).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/orders.parquet")
    // lineitem: keys offset per replica, value/measure columns untouched —
    // group cardinality (l_returnflag) stays constant while rows ×FACTOR,
    // exactly the regime q95's per-group percentile passes must survive
    def replicaLineitem(i: Int): DataFrame =
      if (i == 0) lineitem
      else lineitem.withColumn("l_orderkey", col("l_orderkey") + lit(i * IdOffset))
    (0 until factor).map(replicaLineitem).reduce(_ unionByName _)
      .repartition(32).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/lineitem.parquet")
    // customer copies as-is: order replicas keep o_custkey, so the
    // referential rules stay intact while the fact side grows ×FACTOR
    spark.read.parquet(s"$srcDir/customer.parquet")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/customer.parquet")
    // events: user AND event ids offset per replica — USER CARDINALITY
    // grows ×FACTOR while per-user event counts stay constant, exactly
    // the axis q157's per-user lead windows must stay flat along
    val events = graft.core.Tables.events(spark, srcDir)
    def replicaEvents(i: Int): DataFrame =
      if (i == 0) events
      else events
        .withColumn("event_id", col("event_id") + lit(i * IdOffset))
        .withColumn("user_id", col("user_id") + lit(i * IdOffset))
    (0 until factor).map(replicaEvents).reduce(_ unionByName _)
      .repartition(32).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/events.parquet")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val names = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultQueries)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.core.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft-scale").toString
    try {
      replicate(spark, srcDir, work, factor)

      def time(name: String, dir: String): Double = {
        System.gc()
        val q = customQuery(name).getOrElse(graft.SparkEntry.queries(name))
        val t0 = System.nanoTime()
        q(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // warm both datasets' footers + codegen once
      spark.read.parquet(s"$work/documents.parquet").write.format("noop").mode("overwrite").save()

      // per-query warm-up at the tiny SF so JIT/codegen for that query's
      // operator family isn't billed to whichever measured run goes first
      // (smoke runs without it showed the ×N run FASTER than base)
      val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")

      val rows = names.map { n =>
        time(n, warmDir)
        val base = time(n, srcDir)
        val scaled = time(n, work)
        val perRow = scaled / (factor * base)
        System.err.println(f"[scale] $n base=$base%.2f x$factor=$scaled%.2f per-row=$perRow%.2f")
        (n, base, scaled, perRow)
      }
      val qs = rows.map { case (n, b, s, r) =>
        f""""$n":{"sf01_secs":$b%.3f,"x${factor}_secs":$s%.3f,"per_row_ratio":$r%.3f}"""
      }.mkString("{", ",", "}")
      val worst = rows.map(_._4).max
      val json =
        f"""{"metric":"scale${factor}x","factor":$factor,"src":"$srcDir","worst_per_row_ratio":$worst%.3f,"queries":$qs}"""
      println(json)
      val out = args.headOption.getOrElse("bench_scale10x.json")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    } finally {
      new java.lang.ProcessBuilder("rm", "-rf", work).start().waitFor(): Unit
      spark.stop()
    }
  }
}
