"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build the transcripts inverted index with the
real engine (deterministic synthetic corpus, BASELINE.json input_hint
schema) and run a BM25 top-10 search through the block-max pruned path.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
family from SURVEY.md §2 plus the training-data-pipeline operators
(dedup / similarity / text analysis), each over /root/testdata parquet
with a DuckDB oracle twin (column aliases, rounding, and tie-breaks match
by construction — see parser_indexer_py_spark/entry_queries.py and
entry_text_queries.py).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parser_indexer_py_spark import entry_queries as Q  # noqa: E402
from parser_indexer_py_spark import entry_text_queries as TQ  # noqa: E402


from parser_indexer_py_spark.shipping import ship_package as _ship_package  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index a deterministic synthetic transcript corpus and run a
    multi-term BM25 top-10 query (pruned path). Idempotent: the index build
    resumes from its manifest on re-run."""
    _ship_package(spark)

    from parser_indexer_py_spark.datagen import generate_transcripts
    from parser_indexer_py_spark.index.build import build_index
    from parser_indexer_py_spark.index.search import load_index, search

    out = os.path.join(tempfile.gettempdir(), "pi_spark_entry_index_v2")
    df = generate_transcripts(spark, 200)
    build_index(spark, df, out, n_buckets=16, salt=4, n_chunks=1, checkpoint_input=True)
    idx = load_index(spark, out)
    return search(idx, "bace rikizudi cedi", k=10, mode="pruned")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational operator families (SURVEY.md §2.2-2.7)
        "pricing_summary": Q.q_pricing_summary,
        "filter_pushdown": Q.q_filter_pushdown,
        "facet_event_types": Q.q_facet_event_types,
        "numeric_literal_cast": Q.q_numeric_literal_cast,
        "broadcast_join_facet": Q.q_broadcast_join_facet,
        "semi_join": Q.q_semi_join,
        "anti_join": Q.q_anti_join,
        "block_join_rollup": Q.q_block_join_rollup,
        "asof_last_click": Q.q_asof_last_click,
        "sessionize": Q.q_sessionize,
        "top1_per_group": Q.q_top1_per_group,
        "window_lead_gap": Q.q_window_lead_gap,
        "topk_orders": Q.q_topk_orders,
        "union_dedup": Q.q_union_dedup,
        "grouped_time_windows": Q.q_grouped_time_windows,
        "pair_candidates": Q.q_pair_candidates,
        "except_all": Q.q_except_all,
        # fulltext / term statistics (§2.4 A6, suggester, BM25)
        "termstats_docs": TQ.q_termstats_docs,
        "suggest_prefix": TQ.q_suggest_prefix,
        "suggest_fuzzy": TQ.q_suggest_fuzzy,
        "bm25_docs_topk": TQ.q_bm25_docs_topk,
        "phrase_search": TQ.q_phrase_search,
        "phrase_search_slop": TQ.q_phrase_search_slop,
        "lucene_query": TQ.q_lucene_query,
        "lucene_query_grouped": TQ.q_lucene_grouped,
        "lucene_fuzzy_damerau": TQ.q_lucene_fuzzy_damerau,
        "delete_by_query": TQ.q_delete_by_query,
        "facet_range_date": TQ.q_facet_range_date,
        "decontaminate": TQ.q_decontaminate,
        "pii_scrub": TQ.q_pii_scrub,
        "edismax_bf": TQ.q_edismax_bf,
        "stats_percentiles": TQ.q_stats_percentiles,
        "gopher_repetition": TQ.q_gopher_repetition,
        "edismax_qf": TQ.q_edismax_qf,
        "edismax_qf_pruned": TQ.q_edismax_qf_pruned,
        "lucene_fielded_scored": TQ.q_lucene_fielded_scored,
        "lucene_wildcard": TQ.q_lucene_wildcard,
        "spellcheck": TQ.q_spellcheck,
        "more_like_this": TQ.q_more_like_this,
        # remaining Solr searchComponents (round 5)
        "terms_component": TQ.q_terms_component,
        "term_vectors": TQ.q_term_vectors,
        "stats_field": TQ.q_stats_field,
        "elevate_query": TQ.q_elevate,
        "debug_explain": TQ.q_debug_explain,
        "cursor_deep_page": TQ.q_cursor_deep_page,
        "facet_pivot": TQ.q_facet_pivot,
        "facet_query": TQ.q_facet_query,
        "export_sorted": TQ.q_export_sorted,
        "highlight_snippets": TQ.q_highlight_snippets,
        "parent_rollup": TQ.q_parent_rollup,
        "sample_stratified": TQ.q_sample_stratified,
        "pack_sequences": TQ.q_pack_sequences,
        "federated_search": TQ.q_federated_search,
        "split_assign": TQ.q_split_assign,
        "wordbreak": TQ.q_wordbreak,
        "cluster_results": TQ.q_cluster_results,
        "mlt_qf": TQ.q_mlt_qf,
        # text analysis (training-data pipeline)
        "token_counts": TQ.q_token_counts,
        "doc_fingerprint": TQ.q_doc_fingerprint,
        "quality_score": TQ.q_quality_score,
        "langid": TQ.q_langid,
        # deduplication family
        "dedup_exact": TQ.q_dedup_exact,
        "dedup_ngram_jaccard": TQ.q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": TQ.q_dedup_minhash_lsh,
        "dedup_simhash": TQ.q_dedup_simhash,
        "dedup_simhash_pairs": TQ.q_dedup_simhash_pairs,
        # similarity search over embeddings
        "ann_cosine_topk": TQ.q_ann_cosine_topk,
        "ann_lsh_bucketed": TQ.q_ann_lsh_bucketed,
        "ann_ivf_probe": TQ.q_ann_ivf_probe,
        "embedding_near_dup": TQ.q_embedding_near_dup,
        "embedding_near_dup_lsh": TQ.q_embedding_near_dup_lsh,
        "cluster_kmeans": TQ.q_cluster_kmeans,
        "ann_ivf_kmeans": TQ.q_ann_ivf_kmeans,
        "dedup_components": TQ.q_dedup_components,
        "quality_unigram_xent": TQ.q_quality_unigram_xent,
        "dedup_keep_canonical": TQ.q_dedup_keep_canonical,
        "mix_temperature": TQ.q_mix_temperature,
        "mix_by_cluster": TQ.q_mix_by_cluster,
        "dedup_substring_signal": TQ.q_dedup_substring_signal,
        "dedup_substring_spans": TQ.q_dedup_substring_spans,
        # multimodal plumbing (rows-only: no SQL oracle by design)
        "multimodal_decode": TQ.q_multimodal_decode,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": Q.SQL_PRICING,
        "filter_pushdown": Q.SQL_FILTER_PUSHDOWN,
        "facet_event_types": Q.SQL_FACET_EVENTS,
        "numeric_literal_cast": Q.SQL_NUMERIC_CAST,
        "broadcast_join_facet": Q.SQL_BROADCAST_JOIN,
        "semi_join": Q.SQL_SEMI_JOIN,
        "anti_join": Q.SQL_ANTI_JOIN,
        "block_join_rollup": Q.SQL_BLOCK_JOIN,
        "asof_last_click": Q.SQL_ASOF,
        "sessionize": Q.SQL_SESSIONIZE,
        "top1_per_group": Q.SQL_TOP1,
        "window_lead_gap": Q.SQL_WINDOW_LEAD,
        "topk_orders": Q.SQL_TOPK_ORDERS,
        "union_dedup": Q.SQL_UNION_DEDUP,
        "grouped_time_windows": Q.SQL_TIME_WINDOWS,
        "pair_candidates": Q.SQL_PAIR_CANDIDATES,
        "except_all": Q.SQL_EXCEPT_ALL,
        "termstats_docs": TQ.SQL_TERMSTATS,
        "suggest_prefix": TQ.SQL_SUGGEST,
        "suggest_fuzzy": TQ.SQL_SUGGEST_FUZZY,
        "bm25_docs_topk": TQ.SQL_BM25_DOCS,
        "phrase_search": TQ.SQL_PHRASE,
        "phrase_search_slop": TQ.SQL_PHRASE_SLOP,
        "lucene_query": TQ.SQL_LUCENE,
        "lucene_query_grouped": TQ.SQL_LUCENE_GROUPED,
        "lucene_fuzzy_damerau": TQ.SQL_LUCENE_DAMERAU,
        "delete_by_query": TQ.SQL_DELETE_BY_QUERY,
        "facet_range_date": TQ.SQL_FACET_RANGE_DATE,
        "decontaminate": TQ.SQL_DECONTAMINATE,
        "pii_scrub": TQ.SQL_PII_SCRUB,
        "edismax_bf": TQ.SQL_EDISMAX_BF,
        "stats_percentiles": TQ.SQL_STATS_PERCENTILES,
        "gopher_repetition": TQ.SQL_GOPHER_REPETITION,
        "edismax_qf": TQ.SQL_EDISMAX_QF,
        "edismax_qf_pruned": TQ.SQL_EDISMAX_QF,
        "lucene_fielded_scored": TQ.SQL_FIELDED_SCORED,
        "lucene_wildcard": TQ.SQL_LUCENE_WILDCARD,
        "spellcheck": TQ.SQL_SPELLCHECK,
        "more_like_this": TQ.SQL_MLT,
        "terms_component": TQ.SQL_TERMS,
        "term_vectors": TQ.SQL_TVRH,
        "stats_field": TQ.SQL_STATS,
        "elevate_query": TQ.SQL_ELEVATE,
        "debug_explain": TQ.SQL_DEBUG_EXPLAIN,
        "cursor_deep_page": TQ.SQL_CURSOR_PAGE,
        "facet_pivot": TQ.SQL_FACET_PIVOT,
        "parent_rollup": TQ.SQL_PARENT_ROLLUP,
        "sample_stratified": TQ.SQL_SAMPLE_STRATIFIED,
        "pack_sequences": TQ.SQL_PACK_SEQUENCES,
        "federated_search": TQ.SQL_FEDERATED_SEARCH,
        "split_assign": TQ.SQL_SPLIT_ASSIGN,
        "wordbreak": TQ.SQL_WORDBREAK,
        "cluster_results": TQ.SQL_CLUSTER_RESULTS,
        "mlt_qf": TQ.SQL_MLT_QF,
        "facet_query": TQ.SQL_FACET_QUERY,
        "export_sorted": TQ.SQL_EXPORT_SORTED,
        "highlight_snippets": TQ.SQL_HIGHLIGHT,
        "token_counts": TQ.SQL_TOKEN_COUNTS,
        "doc_fingerprint": TQ.SQL_FINGERPRINT,
        "quality_score": TQ.SQL_QUALITY,
        "langid": TQ.SQL_LANGID,
        "dedup_exact": TQ.SQL_DEDUP_EXACT,
        "dedup_ngram_jaccard": TQ.SQL_NGRAM_JACCARD,
        "dedup_minhash_lsh": TQ.SQL_MINHASH_LSH,
        "dedup_simhash": TQ.SQL_SIMHASH,
        "dedup_simhash_pairs": TQ.SQL_SIMHASH_PAIRS,
        "ann_cosine_topk": TQ.SQL_ANN_TOPK,
        "ann_lsh_bucketed": TQ.SQL_ANN_LSH,
        "ann_ivf_probe": TQ.SQL_ANN_IVF,
        "embedding_near_dup": TQ.SQL_EMB_NEAR_DUP,
        "embedding_near_dup_lsh": TQ.SQL_EMB_NEAR_DUP_LSH,
        "cluster_kmeans": TQ.SQL_CLUSTER_KMEANS,
        "ann_ivf_kmeans": TQ.SQL_ANN_IVF_KMEANS,
        "dedup_components": TQ.SQL_DEDUP_COMPONENTS,
        "quality_unigram_xent": TQ.SQL_QUALITY_UNIGRAM_XENT,
        "dedup_keep_canonical": TQ.SQL_DEDUP_KEEP_CANONICAL,
        "mix_temperature": TQ.SQL_MIX_TEMPERATURE,
        "mix_by_cluster": TQ.SQL_MIX_BY_CLUSTER,
        "dedup_substring_signal": TQ.SQL_DEDUP_SUBSTRING,
        "dedup_substring_spans": TQ.SQL_DEDUP_SUBSTRING_SPANS,
    }
