"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed over a full execution (collect of a count/foreach-less
materialization) after a shared session warm-up. Headline set covers every
operator class: scan+filter, as-of window, nearest-selection, anti-join
dedup, merge, export sort, minhash/LSH, jaccard, ANN, text analysis.

TWO detail records, one path each (VERDICT r12 item 3 — the committed
gated record and the driver's post-commit run used to fight over
BENCH_DETAIL.json, leaving a dirty tree and a two-records-one-file
ambiguity every round):
- tools/bench_commit.py runs set SPARK_GRAFT_BENCH_RECORD=commit and
  write the COMMITTED record to BENCH_DETAIL.json (gated, committed in
  the same step);
- every other run (the driver's per-round capture, local iteration)
  writes BENCH_DETAIL.run.json, which is gitignored.
Both records carry a `provenance` block (host, load averages at start
and end, cpu count, record mode) so same-code cross-box deltas are
attributable from the artifacts alone, and a per-key `queries_spread`
of [min, max, n] over the timing runs so capture-noise-bound keys are
visible in the record itself (VERDICT r12 item 6 — the gate still
reads the min-of-N `queries` map, unchanged).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = (
    "q_asof_price",
    "q_nearest_event",
    "q_nearest_strike",
    "q_dedup_pk",
    "q_upsert_merge",
    "q_export_projection",
    "q_multikey_sort",
    "q_group_count",
    "q_minhash_lsh_pairs",
    # the DF-capped form is the scale-safe default dedup path; the
    # uncapped q_ngram_jaccard stays registered for small-candidate
    # verification only (Zipf-head shingles make it quadratic at scale)
    "q_ngram_jaccard_capped",
    "q_ann_cosine",
    "q_quality_score",
    "q_tumbling_window",
    "q_session_gap",
    "q_dedup_embedding",
    "q_simhash_pairs",
    "q_chain_build",
    # round-2 corpus-prep additions
    "q_chunk_docs",
    "q_decontaminate",
    "q_bm25",
    "q_pack_sequences",
    "q_corpus_build",
    # round-3 curation additions
    "q_hll_distinct",
    "q_hard_negatives",
    "q_dataset_manifest",
    "q_kmeans",
    "q_ann_ivf_kmeans",
    "q_span_dedup",
    "q_stratified_split",
    "q_curation_build",
    "q_quality_report",
    "q_snapshot_diff",
    # round-4 scale-path additions
    "q_hll_groupby",
    "q_quantile_sketch",
    "q_prefix_join",
    "q_systematic_sample",
    "q_salted_join",
    # round-4 maintenance additions
    "q_scd2_history",
    "q_compaction_bins",
    "q_hll_intersect",
    "q_posting_lists",
    "q_semdedup",
    # round-4 PQ family
    "q_pq_codes",
    "q_ann_ivf_pq",
    # round-4 analytics additions
    "q_group_trend",
    "q_skyline",
    "q_bloom_join",
    "q_cooccur_pairs",
    "q_knn_triangles",
    "q_concurrency",
    "q_changepoint",
    "q_containment",
    "q_rolling_distinct",
    "q_skew_profile",
    "q_patch_grid",
    "q_table_stats",
    "q_pit_join",
    "q_value_recon",
    "q_drift_cells",
    # round-5 additions
    "q_dsir_select",
    "q_selection_build",
    "q_lm_score",
    "q_centroid_probe",
    # round-6 additions
    "q_semdedup_sub",
    "q_priority_sample",
    "q_url_canonical",
    "q_mad_outliers",
    "q_hybrid_rrf",
    "q_maxsim",
    "q_text_normalize",
    "q_k_anonymity",
    "q_nb_classifier",
    "q_dedup_incremental",
    "q_gap_fill",
    "q_watermark_audit",
    "q_vl_build",
    "q_phrase_match",
    "q_ngram_novelty",
    "q_cross_check",
    "q_winsorize",
    # round-7 additions
    "q_bpe_train",
    "q_bpe_encode",
    "q_ks_drift",
    "q_dedup_ensemble",
    "q_maxmatch_segment",
    "q_anf",
    "q_pack_masks",
    "q_kcore",
    "q_isotonic",
    "q_span_corruption",
    "q_lsh_design",
    "q_linearize_orders",
    "q_episode_build",
    "q_pack_compose",
    # OPH next to the k-permutation path it accelerates
    "q_oph_lsh_pairs",
    # round-8 additions
    "q_fd_profile",
    "q_entity_resolution",
    "q_encoding_audit",
    "q_random_projection",
    "q_semantic_decontam",
    "q_ahash_dedup",
    "q_ahash_incremental",
    "q_reshard_plan",
    # round-9: real-pixel media flagship (PNG encode->decode->hash in
    # one mapInPandas kernel, then JVM banded dedup + verdicts)
    "q_media_pipeline",
    # round-12: the registered r11 quality fixes (recall-contract banded
    # decontamination, IVF-PQ exact re-rank, hot-bucket-capped LSH pairs)
    "q_decontam_banded",
    "q_ann_pq_rerank",
    "q_lsh_pairs_capped",
    "q_semdedup_routed",
    "q_decontam_fixed_eval",
    "q_ann_pq_batch",
    # round-13: the contract-parameterized banded screen (tables_for is
    # the default L path; this key serves the 0.8 contract's L=17) and
    # the ANN serving shape (materialized IVF-PQ index, zero fit per
    # query)
    "q_decontam_t08",
    "q_ann_pq_served",
    # round-14: the dispersion-corrected solver's looser contract point
    # (0.6 -> L=45 — the most tables any shipped contract serves)
    "q_decontam_t06",
    # round-15: the deployment-shaped (broadcast fixed-eval) twin of the
    # 0.6 contract — the scale-safe form of the L=45 screen
    "q_decontam_t06_fixed",
)

# single-JVM local bench has ~±20-30% run-to-run noise (ambient load
# included); report the best of N full executions per query so timings
# track plan changes, not GC or box luck
RUNS_PER_QUERY = 3

# Driver-visible scale evidence (VERDICT r6 item 4): when benching at the
# default sf0.1, also time the scale-shape-critical queries at the locally
# generated 5x point (.scale/sf0.5, tools/gen_scale.py) so the sublinear
# claims in SCALE_CURVE.json get the same external capture as the sf0.1
# headline. Set is the pair-explosion / range-join / composite plans whose
# 100 TB behavior is the actual question; row-local ops scale trivially.
SCALE_QUERIES = (
    "q_semdedup",
    "q_knn_triangles",
    "q_minhash_lsh_pairs",
    "q_simhash_pairs",
    "q_ann_ivf_pq",
    "q_span_dedup",
    "q_interval_join",
    "q_pit_join",
    "q_chain_build",
    "q_pack_sequences",
    # round-7 composites whose scale shape is the round's centerpiece
    "q_dedup_ensemble",
    "q_episode_build",
    "q_pack_compose",
    # round-8: the delta-vs-base media dedup (the corpus-growth path)
    # and the name-vocabulary entity resolution
    "q_ahash_incremental",
    "q_entity_resolution",
    # round-9: the real-pixel media flagship (kernel-bound; its curve
    # lives in SCALE_CURVE.json at slope 0.69)
    "q_media_pipeline",
    # round-12: the pair-generating / ANN forms whose quality contracts
    # were the round's point — their scale shape is the claim
    "q_decontam_banded",
    "q_ann_pq_rerank",
    "q_lsh_pairs_capped",
    # round-13: the threshold-parametric contract and the served-index
    # ANN form — the flat-at-scale claim is their point
    "q_decontam_t08",
    "q_ann_pq_served",
    # round-16 (VERDICT r15 item 2): the graph family's distributed
    # path back under committed evidence — at sf0.1 the 64k bounded
    # driver finish swallows the whole edge set, so only the sf0.5
    # rows exercise the distributed peel/star rounds
    "q_kcore",
    "q_anf",
)
SCALE_RUNS_PER_QUERY = 2


def main() -> None:
    import socket

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    mode = os.environ.get("SPARK_GRAFT_BENCH_RECORD", "run")
    load_start = os.getloadavg()

    from oic_options_chains_spark.queries import QUERIES
    from oic_options_chains_spark.session import get_spark

    spark = get_spark(app_name="oic-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers with a trivial action.
    QUERIES["q_group_count"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    spread: dict[str, list] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        runs, n = [], 0
        for _ in range(RUNS_PER_QUERY):
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            runs.append(time.perf_counter() - start)
        best = min(runs)
        timings[name] = round(best, 3)
        spread[name] = [round(best, 3), round(max(runs), 3), len(runs)]
        total += best
        print(f"# {name}: {best:.3f}s rows={n}", file=sys.stderr)

    out = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
    }

    # sf0.5 scale section (only on the driver's default sf0.1 run; an
    # explicit SPARK_GRAFT_SF_DIR override is someone iterating locally)
    scale_detail: dict[str, float] = {}
    scale_spread: dict[str, list] = {}
    scale_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scale", "sf0.5"
    )
    if sf == "0.1" and os.path.isdir(scale_dir):
        for name in SCALE_QUERIES:
            fn = QUERIES[name]
            runs, n = [], 0
            for _ in range(SCALE_RUNS_PER_QUERY):
                start = time.perf_counter()
                n = fn(spark, scale_dir).count()
                runs.append(time.perf_counter() - start)
            best = min(runs)
            scale_detail[name] = round(best, 3)
            scale_spread[name] = [round(best, 3), round(max(runs), 3), len(runs)]
            print(f"# sf0.5 {name}: {best:.3f}s rows={n}", file=sys.stderr)
        out["sf05_total"] = round(sum(scale_detail.values()), 3)
        out["sf05_n_queries"] = len(scale_detail)

    # Round-over-round regression visibility: ratio vs the persisted r01
    # per-query baseline (current / baseline; >1 is slower). Only
    # meaningful at the baseline's scale factor.
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_BENCH.json"
    )
    try:
        with open(baseline_path) as f:
            baseline = json.load(f)
        if baseline.get("sf") == sf:
            base_q = baseline.get("queries", {})
            out["vs_r01"] = {
                name: round(t / base_q[name], 2)
                for name, t in timings.items()
                if base_q.get(name)
            }
            # totals compared over the SHARED query set only, so adding
            # new headline entries never reads as a regression
            shared_now = sum(t for n, t in timings.items() if base_q.get(n))
            shared_base = sum(v for n, v in base_q.items() if n in timings)
            if shared_base:
                out["vs_r01_total"] = round(shared_now / shared_base, 2)
    except (OSError, ValueError):
        pass

    # The driver captures only a short tail of stdout; with 59 headline
    # queries a full per-query map outgrows that window and the round's
    # bench records "parsed": null (happened in r04). Keep the stdout
    # line compact — totals + the 5 slowest queries — and write the full
    # per-query detail (timings + vs_r01 ratios) to BENCH_DETAIL.json.
    # machine context next to the numbers, so cross-box same-code deltas
    # are adjudicable from the artifacts alone (the r9-r12 drift ledger
    # had to reconstruct this per round)
    provenance = {
        "host": socket.gethostname(),
        "cpus": os.cpu_count(),
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "record_mode": mode,
    }
    detail = dict(out)
    detail["queries"] = timings
    detail["queries_spread"] = spread
    detail["provenance"] = provenance
    if scale_detail:
        detail["sf05_queries"] = scale_detail
        detail["sf05_spread"] = scale_spread
    detail_name = (
        "BENCH_DETAIL.json" if mode == "commit" else "BENCH_DETAIL.run.json"
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    out["queries"] = dict(slowest)
    out["n_queries"] = len(timings)
    out["detail"] = detail_name
    out["provenance"] = provenance
    if "vs_r01" in out:
        del out["vs_r01"]

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
