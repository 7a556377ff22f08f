"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The headline metric is **validated turns/sec** (BASELINE.json `metric`):
the full north-rule pipeline — row-local spec validation + uniqueness +
gap-free ordering + monotonic-ts + role/tool referential checks — over a
deterministic synthetic transcript table (seeded, violation-injected),
with every result forced through a `noop` sink so the whole plan executes.

Per-query seconds for the operator suite at the sf dir ride along in
"queries". Scaling-efficiency evidence (local[8] vs local[32]) is produced
by tools/scaling_run.py and recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "2000000"))
TURNS_PER_CONV = 50

HEADLINE = [
    "flagship_transcripts",
    "v_bounds_int",
    "v_pattern",
    "v_array_items",
    "v_json_payload",
    "t_unique_keys",
    "t_gapfree_ordering",
    "s_profile",
    "s_chi2_drift",
    "d_minhash_lsh",
    "d_simhash",
    "a_cosine_topk",
    "a_cosine_dup_pairs",
    "a_cosine_dup_bucketed",
    "a_srp_dup_pairs",
    "a_semantic_dedup",
    "a_knn_join",
    "a_quantized_topk",
    "a_ivf_topk",
    "d_dup_groups",
    "v_pattern_hard",
    "v_ext_numeric",
    "v_conditional",
    "v_ext_object",
    "v_content_json",
    "x_quality",
    "m_media_meta",
    "t_role_protocol",
    "t_tool_pairing",
    "t_conv_profile",
    "t_conv_verdicts",
    "t_transcript_diff",
    "d_conv_dedup",
    "s_psi_drift",
    "s_profile_drift",
    "a_ivf_topk_trained",
    "s_w1_drift",
    "x_doc_sample",
    "x_mix_sources",
    "x_mix_temperature",
    "x_pack_chunks",
    "x_decontaminate",
    "x_top_tokens",
    "x_rep_ngram",
    "x_dup_ngrams",
    "x_lm_quality",
    "x_chunk_windows",
    "x_render_conv",
    "x_normalize_text",
    "x_redact_pii",
    "x_boilerplate",
    "x_url_domains",
    "v_profile_spec",
    "x_fuzzy_decontam",
    "x_prep_corpus",
    "x_dedup_spans",
    "s_cvm_drift",
    "s_vocab_drift",
    "s_emb_drift",
    "v_jsonl_source",
    "t_repair_validate",
    "t_tree_check",
    "t_near_retry",
    "x_sft_spans",
    "x_quality_sample",
    "x_heavy_hitters",
    "x_truncate_ctx",
    "d_source_overlap",
    "x_decontam_spans",
    "x_char_stats",
    "x_line_rep",
    "x_c4_clean",
    "x_gopher_gate",
    "d_dedup_report",
    "x_dup_within",
    "x_redact_cards",
    "x_blockwords",
    "t_drop_loops",
    "a_pq_topk",
    "a_pq_recall",
    "a_ivfpq_topk",
    "a_ivfpq_res",
    "s_exact_quantiles",
    "s_exact_corr",
    "s_group_quantiles",
    "d_conv_dsir",
    "d_source_dup_rate",
    "s_vocab_growth",
    "t_conv_quality",
    "a_ivf_recall",
    "x_quota_sample",
    "x_dsir",
    "s_source_psi",
    "x_turn_windows",
    "x_novelty",
    "v_review_queue",
    "a_quality_propagate",
    "s_trend_anomaly",
    "d_incremental_fuzzy",
    "x_encoding_check",
    "a_label_outliers",
    "t_coerce_vocab",
    "e_sessionize",
    "e_asof_join",
    "v_multi_spec",
    "x_shard_corpus",
    "d_canonical_docs",
    "t_turn_loops",
    "x_corpus_report",
    "t_context_budget",
    "s_violation_trend",
    "d_conv_fuzzy",
    "d_conv_fuzzy_groups",
    "d_conv_canonical",
    "e_turn_latency",
    "s_json_keys",
    "x_ngram_diversity",
    "a_coverage_sample",
    "x_pack_report",
    "a_mean_embedding",
    "d_containment",
    "v_json_spec",
    "s_winsorize",
    "a_source_similarity",
    "a_centroid_classify",
    "x_oov_rate",
    "t_freshness",
    "t_dup_conflicts",
    "t_fd_check",
    "x_top_tokens_by",
    "v_lang_mismatch",
    "s_histogram",
    "s_mad_outliers",
    "e_split_convs",
    "a_dim_profile",
    "t_ref_coverage",
    "t_role_patterns",
    "x_quality_buckets",
    "t_key_sync",
    "m_media_stats",
    "e_role_latency",
    "v_vector_check",
    "a_normalize",
    "t_reindex_turns",
    "t_hot_convs",
    "x_soft_dedup",
    "x_vocab_repair",
    "d_incremental_dedup",
    # round-4 breadth completion: every remaining queries() entry, so
    # BENCH covers the full operator surface (sub-second row-local
    # validators and light aggregates; all sf0.1-smoked before landing)
    "d_exact_groups",
    "d_ngram_jaccard",
    "d_simhash_pairs",
    "m_frame_plan",
    "s_js_drift",
    "s_ks_drift",
    "s_ks_sketch",
    "s_sketch_drift",
    "s_sketch_counts",
    "s_w1_sketch",
    "t_conv_bounds",
    "t_expectations",
    "t_monotonic_ts",
    "t_referential",
    "t_referential_shuffle",
    "v_additional_forbid",
    "v_anyof",
    "v_array_errors",
    "v_bounds_frac",
    "v_clean_route",
    "v_const",
    "v_enum",
    "v_enum_stream",
    "v_expected_types",
    "v_ext_anchors",
    "v_formats",
    "v_invalid_json",
    "v_invalid_pattern",
    "v_invalid_ref",
    "v_length",
    "v_oneof_multi",
    "v_oneof_none",
    "v_ref_allof",
    "v_required",
    "v_unevaluated",
    "v_uuid",
    "v_violation_stats",
    "x_dsir_sample",
    "x_fingerprint",
    "x_language_id",
    "x_mix_budget",
    "x_split_counts",
    "x_strat_sample",
    "x_token_stats",
]


def _force(df) -> None:
    """Execute the full plan, all columns, no sink cost."""
    df.write.format("noop").mode("overwrite").save()


def _transcripts_path(spark) -> str:
    """Seeded synthetic transcript parquet (written once per shape)."""
    path = f"/tmp/bench_transcripts_{TURNS}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from json_schema_rs_spark.sources.synth import synth_distributed
        synth_distributed(
            spark, TURNS // TURNS_PER_CONV, TURNS_PER_CONV,
            violation_rate=0.02, partitions=max(CPUS * 2, 32),
        ).write.mode("overwrite").parquet(path)
    return path


def _pipeline(spark, path, protocol: bool = False):
    """The north-rule validation pipeline over the transcript table —
    the fused two-branch plan (operators/pipeline.py): zero-shuffle row
    checks + one skinny conv_id shuffle for all cross-row checks.
    ``protocol=True`` additionally fuses the role-DFA + tool-pairing
    checks into that same shuffle (evidence they ride ~free)."""
    from json_schema_rs_spark.operators.pipeline import transcript_pipeline
    from json_schema_rs_spark.sources.synth import ROLES, TOOLS

    spec = {
        "type": "object",
        "required": ["conv_id", "turn_idx", "role", "text"],
        "properties": {
            "role": {"type": "string", "enum": ROLES},
            "text": {"type": "string", "minLength": 1, "maxLength": 4000,
                     "pattern": "[0-9a-f]"},
            "turn_idx": {"type": "integer", "minimum": 0, "maximum": 100000},
        },
    }
    kw = {}
    if protocol:
        kw = dict(role_protocol=(
            [("system", "user"), ("user", "assistant"),
             ("assistant", "user"), ("assistant", "tool"),
             ("tool", "assistant"), ("tool", "tool")],
            ["system", "user"]), tool_pairing=True)
    tx = spark.read.parquet(path)
    return transcript_pipeline(tx, spec, vocabularies={"tool": TOOLS}, **kw)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder
        .master(f"local[{CPUS}]")
        .appName("json_schema_rs_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # sf0.1 tables land in 1-3 parquet files; the default 128m split
        # gives scan-bound single-pass aggregates only 1-3 cores. At real
        # scale the table IS many files — finer splits locally reproduce
        # that parallelism instead of benchmarking a 1-core scan.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Firecracker guests fault in heap pages lazily (kernel-time spikes
        # mid-benchmark); pre-touching the heap once makes timings stable.
        .config("spark.driver.extraJavaOptions",
                "-XX:+AlwaysPreTouch -XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    def timed(build, runs: int = 3) -> tuple[float, float, float]:
        """``(best_compile_sec, best_exec_sec, median_exec_sec)``.

        Each run re-invokes ``build`` (thunk → DataFrame) and then forces
        the built DataFrame; the two phases are timed SEPARATELY so the
        artifact distinguishes driver-side plan construction (paid once
        per spec at real scale — includes any eager driver work such as
        stats.profile's aggregate collect) from executor time (the thing
        throughput is graded on). ``exec_sec`` of a freshly built
        DataFrame is directly comparable to the round-1 protocol (force
        of a pre-built plan). Best-of-N because this host shows bursty
        neighbor-steal noise (2-3x swings between identical runs); the
        MEDIAN exec is recorded alongside (the scaling protocol's
        estimator) so round-over-round deltas carry their own noise
        context instead of needing BASELINE.md exegesis."""
        best_c = best_e = float("inf")
        execs = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = build()
            t1 = time.perf_counter()
            _force(df)
            t2 = time.perf_counter()
            best_c = min(best_c, t1 - t0)
            best_e = min(best_e, t2 - t1)
            execs.append(t2 - t1)
        return best_c, best_e, sorted(execs)[len(execs) // 2]

    qsecs: dict[str, float] = {}
    csecs: dict[str, float] = {}
    msecs: dict[str, float] = {}
    qs = entry_mod.queries()
    for name in HEADLINE:
        fn = qs[name]
        print(f"bench: {name}", file=sys.stderr, flush=True)
        c, e, m = timed(lambda: fn(spark, SF_DIR), runs=3)
        qsecs[name] = round(e, 3)
        csecs[name] = round(c, 3)
        msecs[name] = round(m, 3)

    # headline throughput: full validation pipeline over TURNS turns,
    # computed from exec time only (plan compile is per-spec, not per-row)
    path = _transcripts_path(spark)
    comp, elapsed, med = timed(lambda: _pipeline(spark, path), runs=3)
    turns_per_sec = TURNS / elapsed
    qsecs["validate_pipeline"] = round(elapsed, 3)
    csecs["validate_pipeline"] = round(comp, 3)
    msecs["validate_pipeline"] = round(med, 3)
    # same pipeline + conversation-protocol checks fused into the same
    # single conv_id shuffle — the delta vs validate_pipeline is the
    # full cost of the protocol at this scale
    pcomp, pelapsed, pmed = timed(
        lambda: _pipeline(spark, path, protocol=True), runs=3)
    qsecs["validate_pipeline_protocol"] = round(pelapsed, 3)
    csecs["validate_pipeline_protocol"] = round(pcomp, 3)
    msecs["validate_pipeline_protocol"] = round(pmed, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "validated_turns_per_sec",
        "value": round(turns_per_sec, 1),
        "unit": "sec",
        "queries": qsecs,           # exec_sec: force of the built plan (r1-comparable)
        "compile_sec": csecs,       # driver-side thunk build, paid once per spec
        "exec_median_sec": msecs,   # median-of-3 exec: the noise-robust estimator
        "timing": "best-of-3 (+ median-of-3 in exec_median_sec); "
                  "exec_sec = force of freshly built DataFrame",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "turns": TURNS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
