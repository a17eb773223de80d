"""Regenerate docs/PLANS.md: physical-plan evidence for the headline
queries (operator tree + PushedFilters, from ``explain("formatted")``).

Usage: python scripts/gen_plans_doc.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = {
    "q6_discount_revenue": "every predicate reaches the parquet scan; 1-row aggregate",
    "q1_pricing_summary": "single scan, map-side partial agg, tiny shuffle",
    "q7_nation_trade_volume": "all dims broadcast; the only shuffle is lineitem join orders",
    "q18_large_volume_orders": "HAVING shrinks lineitem agg before any join",
    "q21_waiting_suppliers": "double-EXISTS decorrelated into one orderkey window",
    "dedup_minhash_lsh": "band-key equi-join; raw text never shuffles",
    "ann_topk_cosine": "query set broadcast; corpus scored in place",
    "ann_lsh_bucketed": "compound AND-amplified bucket keys; candidates verified inside the join stage",
    "decontam_benchmark_overlap": "benchmark fingerprints broadcast; corpus text never shuffles",
    "pack_concat_chunks": "running sum windowed per bucket, never a global sort",
    "text_bm25_topk": "one broadcast stats row; per-row scoring; TakeOrderedAndProject cut",
    "embedding_quantize_int8": "dim-range table broadcast; vectors never shuffle for quantization",
    "token_vocab_coverage": "two-phase cumsum: range partitions + broadcast prefix offsets, no single-partition window",
    "dedup_incremental_delta": "delta-sized band table joins corpus bands; old-vs-old never pairs",
    "events_minute_gapfill": "spine from one min/max row; fill windows partitioned by day",
    "events_user_sessions": "session_window agg: one (user,ts) shuffle, no global sort",
    "ann_ivf_native": "argmin cell assignment from one broadcast centroid row — the corpus never shuffles during Lloyd's",
    "embedding_pq_codes": "all m codebooks train jointly in one keyed loop; one slim (vec_id,s,cell,se) shuffle assembles codes",
    "decontam_bloom_gate": "broadcast side is a bit-position set bounded by M, independent of benchmark size",
    "token_heavy_hitters_cms": "d x w fixed-state sketch cells built from map-side-combinable partials, broadcast back for estimates",
    "lineitem_numeric_profile": "two passes (stats then histogram); only (column,bucket) partial counts shuffle",
    "events_rate_anomalies": "trailing z-score window runs over the aggregated hourly series, never raw events",
    "text_tfidf_top_terms": "one (doc,term) shuffle; vocab-dim broadcast join; per-doc top-k window",
    "corpus_temperature_mix": "one counting scan; all weight math on the n_sources-row aggregate",
    "events_rollup_incremental": "delta-sized aggregation merged into the snapshot on the rollup key — history never rescanned",
    "lineitem_zorder_layout": "Morton keys as pure codegen bit expressions; span audit is a 64-group agg",
    "events_latest_per_user": "max_by-struct partial agg: shuffle carries at most n_keys rows per partition",
    "orders_merge_upsert": "one primary-key hash join; changes side broadcast when small",
    "multimodal_audio_energy": "payload bytes stay inside Arrow batches; only window-energy longs exit Python",
    "dedup_substring_runs": "16-byte gram fingerprints shuffle; run merge windows within each doc only",
    "corpus_shard_assignment": "two-phase distributed rank (range partitions + broadcast offsets); no global sort",
    "lakehouse_compaction_plan": "metadata-plane: windows partition by table partition over the file manifest",
    "embedding_pca_power": "dim^2-bounded covariance partials; every iteration on the 4096-row aggregate plane",
    "events_hourly_corr": "raw events collapse to the hour x type grid; pair join fully broadcast",
    "corpus_dedup_survivorship": "one 16-byte fingerprint shuffle; survivor rank windows within the dup group",
    "customer_rfm_segments": "three exact NTILEs from ONE tagged-union boundary scan (ntile_assign_multi) — bucket assignment is a shuffle-free map expression, no Window at all in the data-plane plan",
    "dsir_importance_weights": "single-split scan re-spread across the cluster before the tokenize pass; 512-bucket stats broadcast as a literal table; per-doc DECIMAL score combine; TakeOrdered top-k",
    "quality_linear_margin": "the whole scorer is one per-row HOF fold — zero joins, zero shuffles before the stratum rollup",
    "embedding_nearest_centroid": "DECIMAL-exact centroids broadcast; argmin assignment in place; L^2 confusion rollup",
    "corpus_epoch_shuffle": "per-row epoch keys; balance audit is one map-side-combinable agg to epochs x shards rows",
    "knn_graph_degrees": "edges explode-symmetrized from ONE evaluation of the LSH candidate join (a unionAll of projections would execute it twice); per-node top-k window partitions by node",
    "decontam_semantic_overlap": "benchmark embeddings broadcast; corpus scored in place; per-vector argmax windows over the benchmark-bounded candidate list",
    "multimodal_y4m_frames": "three map-only stages (synth, container walk, stats) — zero exchanges; raw frames never cross the Python boundary",
    "multimodal_y4m_resize_stats": "FUSED resize+decode after a scan re-spread — the only exchange widens the single-split scan; containers stay inside one Python pass",
    "multimodal_ppm_resize_stats": "synth then FUSED resize+decode (one Python pass) — the resized container never re-crosses the Arrow boundary",
    "tokenizer_bpe_encode": "every learned merge composes into ONE codegen fold chain in the scan's map task — no join, no second corpus pass",
    "connector_bucketed_join": "both scans Bucketed: true; zero Exchange below the SortMergeJoin — the shuffle was paid once at write time",
    "connector_partitioned_sink_pruning": "PartitionFilters prune the re-read to one year's directory before any row is touched",
    "salted_skew_join": "fact side salted in place; only the dim side fans out x8 — the hot key spreads across 8 reducers",
    "media_load_wav_features": "binaryFile listing packs small files per task; decode is map-only; the id re-key joins a broadcast sliver",
    "dedup_simhash_hamming": "three band equi-joins replace the all-pairs cross product; only (band, value, id, sig) slivers shuffle",
    "ann_pq_recall": "the ADC leg joins corpus CODES to a broadcast (subspace,cell)->distance LUT — corpus vectors untouched after encoding",
    "dedup_simhash64_hamming": "deployment-width SimHash: four quarter-band equi-joins (65536 buckets each) replace all-pairs; verify is codegen bit_count on the joined slivers",
    "events_scd2_merge_upsert": "the stored SCD2 snapshot scans with NO snapshot-side Exchange (bucketed table; at this SF, AQE broadcasts the compacted change batch instead) — history is never rescanned or reshuffled",
    "media_partition_pruning_decode": "PartitionFilters prune the media lake listing to one month before any payload byte is read; decode stays map-only Arrow",
    "dsl_train_ridge_predictions": "the PREDICT plan: scored slice filter pushed to the scan; scoring is a shuffle-free per-row expression from O(p) loaded coefficients",
    "text_unicode_token_stats": "unicode corpus synthesized per-row in codegen; tokenize/classify per-row expressions; one (lang_bucket) partial-agg shuffle",
    "media_dedup_exact": "payloads reduce to md5 inside the scan projection; only 16-byte digests shuffle to the dedup agg",
    "media_phash_hamming": "aHash extraction is one map-only Arrow stage (4 ints/file exit Python); the pair join moves quarter-band slivers, never payloads",
    "dedup_minhash128_pairs": "the 128-hash plane at the calibrated (8,16) split: band keys gate candidates, exact-Jaccard verify joins only the surviving pair sliver back to shingles",
    "tokenizer_bpe_byte_coverage": "learn = one word-type shuffle; scoring is a single codegen map pass (merge-chain fold + hex byte arithmetic) into the per-doc partial agg",
}

HEADER = """# PLANS — physical-plan evidence for the headline queries

Generated by `scripts/gen_plans_doc.py` (re-run after plan-affecting
changes); audit every registered query with `scripts/plan_audit.py`.
What to look for, per the 100 TB design rules in README.md:

* `PushedFilters` on every selective scan (row-group skipping);
* dimension joins as `BroadcastHashJoin` (no fact-side shuffle);
* `Exchange` only where a key change is semantically required;
* zero `BatchEvalPython` anywhere (Arrow-only Python boundary —
  enforced by `scripts/plan_audit.py`, strict by default).

"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from declarativeml_spark.queries import QUERIES
    from declarativeml_spark.session import get_spark

    spark = get_spark("plans-doc", cpus="8")
    # validate up front, build in memory, write LAST: opening the doc
    # for write before the loop truncated it, so a mid-loop failure
    # (e.g. a HEADLINE name renamed in the registry) shipped a
    # silently half-written evidence doc
    missing = [n for n in HEADLINE if n not in QUERIES]
    if missing:
        print(f"HEADLINE names missing from the registry: {missing}")
        return 1
    parts = [HEADER]
    for name, note in HEADLINE.items():
        from declarativeml_spark.testing import formatted_plan

        df = QUERIES[name](spark, args.sf_dir)
        plan = formatted_plan(df)
        tree = plan.split("\n\n")[0]
        pushed = sorted(set(re.findall(r"PushedFilters: \[[^\]]*\]", plan)))
        parts.append(f"## {name}\n\n*{note}*\n\n```\n{tree}\n```\n\n")
        if pushed:
            parts.append("Pushed filters:\n\n```\n" + "\n".join(pushed) + "\n```\n\n")
    with open(os.path.join(os.path.dirname(__file__), "..", "docs", "PLANS.md"), "w") as f:
        f.write("".join(parts))
    print("docs/PLANS.md regenerated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
