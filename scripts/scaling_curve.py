"""Scale-factor sensitivity: run a family-representative query subset
at sf0.001 / sf0.01 / sf0.1 (a 100x input range) and report how wall
time grows vs how the data grows.

The point is the EXPONENT, not the absolute numbers: a candidate-gated
dedup/ANN pair generator grows ~linearly in rows, an unguarded one
quadratically — at a 100x range a quadratic leg is unmissable (t ratio
~10,000x vs ~100x). At these local sizes fixed per-job overhead
dominates the small end, so time ratios far BELOW the data ratio are
expected (overhead amortizes); the red flag is a time ratio
meaningfully ABOVE the data ratio.

Writes docs/SCALING_CURVE.md and prints one JSON line per query.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["sf0.001", "sf0.01", "sf0.1"]

# family-representative headliners: relational join/agg, windows,
# sessionization, exact+minhash+clustered dedup, DSIR selection,
# quartile segmentation, IVF ANN, PCA, NB training, TF-IDF
QUERIES = [
    "q1_pricing_summary",
    "q9_product_profit",
    "top3_customers_per_nation",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "dsir_importance_weights",
    "quality_margin_deciles",
    "customer_rfm_segments",
    "ann_ivf_native",
    "embedding_pca_power",
    "nb_lang_confusion",
    "text_tfidf_top_terms",
    "knn_graph_triangles",
    "decontam_semantic_overlap",
    # r6/r7 families: tokenizer apply (codegen fold chain), the three
    # real codecs through the Arrow mapInPandas path
    "tokenizer_bpe_encode",
    "multimodal_wav_features",
    "multimodal_ppm_stats",
    "multimodal_y4m_frames",
    # r8: the bench's current slowest query (synth→resize→decode video
    # chain) and the windowed-audio path — proving their cost is
    # linear codec CPU, not superlinear plan growth (r7 verdict #8)
    "multimodal_y4m_resize_stats",
    "multimodal_wav_window_energy",
    # r8: the binaryFile file-ingest round trip (bounded fixture: the
    # flat small-end curve is the expected shape)
    "media_load_wav_features",
    # r8: bit-sketch banding (candidate volume grows with collision
    # density — the exponent proves the bands gate it) and the PQ-ADC
    # eval (bounded query sweep + code-table lookups)
    "dedup_simhash_hamming",
    "ann_pq_recall",
    "dedup_simhash64_hamming",
    "events_scd2_merge_upsert",
    # r10: media-payload dedup over the bounded 48-file PPM lake
    # (flat curves expected — the fixture is SF-independent; the rows
    # prove the read->hash->band plumbing carries no hidden SF term),
    # and the 128-hash MinHash plane at the calibrated (8,16) split
    # (expect alpha ~ the 8-hash plane's: candidate volume stays
    # banding-gated at 16x the hashing width)
    "media_dedup_exact",
    "media_phash_hamming",
    "dedup_minhash128_pairs",
    # r11: the byte-fallback coverage pass (r10 verdict missing #5 —
    # a learn pass + scoring map, flatness is the claim to prove),
    # the two new perceptual media passes (bounded 48-file lakes,
    # flat expected), and BPE at 256-merge width (the per-round
    # driver loop is vocabulary-sized, so the claim under test is
    # FLAT in SF — a data-proportional exponent here would mean the
    # corpus is being rescanned per round)
    "tokenizer_bpe_byte_coverage",
    "media_audio_fingerprint_hamming",
    "media_video_ahash_hamming",
    "tokenizer_bpe_deep_merges",
    # r11: portable HLL — sketch path shuffles <=256 register rows
    # per source regardless of SF; the exact-distinct audit leg is
    # the only data-proportional term, so alpha should track the
    # plain-aggregation families
    "hll_distinct_audit",
]


def main() -> int:
    import argparse

    from declarativeml_spark.operators.caching import capture, release_all
    from declarativeml_spark.queries import QUERIES as REGISTRY
    from declarativeml_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--queries",
        help="comma-separated subset to RE-measure; other queries'"
        " rows are kept from the existing doc (full sweep when"
        " omitted)",
    )
    args = ap.parse_args()
    subset = (
        [q.strip() for q in args.queries.split(",") if q.strip()]
        if args.queries
        else None
    )
    run_list = subset if subset else QUERIES

    root = os.environ.get("SPARK_GRAFT_DATA_ROOT", "/root/testdata")
    spark = get_spark("scaling-curve")

    # warm JVM + codegen once so sf0.001 cold-start doesn't masquerade
    # as compute
    REGISTRY[QUERIES[0]](spark, os.path.join(root, SFS[0])).count()

    kept: list = []
    if subset:
        # carry forward the existing doc's rows for queries not
        # re-measured this invocation
        doc_path = os.path.join(
            os.path.dirname(__file__), "..", "docs", "SCALING_CURVE.md"
        )
        if os.path.exists(doc_path):
            for line in open(doc_path):
                if not line.startswith("| ") or line.startswith("| query"):
                    continue
                cells = [c.strip() for c in line.strip().strip("|").split("|")]
                if len(cells) != 6 or cells[0] in subset:
                    continue
                try:
                    kept.append(
                        {
                            "query": cells[0],
                            "sf0.001": float(cells[1].rstrip("s")),
                            "sf0.01": float(cells[2].rstrip("s")),
                            "sf0.1": float(cells[3].rstrip("s")),
                            "alpha_001_01": float(cells[4]),
                            "alpha_01_1": float(cells[5]),
                        }
                    )
                except ValueError:
                    continue

    rows = []
    for name in run_list:
        times = {}
        failed = False
        for sf in SFS:
            t0 = time.perf_counter()
            try:
                with capture() as persisted:
                    try:
                        REGISTRY[name](spark, os.path.join(root, sf)).count()
                    finally:
                        # release inside the scope: a crash must not
                        # leak this run's persists into the sweep
                        release_all(persisted)
            except Exception as e:  # noqa: BLE001 — keep the sweep alive
                print(json.dumps({"query": name, "sf": sf,
                                  "error": repr(e)[:200]}), flush=True)
                failed = True
                break
            times[sf] = round(time.perf_counter() - t0, 3)
        if failed:
            # one failing (query, sf) previously aborted the whole
            # sweep, discarding every measured row and never writing
            # the doc
            continue
        # growth of time across each 10x data step, as an exponent:
        # alpha = log10(t_hi / t_lo) per decade of data. alpha <= ~1
        # is linear-or-better; ~2 means quadratic.
        a1 = math.log10(max(times["sf0.01"], 1e-3) / max(times["sf0.001"], 1e-3))
        a2 = math.log10(max(times["sf0.1"], 1e-3) / max(times["sf0.01"], 1e-3))
        rec = {"query": name, **times,
               "alpha_001_01": round(a1, 2), "alpha_01_1": round(a2, 2)}
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    if subset:
        # preserve the full sweep's ordering: kept rows in QUERIES
        # order, re-measured rows replacing their old positions
        by_name = {r["query"]: r for r in kept + rows}
        rows = [by_name[q] for q in QUERIES if q in by_name]
    doc = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "SCALING_CURVE.md")
    with open(doc, "w") as f:
        f.write(
            "# Scale-factor sensitivity (measured)\n\n"
            "One run per (query, sf) on local[32]; `alpha` is\n"
            "log10(time ratio) per decade of data growth — the\n"
            "empirical scaling exponent across a 100x input range.\n"
            "Per-job fixed overhead dominates the small end, so\n"
            "alpha well below 1 mostly reflects overhead\n"
            "amortization; **the red flag is alpha near 2 on the\n"
            "sf0.01 -> sf0.1 step** (a quadratic pair generator or\n"
            "an un-pushed-down scan). Regenerate with\n"
            "`python scripts/scaling_curve.py`.\n\n"
            "| query | sf0.001 | sf0.01 | sf0.1 | α(0.001→0.01) | α(0.01→0.1) |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['query']} | {r['sf0.001']}s | {r['sf0.01']}s |"
                f" {r['sf0.1']}s | {r['alpha_001_01']} | {r['alpha_01_1']} |\n"
            )
        worst = max(rows, key=lambda r: r["alpha_01_1"])
        verdict = (
            "All exponents at or below ~1 ⇒ no operator family"
            " exhibits superlinear growth over the measured range."
            if worst["alpha_01_1"] <= 1.05
            else "An exponent above ~1 needs adjudication (isolated"
            " re-measure vs host-state probes) before reading it as"
            " superlinear growth."
        )
        f.write(
            f"\nWorst sf0.01→sf0.1 exponent: **{worst['query']}**"
            f" (α={worst['alpha_01_1']}). {verdict}\n"
        )
    print(f"# wrote {os.path.normpath(doc)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
