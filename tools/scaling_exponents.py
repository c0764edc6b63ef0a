#!/usr/bin/env python3
"""Per-family scale exponents for the sf1 -> sf10 rung (SURVEY §5).

exponent a solves t_sf10 = t_sf1 * 10^a: a=1 is linear in data,
a=0 is scale-free (per-job constants dominate), a>1 superlinear.
Wall times are warm-artifact bench rows (BENCH_sf1.json per-query map
vs the sf10 BENCH_DETAIL), both on this node at local[24].

Usage: python3 tools/scaling_exponents.py BENCH_sf1.json BENCH_DETAIL_sf10.json
"""
import json
import math
import sys

FAMILIES = {
    "relational scan/agg/join": ["q1_pricing", "q3_join5", "q5_window",
                                 "q7_topk_per_group", "q10_distinct",
                                 "q13_salted_agg", "q14_range_window",
                                 "q17_funnel", "gs1_grouping_sets",
                                 "bk1_bucketed_join", "f1_bloom_join",
                                 "j2_salted_join", "iv1_interval_join",
                                 "a1_asof", "b1_range_join", "zm1_zorder_scan",
                                 "ord1_global_rank", "cdc1_merge",
                                 "coh1_cohort", "m5_histogram",
                                 "m11_global_pcts", "m1_latency_pcts"],
    "sketches": ["m4_approx_pcts", "q12_approx_distinct", "roll1_hll_rollup"],
    "events/sessions": ["e2_sessions", "pw1_partitioned_write",
                        "ws1_weighted_sample", "sk2_skew_salted_agg",
                        "sk3_skew_plain_agg"],
    "text/corpus": ["t1_tokens", "t3_langid", "t9_tfidf_keywords",
                    "bpe2_encode", "b2_bm25", "m2_recall_at_k"],
    "dedup": ["d1_exact_dedup", "d3_minhash", "d5_embed_neardup",
              "d7_simhash_pairs", "d8_dedup_groups", "sem1_semdedup"],
    "graph (iterative)": ["g1_pagerank", "kc1_kcore"],
    "vector/ANN": ["v0_embed", "v1_knn_cos", "v6_knn_ivf", "v7_knn_lsh",
                   "v9_ivf_persisted", "v12_hybrid_search", "v14_ivf_pq",
                   "v16_knn_hamming", "vq2_pq_codes", "rk1_rank_agreement"],
}


def load(path):
    q = json.load(open(path))["queries"]
    return {k: (v["sec"] if isinstance(v, dict) else v) for k, v in q.items()}


def main(p1, p10):
    t1, t10 = load(p1), load(p10)
    print(f"{'family':28s} {'sf1_s':>8s} {'sf10_s':>8s} {'exp':>6s}  n")
    for fam, qs in FAMILIES.items():
        pairs = [(t1[q], t10[q]) for q in qs if q in t1 and q in t10
                 and t1[q] > 0.05]
        if not pairs:
            continue
        s1, s10 = sum(p[0] for p in pairs), sum(p[1] for p in pairs)
        exp = math.log10(s10 / s1)
        print(f"{fam:28s} {s1:8.1f} {s10:8.1f} {exp:6.2f}  {len(pairs)}")
        for q in qs:
            if q in t1 and q in t10 and t1[q] > 0.5:
                e = math.log10(t10[q] / t1[q])
                print(f"  {q:26s} {t1[q]:8.2f} {t10[q]:8.2f} {e:6.2f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
