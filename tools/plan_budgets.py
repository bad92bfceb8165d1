"""Capture plan-shape budgets for the top compute queries.

Prints, for each named contract query at sf0.001: total Exchange count,
hash/range exchange count, join strategies present, and whether an
unbounded all-pairs join appears. Used to (re)pin the budgets asserted
in tests/test_query_plans.py::test_top_compute_query_plan_budgets —
run it after an intentional plan change and update the table there.

Usage: python tools/plan_budgets.py [query ...]
"""

from __future__ import annotations

import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

TOP_COMPUTE = [
    "dedup_clusters", "dedup_minhash_lsh", "sparse_join_bloom",
    "incremental_dedup", "fuzzy_join", "smb_join", "substring_dedup",
    "dedup_ngram_jaccard", "dsir_select", "winnow_fingerprints",
    "curation_e2e", "dedup_simhash", "pipe_identity", "lang_id",
    "video_mjpeg", "bigram_lm", "merge_upsert", "zorder_layout",
    "aggregate_global", "smb_transform",
]


def main(names):
    import __spark_entry__ as ent
    from scio_spark.context import build_session
    from scio_spark.plans import lint

    spark = build_session()
    qs = ent.queries()
    print(f"{'query':28s} {'exch':>4} {'hash/rng':>8} joins")
    for name in names:
        df = qs[name](spark, "/root/testdata/sf0.001")
        plan = lint.executed_plan(df)
        exch = plan.count("Exchange")
        hr = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
        joins = sorted(
            {
                j
                for j in (
                    "BroadcastHashJoin", "SortMergeJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct",
                    "ShuffledHashJoin",
                )
                if j in plan
            }
        )
        bad = lint.find_all_pairs_joins(df)
        flag = " ALL-PAIRS!" if bad else ""
        print(f"{name:28s} {exch:>4} {hr:>8} {','.join(joins) or '-'}{flag}")


if __name__ == "__main__":
    main(sys.argv[1:] or TOP_COMPUTE)
