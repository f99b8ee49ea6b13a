"""Dump .explain("formatted") for named queries() entries to a directory.

Usage: python tools/dump_plans.py OUT_DIR SUFFIX [sf_dir] [query ...]
Writes OUT_DIR/<query>_<SUFFIX>.txt for each query (default: a fixed
set of optimization-target queries). Plans only - nothing is executed
except the tiny collect()s some query builders do for setup.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "emb_neardup_lsh", "minhash_lsh_dups", "dedup_ngram_jaccard",
    "dedup_clusters_star", "curation_v2", "cms_token_counts",
    "repeated_spans", "hamming_pairs", "simhash64", "pack_sequences",
    "contamination", "bm25_topk", "tfidf_keywords", "lm_quality",
    "pq_adc_topk", "lineitem_agg", "top_orders", "passage_dedup",
    "repetition_stats", "session_stats", "curation", "recrawl_delta",
]


def main():
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:] or DEFAULT
    os.makedirs(out_dir, exist_ok=True)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from azuresearchcrawlervector_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInPandas")
        print(f"{name}: exchanges={n_exch} python_nodes={n_py} -> {path}")


if __name__ == "__main__":
    main()
