#!/usr/bin/env python
"""Reproducible physical-plan audit (the evidence behind PLANS.md).

For each named query (default: a representative set), prints the pushdown
/ shuffle / codegen properties of its plan::

    PYTHONPATH=/root/repo python scripts/plan_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = ["time_slice", "sliding_mean_sum", "lineitem_pricing_summary",
           "period_days", "dedup_ngram_jaccard", "dedup_minhash_lsh_pairs",
           "embedding_neardup", "acf_by_user", "tumbling_blocks",
           "ann_ivfpq_topk", "arima_auto_order_by_user", "adf_test_by_user",
           "lm_perplexity_by_doc", "drift_psi_events",
           "chunk_documents_corpus"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    import __spark_entry__ as entrymod
    from orange3_timeseries_spark import get_spark

    spark = get_spark("plan-audit", master="local[8]")
    qs = entrymod.queries()
    for name in names or DEFAULT:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        pushed = [ln.strip() for ln in plan.splitlines()
                  if "PushedFilters" in ln and "[]" not in ln]
        schemas = [ln.strip()[:120] for ln in plan.splitlines()
                   if "ReadSchema" in ln]
        n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        n_window = len(re.findall(r"^\(\d+\) Window", plan, re.M))
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        print(f"== {name}")
        print(f"   exchanges={n_exchange} windows={n_window} "
              f"nested_loop_joins={n_bnlj}")
        for p in pushed[:3]:
            print(f"   {p[:160]}")
        for s in schemas[:2]:
            print(f"   {s}")
        if n_bnlj:
            print("   !! nested-loop join present — check this plan")
    print("done")


if __name__ == "__main__":
    main()
