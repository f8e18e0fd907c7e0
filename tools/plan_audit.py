"""Plan audit: extract scale-relevant physical-plan features per query.

For each (headline) query, prints the join strategies, exchange (shuffle)
count, parquet pushdown evidence, and whole-stage-codegen span count — the
checklist from SURVEY §4 / the 100 TB design rules. Usage:

    python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def features(plan: str) -> dict:
    # formatted explain prints each node once as "(<id>) <NodeName>" in the
    # detail section — count those, not the tree (which would double-count)
    nodes = Counter(re.findall(r"^\(\d+\) (\w+)", plan, re.MULTILINE))
    joins = {
        k: v
        for k, v in nodes.items()
        if k
        in {
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        }
    }
    return {
        "joins": joins,
        "shuffles": nodes.get("Exchange", 0),
        "broadcasts": nodes.get("BroadcastExchange", 0),
        "pushed": sorted(
            set(
                m.group(1)
                for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan)
                if m.group(1)
            )
        ),
        "python_udf": "BatchEvalPython" in plan or "ArrowEvalPython" in plan,
        "pandas_grouped": "FlatMapGroupsInPandas" in plan or "MapInPandas" in plan,
        "windows": nodes.get("Window", 0) + nodes.get("WindowGroupLimit", 0),
        "sorts": nodes.get("Sort", 0),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    import __spark_entry__ as ent
    from end_to_end_azure_data_engineering_spark.engine import get_spark

    from end_to_end_azure_data_engineering_spark.queries.lazy_stages import (
        lazy_stages,
    )

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    stages = lazy_stages()
    names = only or list(qs)
    # interleave each query's eager-stage lazy twins right after it, so the
    # real mining shuffles sit next to the (checkpoint-scan) query row
    audit: list[tuple[str, object]] = []
    for name in names:
        audit.append((name, qs[name]))
        audit.extend(
            (sname, fn)
            for sname, fn in stages.items()
            if sname.split(":", 1)[0] == name
        )
    for name, qfn in audit:
        df = qfn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        f = features(plan)
        joins = ", ".join(f"{k}×{v}" for k, v in f["joins"].items()) or "none"
        flags = []
        if f["python_udf"]:
            flags.append("PYTHON-UDF")
        if f["pandas_grouped"]:
            flags.append("pandas-grouped")
        print(
            f"{name:28s} joins[{joins}] shuffles={f['shuffles']} "
            f"bcast={f['broadcasts']} windows={f['windows']} "
            f"pushdown={'yes' if f['pushed'] else 'no'} "
            + (" ".join(flags))
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
