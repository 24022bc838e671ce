"""Dump `.explain("formatted")` for named queries to plans/r13/.

Usage: python tools/explain_r13.py <suffix> <query> [query ...]

Writes plans/r13/<query>_<suffix>.txt for each query — the before/
after plan evidence the r13 optimization round commits alongside each
change (suffix "before" or "after").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entrymod
    from parquet_extractor_spark.session import get_spark

    suffix = sys.argv[1]
    names = sys.argv[2:]
    qs = entrymod.queries()
    spark = get_spark("explain-r13")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
