"""Physical-plan inspection helpers (SURVEY §4).

The scale contract of this engine is enforceable, not aspirational:
these helpers parse ``explain("formatted")`` output so tests can
assert that filters reached the parquet scan (PushedFilters), scans
were column-pruned (ReadSchema), and small dimensions were broadcast
rather than shuffled. tests/test_plan_quality.py runs these against
every headline query.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (pruning check)."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {
            f.split(":")[0].strip()
            for f in m.group(1).split(",")
            if f.strip()
        }
        out.append(cols)
    return out


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def whole_stage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (more fused = fewer
    interpreter boundaries). Matches both the tree form
    ``WholeStageCodegen (N)`` and formatted-mode ``[codegen id : N]``.
    Adaptive plans defer codegen to runtime — disable AQE on the
    session to see spans statically (tools/audit_plans.py does)."""
    plan = formatted_plan(df)
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    ids |= set(re.findall(r"codegen id : (\d+)", plan))
    return len(ids)


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the plan carries map-side partial aggregation
    (HashAggregate appears both before and after the exchange)."""
    plan = formatted_plan(df)
    return len(re.findall(r"HashAggregate", plan)) >= 2


def forced_broadcast_count(df: DataFrame) -> int:
    """Number of user-forced broadcast hints surviving in the
    optimized logical plan. A hint pins the plan: AQE cannot fall back
    to a shuffle join when the hinted table outgrows memory, so tests
    use this to forbid hints on tables whose cardinality scales with
    the data (doc_id- or vocabulary-keyed)."""
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    return opt.count("strategy=broadcast")
