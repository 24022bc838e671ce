"""Window helpers.

``bounded_global_window`` is the ONLY sanctioned way to build a
global (single-partition) window in this codebase, and it is only
legitimate over K-BOUNDED inputs: a post-``limit(K)`` head, or a
grouped reduction whose cardinality is a constant of the query (never
raw fact rows). ``partitionBy(lit(0))`` keeps the partition spec
non-empty so WindowExec doesn't emit its "No Partition Defined"
WARN for what is a deliberate, bounded single partition — which in
turn keeps run logs clean enough that a REAL unbounded global window
(someone calling ``Window.orderBy`` directly) stands out. A source
lint in tests/test_plan_quality.py enforces that operators never call
``Window.orderBy`` directly (r03 verdict item 8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec


def bounded_global_window(*order_cols: Column | str) -> WindowSpec:
    """Single-partition window for K-bounded inputs; see module doc."""
    return Window.partitionBy(F.lit(0)).orderBy(*order_cols)
