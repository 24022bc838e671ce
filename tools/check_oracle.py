"""Local replica of the driver's correctness gate: run every
queries() entry on Spark AND its oracle_sql() on DuckDB at sf0.01,
compare row count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def type_tag(name: str) -> str:
    """Coarse cross-engine type tag. The driver's value hash is
    type-tagged, so a Spark BIGINT vs DuckDB HUGEINT mismatch fails
    there even when values agree (r01 q12). Map both engines' type
    names into one tag space: int-family collapses to 'int', but
    HUGEINT/DECIMAL deliberately do NOT — that divergence is exactly
    what the driver punishes."""
    t = name.strip().lower()
    if t.startswith(("array<", "list")) or t.endswith("[]"):
        inner = t
        for pre, suf in (("array<", ">"), ("list(", ")")):
            if inner.startswith(pre) and inner.endswith(suf):
                inner = inner[len(pre):-len(suf)]
        if inner.endswith("[]"):
            inner = inner[:-2]
        return f"list<{type_tag(inner)}>"
    if t.startswith("decimal") or t == "hugeint":
        return "decimal"
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "ubigint",
             "uinteger", "usmallint", "utinyint"):
        return "int"
    if t in ("float", "double", "real"):
        return "float"
    if t in ("string", "varchar", "text"):
        return "str"
    if t.startswith("timestamp"):
        return "ts"
    if t == "date":
        return "date"
    if t in ("boolean", "bool"):
        return "bool"
    if t in ("binary", "blob"):
        return "bin"
    return t


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in idx) for r in rows
    )


def run_gate(only=(), sf_dir=None, spark=None, quiet=False) -> list:
    """Run the driver-gate replica; returns the list of failing query
    names (empty = all green). Importable so the pytest suite can run
    the full registry sweep mechanically (tests/test_oracle_gate.py);
    the CLI below is this with argv as ``only``."""
    import __spark_entry__ as entrymod
    from parquet_extractor_spark.session import get_spark, release_cached

    sf_dir = sf_dir or SF_DIR
    if spark is None:
        spark = get_spark("oracle-check", master="local[8]",
                          shuffle_partitions=8)

    def say(msg):
        if not quiet:
            print(msg)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(only)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = [f.dataType.simpleString() for f in sdf.schema.fields]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            say(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        finally:
            # collect() fully consumed the frame; drop its persisted
            # intermediates + localCheckpoint blocks before the next
            # query (see session.release_cached — r04 measured block
            # accumulation degrading late-sweep queries 2.6s->6.9s).
            release_cached(spark)
        if name not in oracles:
            say(f"pass {name}: rows-only ({len(srows)} rows) "
                f"[{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            say(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        stags = {c: type_tag(t) for c, t in zip(scols, stypes)}
        dtags = {c: type_tag(t) for c, t in zip(dcols, dtypes)}
        if sorted(scols) != sorted(dcols):
            say(f"FAIL {name}: columns {sorted(scols)} != {sorted(dcols)}")
            ok = False
        elif stags != dtags:
            diffs = {
                c: (stags[c], dtags[c]) for c in stags if stags[c] != dtags[c]
            }
            say(f"FAIL {name}: type-tag mismatch {diffs}")
            ok = False
        elif len(srows) != len(drows):
            say(f"FAIL {name}: rowcount {len(srows)} != {len(drows)}")
            ok = False
        else:
            sn = norm_rows(scols, srows)
            dn = norm_rows(dcols, drows)
            if sn != dn:
                diffs = [
                    (a, b) for a, b in zip(sn, dn) if a != b
                ][:3]
                say(f"FAIL {name}: value mismatch, first diffs: {diffs}")
                ok = False
        if ok:
            say(f"pass {name}: {len(srows)} rows match "
                f"[{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
    return failures


def main() -> int:
    failures = run_gate(sys.argv[1:])
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
