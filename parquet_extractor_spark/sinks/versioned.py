"""Snapshot-versioned dataset sink: time travel for corpus tables.

A rolling training-data pipeline re-materializes its corpus every
cycle and must answer "train against EXACTLY the table the last run
saw" — the public table-format recipe (Iceberg/Delta, both published
designs) reduced to its load-bearing core, with no library
dependency:

* **Immutable data files.** Every commit writes NEW parquet files
  under ``data/``; nothing is ever modified in place, so any reader
  holding a snapshot sees a frozen file set forever.
* **Manifest per snapshot.** ``_versions/v{N:08d}.json`` lists the
  exact data files of snapshot N (append = parent's files + new
  files; overwrite = new files only), plus the operation, parent and
  schema.
* **Atomic commit.** The manifest is written to a temp file and
  linked into place with ``O_CREAT|O_EXCL`` — the filesystem's
  atomic create is the commit point. Two concurrent committers race
  on the same version id; the loser re-reads the log and retries on
  the next id (optimistic concurrency, bounded retries).
* **Time travel.** ``read_snapshot(spark, dir, version=K)`` loads
  the file list of manifest K — reads are snapshot-isolated by
  construction because data files are immutable.
* **Compaction as a snapshot.** ``compact_snapshot`` rewrites the
  current file set into fewer files and commits the result as a NEW
  snapshot — history stays readable; no reader observes a half-
  compacted table.
* **GC with reachability.** ``expire_snapshots(keep_last=K)``
  deletes older manifests and any data file no SURVIVING manifest
  references.

Scale notes: the driver touches only manifests (KB-sized JSON —
file LISTS, never data); data moves exclusively through distributed
parquet jobs. At 100 TB the one real divergence from Iceberg is
manifest size — a billion-file table wants the manifest itself
chunked and stats-indexed (Iceberg's manifest-list layer); the
commit protocol and immutability contract here are unchanged by
that extension.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_VDIR = "_versions"
_COMMIT_RETRIES = 20


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _VDIR, f"v{version:08d}.json")


def snapshots(table_dir: str) -> list[dict]:
    """The snapshot log, oldest first; [] for a fresh directory."""
    vdir = os.path.join(table_dir, _VDIR)
    if not os.path.isdir(vdir):
        return []
    out = []
    for name in sorted(os.listdir(vdir)):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(vdir, name)) as f:
                out.append(json.load(f))
    return out


def _latest_version(table_dir: str) -> int | None:
    log = snapshots(table_dir)
    return log[-1]["snapshot"] if log else None


def commit_snapshot(
    df: DataFrame, table_dir: str, mode: str = "append",
    tag: str | None = None,
) -> int:
    """Write ``df``'s rows as new immutable data files and commit
    them as the next snapshot. ``mode='append'`` carries the parent
    snapshot's files forward; ``'overwrite'`` starts the file list
    fresh. Returns the committed snapshot id.

    ``tag`` makes the commit IDEMPOTENT per tag: if any existing
    snapshot already carries it, the call is a no-op returning that
    snapshot — the dedup hook an at-least-once streaming sink uses
    to commit each epoch exactly once."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode {mode!r}")
    if tag is not None:
        for m in snapshots(table_dir):
            if m.get("tag") == tag:
                return m["snapshot"]
    os.makedirs(os.path.join(table_dir, _VDIR), exist_ok=True)
    data_dir = os.path.join(table_dir, "data", uuid.uuid4().hex)
    df.write.mode("error").parquet(data_dir)
    new_files = sorted(
        os.path.join("data", os.path.basename(data_dir), f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    schema = df.schema.simpleString()

    for _ in range(_COMMIT_RETRIES):
        # re-check the tag EACH attempt, not just before the data
        # write: two committers replaying the same epoch can both
        # pass the first check; the loser of the link race must
        # discover the winner's tag here rather than commit a
        # duplicate snapshot under the next version number
        log = snapshots(table_dir)
        if tag is not None:
            for m in log:
                if m.get("tag") == tag:
                    shutil.rmtree(data_dir, ignore_errors=True)
                    return m["snapshot"]
        parent = log[-1]["snapshot"] if log else None
        version = 0 if parent is None else parent + 1
        files = list(new_files)
        if mode == "append" and parent is not None:
            with open(_manifest_path(table_dir, parent)) as f:
                files = json.load(f)["files"] + files
        manifest = {
            "snapshot": version,
            "parent": parent,
            "operation": mode,
            "files": files,
            "n_files": len(files),
            "schema": schema,
            "tag": tag,
        }
        tmp = os.path.join(
            table_dir, _VDIR, f".tmp-{uuid.uuid4().hex}.json"
        )
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        try:
            # atomic commit point: exclusive link of the manifest name
            os.link(tmp, _manifest_path(table_dir, version))
            os.unlink(tmp)
            return version
        except FileExistsError:
            os.unlink(tmp)  # lost the race: re-read the log, retry
    raise RuntimeError(
        f"could not commit after {_COMMIT_RETRIES} attempts (livelock?)"
    )


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The table AS OF ``version`` (default: latest). Snapshot-
    isolated: the returned frame reads a frozen, immutable file
    list, unaffected by any later commit, compaction, or expiry of
    OTHER snapshots."""
    if version is None:
        version = _latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no snapshots in {table_dir}")
    path = _manifest_path(table_dir, version)
    if not os.path.exists(path):
        raise FileNotFoundError(f"snapshot {version} not found (expired?)")
    with open(path) as f:
        manifest = json.load(f)
    files = [os.path.join(table_dir, p) for p in manifest["files"]]
    if not files:
        raise ValueError(f"snapshot {version} is empty")
    return spark.read.parquet(*files)


def compact_snapshot(
    spark: SparkSession, table_dir: str, target_files: int = 1
) -> int:
    """Rewrite the LATEST snapshot's rows into ``target_files`` files
    and commit as a new overwrite snapshot — small-file maintenance
    that never disturbs a concurrent reader of any older snapshot."""
    current = read_snapshot(spark, table_dir)
    return commit_snapshot(
        current.coalesce(target_files), table_dir, mode="overwrite"
    )


def expire_snapshots(table_dir: str, keep_last: int = 1) -> dict:
    """Drop all but the newest ``keep_last`` snapshots and delete
    data files no surviving snapshot references. Returns counts."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    log = snapshots(table_dir)
    dead, alive = log[:-keep_last], log[-keep_last:]
    keep_files = {p for m in alive for p in m["files"]}
    removed_files = 0
    for m in dead:
        os.unlink(_manifest_path(table_dir, m["snapshot"]))
    data_root = os.path.join(table_dir, "data")
    for sub in os.listdir(data_root) if os.path.isdir(data_root) else []:
        subdir = os.path.join(data_root, sub)
        rels = {
            os.path.join("data", sub, f)
            for f in os.listdir(subdir)
            if f.endswith(".parquet")
        }
        if rels and not (rels & keep_files):
            removed_files += len(rels)
            shutil.rmtree(subdir)
    return {
        "expired_snapshots": len(dead),
        "removed_files": removed_files,
        "live_snapshots": len(alive),
    }
