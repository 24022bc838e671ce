"""Snapshot-versioned dataset sink: time travel, isolation, commit
atomicity under a simulated race, compaction, and GC reachability."""

from __future__ import annotations

import json
import os

import pytest

from parquet_extractor_spark.sinks.versioned import (
    commit_snapshot,
    compact_snapshot,
    expire_snapshots,
    read_snapshot,
    snapshots,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id", "concat('doc-', id) AS name"
    )


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = commit_snapshot(_df(spark, 0, 5), t)
    v1 = commit_snapshot(_df(spark, 5, 8), t, mode="append")
    v2 = commit_snapshot(_df(spark, 100, 102), t, mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    assert _ids(read_snapshot(spark, t)) == [100, 101]
    assert _ids(read_snapshot(spark, t, version=1)) == list(range(8))
    assert _ids(read_snapshot(spark, t, version=0)) == list(range(5))
    log = snapshots(t)
    assert [m["operation"] for m in log] == [
        "append", "append", "overwrite",
    ]
    assert log[1]["parent"] == 0 and log[0]["parent"] is None
    assert all("bigint" in m["schema"] for m in log)


def test_snapshot_isolation_across_later_commits(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 4), t)
    frozen = read_snapshot(spark, t, version=0)
    commit_snapshot(_df(spark, 50, 60), t, mode="overwrite")
    compact_snapshot(spark, t)
    # the v0 reader still sees exactly the v0 rows
    assert _ids(frozen) == list(range(4))


def test_commit_race_retries_to_next_version(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 3), t)
    # another committer wins version 1 between log-read and link
    blocker = os.path.join(t, "_versions", "v00000001.json")
    with open(blocker, "w") as f:
        json.dump(
            {"snapshot": 1, "parent": 0, "operation": "overwrite",
             "files": [], "n_files": 0, "schema": "struct<>"},
            f,
        )
    v = commit_snapshot(_df(spark, 3, 6), t, mode="overwrite")
    assert v == 2
    assert _ids(read_snapshot(spark, t, version=2)) == [3, 4, 5]


def test_tagged_commit_race_adopts_winner(spark, tmp_path, monkeypatch):
    """Two committers replaying one epoch tag can both pass the
    pre-write tag check; the link-race loser must adopt the winner's
    snapshot (re-checking the tag inside the retry loop), not commit
    a duplicate under the next version number."""
    import parquet_extractor_spark.sinks.versioned as V

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 3), t)
    real_link = os.link

    def racing_link(src, dst, *a, **kw):
        # the competitor lands the SAME tag at this version first;
        # the real link then loses the race naturally
        if not os.path.exists(dst):
            with open(dst, "w") as f:
                json.dump(
                    {"snapshot": 1, "parent": 0, "operation": "append",
                     "files": [], "n_files": 0, "schema": "struct<>",
                     "tag": "epoch-7"},
                    f,
                )
        return real_link(src, dst, *a, **kw)

    monkeypatch.setattr(V.os, "link", racing_link)
    v = commit_snapshot(_df(spark, 3, 6), t, mode="append", tag="epoch-7")
    assert v == 1  # adopted the winner, did not mint version 2
    log = snapshots(t)
    assert [m["snapshot"] for m in log] == [0, 1]
    assert sum(1 for m in log if m.get("tag") == "epoch-7") == 1
    # the loser's freshly written (now unreferenced) data files are
    # cleaned up rather than orphaned
    referenced = {
        p.split("/")[1] for m in log for p in m["files"]
    }
    on_disk = set(os.listdir(os.path.join(t, "data")))
    assert on_disk == referenced


def test_compaction_reduces_files_preserves_rows_and_history(
    spark, tmp_path
):
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 10).repartition(6), t)
    before = snapshots(t)[-1]["n_files"]
    assert before >= 6
    v = compact_snapshot(spark, t, target_files=1)
    log = snapshots(t)
    assert log[-1]["snapshot"] == v and log[-1]["n_files"] == 1
    assert _ids(read_snapshot(spark, t, version=v)) == list(range(10))
    assert _ids(read_snapshot(spark, t, version=0)) == list(range(10))


def test_expire_drops_manifests_and_unreferenced_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 5), t)
    commit_snapshot(_df(spark, 5, 8), t, mode="append")
    commit_snapshot(_df(spark, 90, 92), t, mode="overwrite")
    res = expire_snapshots(t, keep_last=1)
    assert res["expired_snapshots"] == 2 and res["live_snapshots"] == 1
    # v0/v1 data dirs are unreferenced by v2 and must be gone
    assert res["removed_files"] >= 2
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, version=0)
    assert _ids(read_snapshot(spark, t)) == [90, 91]

    # append-chain safety: expiring keep_last=1 after appends keeps
    # every file the surviving manifest references
    t2 = str(tmp_path / "tbl2")
    commit_snapshot(_df(spark, 0, 3), t2)
    commit_snapshot(_df(spark, 3, 6), t2, mode="append")
    res2 = expire_snapshots(t2, keep_last=1)
    assert res2["removed_files"] == 0  # v1 references v0's files too
    assert _ids(read_snapshot(spark, t2)) == list(range(6))


def test_read_errors(spark, tmp_path):
    t = str(tmp_path / "empty")
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t)
    commit_snapshot(_df(spark, 0, 2), t)
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, version=7)
    with pytest.raises(ValueError):
        commit_snapshot(_df(spark, 0, 1), t, mode="merge")


def test_tagged_commit_is_idempotent(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v = commit_snapshot(_df(spark, 0, 3), t, tag="epoch-0")
    again = commit_snapshot(_df(spark, 99, 104), t, tag="epoch-0")
    assert again == v  # replay: no new snapshot, no new rows
    assert len(snapshots(t)) == 1
    assert _ids(read_snapshot(spark, t)) == [0, 1, 2]


def test_versioned_table_stream_commits_epochs(spark, sf_small, tmp_path):
    from parquet_extractor_spark.sinks.versioned import read_snapshot
    from parquet_extractor_spark.sources.tables import load_table
    from parquet_extractor_spark.streaming.versioning import (
        run_versioned_table_stream,
    )

    t = str(tmp_path / "tbl")
    committed = run_versioned_table_stream(
        spark, sf_small, str(tmp_path / "ckpt"), t
    )
    assert committed
    log = snapshots(t)
    assert [m["snapshot"] for m in log] == committed
    assert all(m["tag"].startswith("epoch-") for m in log)
    n_docs = load_table(spark, sf_small, "documents").count()
    assert read_snapshot(spark, t).count() == n_docs


def test_band_index_lifecycle_matches_recompute(spark, sf_small, tmp_path):
    """The versioned LSH band index supports the full crawl cycle:
    init from the prior corpus, probe a delta (must equal the
    one-shot incremental_dedup_candidates), append the delta, then a
    SECOND crawl's probe sees both the original corpus and the first
    delta."""
    from pyspark.sql import functions as F

    from parquet_extractor_spark.functions.text import portable_hash64
    from parquet_extractor_spark.operators.versioning import (
        band_index_append,
        band_index_init,
        band_index_probe,
        incremental_dedup_candidates,
    )
    from parquet_extractor_spark.sources.tables import load_table

    t = str(tmp_path / "band_index")
    assert band_index_init(spark, sf_small, t) == 0
    assert band_index_init(spark, sf_small, t) == 0  # idempotent

    docs = load_table(spark, sf_small, "documents")
    h = portable_hash64(F.col("doc_id").cast("string"))
    delta1 = docs.where(h % 10 == 0)
    probe1 = band_index_probe(spark, t, delta1).collect()
    oneshot = incremental_dedup_candidates(spark, sf_small).collect()
    assert sorted(map(tuple, probe1)) == sorted(map(tuple, oneshot))

    v = band_index_append(spark, t, delta1, tag="crawl-1")
    assert v == 1
    assert band_index_append(spark, t, delta1, tag="crawl-1") == 1

    # second crawl: the decile v1 dropped — absent from both tiers
    delta2 = docs.where(h % 10 == 9)
    probe2 = band_index_probe(spark, t, delta2)
    prior_ids = {r.doc_prior for r in probe2.collect()}
    d1_ids = {r.doc_id for r in delta1.select("doc_id").collect()}
    idx_ids = {
        r.doc_id
        for r in docs.where(h % 10 != 0).select("doc_id").collect()
    }
    assert prior_ids <= (d1_ids | idx_ids)
    # the appended delta is genuinely probe-visible: an exact dup of
    # a delta-1 doc planted as a fake second-crawl row must hit it
    fake = delta1.limit(1).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        "text",
        "lang",
        F.lit("recrawl").alias("source"),
        "n_chars",
    )
    hits = band_index_probe(spark, t, fake).collect()
    assert any(r.doc_prior in d1_ids for r in hits)


def test_cli_table_lifecycle(spark, tmp_path, capsys):
    import json

    from parquet_extractor_spark.cli import main as cli_main

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 6).repartition(4), t)
    commit_snapshot(_df(spark, 6, 9), t, mode="append")

    assert cli_main(["table", "log", t]) == 0
    log = [json.loads(ln) for ln in
           capsys.readouterr().out.strip().splitlines()]
    assert [m["snapshot"] for m in log] == [0, 1]

    assert cli_main(["table", "read", t, "--version", "0",
                     "--limit", "100"]) == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert sorted(r["id"] for r in rows) == list(range(6))

    assert cli_main(["table", "compact", t]) == 0
    assert json.loads(capsys.readouterr().out)["committed_snapshot"] == 2

    assert cli_main(["table", "expire", t, "--keep-last", "1"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["expired_snapshots"] == 2
    assert _ids(read_snapshot(spark, t)) == list(range(9))


def test_ingest_crawl_cycle_end_to_end(spark, sf_small, tmp_path):
    """Full rolling-pipeline cycle: near-dups of the existing corpus
    are dropped, novel docs land in BOTH versioned tables, a replay
    of the same tag is a no-op, and a later cycle sees the earlier
    cycle's docs through the updated index."""
    from pyspark.sql import functions as F

    from parquet_extractor_spark.functions.text import portable_hash64
    from parquet_extractor_spark.operators.versioning import (
        band_index_init,
        ingest_crawl_cycle,
    )
    from parquet_extractor_spark.sinks.versioned import (
        commit_snapshot as commit,
        read_snapshot as read,
    )
    from parquet_extractor_spark.sources.tables import load_table

    corpus_t = str(tmp_path / "corpus")
    index_t = str(tmp_path / "index")
    docs = load_table(spark, sf_small, "documents")
    h = portable_hash64(F.col("doc_id").cast("string"))
    v1 = docs.where(h % 10 != 0)
    commit(v1, corpus_t, mode="overwrite", tag="base")
    band_index_init(spark, sf_small, index_t)
    n_v1 = v1.count()

    delta1 = docs.where(h % 10 == 0)
    res1 = ingest_crawl_cycle(spark, delta1, corpus_t, index_t, "crawl-1")
    assert res1["delta_docs"] == delta1.count()
    assert res1["novel_docs"] + res1["near_dup_docs"] == res1["delta_docs"]
    assert read(spark, corpus_t).count() == n_v1 + res1["novel_docs"]

    # replay: identical snapshots, no double-ingest
    res1b = ingest_crawl_cycle(spark, delta1, corpus_t, index_t, "crawl-1")
    assert res1b["corpus_snapshot"] == res1["corpus_snapshot"]
    assert res1b["index_snapshot"] == res1["index_snapshot"]
    assert read(spark, corpus_t).count() == n_v1 + res1["novel_docs"]

    # cycle 2: exact re-crawls of cycle-1 NOVEL docs must now be
    # caught by the index that cycle 1 appended to
    novel1 = delta1.join(
        read(spark, corpus_t).select("doc_id"), "doc_id", "left_semi"
    )
    recrawl = novel1.limit(2).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        "text", "lang",
        F.lit("recrawl").alias("source"),
        "n_chars",
    )
    res2 = ingest_crawl_cycle(spark, recrawl, corpus_t, index_t, "crawl-2")
    assert res2["near_dup_docs"] == res2["delta_docs"] == 2
    assert res2["novel_docs"] == 0
    # time travel: the pre-cycle-2 corpus is intact at its snapshot
    assert read(
        spark, corpus_t, version=res1["corpus_snapshot"]
    ).count() == n_v1 + res1["novel_docs"]


def test_orders_point_in_time_dim_semantics(spark, sf_small):
    """PIT-join invariants: epoch-1 orders never see _V2 segment
    spellings (those open at version 2); orphaned orders exist only
    where the dimension row is closed or absent for the epoch; totals
    reconcile with the raw orders table."""
    from parquet_extractor_spark.operators.versioning import (
        orders_point_in_time_dim,
    )
    from parquet_extractor_spark.sources.tables import load_table

    rows = orders_point_in_time_dim(spark, sf_small).collect()
    e1 = [r for r in rows if r.order_epoch == 1]
    e2 = [r for r in rows if r.order_epoch == 2]
    assert e1 and e2
    # v2 respellings cannot be attributed to epoch-1 facts
    assert not any(
        (r.c_mktsegment or "").endswith("_V2") for r in e1
    )
    # epoch 2 sees both unchanged and revised spellings
    assert any((r.c_mktsegment or "").endswith("_V2") for r in e2)
    # every order lands exactly once (left join, history <= 1 valid
    # row per key per epoch)
    total = sum(r.n_orders for r in rows)
    assert total == load_table(spark, sf_small, "orders").count()
    # orphans (removed-in-v2 customers with epoch-2 orders, or
    # added-in-v2 customers with epoch-1 orders) are reported, not
    # silently matched
    assert any(r.c_mktsegment is None for r in rows)
