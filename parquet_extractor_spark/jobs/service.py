"""Async job service (SURVEY §2.10 O1-O8) — the reference's Flask REST
surface (api.py:22-191) rebuilt over Spark.

Same REST shape: submit → uuid job id → background thread → poll
status → list/download outputs. Differences by design:

- the worker thread is a ``pyspark.InheritableThread`` tagged with
  ``setJobGroup(job_id)`` so Spark stage progress is attributable and
  a job is CANCELLABLE (``cancelJobGroup``) — the reference's threads
  can't be stopped (api.py:97-98);
- progress comes from real Spark execution, not manual log appends
  only;
- one documented port (the reference binds 4000 at api.py:982 while
  its README/client say 5000 — SURVEY §3.2 gotcha; here: 5000).

The in-memory ``jobs`` dict mirrors api.py:25, with the same caveats
(process-local, non-durable) — acceptable for the driver-side control
plane; the data plane is all Spark.
"""

from __future__ import annotations

import os
import threading
import traceback
import uuid
from typing import Any, Callable

from pyspark import InheritableThread
from pyspark.sql import SparkSession

from parquet_extractor_spark.constants import (
    MAX_CRAWL_ARTICLES,
    MAX_DOCS,
    MAX_ERRORS,
    MAX_QUERY_ROWS,
)
from parquet_extractor_spark.session import release_cached

DEFAULT_PORT = 5000

jobs: dict[str, dict[str, Any]] = {}
_jobs_lock = threading.Lock()


def _register_job(job_type: str, params: dict[str, Any]) -> str:
    job_id = str(uuid.uuid4())
    with _jobs_lock:
        jobs[job_id] = {
            "id": job_id,
            "status": "running",
            "type": job_type,
            "params": params,
            "log": [],
            "result": None,
            "error": None,
        }
    return job_id


def job_log(job_id: str, message: str) -> None:
    """Append-only progress log (api.py:412, api.py:419), capped so a
    chatty job can't grow without bound."""
    with _jobs_lock:
        log = jobs[job_id]["log"]
        if len(log) < 1000:
            log.append(message)


def submit_job(
    spark: SparkSession,
    job_type: str,
    fn: Callable[[str], dict[str, Any]],
    params: dict[str, Any] | None = None,
) -> str:
    """Run ``fn(job_id)`` on an InheritableThread under a Spark job
    group named by the job id. Per-job error capture mirrors
    api.py:89-91."""
    job_id = _register_job(job_type, params or {})

    def _run() -> None:
        sc = spark.sparkContext
        sc.setJobGroup(job_id, f"{job_type} [{job_id}]", interruptOnCancel=True)
        # Terminal-state rule: a cancelled job stays cancelled. The
        # interrupted worker unwinds through the except arm (or, if fn
        # happened to finish first, the try arm) AFTER cancel_job set
        # status='cancelled' — only transition while still 'running'.
        try:
            result = fn(job_id)
            with _jobs_lock:
                if jobs[job_id]["status"] == "running":
                    jobs[job_id]["status"] = "completed"
                    jobs[job_id]["result"] = result
        except Exception as exc:  # permissive job surface (O4)
            with _jobs_lock:
                if jobs[job_id]["status"] == "running":
                    jobs[job_id]["status"] = "failed"
                    jobs[job_id]["error"] = str(exc)
                jobs[job_id]["log"].append(traceback.format_exc()[-2000:])
        # no clearJobGroup: the property is thread-local and this
        # worker thread ends here (PySpark 4 removed clearJobGroup).
        # Long-lived session hygiene: drop cached intermediates the
        # job left behind (persist + localCheckpoint blocks) — but
        # ONLY when no sibling job is still running, because
        # release_cached is session-wide and would hard-invalidate a
        # concurrent job's checkpointed lineage (session.py WARNING).
        with _jobs_lock:
            others_running = any(
                j["status"] == "running"
                for jid, j in jobs.items()
                if jid != job_id
            )
        if not others_running:
            release_cached(spark)

    InheritableThread(target=_run).start()
    return job_id


def cancel_job(spark: SparkSession, job_id: str) -> bool:
    with _jobs_lock:
        if job_id not in jobs:
            return False
        if jobs[job_id]["status"] == "running":
            jobs[job_id]["status"] = "cancelled"
    spark.sparkContext.cancelJobGroup(job_id)
    return True


def resolve_subdir(output_root: str, subdir: str) -> str:
    """Resolve a client-supplied subdir strictly inside output_root.

    ``os.path.join(root, '../..')`` or an absolute subdir would escape
    the output root entirely (arbitrary listing/download, and writes
    via check_write_access's makedirs). Normalize with realpath and
    require the result to stay under the root.
    """
    root = os.path.realpath(output_root)
    target = os.path.realpath(os.path.join(root, subdir))
    if os.path.commonpath([root, target]) != root:
        raise ValueError(f"subdir escapes output root: {subdir!r}")
    return target


def check_write_access(output_dir: str) -> None:
    """Write-access preflight (api.py:886-897): fail fast before
    launching executors at an unwritable sink."""
    os.makedirs(output_dir, exist_ok=True)
    probe = os.path.join(output_dir, "test_write.txt")
    with open(probe, "w") as fh:
        fh.write("ok")
    os.remove(probe)


def create_app(spark: SparkSession, output_root: str, wiki_adapters=None):
    """Flask app factory. Routes mirror api.py's surface:

    GET  /api/health                 — O6
    GET  /api/jobs                   — O2 (list)
    GET  /api/jobs/<id>              — O2 (status)
    POST /api/jobs/<id>/cancel       — beyond reference (cancellable)
    GET  /api/queries                — beyond reference: registry listing
    GET  /api/explain/<name>         — beyond reference: formatted
                                       physical plan without execution
    POST /api/query/<name>           — beyond reference: run ANY
                                       registered analytics query async
    POST /api/analyze/corpus         — §3.3 flagship (corpus stats)
    POST /api/extract/documents      — §3.1 extract pipeline
    POST /api/extract/parquet        — S5 multipart upload → extract
    POST /api/extract/pdf            — S9 documents → per-doc PDFs
    POST /api/extract/cisi           — S3 CISI upload → markdown sink
                                       (api.py:106-165)
    POST /api/ingest/pdftext         — beyond reference: PDF upload →
                                       text extraction → parquet table
    POST /api/ingest/warc            — beyond reference: WARC upload →
                                       record parse → parquet table
    POST /api/extract/wiki           — S6/S7 category crawl → PDF sink
                                       (api.py:849-979)
    GET  /api/files                  — S11 listing
    GET  /api/files/<name>           — S12 download
    DELETE /api/files                — S13 cleanup (cleanup_wikir.py:22-61)

    Every client-supplied ``subdir`` goes through :func:`resolve_subdir`
    (400 on escape attempts) before touching the filesystem.

    ``wiki_adapters`` injects the crawl's network seam: a zero-arg
    callable returning ``(list_members, fetch_page)``. Defaults to the
    live mwclient/wikipediaapi adapters (503 when those libs are
    absent); tests pass deterministic fakes — same injectable shape as
    sources/wikipedia.py itself.
    """
    import shutil
    import tempfile

    from flask import Flask, jsonify, request, send_from_directory
    from pyspark.sql import functions as F

    from parquet_extractor_spark.functions.text import zero_pad
    from parquet_extractor_spark.operators.analyze import corpus_stats
    from parquet_extractor_spark.operators.extract import (
        extract_any_parquet,
        extract_files,
    )
    from parquet_extractor_spark.functions.text import sanitize_filename
    from parquet_extractor_spark.sinks.markdown import write_files
    from parquet_extractor_spark.sinks.pdf import write_pdfs
    from parquet_extractor_spark.sources.cisi import (
        cisi_to_markdown,
        read_cisi,
    )
    from parquet_extractor_spark.sources.tables import load_table
    from parquet_extractor_spark.sources.wikipedia import (
        WIKI_CRAWL_CATEGORIES,
        crawl_category,
        live_fetch_page,
        live_list_members,
    )

    app = Flask("parquet_extractor_spark")

    def _subdir_or_400(raw: str):
        try:
            return resolve_subdir(output_root, raw), None
        except ValueError as exc:
            return None, (jsonify({"error": str(exc)}), 400)

    def _spool(tmp: str, up, generated: str) -> str:
        """Save an upload under a server-generated spool name.

        Client-supplied multipart filenames are untrusted: a name like
        ``../../x`` (or an absolute path, which os.path.join adopts
        wholesale) would escape the spool dir, and duplicate names
        would silently overwrite each other. The readers never key on
        the name (parquet/CISI get explicit paths; WARC/PDF parsing is
        content-sniffed), so the original name is kept only as job
        metadata by the callers.
        """
        path = os.path.join(tmp, generated)
        up.save(path)
        return path

    @app.get("/api/health")
    def health():
        return jsonify({"status": "ok", "spark_version": spark.version})

    @app.get("/api/jobs")
    def list_jobs():
        with _jobs_lock:
            return jsonify(
                [
                    {k: v for k, v in j.items() if k != "log"}
                    for j in jobs.values()
                ]
            )

    @app.get("/api/jobs/<job_id>")
    def job_status(job_id: str):
        job = jobs.get(job_id)
        if job is None:
            return jsonify({"error": "job not found"}), 404
        return jsonify(job)

    @app.post("/api/jobs/<job_id>/cancel")
    def job_cancel(job_id: str):
        if not cancel_job(spark, job_id):
            return jsonify({"error": "job not found"}), 404
        return jsonify(jobs[job_id])

    @app.get("/api/queries")
    def list_queries():
        try:
            import __spark_entry__ as entrymod
        except ImportError:
            return jsonify({"error": "query registry unavailable"}), 503
        return jsonify(sorted(entrymod.queries()))

    @app.get("/api/explain/<name>")
    def explain_named_query(name: str):
        """Formatted physical plan of any registered query — the
        engine's EXPLAIN face: lets an operator confirm pushdown /
        join strategy / exchange count over REST without executing
        the query's output. Caveat: queries whose plans embed
        data-derived literals (IVF/k-means centroid families) run
        small bounded driver jobs at plan-BUILD time; those run
        synchronously here. Builder failures (bad sf_dir, missing
        table) return 400, not 500."""
        try:
            import __spark_entry__ as entrymod
        except ImportError:
            return jsonify({"error": "query registry unavailable"}), 503
        registry = entrymod.queries()
        if name not in registry:
            return jsonify({"error": f"unknown query '{name}'"}), 404
        sf_dir = request.args.get("sf_dir", "/root/testdata/sf0.001")
        from parquet_extractor_spark.plans.explain import formatted_plan

        try:
            df = registry[name](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as exc:  # surface builder errors as client errors
            return (
                jsonify({"error": f"{type(exc).__name__}: {exc}"[:500]}),
                400,
            )
        # shuffle + broadcast exchanges; ReusedExchange references the
        # same physical exchange, so it must not inflate the count
        n_exchanges = plan.count("Exchange") - plan.count("ReusedExchange")
        return jsonify(
            {
                "query": name,
                "sf_dir": sf_dir,
                "plan": plan,
                "exchanges": n_exchanges,
            }
        )

    @app.post("/api/query/<name>")
    def run_named_query(name: str):
        """Run any registered analytics query as an async job —
        the REST face of the whole queries() registry (dedup, ANN,
        quality, TPC-H, ...), not just the reference's endpoints."""
        try:
            import __spark_entry__ as entrymod
        except ImportError:
            return jsonify({"error": "query registry unavailable"}), 503
        registry = entrymod.queries()
        if name not in registry:
            return jsonify({"error": f"unknown query '{name}'"}), 404
        params = request.get_json(silent=True) or {}
        sf_dir = params.get("sf_dir", "/root/testdata/sf0.001")
        raw = params.get("limit", 20)
        # strict: a JSON integer (bool is an int subclass — reject) or
        # a digit string; fractional/negative/zero limits are errors,
        # not silent truncations
        if isinstance(raw, bool) or not (
            isinstance(raw, int)
            or (isinstance(raw, str) and raw.isdigit())
        ):
            return jsonify({"error": "limit must be a positive integer"}), 400
        limit = int(raw)
        if limit < 1:
            return jsonify({"error": "limit must be a positive integer"}), 400
        limit = min(limit, MAX_QUERY_ROWS)

        def _work(job_id: str) -> dict[str, Any]:
            job_log(job_id, f"running {name} at {sf_dir} (limit {limit})")
            df = registry[name](spark, sf_dir)
            rows = [
                {
                    k: v
                    if isinstance(v, (int, float, bool, str, type(None)))
                    else str(v)
                    for k, v in r.asDict().items()
                }
                for r in df.limit(limit).collect()
            ]
            job_log(job_id, f"returning {len(rows)} rows")
            return {"query": name, "n_rows": len(rows), "rows": rows}

        job_id = submit_job(spark, f"query:{name}", _work, params)
        return jsonify({"job_id": job_id, "status": "running"}), 202

    @app.post("/api/analyze/corpus")
    def analyze_corpus():
        params = request.get_json(silent=True) or {}
        sf_dir = params.get("sf_dir", "/root/testdata/sf0.001")

        def _work(job_id: str) -> dict[str, Any]:
            job_log(job_id, f"analyzing corpus at {sf_dir}")
            row = corpus_stats(spark, sf_dir).first()
            job_log(job_id, "aggregation complete")
            return row.asDict()

        job_id = submit_job(spark, "analyze_corpus", _work, params)
        return jsonify({"job_id": job_id, "status": "running"}), 202

    @app.post("/api/extract/documents")
    def extract_documents():
        params = request.get_json(silent=True) or {}
        sf_dir = params.get("sf_dir", "/root/testdata/sf0.001")
        n = min(int(params.get("num_docs", 100)), MAX_DOCS)
        seed = int(params.get("seed", 42))
        out_dir, err = _subdir_or_400(params.get("subdir", "markdown"))
        if err:
            return err

        def _work(job_id: str) -> dict[str, Any]:
            check_write_access(out_dir)
            job_log(job_id, f"extracting {n} docs from {sf_dir} -> {out_dir}")
            work = extract_files(spark, sf_dir, n=n, seed=seed)
            result = write_files(work, out_dir)
            job_log(job_id, f"wrote {result['written']} files")
            return result

        job_id = submit_job(spark, "extract_documents", _work, params)
        return jsonify({"job_id": job_id, "status": "running"}), 202

    @app.post("/api/extract/parquet")
    def extract_parquet_upload():
        """S5 (api.py:41-104): multipart upload spooled to a temp dir,
        then the arbitrary-schema extract pipeline over it."""
        if "file" not in request.files:
            return jsonify({"error": "no file provided"}), 400
        up = request.files["file"]
        tmp = tempfile.mkdtemp(prefix="upload_")
        path = _spool(tmp, up, "upload.parquet")
        # default batch 1000 (main.py:205), capped like every job input
        n = min(int(request.form.get("num_papers", 1000)), MAX_DOCS)
        seed = int(request.form.get("seed", 42))
        out_dir, err = _subdir_or_400(request.form.get("subdir", "parquet_md"))
        if err:
            shutil.rmtree(tmp, ignore_errors=True)
            return err

        def _work(job_id: str) -> dict[str, Any]:
            try:
                check_write_access(out_dir)
                job_log(job_id, f"extracting {n} rows from upload -> {out_dir}")
                work = extract_any_parquet(spark, path, n=n, seed=seed)
                result = write_files(work, out_dir)
                job_log(job_id, f"wrote {result['written']} files")
                return result
            finally:
                # temp-spool cleanup mirrors api.py:93-94
                shutil.rmtree(tmp, ignore_errors=True)

        job_id = submit_job(
            spark, "extract_parquet", _work, {"num_papers": n, "seed": seed}
        )
        return jsonify({"job_id": job_id, "status": "running"}), 202

    @app.post("/api/extract/pdf")
    def extract_pdf():
        """S9 (api.py:193-383): render per-document PDFs from the
        documents table (the wikir→PDF flow, with the table as the
        corpus source)."""
        params = request.get_json(silent=True) or {}
        sf_dir = params.get("sf_dir", "/root/testdata/sf0.001")
        limit = min(int(params.get("limit", 100)), MAX_DOCS)
        out_dir, err = _subdir_or_400(params.get("subdir", "pdf"))
        if err:
            return err

        def _work(job_id: str) -> dict[str, Any]:
            check_write_access(out_dir)
            job_log(job_id, f"rendering {limit} PDFs from {sf_dir}")
            docs = (
                load_table(spark, sf_dir, "documents")
                .orderBy("doc_id")
                .limit(limit)
            )
            work = docs.select(
                F.concat(zero_pad(F.col("doc_id")), F.lit(".pdf")).alias(
                    "filename"
                ),
                F.concat(
                    F.lit("Document "), F.col("doc_id").cast("string")
                ).alias("title"),
                "doc_id",
                F.col("text").alias("content"),
            )
            result = write_pdfs(work, out_dir)
            job_log(job_id, f"rendered {result['written']} PDFs")
            return result

        job_id = submit_job(spark, "extract_pdf", _work, params)
        return jsonify({"job_id": job_id, "status": "running"}), 202

    @app.post("/api/ingest/pdftext")
    def ingest_pdftext():
        """PDF ingestion face (beyond reference — the read side of the
        S9 sink): one or more PDFs uploaded multipart, spooled to a
        temp dir, extracted by sources/pdf.read_pdf_docs (PERMISSIVE —
        malformed uploads become error rows), written as a parquet
        document table under the outputs subdir. Same spool/cleanup
        contract as the parquet/CISI uploads."""
        ups = request.files.getlist("file")
        if not ups or all(not u.filename for u in ups):
            return jsonify({"error": "no file provided"}), 400
        tmp = tempfile.mkdtemp(prefix="pdftext_")
        # generated spool names; original client names survive only as
        # display metadata, remapped into file_name after the read
        names = {
            f"upload{i}.pdf": (up.filename or f"upload{i}.pdf")
            for i, up in enumerate(ups)
        }
        for i, up in enumerate(ups):
            _spool(tmp, up, f"upload{i}.pdf")
        out_dir, err = _subdir_or_400(request.form.get("subdir", "pdf_docs"))
        if err:
            shutil.rmtree(tmp, ignore_errors=True)
            return err

        def _work(job_id: str) -> dict[str, Any]:
            from parquet_extractor_spark.sources.pdf import read_pdf_docs

            try:
                check_write_access(out_dir)
                job_log(job_id, f"extracting {len(ups)} uploaded PDFs")
                name_map = F.create_map(
                    *[F.lit(x) for kv in names.items() for x in kv]
                )
                docs = (
                    read_pdf_docs(spark, tmp)
                    .withColumn(
                        "file_name",
                        F.coalesce(
                            name_map[F.col("file_name")], F.col("file_name")
                        ),
                    )
                    .persist()
                )
                try:
                    docs.write.mode("overwrite").parquet(out_dir)
                    ok = docs.where(docs.error.isNull()).count()
                    bad = docs.where(docs.error.isNotNull()).count()
                    errors = [
                        {"file": r.file_name, "error": r.error}
                        for r in docs.where(docs.error.isNotNull())
                        .select("file_name", "error")
                        .collect()
                    ]
                finally:
                    docs.unpersist()
                job_log(job_id, f"extracted {ok} PDFs, {bad} errors")
                return {
                    "output_dir": out_dir,
                    "extracted": ok,
                    "errors": bad,
                    "error_files": errors,
                }
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

        job_id = submit_job(
            spark,
            "ingest_pdftext",
            _work,
            {"files": [u.filename for u in ups]},
        )
        return jsonify({"job_id": job_id, "status": "running"}), 202

    @app.post("/api/ingest/warc")
    def ingest_warc():
        """WARC ingestion face (beyond reference — the Common Crawl
        input path): one or more .warc/.warc.gz files uploaded
        multipart, spooled, parsed record-by-record by
        sources/warc.read_warc_docs (PERMISSIVE — corrupt containers
        and payloads become error rows), written as a parquet record
        table under the outputs subdir."""
        ups = request.files.getlist("file")
        if not ups or all(not u.filename for u in ups):
            return jsonify({"error": "no file provided"}), 400
        tmp = tempfile.mkdtemp(prefix="warc_")
        # generated spool names: traversal-proof, collision-proof, and
        # always matched by read_warc_docs' *.warc* glob (a client
        # name like "segment.gz" would otherwise be silently skipped);
        # originals survive as display metadata remapped into path
        names = {
            f"upload{i}.warc": (up.filename or f"upload{i}.warc")
            for i, up in enumerate(ups)
        }
        for i, up in enumerate(ups):
            _spool(tmp, up, f"upload{i}.warc")
        out_dir, err = _subdir_or_400(request.form.get("subdir", "warc_docs"))
        if err:
            shutil.rmtree(tmp, ignore_errors=True)
            return err

        def _work(job_id: str) -> dict[str, Any]:
            from parquet_extractor_spark.sources.warc import read_warc_docs

            try:
                check_write_access(out_dir)
                job_log(job_id, f"parsing {len(ups)} uploaded WARCs")
                name_map = F.create_map(
                    *[F.lit(x) for kv in names.items() for x in kv]
                )
                spool_base = F.element_at(
                    F.split(F.col("path"), "/"), -1
                )
                recs = (
                    read_warc_docs(spark, tmp)
                    .withColumn(
                        "path",
                        F.coalesce(name_map[spool_base], F.col("path")),
                    )
                    .persist()
                )
                try:
                    recs.write.mode("overwrite").parquet(out_dir)
                    ok = recs.where(recs.error.isNull()).count()
                    bad = recs.where(recs.error.isNotNull()).count()
                    docs = recs.where(recs.text.isNotNull()).count()
                finally:
                    recs.unpersist()
                job_log(
                    job_id,
                    f"parsed {ok} records ({docs} documents), {bad} errors",
                )
                return {
                    "output_dir": out_dir,
                    "records": ok,
                    "documents": docs,
                    "errors": bad,
                }
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

        job_id = submit_job(
            spark,
            "ingest_warc",
            _work,
            {"files": [u.filename for u in ups]},
        )
        return jsonify({"job_id": job_id, "status": "running"}), 202

    @app.post("/api/extract/cisi")
    def extract_cisi():
        """S3 face (api.py:106-165): CISI.ALL multipart upload spooled
        to a temp dir → regex split + section-parse pandas_udf →
        file-per-row markdown sink. Same spool/cleanup contract as the
        parquet upload above."""
        if "file" not in request.files:
            return jsonify({"error": "no file provided"}), 400
        up = request.files["file"]
        if not up.filename:
            return jsonify({"error": "no file selected"}), 400
        tmp = tempfile.mkdtemp(prefix="cisi_")
        path = _spool(tmp, up, "upload.cisi")
        out_dir, err = _subdir_or_400(request.form.get("subdir", "cisi_papers"))
        if err:
            shutil.rmtree(tmp, ignore_errors=True)
            return err

        def _work(job_id: str) -> dict[str, Any]:
            try:
                check_write_access(out_dir)
                job_log(job_id, f"parsing CISI upload -> {out_dir}")
                work = cisi_to_markdown(read_cisi(spark, path))
                result = write_files(work, out_dir)
                job_log(job_id, f"wrote {result['written']} files")
                result["file_count"] = len(os.listdir(out_dir))
                return result
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

        job_id = submit_job(
            spark, "cisi", _work, {"file": up.filename, "subdir": out_dir}
        )
        return jsonify({"job_id": job_id, "status": "running"}), 202

    @app.post("/api/extract/wiki")
    def extract_wiki():
        """S6/S7 face (api.py:849-979, the ww2 route generalized):
        category crawl (driver-side member listing, rate-limited
        executor-side page fetch) → file-per-row PDF sink. The network
        seam comes from create_app's ``wiki_adapters``; without an
        injection and without the live libs installed this returns
        503 instead of launching a doomed job."""
        params = request.get_json(silent=True) or {}
        categories = params.get("categories") or WIKI_CRAWL_CATEGORIES
        limit = min(int(params.get("limit", 200)), MAX_CRAWL_ARTICLES)
        delay_s = float(params.get("delay_s", 1.0))
        out_dir, err = _subdir_or_400(params.get("subdir", "wiki_pdf"))
        if err:
            return err
        try:
            if wiki_adapters is not None:
                list_members, fetch_page = wiki_adapters()
            else:
                list_members = live_list_members()
                fetch_page = live_fetch_page()
        except ImportError as exc:
            return jsonify({"error": f"wiki adapters unavailable: {exc}"}), 503

        def _work(job_id: str) -> dict[str, Any]:
            check_write_access(out_dir)
            job_log(
                job_id,
                f"crawling {len(categories)} categories (limit {limit})",
            )
            pages = crawl_category(
                spark, categories, list_members, fetch_page,
                limit=limit, delay_s=delay_s,
            )
            work = pages.select(
                F.concat(
                    sanitize_filename(F.col("title")), F.lit(".pdf")
                ).alias("filename"),
                F.col("title").alias("title"),
                F.col("title").alias("doc_id"),
                F.col("text").alias("content"),
            )
            result = write_pdfs(work, out_dir)
            job_log(job_id, f"rendered {result['written']} PDFs")
            result["file_count"] = len(os.listdir(out_dir))
            return result

        job_id = submit_job(
            spark,
            "wiki_crawl",
            _work,
            {"categories": categories, "limit": limit, "subdir": out_dir},
        )
        return jsonify({"job_id": job_id, "status": "running"}), 202

    @app.get("/api/files")
    def list_files():
        target, err = _subdir_or_400(request.args.get("subdir", "markdown"))
        if err:
            return err
        if not os.path.isdir(target):
            return jsonify({"files": [], "count": 0})
        names = sorted(os.listdir(target))
        return jsonify(
            {
                "files": [
                    {
                        "name": n,
                        "size": os.path.getsize(os.path.join(target, n)),
                    }
                    for n in names[:1000]
                ],
                "count": len(names),
            }
        )

    @app.get("/api/files/<path:name>")
    def download_file(name: str):
        target, err = _subdir_or_400(request.args.get("subdir", "markdown"))
        if err:
            return err
        return send_from_directory(target, name)

    @app.delete("/api/files")
    def cleanup_files():
        """S13 cleanup (reference cleanup_wikir.py:22-61): delete a
        subdir's files with size accounting. Driver-side os walk — the
        output root is a driver-local staging area; at cluster scale
        outputs live in object storage and cleanup is a lifecycle rule.
        """
        target, err = _subdir_or_400(request.args.get("subdir", "markdown"))
        if err:
            return err
        if os.path.realpath(target) == os.path.realpath(output_root):
            return jsonify({"error": "refusing to delete output root"}), 400
        deleted, bytes_freed = 0, 0
        if os.path.isdir(target):
            for root, _dirs, names in os.walk(target, topdown=False):
                for n in names:
                    p = os.path.join(root, n)
                    bytes_freed += os.path.getsize(p)
                    os.remove(p)
                    deleted += 1
            shutil.rmtree(target, ignore_errors=True)
        return jsonify({"deleted": deleted, "bytes_freed": bytes_freed})

    return app
