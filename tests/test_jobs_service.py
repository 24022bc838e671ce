import time

import pytest

flask = pytest.importorskip("flask")

from parquet_extractor_spark.jobs.service import create_app, jobs  # noqa: E402


@pytest.fixture()
def client(spark, tmp_path):
    app = create_app(spark, str(tmp_path))
    app.config["TESTING"] = True
    return app.test_client()


def _wait_for(client, job_id, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline:
        job = client.get(f"/api/jobs/{job_id}").get_json()
        if job["status"] in ("completed", "failed", "cancelled"):
            return job
        time.sleep(0.2)  # polling client pattern (api_client.py:174-182)
    raise TimeoutError(f"job {job_id} still running")


def test_health(client, spark):
    body = client.get("/api/health").get_json()
    assert body["status"] == "ok"
    assert body["spark_version"] == spark.version


def test_analyze_job_lifecycle(client):
    resp = client.post("/api/analyze/corpus", json={})
    assert resp.status_code == 202
    job_id = resp.get_json()["job_id"]
    job = _wait_for(client, job_id)
    assert job["status"] == "completed"
    assert job["result"]["document_count"] == 500
    assert any("analyzing corpus" in line for line in job["log"])


def test_extract_job_writes_files_and_lists_them(client):
    resp = client.post(
        "/api/extract/documents", json={"num_docs": 12, "subdir": "mdtest"}
    )
    job = _wait_for(client, resp.get_json()["job_id"])
    assert job["status"] == "completed"
    assert job["result"]["written"] == 12

    listing = client.get("/api/files?subdir=mdtest").get_json()
    assert listing["count"] == 12
    assert all(f["size"] > 0 for f in listing["files"])

    name = listing["files"][0]["name"]
    download = client.get(f"/api/files/{name}?subdir=mdtest")
    assert download.status_code == 200
    assert download.data.startswith(b"---\n")


def test_failed_job_reports_error(client):
    resp = client.post("/api/analyze/corpus", json={"sf_dir": "/nonexistent"})
    job = _wait_for(client, resp.get_json()["job_id"])
    assert job["status"] == "failed"
    assert job["error"]


def test_unknown_job_404(client):
    assert client.get("/api/jobs/nope").status_code == 404


def test_job_listing_excludes_log(client):
    listing = client.get("/api/jobs").get_json()
    assert len(listing) >= 1
    assert all("log" not in j for j in listing)
