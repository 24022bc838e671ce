"""Polling job client (SURVEY §2.10 O5, api_client.py:1-274).

The reference ships a CLI client that submits a job and polls
``GET /api/jobs/{id}`` every 2 seconds until it reaches a terminal
state (api_client.py:174-182). Same pattern here, stdlib-only
(urllib), usable against ``jobs.service.create_app``.
"""

from __future__ import annotations

import json
import time
import urllib.parse
import urllib.request
from typing import Any

POLL_INTERVAL_S = 2.0  # api_client.py:182
TERMINAL_STATES = frozenset({"completed", "failed", "cancelled"})


class JobClient:
    def __init__(self, base_url: str = "http://localhost:5000"):
        self.base_url = base_url.rstrip("/")

    def _get(self, path: str) -> dict[str, Any]:
        with urllib.request.urlopen(self.base_url + path) as resp:
            return json.loads(resp.read())

    def _post(self, path: str, payload: dict[str, Any] | None = None) -> dict[str, Any]:
        data = json.dumps(payload or {}).encode()
        req = urllib.request.Request(
            self.base_url + path,
            data=data,
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    def health(self) -> dict[str, Any]:
        return self._get("/api/health")

    def submit(self, endpoint: str, params: dict[str, Any] | None = None) -> str:
        """POST a job endpoint (e.g. '/api/analyze/corpus'); returns job id."""
        return self._post(endpoint, params)["job_id"]

    def status(self, job_id: str) -> dict[str, Any]:
        return self._get(f"/api/jobs/{job_id}")

    def wait(
        self,
        job_id: str,
        timeout_s: float = 600.0,
        poll_interval_s: float | None = None,
    ) -> dict[str, Any]:
        """Poll until the job reaches a terminal state (the reference's
        2-second loop, api_client.py:174-182) or the timeout lapses.
        The interval default resolves at CALL time so tests (and
        callers) can adjust the module constant."""
        if poll_interval_s is None:
            poll_interval_s = POLL_INTERVAL_S  # module global: call-time lookup
        deadline = time.time() + timeout_s
        while True:
            job = self.status(job_id)
            if job.get("status") in TERMINAL_STATES:
                return job
            if time.time() >= deadline:
                raise TimeoutError(f"job {job_id} still {job.get('status')}")
            time.sleep(poll_interval_s)

    def run(self, endpoint: str, params: dict[str, Any] | None = None) -> dict[str, Any]:
        """submit + wait, returning the terminal job record."""
        return self.wait(self.submit(endpoint, params))

    def list_files(self, subdir: str = "markdown") -> dict[str, Any]:
        return self._get(f"/api/files?subdir={urllib.parse.quote(subdir)}")

    def run_query(
        self,
        name: str,
        sf_dir: str | None = None,
        limit: int = 20,
        timeout_s: float = 600.0,
    ) -> dict[str, Any]:
        """Run a registered analytics query (POST /api/query/<name>)
        and wait for its terminal job record."""
        params: dict[str, Any] = {"limit": limit}
        if sf_dir is not None:
            params["sf_dir"] = sf_dir
        quoted = urllib.parse.quote(name, safe="")
        return self.wait(
            self.submit(f"/api/query/{quoted}", params), timeout_s
        )

    def queries(self) -> list[str]:
        """List the registered analytics queries (GET /api/queries)."""
        return list(self._get("/api/queries"))
