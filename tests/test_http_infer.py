"""http_infer against a local stub HTTP server: happy path, retry on
5xx/timeouts, immediate failure on 4xx and contract violations, and
the full Spark batch-inference integration.

Mirrors the failure surface of the reference's HTTP LLM client
(``/root/reference/src/llm/client.py:23-60``).
"""

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from credit_ocr_system_spark.operators.llm_infer import (
    http_infer,
    llm_batch_infer,
)


class _StubHandler(BaseHTTPRequestHandler):
    """Behavior keyed by path; shared mutable state on the server."""

    def log_message(self, *args):  # silence
        pass

    def do_POST(self):
        srv = self.server
        srv.n_requests += 1
        prompts = json.loads(
            self.rfile.read(int(self.headers["Content-Length"])))["prompts"]
        path = self.path
        if path == "/flaky" and srv.n_requests <= 2:
            self.send_error(503, "warming up")
            return
        if path == "/bad400":
            self.send_error(400, "nope")
            return
        if path == "/slow":
            time.sleep(1.0)
        if path == "/short":
            responses = [f"R:{len(p)}" for p in prompts][:-1]
        else:
            responses = [f"R:{len(p)}" for p in prompts]
        body = json.dumps({"responses": responses}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def stub_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    srv.n_requests = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _url(srv, path: str) -> str:
    return f"http://127.0.0.1:{srv.server_address[1]}{path}"


def test_happy_path(stub_server):
    infer = http_infer(_url(stub_server, "/ok"), timeout=5)
    assert infer(["abc", "defgh"]) == ["R:3", "R:5"]


def test_retries_recover_from_5xx(stub_server):
    stub_server.n_requests = 0
    infer = http_infer(_url(stub_server, "/flaky"), timeout=5,
                       retries=3, backoff=0.01)
    assert infer(["xy"]) == ["R:2"]
    assert stub_server.n_requests == 3  # two 503s then success


def test_4xx_fails_immediately_without_retry(stub_server):
    stub_server.n_requests = 0
    infer = http_infer(_url(stub_server, "/bad400"), timeout=5,
                       retries=3, backoff=0.01)
    with pytest.raises(RuntimeError, match="HTTP 400"):
        infer(["x"])
    assert stub_server.n_requests == 1


def test_short_response_is_contract_violation_no_retry(stub_server):
    stub_server.n_requests = 0
    infer = http_infer(_url(stub_server, "/short"), timeout=5,
                       retries=3, backoff=0.01)
    with pytest.raises(RuntimeError, match="1 responses for 2 prompts"):
        infer(["a", "b"])
    assert stub_server.n_requests == 1


def test_timeout_exhausts_retries(stub_server):
    stub_server.n_requests = 0
    infer = http_infer(_url(stub_server, "/slow"), timeout=0.2,
                       retries=2, backoff=0.01)
    with pytest.raises(RuntimeError, match="3 attempts failed"):
        infer(["x"])
    assert stub_server.n_requests == 3


def test_unreachable_endpoint_raises_after_retries():
    infer = http_infer("http://127.0.0.1:9/none", timeout=0.5,
                       retries=1, backoff=0.01)
    with pytest.raises(RuntimeError, match="2 attempts failed"):
        infer(["x"])


def test_spark_batch_inference_through_http(spark, stub_server):
    """End-to-end: the closure ships to executors; one POST per batch."""
    stub_server.n_requests = 0
    prompts = spark.createDataFrame(
        [(f"u{i}", "p" * (i + 1)) for i in range(20)],
        "url string, prompt string").repartition(2)
    out = llm_batch_infer(
        prompts, infer_fn=http_infer(_url(stub_server, "/ok"), timeout=10),
        batch_size=6).collect()
    assert len(out) == 20
    assert all(r.response == f"R:{len('p' * (int(r.url[1:]) + 1))}"
               for r in out)
    # 20 rows over 2 partitions in batches of <=6 → 4 total calls
    assert stub_server.n_requests == 4
