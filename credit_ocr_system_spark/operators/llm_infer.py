"""Batched-LLM-inference orchestration as an operator shape (U2).

The reference called an LLM per document (prompt build →
aiohttp-to-Ollama with a 120 s timeout → JSON-response parse,
``/root/reference/src/llm/field_extractor.py:90-193``,
``src/llm/client.py:40``) and then *overrode* the answers with
deterministic candidate-label matching. This engine keeps the
deterministic matcher as the extraction path (SURVEY §2.6 U2) — but a
100 TB training-data pipeline still needs the *orchestration shape*
for batched model calls (labeling, scoring, augmentation), so that
shape is a first-class, tested operator here:

* ``build_prompts`` — native DataFrame op (no Python): assembles the
  reference-style prompt per document from its extracted pairs, in
  pinned ``pair_idx`` order, so the string is engine-portable and
  oracle-checkable;
* ``llm_batch_infer`` — the Arrow iterator UDF that owns batching:
  accumulates up to ``batch_size`` prompts, calls ``infer_fn`` once
  per batch (amortizing connection/model setup exactly like the
  extraction kernel amortizes parser setup), and emits per-row
  responses with per-batch latency for the lineage sidecar. The model
  is behind the ``infer_fn`` seam: real deployments plug an HTTP
  client with retry/timeout here (the reference used total=120 s);
  the default ``fake_infer`` is a deterministic stand-in whose output
  is a *pure SQL-expressible function of the prompt* (md5 + length),
  so the whole pipeline — prompt → batched call → response parse —
  is oracle-checked end-to-end without pretending a model ran;
* ``parse_llm_response`` — native ops: strip the code fence and
  ``//`` comments the reference's parser stripped
  (``field_extractor.py:53-87``) and ``from_json`` the rest.

Scale notes: batch_size bounds per-call payload (prompts are KB-sized
strings; 64 per call ≈ a few hundred KB per request); the stage is
map-only — no shuffle — so inference throughput scales linearly with
executors and a slow/straggling model endpoint only stalls its own
partition.
"""

from __future__ import annotations

import hashlib
import time
from typing import Callable, Iterator, List

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config.document_types import EXPECTED_FIELD_NAMES

PROMPT_HEADER = (
    "Extract the following fields from this credit request document.\n"
    "Fields: " + ", ".join(EXPECTED_FIELD_NAMES) + "\nDocument:\n")
PROMPT_FOOTER = "\nRespond with a single JSON object."

FAKE_MODEL_TAG = "model=fake-det-1"


def build_prompts(extracted: DataFrame) -> DataFrame:
    """(url, prompt, n_pairs) — one prompt per document with ≥1 pair.

    Document lines are ``label: value`` in emission (pair_idx) order,
    pinned via ``array_sort`` on (pair_idx, line) structs — a bare
    ``collect_list`` has partition-dependent order.
    """
    pairs = extracted.select("url", F.explode("pairs").alias("p"))
    line = F.concat(F.col("p.label"), F.lit(": "), F.col("p.value"))
    return (
        pairs
        .withColumn("ln", F.struct(F.col("p.pair_idx").alias("pair_idx"),
                                   line.alias("line")))
        .groupBy("url")
        .agg(F.count("*").alias("n_pairs"),
             F.concat_ws("\n", F.transform(
                 F.array_sort(F.collect_list("ln")),
                 lambda s: s["line"])).alias("body"))
        .select(
            "url",
            F.concat(F.lit(PROMPT_HEADER), F.col("body"),
                     F.lit(PROMPT_FOOTER)).alias("prompt"),
            "n_pairs")
    )


def fake_infer(prompts: List[str]) -> List[str]:
    """Deterministic inference stand-in: the response is a pure
    function of the prompt (md5 + char count), wrapped in the code
    fence + trailing ``//`` comment dirt the reference's LLM emitted —
    so the parse stage is exercised and a SQL oracle can recompute
    the response exactly."""
    return [
        ('```json\n{"prompt_md5": "'
         + hashlib.md5(p.encode("utf-8")).hexdigest()
         + f'", "prompt_chars": {len(p)}}} // {FAKE_MODEL_TAG}\n```')
        for p in prompts
    ]


RESPONSES_SCHEMA = ("url string, response string, part_id int, "
                    "batch_idx int, batch_size int, "
                    "batch_latency_us bigint")

_PA_RESPONSES = pa.schema([
    ("url", pa.string()), ("response", pa.string()),
    ("part_id", pa.int32()), ("batch_idx", pa.int32()),
    ("batch_size", pa.int32()), ("batch_latency_us", pa.int64()),
])


def llm_batch_infer(prompts: DataFrame,
                    infer_fn: Callable[[List[str]], List[str]] = fake_infer,
                    batch_size: int = 64) -> DataFrame:
    """Batched inference over (url, prompt): accumulate ≤ batch_size
    prompts, one ``infer_fn`` call per batch, flatten responses back
    row-aligned. ``batch_idx``/``batch_latency_us`` surface the
    orchestration (how many calls, how slow) to the lineage sidecar;
    ``batch_idx`` restarts at 0 in each task, so the globally unique
    batch key a consumer should group on is ``(part_id, batch_idx)``
    (``part_id`` = ``spark_partition_id()``, stamped below).
    """
    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pending_urls: List[str] = []
        pending_prompts: List[str] = []
        part_id = -1
        batch_idx = 0

        def flush():
            nonlocal batch_idx
            if not pending_prompts:
                return None
            t0 = time.perf_counter_ns()
            responses = infer_fn(list(pending_prompts))
            if len(responses) != len(pending_prompts):
                raise RuntimeError(
                    f"infer_fn returned {len(responses)} responses for "
                    f"{len(pending_prompts)} prompts")
            latency = (time.perf_counter_ns() - t0) // 1000
            out = pa.RecordBatch.from_pylist([
                {"url": u, "response": r, "part_id": part_id,
                 "batch_idx": batch_idx, "batch_size": len(responses),
                 "batch_latency_us": latency}
                for u, r in zip(pending_urls, responses)
            ], schema=_PA_RESPONSES)
            batch_idx += 1
            pending_urls.clear()
            pending_prompts.clear()
            return out

        for arrow_batch in batches:
            pids = arrow_batch.column("part_id").to_pylist()
            if pids:
                part_id = pids[0]
            for u, p in zip(arrow_batch.column("url").to_pylist(),
                            arrow_batch.column("prompt").to_pylist()):
                pending_urls.append(u)
                pending_prompts.append(p)
                if len(pending_prompts) >= batch_size:
                    yield flush()
        tail = flush()
        if tail is not None:
            yield tail

    return prompts.select(
        "url", "prompt", F.spark_partition_id().alias("part_id")
    ).mapInArrow(run, schema=RESPONSES_SCHEMA)


def http_infer(endpoint: str, timeout: float = 120.0, retries: int = 3,
               backoff: float = 0.2,
               headers: dict | None = None
               ) -> Callable[[List[str]], List[str]]:
    """Real HTTP ``infer_fn`` for the :func:`llm_batch_infer` seam.

    The production counterpart of the reference's Ollama client
    (``/root/reference/src/llm/client.py:23-60`` — aiohttp POST with a
    120 s total timeout): one JSON POST per batch
    (``{"prompts": [...]}`` → ``{"responses": [...]}``), stdlib-only
    (``urllib``) so executors need no extra deps.

    Failure policy:

    * transient faults (connection errors, timeouts, HTTP 5xx) retry
      up to ``retries`` times with exponential backoff — a flaky
      endpoint costs latency, not a failed Spark task;
    * non-transient faults (HTTP 4xx, malformed/mis-sized response
      bodies) raise immediately: retrying a deterministic server bug
      would just burn the timeout budget ``retries`` times and then
      fail anyway.

    The returned closure is serialized to executors by Spark; it holds
    only plain config values.
    """
    import json as _json
    import urllib.error
    import urllib.request

    def infer(prompts: List[str]) -> List[str]:
        body = _json.dumps({"prompts": prompts}).encode("utf-8")
        hdrs = {"Content-Type": "application/json", **(headers or {})}
        last_err: Exception | None = None
        for attempt in range(retries + 1):
            try:
                req = urllib.request.Request(
                    endpoint, data=body, headers=hdrs, method="POST")
                with urllib.request.urlopen(req, timeout=timeout) as r:
                    payload = _json.loads(r.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                if e.code < 500:
                    raise RuntimeError(
                        f"http_infer: endpoint rejected batch "
                        f"(HTTP {e.code})") from e
                last_err = e
            except (urllib.error.URLError, TimeoutError, OSError) as e:
                last_err = e
            else:
                responses = payload.get("responses")
                if (not isinstance(responses, list)
                        or len(responses) != len(prompts)):
                    raise RuntimeError(
                        f"http_infer: endpoint returned "
                        f"{len(responses) if isinstance(responses, list) else type(responses).__name__}"
                        f" responses for {len(prompts)} prompts")
                return [str(x) for x in responses]
            if attempt < retries:
                time.sleep(backoff * (2 ** attempt))
        raise RuntimeError(
            f"http_infer: {retries + 1} attempts failed; "
            f"last error: {last_err}") from last_err

    return infer


def parse_llm_response(responses: DataFrame) -> DataFrame:
    """Fence/comment strip + JSON parse — the reference's response
    cleanup (``field_extractor.py:53-87``) as column expressions.

    Bug-compatible by design: the reference truncates every line at
    its first ``//`` (``field_extractor.py:76-79``), which corrupts
    JSON string values containing ``//`` (URLs). This operator
    reproduces that exactly — parity with the reference is the
    contract. A deployment whose model emits URLs should swap the
    comment-strip for a JSON5 lexer at this seam (and accept the
    divergence from the reference's parses).
    """
    unfenced = F.regexp_replace(
        F.col("response"), r"(?s)^```[^\n]*\n(.*?)\n?```.*$", "$1")
    uncommented = F.regexp_replace(unfenced, r"//[^\n]*", "")
    parsed = F.from_json(
        uncommented, "prompt_md5 STRING, prompt_chars INT")
    return responses.select(
        "url", "response",
        parsed["prompt_md5"].alias("prompt_md5"),
        parsed["prompt_chars"].alias("prompt_chars"),
    )
