"""credit_ocr_system_spark — a PySpark-native batch extraction engine.

A from-scratch re-expression of the capabilities of
markuskuehnle/credit-ocr-system (FastAPI + Celery + EasyOCR + LLM
microservice pipeline) as a pure batch transform over a table of
Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``:

* a vectorized Arrow/pandas kernel stage parses each payload (HTML
  boilerplate-strip or PDF-style token layout), reconstructs reading
  order, detects rows, merges split fragments, and emits label/value
  pairs — reproducing the reference's layout semantics
  (``src/ocr/spatial_analysis.py``, ``src/ocr/label_value_extraction.py``,
  ``src/ocr/postprocess.py``) byte-for-byte on its golden fixtures;
* the relational tail (field matching, cleaning, validation, metrics)
  is expressed natively in pyspark.sql DataFrame operations with
  broadcast joins and window functions — no per-row Python;
* explicit salted repartitioning, per-partition lineage + metrics
  sidecar, and snapshot-idempotent resume make the job safe at
  10^12-document scale.
"""

__version__ = "0.1.0"
