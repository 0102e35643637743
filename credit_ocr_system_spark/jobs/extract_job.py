"""spark-submit entry point for the extraction job (north_rule packaging).

Cluster usage::

    python -c "from credit_ocr_system_spark.session import \\
               make_pyfiles_zip; print(make_pyfiles_zip())"
    spark-submit --py-files /tmp/credit_ocr_system_spark-<ver>.zip \\
        credit_ocr_system_spark/jobs/extract_job.py \\
        --input  <pages table path / iceberg table> \\
        --output <output root> \\
        [--partitions 4096] [--salt 1234] [--synthetic-pages N]

Local smoke::

    spark-submit jobs/extract_job.py --synthetic-pages 500 \\
        --output /tmp/out   # py-files zip is auto-shipped in-session

The job is restart-safe: re-submitting with the same ``--output``
resumes from the last committed snapshot (left-anti join on committed
urls) and never duplicates a document.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Self-bootstrap when executed as a script (spark-submit passes the
# file path, not the module): the repo root is three levels up.
if __package__ in (None, ""):
    _root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if _root not in sys.path:
        sys.path.insert(0, _root)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="batch extraction job")
    ap.add_argument("--input", help="pages parquet path (url, warc_ts, "
                                    "html, text, lang)")
    ap.add_argument("--synthetic-pages", type=int, default=0,
                    help="generate N deterministic pages instead of "
                         "reading --input (smoke/bench mode)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--salt", type=int, default=None)
    args = ap.parse_args(argv)

    from credit_ocr_system_spark.plans.pipeline import (
        SALT_DEFAULT,
        run_extraction_job,
    )
    from credit_ocr_system_spark.session import build_session
    from credit_ocr_system_spark.sources.pages import pages_df

    spark = build_session(app_name="cos-extract-job")
    if args.synthetic_pages:
        pages = pages_df(spark, args.synthetic_pages)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthetic-pages is required")

    stats = run_extraction_job(
        spark, pages, args.output,
        num_partitions=args.partitions,
        salt=args.salt if args.salt is not None else SALT_DEFAULT)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
