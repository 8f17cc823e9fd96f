#!/usr/bin/env python
"""CLI entrypoint: ``spark-submit bin/vspace-main.py job.conf`` — the
reference's launch surface (reference: bin/vspace-main.py:14-50,
README.md:41-53), minus its load-test stub (the shipped reference
entrypoint slept instead of calling main, SURVEY.md §1.4 quirk 6; this
one runs the job)."""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    parser = argparse.ArgumentParser(description="vspace_spark corpus job")
    parser.add_argument("config", help="INI job config path")
    parser.add_argument("--log-level", default="INFO")
    args = parser.parse_args()

    logging.basicConfig(
        level=args.log_level,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )

    from vspace_spark.pipelines.corpus_job import JobConfig, run_job
    from vspace_spark.session import get_spark

    config = JobConfig.from_ini(args.config)
    spark = get_spark("vspace-job")
    try:
        outputs = run_job(spark, config)
        for name, path in outputs.items():
            logging.info("wrote %s -> %s", name, path)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
