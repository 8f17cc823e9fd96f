from vspace_spark.pipelines.corpus_job import JobConfig, run_job  # noqa: F401
