"""vspace_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference engine
``sriramb12/vspace`` (a PySpark 2.4 vector-space-model corpus-statistics
pipeline, see SURVEY.md), re-expressed Spark-first for Spark 3.x/4.x:

- DataFrame/SQL declarative plans everywhere; zero RDD in the hot path.
- The reference's driver-collected DAWG broadcast lookup
  (reference: vspace/lookups/dawg.py:47-206) is replaced by a broadcast
  left-semi join — Catalyst handles distribution.
- Python logic that the reference ran as row-at-a-time RDD lambdas
  (reference: vspace/pipelines/base.py:181-185) is either pure built-in
  column expressions (whole-stage codegen) or Arrow-vectorized pandas
  UDFs.

Subpackages
-----------
- ``io``         sources (parquet/CSV/text/corpus) and sinks
- ``functions``  scalar/text/vector column-expression builders
- ``operators``  composable DataFrame-in/DataFrame-out operators
- ``plans``      plan-inspection helpers (pushdown/broadcast assertions)
- ``streaming``  Structured Streaming operators over the events table
- ``pipelines``  config-driven end-to-end jobs (reference CLI parity)
"""

__version__ = "0.1.0"

from vspace_spark.session import get_spark  # noqa: F401
