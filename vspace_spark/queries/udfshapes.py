"""The remaining sanctioned UDF shapes (SURVEY.md §2.12 'UDF surface'):
a Python UDTF (table function) and a grouped-map ``applyInPandas`` —
each with an exact oracle, each self-contained for executor pickling
(see the worker-pickling note in operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vspace_spark.io.tables import load_table
from vspace_spark.queries import query


@query(
    "udtf_token_chunks",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (SELECT doc_id, toks, unnest(range((len(toks) + 9) // 10)) AS chunk_idx
      FROM t)
SELECT doc_id, chunk_idx::INT AS chunk_idx,
       array_to_string(toks[chunk_idx * 10 + 1 : chunk_idx * 10 + 10], ' ')
           AS chunk
FROM c
""",
)
def udtf_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (PySpark 3.5+ ``@udtf``): split each document into
    10-token chunks — one input row → many output rows, the
    table-function contract (the training-data chunking primitive).

    Arrow evaluation is enabled explicitly: the default UDTF
    evaluator is row-at-a-time BatchEvalPython (pickle per row — the
    slow path the repo bans; tests/test_plans.py audits every plan
    for it), Arrow batches it. Set here rather than in the session
    factory so the query carries its requirement under any vanilla
    session."""
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, chunk string")
    class ChunkTokens:
        def eval(self, doc_id: int, text: str):  # noqa: D401
            toks = text.split(" ")
            for i in range(0, len(toks), 10):
                yield doc_id, i // 10, " ".join(toks[i : i + 10])

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("chunk_tokens", ChunkTokens)
    return spark.sql(
        "SELECT c.* FROM _udtf_docs, "
        "LATERAL chunk_tokens(doc_id, text) AS c"
    )


@query(
    "grouped_map_source_ranks",
    oracle="""
SELECT doc_id, source,
       (row_number() OVER (PARTITION BY source
                           ORDER BY n_chars DESC, doc_id))::INT AS size_rank
FROM documents
""",
)
def grouped_map_source_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: whole-group pandas DataFrame in /
    out (per-source size ranking — integer output, so exact vs the
    window oracle). The escape hatch for per-group logic that window
    functions can't express (model scoring, per-group fitting)."""

    def rank_group(pdf):
        import pandas as _pd  # self-contained for worker pickling

        pdf = pdf.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["size_rank"] = _pd.RangeIndex(1, len(pdf) + 1).astype("int32")
        return pdf[["doc_id", "source", "size_rank"]]

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return docs.groupBy("source").applyInPandas(
        rank_group, "doc_id long, source string, size_rank int"
    )


@query(
    "map_functions_suite",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
ex AS (SELECT doc_id, unnest(toks) AS tok FROM t),
hist AS (SELECT doc_id, tok, count(*) AS tf FROM ex GROUP BY ALL),
agg AS (SELECT doc_id,
               count(*) AS n_keys,
               sum(CASE WHEN tf >= 3 THEN 1 ELSE 0 END) AS n_frequent,
               max(len(tok) * tf) AS max_weight
        FROM hist GROUP BY doc_id)
SELECT doc_id, n_keys::INT AS n_keys, n_frequent::INT AS n_frequent,
       max_weight::INT AS max_weight
FROM agg
""",
)
def map_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions over the per-doc histogram map
    (corpus_histograms): map_keys / map_filter / transform_values /
    map_zip-style weighting — the MapType surface the reference's
    token_counts column implies (SURVEY.md §1.1)."""
    from vspace_spark.operators.stats import corpus_histograms

    hist = corpus_histograms(load_table(spark, sf_dir, "documents"))
    m = F.col("token_counts")
    weights = F.transform_values(
        m, lambda k, v: F.length(k) * v.cast("int")
    )
    return hist.select(
        "doc_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.size(
            F.map_keys(F.map_filter(m, lambda k, v: v >= 3))
        ).alias("n_frequent"),
        F.array_max(F.map_values(weights)).cast("int").alias("max_weight"),
    )
