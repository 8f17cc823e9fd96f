from vspace_spark.operators.stats import (  # noqa: F401
    build_vocabulary,
    compute_stats,
    doc_term_frequencies,
    term_stats,
    tokenized_documents,
)
