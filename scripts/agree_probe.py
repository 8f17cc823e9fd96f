"""Round-11 probe: measure fast-twin vs portable-twin disagreement at
sf0.01 (the driver's correctness SF) before registering the oracled
agreement queries (VERDICT r10 #3). If a pair shows exact 0 output
disagreement, the query can carry a `SELECT 0` oracle; otherwise the
query must gate on invariants that ARE exact."""
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .appName("agree-probe")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from vspace_spark.io.tables import load_table  # noqa: E402

emb = load_table(spark, SF, "embeddings")
n = emb.count()
print("embeddings:", n)


def diff_count(a, b):
    return a.exceptAll(b).unionByName(b.exceptAll(a)).count()


t0 = time.time()
# 1. brute force fold vs arrow
from vspace_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    brute_force_topk_arrow,
    ivf_pq_encode_arrow,
    ivf_pq_probe_arrow,
    ivf_pq_topk,
    pq_codebook,
    portable_hyperplanes,
)

q = emb.filter(F.col("vec_id") < 10)
d1 = diff_count(brute_force_topk(q, emb, k=5), brute_force_topk_arrow(q, emb, k=5))
print("bruteforce fold-vs-arrow diff:", d1, f"{time.time()-t0:.1f}s")

t0 = time.time()
pc = pq_codebook(emb)
pc_rows = [(r["sub"], r["cid"], list(r["pv"])) for r in pc.collect()]
index = ivf_pq_encode_arrow(emb, pc_rows=pc_rows)
d2 = diff_count(
    ivf_pq_topk(q, emb, k=5), ivf_pq_probe_arrow(q, index, pc_rows, k=5)
)
print("ivf_pq relational-vs-arrow diff:", d2, f"{time.time()-t0:.1f}s")

t0 = time.time()
from vspace_spark.operators.dedup import (  # noqa: E402
    hierarchical_codebook,
    semantic_dedup,
    semantic_dedup_two_level,
)
from vspace_spark.operators.scale import footer_row_count  # noqa: E402

k = max(16, n // 512)
centers = portable_hyperplanes(64, k, salt="s")
d3 = diff_count(
    semantic_dedup(emb, centers, threshold=0.4, engine="fold"),
    semantic_dedup(emb, centers, threshold=0.4, engine="arrow"),
)
print("semantic fold-vs-arrow diff:", d3, f"{time.time()-t0:.1f}s")

t0 = time.time()
fine, coarse, owner = hierarchical_codebook(emb, k)
flat = semantic_dedup(emb, fine, threshold=0.4, engine="arrow")
two = semantic_dedup(
    emb, fine, threshold=0.4, engine="arrow", coarse=(coarse, owner)
)
d4 = diff_count(flat, two)
print("semantic trained flat-vs-two-level diff:", d4, f"{time.time()-t0:.1f}s")

# structural invariants of the trained lane (exact by construction?)
t0 = time.time()
out = semantic_dedup_two_level(emb, k=k, threshold=0.4)
viol = out.filter(
    (F.col("kept") != F.col("duplicate_of").isNull())
    | (F.col("duplicate_of") >= F.col("vec_id"))
).count()
rows = out.count()
print("two_level invariant violations:", viol, "rows:", rows, "N:", n,
      f"{time.time()-t0:.1f}s")
spark.stop()
