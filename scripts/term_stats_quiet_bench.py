"""Round-11 quiet-host confirmation (VERDICT r10 #2): both r10 bench
reps of term_stats_ngram / term_stats_by_source ran at host load 15.8
and regressed 2-2.7x vs r8 with NO change in their code path — rerun
them standalone at low load to separate host contention from a real
plan regression. Usage:

    python scripts/term_stats_quiet_bench.py [sf_dir] [reps]

Prints per-rep (seconds, end-of-rep 1-min load) and the min, in the
same shape bench.py's timed_min records.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vspace_spark.queries import QUERIES, load_all
from vspace_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

load_all()
spark = get_spark("term-stats-quiet")
spark.range(1000).count()  # JIT/session warmup, as bench.py does

result = {}
for name in ["term_stats_ngram", "term_stats_by_source"]:
    fn = QUERIES[name]
    times, loads = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn(spark, SF).count()
        times.append(round(time.perf_counter() - t0, 3))
        loads.append(round(os.getloadavg()[0], 1))
        spark.catalog.clearCache()
    result[name] = {"reps": times, "load_1m": loads, "min": min(times)}
print(json.dumps(result))
spark.stop()
