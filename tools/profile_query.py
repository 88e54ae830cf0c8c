"""Profile one registered query end-to-end: wall time + Ray Data per-operator
stats (task counts, UDF time, rows, throughput). The measure-don't-guess
loop for a single operator.

Usage: python tools/profile_query.py QUERY_NAME [sf_dir] [num_cpus]
"""
import os
import sys
import time

import ray

name = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
ncpu = int(sys.argv[3]) if len(sys.argv) > 3 else 16

ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
         log_to_driver=False)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as entry  # noqa: E402

fn = entry.queries()[name]
t0 = time.time()
res = fn(sf)
import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402

if isinstance(res, (pa.Table, pd.DataFrame)):
    n = len(res)
    stats = "(driver-side result: table materialized inside the query)"
else:
    n = sum(pa.table(b).num_rows
            for b in res.iter_batches(batch_format="pyarrow"))
    stats = res.stats()
wall = time.time() - t0
print(f"=== {name} @ {sf} ({ncpu} CPUs): {n} rows in {wall:.2f}s ===")
print(stats)
ray.shutdown()
