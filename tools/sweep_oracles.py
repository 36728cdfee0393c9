"""Full driver-contract sweep: every oracle-backed queries() entry vs
its DuckDB oracle, fresh Ray session. The repo-checked-in form of the
end-of-round verification pass (160/160 green at round 4 close).

Usage: python tools/sweep_oracles.py [sf_dir] [num_cpus]
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ray
NCPU = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import duckdb, pandas as pd
import __ray_entry__ as em
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for n in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {n} AS SELECT * FROM read_parquet('{SF}/{n}.parquet')")
qs, osql = em.queries(), em.oracle_sql()
only = set(filter(None, os.environ.get("GRAFT_SWEEP_ONLY", "")
                  .split(",")))
bad = []
t00 = time.time()
for i, name in enumerate(qs):
    if name not in osql or (only and name not in only):
        continue
    try:
        res = qs[name](SF)
        adf = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        odf = con.execute(osql[name]).df()
        a = adf[sorted(adf.columns)].sort_values(sorted(adf.columns)).reset_index(drop=True)
        o = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
        ok = (len(a) == len(o) and list(a.columns) == list(o.columns)
              and all((a[c].astype(str).values == o[c].astype(str).values).all()
                      for c in a.columns))
    except Exception as e:
        ok = False
        print(f"ERR {name}: {type(e).__name__}: {e}", flush=True)
    if not ok:
        bad.append(name)
    print(f"[{i+1}] {name}: {'OK' if ok else 'FAIL'}", flush=True)
print(f"SWEEP DONE in {time.time()-t00:.0f}s; failures: {bad}", flush=True)
if bad:
    sys.exit(1)
ray.shutdown()
