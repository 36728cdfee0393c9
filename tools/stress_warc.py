"""WARC-source throughput evidence (round-5 addition): export the ×N
amplified pages corpus to WARC/1.0 multi-member-gzip shards (the
Common-Crawl wire format), then measure the ingest path end-to-end:

  1. write_warc_shards wall (pages Dataset → per-block .warc.gz files)
  2. read_warc → full-parse consume wall (pages/s, payload MB/s)
  3. read_warc → full flagship KG pipeline wall (the kg_quads_warc
     composition at stress scale), row-count-checked against the
     parquet-sourced flagship over the same corpus

The driver holds only shard paths throughout (S1 analog); parse is
per-record-contained inside tasks (P4).

Usage: python tools/stress_warc.py [sf_dir] [repeat] [num_cpus]
"""
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import pyarrow as pa
import ray

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPEAT = int(sys.argv[2]) if len(sys.argv) > 2 else 50
NCPU = int(sys.argv[3]) if len(sys.argv) > 3 else 32
ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
from fcrepo3_rdf_extractor_ray.pipelines.kg import (extract_raw_quads,
                                                    pages_for_sf, run_kg)
from fcrepo3_rdf_extractor_ray.sources.warc import (read_warc,
                                                    write_warc_shards)

pages = pages_for_sf(SF, repeat=REPEAT)  # synthesis cached, untimed
n_expected = pages.count()

out_dir = f"/tmp/stress_warc_x{REPEAT}"
shutil.rmtree(out_dir, ignore_errors=True)

t0 = time.perf_counter()
manifest = write_warc_shards(pages, out_dir).materialize()
write_s = time.perf_counter() - t0
paths = sorted(glob.glob(os.path.join(out_dir, "*.warc.gz")))
gz_bytes = sum(os.path.getsize(p) for p in paths)

# full-parse consume: force every record through _parse_warc_bytes and
# count payload bytes so nothing short-circuits


def _consume(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    return pa.table({
        "n": pa.array([t.num_rows], pa.int64()),
        "b": pa.array([pc.sum(pc.binary_length(t["html"])).as_py() or 0],
                      pa.int64())})


t0 = time.perf_counter()
agg = (read_warc(paths).map_batches(_consume, batch_format="pyarrow")
       .to_pandas().sum())
read_s = time.perf_counter() - t0
assert int(agg["n"]) == n_expected, (int(agg["n"]), n_expected)

# flagship fed from WARC instead of parquet at the same stress scale,
# row-count-checked against the parquet-sourced flagship
t0 = time.perf_counter()
n_quads_warc = run_kg(SF, pages_ds=read_warc(paths)).count()
warc_kg_s = time.perf_counter() - t0
t0 = time.perf_counter()
n_quads_pq = run_kg(SF, repeat=REPEAT).count()
pq_kg_s = time.perf_counter() - t0
assert n_quads_warc == n_quads_pq, (n_quads_warc, n_quads_pq)

print(json.dumps({
    "metric": "warc_ingest_stress", "sf": SF, "repeat": REPEAT,
    "num_cpus": NCPU, "n_pages": n_expected,
    "gz_bytes": gz_bytes, "n_shards": len(paths),
    "write_s": round(write_s, 2),
    "read_parse_s": round(read_s, 2),
    "read_pages_per_s": round(n_expected / read_s, 1),
    "read_payload_mb_per_s": round(
        int(agg["b"]) / read_s / 1e6, 1),
    "flagship_from_warc_s": round(warc_kg_s, 2),
    "flagship_from_parquet_s": round(pq_kg_s, 2),
    "n_quads": int(n_quads_warc)}, separators=(",", ":")))
shutil.rmtree(out_dir, ignore_errors=True)
ray.shutdown()
