"""Checkpoint manifests + lineage records + resume.

The reference has NO checkpointing (a crash loses the run — SURVEY.md
§3.1 state-placement note); the north rule adds it. Design:

- A checkpoint is a directory ``<root>/stage=<name>[/group=<k>]`` written
  atomically: data + ``_MANIFEST.json`` land in a ``.tmp`` sibling that is
  ``os.replace``d into place — manifest-commit-last, so a half-written
  checkpoint is never observable (SURVEY.md §7.4 resume-atomicity).
- Lineage rows (LINEAGE_SCHEMA: stage, input_shard, row range, triple
  count, error count, wall-ms) are gathered by a named Ray actor that
  extraction stages report to per batch (the W3 progress/error
  accounting analog, Extract.java:224-235 — a final tiny sum replaces
  ``summingInt``).
- Resume = set-difference of input shard groups vs committed manifests
  (anti-join on the completed set); ``run_kg_resumable`` processes shard
  groups as independent streaming waves, each committing its own
  checkpoint — the unit of resume is the wave.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import ray

from ..schema import LINEAGE_SCHEMA

@ray.remote(num_cpus=0)
class LineageCollector:
    """Driver-owned actor accumulating per-batch lineage rows from stage
    actors. The driver creates it and passes the handle into stage
    constructors (a named/get_if_exists actor would be owned by whichever
    worker created it first and die with that worker's pool)."""

    def __init__(self):
        self.rows: list[dict] = []

    def add(self, stage: str, input_shard: str, row_start: int, row_end: int,
            triple_count: int, error_count: int, wall_ms: float):
        self.rows.append(dict(stage=stage, input_shard=input_shard,
                              row_start=row_start, row_end=row_end,
                              triple_count=triple_count,
                              error_count=error_count, wall_ms=wall_ms))

    def snapshot(self) -> list[dict]:
        return list(self.rows)

    def clear(self):
        self.rows = []


def new_collector():
    """Create a driver-owned lineage collector; pass the handle to stages."""
    return LineageCollector.remote()  # type: ignore[attr-defined]


def lineage_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return LINEAGE_SCHEMA.empty_table()
    cols = {f.name: [r.get(f.name) for r in rows] for f in LINEAGE_SCHEMA}
    return pa.table({k: pa.array(v, LINEAGE_SCHEMA.field(k).type)
                     for k, v in cols.items()})


# ---------------------------------------------------------------------------
# Atomic checkpoint dirs

def _ckpt_dir(root: str, stage: str, group: str | None = None) -> str:
    p = os.path.join(root, f"stage={stage}")
    if group is not None:
        p = os.path.join(p, f"group={group}")
    return p


def checkpoint_exists(root: str, stage: str, group: str | None = None) -> bool:
    return os.path.exists(os.path.join(_ckpt_dir(root, stage, group),
                                       "_MANIFEST.json"))


def checkpoint_quads(ds, root: str, stage: str, group: str | None = None,
                     extra_manifest: dict | None = None,
                     collector=None) -> str:
    """Write a Dataset to an atomic checkpoint. Skips (resume) if already
    committed. Returns the checkpoint path.

    ``collector``: optional LineageCollector handle. The lineage rows that
    accumulated during this wave's execution are drained and written as
    ``_LINEAGE.parquet`` INSIDE the tmp dir, before the manifest — so the
    atomic rename commits data + lineage together and a crash between
    waves can never orphan a committed checkpoint from its lineage
    (the invariant in this module's docstring)."""
    final = _ckpt_dir(root, stage, group)
    if checkpoint_exists(root, stage, group):
        return final
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    t0 = time.perf_counter()
    ds.write_parquet(tmp)
    wall_ms = (time.perf_counter() - t0) * 1000
    import pyarrow.parquet as pq

    if collector is not None:
        rows = ray.get(collector.snapshot.remote())
        ray.get(collector.clear.remote())  # drain: each wave owns its rows
        pq.write_table(lineage_table(rows),
                       os.path.join(tmp, "_LINEAGE.parquet"))

    files = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shards = []
    total = 0
    for f in files:
        n = pq.ParquetFile(os.path.join(tmp, f)).metadata.num_rows
        shards.append({"file": f, "rows": n})
        total += n
    manifest = {"stage": stage, "group": group, "rows": total,
                "wall_ms": wall_ms, "shards": shards}
    manifest.update(extra_manifest or {})
    # manifest written inside tmp, then the whole dir commits via rename
    with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    shutil.rmtree(final, ignore_errors=True)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    os.replace(tmp, final)
    return final


def read_checkpoint(root: str, stage: str, group: str | None = None):
    import ray.data as rd

    d = _ckpt_dir(root, stage, group)
    files = sorted(os.path.join(d, f) for f in os.listdir(d)
                   if f.endswith(".parquet") and not f.startswith("_"))
    return rd.read_parquet(files)


def committed_groups(root: str, stage: str) -> list[tuple[str, dict]]:
    """(group_id, manifest) for every committed group of a stage."""
    base = _ckpt_dir(root, stage)
    out = []
    if not os.path.isdir(base):
        return out
    for g in sorted(os.listdir(base)):
        mp = os.path.join(base, g, "_MANIFEST.json")
        if g.startswith("group=") and os.path.exists(mp):
            with open(mp) as f:
                out.append((g[len("group="):], json.load(f)))
    return out


def read_all_groups(root: str, stage: str):
    """Read every committed group checkpoint of a stage as one Dataset."""
    import ray.data as rd

    base = _ckpt_dir(root, stage)
    files = []
    for g in sorted(os.listdir(base)):
        gd = os.path.join(base, g)
        if g.startswith("group=") and os.path.exists(
            os.path.join(gd, "_MANIFEST.json")
        ):
            files.extend(sorted(os.path.join(gd, f) for f in os.listdir(gd)
                                if f.endswith(".parquet")
                                and not f.startswith("_")))
    return rd.read_parquet(files)


def write_lineage(collector, root: str, stage: str = "all"):
    """Dump collected lineage rows to ``<root>/_lineage/<stage>.parquet``."""
    import pyarrow.parquet as pq

    rows = ray.get(collector.snapshot.remote())
    os.makedirs(os.path.join(root, "_lineage"), exist_ok=True)
    pq.write_table(lineage_table(rows),
                   os.path.join(root, "_lineage", f"{stage}.parquet"))
    return len(rows)


def merge_lineage(root: str, stage: str) -> int:
    """Merge the per-group ``_LINEAGE.parquet`` files of every committed
    checkpoint into ``<root>/_lineage/<stage>.parquet``. Because each
    wave's lineage commits atomically with its data (checkpoint_quads),
    this reconstructs the FULL lineage even after crash+resume across
    multiple invocations — the final merged file is derived state, safe
    to rebuild at any time. Returns the merged row count."""
    import pyarrow.parquet as pq

    base = _ckpt_dir(root, stage)
    tables = []
    if os.path.isdir(base):
        for g in sorted(os.listdir(base)):
            gd = os.path.join(base, g)
            lf = os.path.join(gd, "_LINEAGE.parquet")
            if (g.startswith("group=")
                    and os.path.exists(os.path.join(gd, "_MANIFEST.json"))
                    and os.path.exists(lf)):
                tables.append(pq.read_table(lf))
    merged = (pa.concat_tables(tables) if tables
              else LINEAGE_SCHEMA.empty_table())
    os.makedirs(os.path.join(root, "_lineage"), exist_ok=True)
    pq.write_table(merged, os.path.join(root, "_lineage", f"{stage}.parquet"))
    return merged.num_rows
