"""JSONL corpus export/ingest — the de-facto interchange format for LLM
training corpora (one JSON object per line, optionally gzipped).

Sink mirrors the WARC/WET sharding rules (``sources/warc.py``): one file
per block — the K1 per-task sharding shape (ObjectProcessor.java:161-176
analog: no shared writer, per-task output) — atomic temp+rename publish so
a crashed run never leaves a half-written shard visible (resumable-output
rule). Values are written with ``ensure_ascii=False`` + ``sort_keys=True``
+ compact separators, so shard bytes are deterministic for a given row
stream and non-ASCII text stays human-readable UTF-8.

Source is Ray Data's built-in ``read_json``: it is already the right
Datasource shape — one read task per file (streaming, no
fusion-serialization hazard — see the read_warc note), pyarrow.json
parsing (vectorized, int64-exact beyond 2^53), gzip inferred from the
``.gz`` extension. Wrapping rather than reimplementing it is deliberate:
the engine adds only the sharded-writer side JSONL lacks."""
import gzip
import io
import json

import pyarrow as pa


def write_jsonl_shards(ds, out_dir: str, gzipped: bool = True):
    """Export any tabular Dataset to ``<out_dir>/shard-*.jsonl[.gz]`` —
    one file per block, one JSON object per row. Returns a Dataset of
    (path, n_records) rows (consume it to drive the write). Values must
    be JSON-representable (ints/floats/strings/bools/lists/None);
    anything else falls back to ``str()`` (documented lossy escape
    hatch, e.g. timestamps)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        import uuid

        if t.num_rows == 0:  # pyarrow.json rejects empty files — skip
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        cols = t.schema.names
        data = [t[c].to_pylist() for c in cols]
        buf = io.StringIO()
        for row in zip(*data):
            buf.write(json.dumps(dict(zip(cols, row)), ensure_ascii=False,
                                 sort_keys=True, separators=(",", ":"),
                                 default=str))
            buf.write("\n")
        payload = buf.getvalue().encode("utf-8")
        if gzipped:
            payload = gzip.compress(payload)
        name = f"shard-{uuid.uuid4().hex[:12]}.jsonl" + (
            ".gz" if gzipped else "")
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        final = os.path.join(out_dir, name)
        with open(tmp, "wb") as f:
            f.write(payload)
        os.rename(tmp, final)  # atomic publish (resumable-output rule)
        return pa.table({"path": pa.array([final], pa.string()),
                         "n_records": pa.array([t.num_rows], pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow",
                          batch_size=None)


def read_jsonl(paths, **kwargs):
    """Read JSONL shards back as a Dataset — thin wrapper over
    ``ray.data.read_json`` (per-file read tasks, pyarrow.json parsing,
    gzip by extension). Kept as the package's named entry point so
    pipelines depend on one ingest surface per wire format (read_warc /
    read_wet / read_cdx / read_jsonl)."""
    import ray.data as rd

    return rd.read_json(paths, **kwargs)
