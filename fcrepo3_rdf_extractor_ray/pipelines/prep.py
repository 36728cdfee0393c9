"""Composite training-data corpus prep — the canonical LLM-data chain
(quality filter → exact dedup → deterministic sample) as ONE streaming
Dataset pipeline, each stage reusing the engine's primitives:

1. quality gate: vectorized token count per batch, drop short docs;
2. exact dedup: content-hash partition + min-ID keep
   (``dedup_exact_docs`` — the combiner/shuffle shape documented there);
3. deterministic sample: content-hash prefix threshold — reproducible
   across runs AND cluster sizes (no RNG, no per-node state).

Everything is a pure function of the text, so a DuckDB oracle replays
the whole chain exactly (the composite is oracle-checked end-to-end,
not just stage-by-stage)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.dedup import dedup_exact_docs


def prep_corpus(sf_dir: str, min_tokens: int = 20,
                sample_prefix: str = "40", docs_ds=None):
    """documents → (doc_id, n_tokens) of the filtered, deduped, sampled
    corpus. ``sample_prefix``: keep docs whose md5(text) hex starts
    below this 2-char prefix (e.g. '40' ≈ 25% sample)."""
    import os

    import ray.data as rd

    ds = docs_ds if docs_ds is not None else rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])

    def quality_gate(df: pd.DataFrame) -> pd.DataFrame:
        n_tokens = df["text"].str.split().str.len()
        return df.loc[n_tokens >= min_tokens, ["doc_id", "text"]]

    filtered = ds.map_batches(quality_gate, batch_format="pandas")
    deduped = dedup_exact_docs(filtered)  # (text, keep_id, n_dups)

    def sample(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        keep = np.array([hashlib.md5(s.encode("utf-8")).hexdigest()[:2]
                         < sample_prefix for s in texts])
        t = t.filter(pa.array(keep))
        n_tok = pa.array([len(s.split()) for s in t["text"].to_pylist()],
                         pa.int64())
        return pa.table({"doc_id": t["keep_id"], "n_tokens": n_tok})

    return deduped.map_batches(sample, batch_format="pyarrow")
