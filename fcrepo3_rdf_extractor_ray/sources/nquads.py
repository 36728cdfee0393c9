"""N-Quads INGESTION — the read half of the engine's own K1 sink.

``materialize_sorted`` (pipelines/kg.py) writes the reference-shaped
``quads{i}.nq`` text shards (TripleDump.java:63-69 analog, one file per
block); this module reads such shards back into the canonical quad
schema, completing the N-Quads round-trip the same way
``sources/warc.py`` / ``sources/jsonl.py`` complete theirs.

Line grammar (exactly what the sink emits — RDF 1.1 N-Quads restricted
to the engine's term shapes)::

    <subj> <pred> <obj-iri> <graph> .
    <subj> <pred> "lex"^^<dt>? <graph> .

Literal escapes are the sink's three: ``\\\\``, ``\\"``, ``\\n``.
Unescaping is a single left-to-right pass (NOT chained global
replaces — ``\\\\n`` must decode to backslash+n, not newline); rows
without a backslash skip the Python pass entirely, so the hot path
stays vectorized.

``read_nquads`` uses ``ray.data.read_text`` (a true per-file
Datasource — one read task per shard, never fusion-coalesced like the
original ``read_warc`` map_batches shape was) followed by one
vectorized parse stage. Malformed lines raise by default
(``on_error="raise"``) since the engine's own sink is the producer;
``on_error="skip"`` gives per-row containment for foreign files.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_LINE_RE = re.compile(
    r"^<([^>]*)> <([^>]*)> (.+) <([^>]*)> \.$")
_LIT_RE = re.compile(r'^"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>)?$')
_ESC_RE = re.compile(r"\\(.)")
_ESC_MAP = {"n": "\n", '"': '"', "\\": "\\"}


def _unescape(lex: str) -> str:
    def sub(m: re.Match) -> str:
        ch = m.group(1)
        try:
            return _ESC_MAP[ch]
        except KeyError:
            raise ValueError(f"unknown N-Quads escape: \\{ch}") from None

    return _ESC_RE.sub(sub, lex)


def parse_nquads_lines(lines: pd.Series, on_error: str = "raise"
                       ) -> pd.DataFrame:
    """Vectorized N-Quads line parse → the canonical 6-column quad
    frame. The term split is one compiled-regex extract over the whole
    column; only literal rows that actually contain a backslash pay the
    per-row unescape pass."""
    parts = lines.str.extract(_LINE_RE)
    parts.columns = ["subj", "pred", "objterm", "graph"]
    bad = parts["subj"].isna()
    if bad.any():
        if on_error == "raise":
            raise ValueError(
                f"malformed N-Quads line: {lines[bad].iloc[0]!r}")
        parts = parts[~bad]
    objterm = parts["objterm"]
    is_iri = objterm.str.startswith("<") & objterm.str.endswith(">")
    lit = objterm.str.extract(_LIT_RE)
    lit.columns = ["lex", "dt"]
    bad_obj = ~is_iri & lit["lex"].isna()
    if bad_obj.any():
        if on_error == "raise":
            raise ValueError(
                f"malformed N-Quads object term: "
                f"{objterm[bad_obj].iloc[0]!r}")
        keep = ~bad_obj
        parts, objterm = parts[keep], objterm[keep]
        is_iri, lit = is_iri[keep], lit[keep]
    lex = lit["lex"].copy()
    esc = lex.notna() & lex.str.contains("\\", regex=False)
    if esc.any():
        lex.loc[esc] = lex.loc[esc].map(_unescape)
    obj = np.where(is_iri, objterm.str.slice(1, -1), lex)
    return pd.DataFrame({
        "graph": parts["graph"].to_numpy(),
        "subj": parts["subj"].to_numpy(),
        "pred": parts["pred"].to_numpy(),
        "obj": obj,
        "obj_is_literal": (~is_iri).to_numpy(),
        "obj_datatype": lit["dt"].fillna("").to_numpy(),
    })


def read_nquads(paths, on_error: str = "raise"):
    """``.nq`` shard paths (or a directory) → Dataset of
    ``(graph, subj, pred, obj, obj_is_literal, obj_datatype)``.

    One read task per shard (ray.data.read_text's per-file Datasource),
    one stateless vectorized parse stage. Empty files yield no rows."""
    import ray.data as rd

    ds = rd.read_text(paths, file_extensions=["nq"])

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        return parse_nquads_lines(df["text"], on_error=on_error)

    return ds.map_batches(parse, batch_format="pandas")
