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


def neardup_filter_corpus(sf_dir: str, threshold: float = 0.5):
    """END-TO-END near-duplicate corpus dedup — the canonical
    training-data cleaning pipeline: exact k-gram Jaccard pairs →
    connected components over the near-dup graph → keep ONE document
    per cluster (the minimum doc_id); singletons survive untouched.
    Returns the surviving (doc_id) set as a Dataset.

    Everything reuses the engine's primitives: the inverted-index pair
    stage, the contraction union-find (doc ids zero-padded so the
    lexicographic component min IS the numeric min), and a broadcast
    drop-set filter (bounded by the number of near-dup documents — at
    web scale near-dups are a few percent of the corpus, so the
    broadcast side stays tiny next to the stream it filters)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..stages.dedup import ngram_jaccard_pairs
    from ..stages.graph import connected_components

    import os

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=threshold)

    def pad(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "norm_a": pa.array([f"{x:012d}" for x in a], pa.string()),
            "norm_b": pa.array([f"{x:012d}" for x in b], pa.string())})

    comp = connected_components(pairs.map_batches(pad,
                                                  batch_format="pyarrow"))

    # the CC node set here is ONLY the docs that appear in a near-dup
    # pair — a few percent of any real corpus — so collecting the
    # (node, component) table is bounded by dup volume, not corpus size
    comp_df = comp.to_pandas()
    if len(comp_df):
        dropped = comp_df.loc[comp_df["node"] != comp_df["component"],
                              "node"]
        drop_set = pa.array(sorted(int(x) for x in dropped), pa.int64())
    else:
        drop_set = pa.array([], pa.int64())
    drop_ref = ray.put(drop_set)

    def survivors(t: pa.Table) -> pa.Table:
        ds_ = ray.get(drop_ref)
        if len(ds_):
            t = t.filter(pc.invert(pc.is_in(t["doc_id"], value_set=ds_)))
        return t.select(["doc_id"])

    return docs.map_batches(survivors, batch_format="pyarrow")


def corpus_report(sf_dir: str):
    """CORPUS HEALTH REPORT — the one-row dashboard a data-pipeline
    owner checks before training: document count, token volume, exact
    duplicate rate, language count and mean doc length, all from
    streaming combiner passes (no shuffle wider than the tiny dedup
    exchange). Returns a single-row frame."""
    import os

    import pyarrow.compute as pc
    import ray.data as rd

    from ray.data.aggregate import Sum

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text", "lang"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split().str.len()
        return pd.DataFrame({
            "n_docs": [len(df)],
            "n_tokens": [int(toks.sum())],
            "n_chars": [int(df["text"].str.len().sum())],
        })

    agg = (docs.map_batches(partials, batch_format="pandas")
           .aggregate(Sum("n_docs"), Sum("n_tokens"), Sum("n_chars")))

    from ..stages.dedup import dedup_exact_docs

    n_distinct = dedup_exact_docs(docs).count()

    def langs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"lang": df["lang"].unique()})

    n_langs = (docs.map_batches(langs, batch_format="pandas")
               .to_pandas()["lang"].nunique())

    n_docs = agg["sum(n_docs)"]
    return pd.DataFrame({
        "n_docs": pd.array([n_docs], dtype="int64"),
        "n_tokens": pd.array([agg["sum(n_tokens)"]], dtype="int64"),
        "n_distinct_docs": pd.array([n_distinct], dtype="int64"),
        "dup_rate_micro": pd.array(
            [(1_000_000 * (n_docs - n_distinct)) // n_docs], dtype="int64"),
        "n_langs": pd.array([n_langs], dtype="int64"),
        "mean_chars_micro": pd.array(
            [(1_000_000 * agg["sum(n_chars)"]) // n_docs], dtype="int64"),
    })


def mix_report(sf_dir: str, k: int = 4, n_parts: int | None = None):
    """TRAINING-MIX REPORT: what the corpus looks like after the
    quality gate, per (host, LM-quality tile) cell — the table a data
    engineer reads before setting mixing weights (which domains
    dominate which quality band, and how much the Gopher gate removes
    from each). Composes `gopher_filter` (keep/drop verdict) with
    `lm_buckets` (NTILE over the unigram-LM commonness score) and the
    corpus host mapping.

    Shape: the two per-doc signal Datasets and the host map are merged
    by ONE doc-hash co-partition exchange (tagged union + groupby —
    no join operator), then reduced by ONE (host, tile) exchange with
    a per-batch combiner. Returns (host, tile, n_docs, n_keep).
    """
    import ray.data as rd

    from ..functions.hashing import fast_part_hash
    from ..runtime import default_parts
    from ..stages.text_analysis import gopher_filter, lm_buckets
    n_parts = n_parts or default_parts(1.0)
    import os

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def tag(col_from, col_as, kind):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow as pa
            import pyarrow.compute as pc

            ids = t["doc_id"]
            return pa.table({
                "doc_id": ids,
                "val": pc.cast(t[col_from], pa.int64())
                if col_from else pa.nulls(t.num_rows, pa.int64()),
                "kind": pa.array(np.full(t.num_rows, kind, np.int8)),
                "part": pa.array(fast_part_hash(ids, n_parts))})
        return fn

    tiles = lm_buckets(docs, k=k).map_batches(
        tag("tile", "tile", 0), batch_format="pyarrow")
    keeps = gopher_filter(docs).map_batches(
        tag("keep", "keep", 1), batch_format="pyarrow")

    def merge(t: pa.Table) -> pa.Table:
        # Arrow-native exchange finisher (no per-partition pandas
        # conversion / pivot_table): split the tagged union by kind,
        # inner-resolve tiles onto the keep rows with index_in (both
        # sides are one row per doc), then one hash aggregate
        import pyarrow.compute as pc

        is_tile = pc.equal(t["kind"], 0)
        tl = t.filter(is_tile)
        kp = t.filter(pc.invert(is_tile))
        idx = pc.index_in(kp["doc_id"], value_set=tl["doc_id"]
                          .combine_chunks())
        tile = pc.take(tl["val"].combine_chunks(), idx)
        ok = pc.is_valid(tile)  # token-less docs have no LM tile
        ids = kp["doc_id"].filter(ok)
        mod = pc.subtract(ids, pc.multiply(
            pc.divide(ids, pa.scalar(20, pa.int64())),
            pa.scalar(20, pa.int64())))
        host = pc.binary_join_element_wise(
            pa.array(["ex"] * len(ids), pa.string()),
            pc.cast(mod, pa.string()),
            pa.array([".org"] * len(ids), pa.string()), "")
        g = (pa.table({"host": host, "tile": tile.filter(ok),
                       "n_docs": pa.array(np.ones(len(ids), np.int64)),
                       "n_keep": kp["val"].filter(ok)})
             .group_by(["host", "tile"])
             .aggregate([("n_docs", "sum"), ("n_keep", "sum")]))
        g = g.rename_columns(["host", "tile", "n_docs", "n_keep"])
        return g.append_column(
            "part", pa.array(fast_part_hash(g["host"], n_parts)))

    def final(t: pa.Table) -> pa.Table:
        g = (t.select(["host", "tile", "n_docs", "n_keep"])
             .group_by(["host", "tile"])
             .aggregate([("n_docs", "sum"), ("n_keep", "sum")]))
        return g.rename_columns(["host", "tile", "n_docs", "n_keep"])

    # repartition BEFORE each exchange: union doubles the block count
    # and the sort-shuffle inherits it (128 tiny map+reduce tasks);
    # coalescing to n_parts first quarters the task fan-out.
    return (tiles.union(keeps).repartition(n_parts)
            .groupby("part").map_groups(merge, batch_format="pyarrow")
            .repartition(min(n_parts, 8))
            .groupby("part").map_groups(final, batch_format="pyarrow"))


def web_corpus_prep(docs_ds, k: int = 5, n_parts: int | None = None):
    """END-TO-END WEB TRAINING-CORPUS PREP over (doc_id, url, text):
    canonical-url crawl dedup (keep min doc per canonical address) →
    Gopher composite quality gate on the survivors → domain-balanced
    per-host cap — the three filters every web-corpus recipe chains,
    as ONE pipeline a user can actually run. Returns the final kept
    docs (doc_id, host, smp_rank).

    Shape: `dedup_by_canonical_url` (stateless canon + one url-hash
    exchange) → ONE doc-hash co-partition exchange merging winners with
    their text (tagged union + groupby, no join operator) → stateless
    `gopher_filter` verdict on the merged rows → host extract (Arrow
    regex) → `host_cap_sample` (one host-hash exchange). Four
    exchanges total, all key-partitioned; nothing driver-side.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import fast_part_hash
    from ..runtime import default_parts
    from ..stages.text_analysis import gopher_filter
    from ..stages.web import dedup_by_canonical_url, host_cap_sample
    n_parts = n_parts or default_parts(1.0)

    winners = dedup_by_canonical_url(
        docs_ds.map_batches(lambda t: t.select(["doc_id", "url"]),
                            batch_format="pyarrow"))

    def tag_winner(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "url_canon": t["url_canon"],
            "text": pa.nulls(t.num_rows, pa.string()),
            "part": pa.array(fast_part_hash(t["doc_id"], n_parts))})

    def tag_text(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "url_canon": pa.nulls(t.num_rows, pa.string()),
            "text": t["text"],
            "part": pa.array(fast_part_hash(t["doc_id"], n_parts))})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        w = df[df["url_canon"].notna()][["doc_id", "url_canon"]]
        tx = df[df["text"].notna()][["doc_id", "text"]]
        return w.merge(tx, on="doc_id")  # winners only (semi-join)

    merged = (winners.map_batches(tag_winner, batch_format="pyarrow")
              .union(docs_ds.map_batches(
                  lambda t: t.select(["doc_id", "text"]),
                  batch_format="pyarrow")
                  .map_batches(tag_text, batch_format="pyarrow"))
              .groupby("part").map_groups(merge, batch_format="pandas")
              .materialize())

    verdict = gopher_filter(merged)

    def tag_keep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["keep"], 1))
        return pa.table({
            "doc_id": t["doc_id"],
            "url_canon": pa.nulls(t.num_rows, pa.string()),
            "text": pa.nulls(t.num_rows, pa.string()),
            "part": pa.array(fast_part_hash(t["doc_id"], n_parts))})

    def keep_merge(df: pd.DataFrame) -> pd.DataFrame:
        kept = df[df["url_canon"].isna() & df["text"].isna()]["doc_id"]
        w = df[df["url_canon"].notna()]
        return w[w["doc_id"].isin(set(kept))][["doc_id", "url_canon"]]

    survivors = (verdict.map_batches(tag_keep, batch_format="pyarrow")
                 .union(merged.map_batches(
                     lambda t: t.append_column(
                         "part", pa.array(fast_part_hash(t["doc_id"],
                                                         n_parts))),
                     batch_format="pyarrow"))
                 .groupby("part").map_groups(keep_merge,
                                             batch_format="pandas"))

    def with_host(t: pa.Table) -> pa.Table:
        h = pc.struct_field(
            pc.extract_regex(t["url_canon"], r"^https?://(?P<h>[^/?#]+)"),
            "h")
        return pa.table({"doc_id": t["doc_id"], "host": h})

    return host_cap_sample(
        survivors.map_batches(with_host, batch_format="pyarrow"), k=k)


def dataset_card(docs_ds, url_ds=None, n_parts: int | None = None):
    """DATASET CARD: the one-row corpus summary every published
    training set ships with — document/token volume, quality-gate keep
    count, canonical-url/host coverage and the dominant language. The
    end-of-pipeline report a data curator reads before a corpus is
    released (and the number sheet a mixing recipe starts from).

    Every figure is a STREAMING aggregate — the driver only ever holds
    scalars and a vocabulary-sized language histogram: token totals
    and gate keeps fold through Ray sum aggregates over per-batch
    partials; distinct canonical urls / hosts go through ONE key-hash
    exchange of per-batch-distinct partials (kind-tagged, so urls and
    hosts share the exchange); the language histogram is a per-batch
    combiner folded at lang granularity. ``url_ds`` is optional
    (doc_id, url) — without it the url/host columns are 0.

    Returns a one-row pandas DataFrame (n_docs, n_tokens, n_gate_keep,
    n_canon_unique, n_hosts, top_lang, top_lang_n).
    """
    import pyarrow.compute as pc

    from ..functions.hashing import fast_part_hash
    from ..runtime import default_parts
    from ..stages.text_analysis import gopher_filter, token_counts
    n_parts = n_parts or default_parts(1.0)

    n_docs = docs_ds.count()
    n_tokens = int(token_counts(docs_ds).sum("n_tokens") or 0)
    n_keep = int(gopher_filter(docs_ds).sum("keep") or 0)

    def lang_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"lang": t["lang"],
                       "n": pa.array(np.ones(t.num_rows, np.int64))})
             .group_by("lang").aggregate([("n", "sum")]))
        return g.rename_columns(["lang", "n"])

    hist = (docs_ds.map_batches(lang_partial, batch_format="pyarrow")
            .to_pandas().groupby("lang", as_index=False)["n"].sum()
            .sort_values(["n", "lang"], ascending=[False, True]))
    top_lang = str(hist.iloc[0]["lang"]) if len(hist) else ""
    top_lang_n = int(hist.iloc[0]["n"]) if len(hist) else 0

    n_canon, n_hosts = 0, 0
    if url_ds is not None:
        from ..stages.web import canonicalize_urls
        canon = canonicalize_urls(url_ds)

        def dkeys(t: pa.Table) -> pa.Table:
            t = t.filter(t["parse_ok"])
            u = t["url_canon"]
            host = pc.struct_field(
                pc.extract_regex(u, r"^https?://(?P<h>[^/?#]+)"), "h")
            both = pa.table({
                "kind": pa.concat_arrays(
                    [pa.array(np.zeros(t.num_rows, np.int64)),
                     pa.array(np.ones(t.num_rows, np.int64))]),
                "key": pa.concat_arrays([u.combine_chunks().cast(pa.string()),
                                         host.combine_chunks()])})
            g = both.group_by(["kind", "key"]).aggregate([])
            return g.append_column(
                "part", pa.array(fast_part_hash(g["key"], n_parts)))

        def cnt(df: pd.DataFrame) -> pd.DataFrame:
            d = df.drop_duplicates(["kind", "key"])
            g = d.groupby("kind", as_index=False).agg(n=("key", "count"))
            g["n"] = g["n"].astype("int64")
            return g[["kind", "n"]]

        parts = (canon.map_batches(dkeys, batch_format="pyarrow")
                 .groupby("part").map_groups(cnt, batch_format="pandas")
                 .to_pandas().groupby("kind")["n"].sum())
        n_canon = int(parts.get(0, 0))
        n_hosts = int(parts.get(1, 0))

    return pd.DataFrame({
        "n_docs": pd.array([n_docs], dtype="int64"),
        "n_tokens": pd.array([n_tokens], dtype="int64"),
        "n_gate_keep": pd.array([n_keep], dtype="int64"),
        "n_canon_unique": pd.array([n_canon], dtype="int64"),
        "n_hosts": pd.array([n_hosts], dtype="int64"),
        "top_lang": [top_lang],
        "top_lang_n": pd.array([top_lang_n], dtype="int64")})


def neardup_best_corpus(sf_dir: str, threshold: float = 0.5):
    """Near-dup dedup with QUALITY-AWARE representative selection: the
    survivor of each near-dup cluster is the HIGHEST-QUALITY member
    (longest document — ``n_chars`` DESC, doc_id ASC tiebreak), not the
    minimum id. The "keep best, not first" policy of production
    training-data pipelines (near-dup variants often differ by
    truncation, and the longest variant is the one worth keeping).

    Same shape and driver bound as ``neardup_filter_corpus``: the only
    driver-resident state is the clustered-doc table — a few percent of
    any real corpus — against which the full document stream is
    filtered via one object-store broadcast. Returns surviving
    (doc_id, n_chars)."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..stages.dedup import ngram_jaccard_pairs
    from ..stages.graph import connected_components

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text", "n_chars"])
    pairs = ngram_jaccard_pairs(
        docs.select_columns(["doc_id", "text"]), threshold=threshold)

    def pad(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "norm_a": pa.array([f"{x:012d}" for x in a], pa.string()),
            "norm_b": pa.array([f"{x:012d}" for x in b], pa.string())})

    comp = connected_components(pairs.map_batches(pad,
                                                  batch_format="pyarrow"))
    comp_df = comp.to_pandas()  # bounded by dup volume (see docstring)

    if len(comp_df):
        comp_df["doc_id"] = comp_df["node"].astype("int64")
        member_set = pa.array(sorted(comp_df["doc_id"].tolist()),
                              pa.int64())
        member_ref = ray.put(member_set)

        def member_rows(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t["doc_id"],
                                  value_set=ray.get(member_ref)))
            return t.select(["doc_id", "n_chars"])

        members = (docs.map_batches(member_rows, batch_format="pyarrow")
                   .to_pandas())  # same dup-volume bound
        m = comp_df.merge(members, on="doc_id")
        m = m.sort_values(["component", "n_chars", "doc_id"],
                          ascending=[True, False, True])
        winners = m.groupby("component", sort=False).head(1)["doc_id"]
        dropped = m[~m["doc_id"].isin(set(winners))]["doc_id"]
        drop_set = pa.array(sorted(int(x) for x in dropped), pa.int64())
    else:
        drop_set = pa.array([], pa.int64())
    drop_ref = ray.put(drop_set)

    def survivors(t: pa.Table) -> pa.Table:
        ds_ = ray.get(drop_ref)
        if len(ds_):
            t = t.filter(pc.invert(pc.is_in(t["doc_id"], value_set=ds_)))
        return t.select(["doc_id", "n_chars"])

    return docs.map_batches(survivors, batch_format="pyarrow")
