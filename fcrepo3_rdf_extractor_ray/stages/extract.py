"""Per-page extraction stages (the map core, SURVEY.md §2.2).

``ExtractQuadsStage`` is the fused single-pass analog of the reference's
``ObjectProcessor.accept`` (ObjectProcessor.java:142-177): one HTML parse
per page emits constant page quads (M2), metadata quads (M4), and raw
fact quads (M5) together, with per-row error containment (P4,
ObjectProcessor.java:172-176) — a data error never fails the task, it is
counted and the page still contributes its constant quads.

It is a callable class for ``map_batches(..., concurrency=N)``: regexes
and dictionaries are bound once per actor in ``__init__`` (the W1
pattern — one long-lived ObjectProcessor per worker,
ObjectProcessor.java:96-139).

The unfused building blocks (``extract_text_batch``, ``page_quads_batch``)
exist for composition and unit testing; the flagship pipeline uses the
fused stage so the expensive parse happens exactly once per page.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.normalize import norm_surface
from ..functions.textextract import PageParseError, ParsedPage, parse_page
from ..schema import (
    GRAPH_IRI,
    ISO_FMT,
    KG_ACTIVE,
    KG_DOMAIN,
    KG_FETCHED_AT,
    KG_LANG,
    KG_STATE,
    KG_TITLE,
    KG_WEBPAGE,
    META_WHITELIST,
    RDF_TYPE,
    VERB_PRED,
    XSD_DATETIME,
    quads_table,
    robots_state,
)

SURF_PREFIX = "surf:"  # marks an unresolved entity (normalized surface form)


# ---------------------------------------------------------------------------
# Vectorized constant-quad projection (M2 analog: pure column ops, no loop)

def page_quads_batch(batch: pa.Table) -> pa.Table:
    """4 constant quads per page from (url, warc_ts, lang) columns only —
    emitted even for malformed pages, like the reference's constant object
    triples (ObjectProcessor.java:235-246)."""
    n = batch.num_rows
    url = batch["url"]
    # cast to second resolution first: Arrow's %S emits fractional digits,
    # and the contract is ISO_INSTANT with no sub-second zeros (isoDate,
    # ObjectProcessor.java:272-274)
    iso = pc.strftime(pc.cast(batch["warc_ts"], pa.timestamp("s")), format=ISO_FMT)
    domain = pc.replace_substring_regex(url, pattern=r"^(https://[^/]+/).*$", replacement=r"\1")
    empty = pa.nulls(n, pa.string()).fill_null("")

    def const(s):
        return pa.array([s] * n, pa.string())

    parts = [
        quads_table(const(GRAPH_IRI), url, const(RDF_TYPE), const(KG_WEBPAGE),
                    pa.array([False] * n), empty, url),
        quads_table(const(GRAPH_IRI), url, const(KG_FETCHED_AT), iso,
                    pa.array([True] * n), const(XSD_DATETIME), url),
        quads_table(const(GRAPH_IRI), url, const(KG_LANG), batch["lang"],
                    pa.array([True] * n), empty, url),
        quads_table(const(GRAPH_IRI), url, const(KG_DOMAIN), domain,
                    pa.array([False] * n), empty, url),
    ]
    return pa.concat_tables(parts)


# ---------------------------------------------------------------------------
# Row-wise parsed extractions (shared by fused and unfused paths)

def meta_quad_rows(url: str, page: ParsedPage) -> list[tuple]:
    """(graph, subj, pred, obj, is_lit, dt, src) rows for title/meta/state.
    Non-whitelisted meta names are dropped (F3 analog); newline-bearing
    values preserved verbatim (DublinCoreContentHandlerTest.java:94-97)."""
    rows = []
    if page.title is not None:
        rows.append((GRAPH_IRI, url, KG_TITLE, page.title, True, "", url))
    state = KG_ACTIVE
    for name, content in page.metas:
        if name == "robots":
            state = robots_state(content)
        elif name in META_WHITELIST:
            rows.append((GRAPH_IRI, url, META_WHITELIST[name], content, True, "", url))
    rows.append((GRAPH_IRI, url, KG_STATE, state, False, "", url))
    return rows


_FACT_RE = None


def _fact_regex():
    global _FACT_RE
    if _FACT_RE is None:
        import re

        verbs = "|".join(sorted(VERB_PRED, key=len, reverse=True))
        _FACT_RE = re.compile(rf"^(.+?) ({verbs}) (.+?)\.$")
    return _FACT_RE


def fact_rows_for_page(url: str, page: ParsedPage) -> list[tuple]:
    """OpenIE-style (src_url, subj_surface, verb, obj_surface) rows from the
    page's candidate fact sentences (M5 analog — arbitrary body triples)."""
    rx = _fact_regex()
    out = []
    for sent in page.fact_sentences:
        m = rx.match(sent)
        if m:
            out.append((url, m.group(1), m.group(2), m.group(3)))
    return out


def fact_quad_rows(fact_rows: list[tuple]) -> list[tuple]:
    """Raw fact quads: entities carried as ``surf:<normalized>`` until the
    canonicalization shuffle resolves them."""
    rows = []
    for url, s, verb, o in fact_rows:
        rows.append(
            (GRAPH_IRI, SURF_PREFIX + norm_surface(s), VERB_PRED[verb],
             SURF_PREFIX + norm_surface(o), False, "", url)
        )
    return rows


def _rows_to_quads(rows: list[tuple]) -> pa.Table:
    if not rows:
        from ..schema import empty_quads_table

        return empty_quads_table()
    cols = list(zip(*rows))
    return quads_table(*cols)


# ---------------------------------------------------------------------------
# Fused stage

def extract_quads_batch(batch: pa.Table,
                        skip_empty_literals: bool = True) -> pa.Table:
    """Stateless fused extraction (task form): the only per-worker state
    is module-level compiled regexes, so the default pipeline runs this
    as ordinary tasks on the long-lived warm workers — no actor-pool
    spawn/ramp cost per run. ``ExtractQuadsStage`` (below) is the
    actor-pool form for stages that genuinely hold state (lineage
    reporting, and the slot where model-backed NER/OpenIE would load)."""
    const_quads = page_quads_batch(batch)
    rows: list[tuple] = []
    for url, html in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
        try:
            # Whole per-page derivation is inside the containment boundary:
            # a malformed page (parse failure, unexpected enum value in
            # robots/meta, bad date) must never fail the task — mirrors the
            # reference's per-object catch-all (ObjectProcessor.java:172-176).
            page = parse_page(html)
            page_rows = list(meta_quad_rows(url, page))
            page_rows.extend(fact_quad_rows(fact_rows_for_page(url, page)))
        except Exception:
            continue  # contained: constant quads already emitted
        rows.extend(page_rows)
    out = pa.concat_tables([const_quads, _rows_to_quads(rows)])
    if skip_empty_literals:
        from .filters import skip_empty_literals_table

        out = skip_empty_literals_table(out)
    return out


class ExtractQuadsStage:
    """pages batch → quads batch (constant + meta + raw-fact), one parse
    per page, errors contained per row. Use via::

        ds.map_batches(ExtractQuadsStage, batch_format="pyarrow",
                       concurrency=N, batch_size=B)
    """

    def __init__(self, skip_empty_literals: bool = True,
                 collector=None, shard_label: str = "-"):
        self.skip_empty_literals = skip_empty_literals
        self.errors = 0  # per-actor data-error counter (W3 analog)
        self.shard_label = shard_label
        self._collector = collector  # driver-owned LineageCollector handle
        _fact_regex()  # compile once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        t0 = _time.perf_counter()
        errors_before = self.errors
        const_quads = page_quads_batch(batch)
        rows: list[tuple] = []
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        for url, html in zip(urls, htmls):
            try:
                # Containment boundary covers the whole per-page derivation
                # (parse + meta enums + facts), matching the reference's
                # per-object catch-all (ObjectProcessor.java:172-176): a data
                # error never fails the task, and is counted per actor.
                page = parse_page(html)
                page_rows = list(meta_quad_rows(url, page))
                page_rows.extend(fact_quad_rows(fact_rows_for_page(url, page)))
            except Exception:
                self.errors += 1  # contained: constant quads already emitted
                continue
            rows.extend(page_rows)
        out = pa.concat_tables([const_quads, _rows_to_quads(rows)])
        if self.skip_empty_literals:
            from .filters import skip_empty_literals_table

            out = skip_empty_literals_table(out)
        if self._collector is not None:
            # synchronous per-batch lineage record (W3 analog): the batch
            # completes only after the record lands, so a committed
            # checkpoint always has its lineage (a fire-and-forget send
            # from a dying actor pool can be dropped). One tiny message
            # per batch; at multi-node scale shard the collector.
            import ray

            ray.get(self._collector.add.remote(
                "extract", self.shard_label, 0, batch.num_rows,
                out.num_rows, self.errors - errors_before,
                (_time.perf_counter() - t0) * 1000,
            ))
        return out


def extract_text_batch(batch: pa.Table, lenient: bool = False) -> pa.Table:
    """Task form of ``ExtractTextStage`` — the parse has no per-worker
    state beyond module-level compiled regexes, so warm-worker tasks
    beat paying an actor-pool ramp. Same output, errors contained per
    row (rows dropped).

    ``lenient=True`` swaps in ``parse_page_lenient`` (best-effort
    real-crawl HTML: arbitrary attribute order, unclosed/uppercase
    tags, broken bytes — never raises, every row yields text). The
    strict default remains the byte-identical oracle contract."""
    from ..functions.textextract import parse_page_lenient

    parse = parse_page_lenient if lenient else parse_page
    urls, texts = [], []
    for url, html in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
        try:
            page = parse(html)
        except PageParseError:
            continue
        urls.append(url)
        texts.append(page.text)
    return pa.table({"url": pa.array(urls, pa.string()),
                     "text": pa.array(texts, pa.string())})


class ExtractTextStage:
    """pages batch → (url, text) with the boilerplate-stripped main text —
    the byte-identical-per-url invariant surface (BASELINE.json
    input_hint). Malformed pages are dropped (error contained per row).
    Actor form (per-actor error counter feeds lineage); the stateless
    task form is ``extract_text_batch``."""

    def __init__(self):
        self.errors = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, texts = [], []
        for url, html in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            try:
                page = parse_page(html)
            except PageParseError:
                self.errors += 1
                continue
            urls.append(url)
            texts.append(page.text)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "text": pa.array(texts, pa.string())})


def parse_pages(pages_ds, batch_size: int = 4096):
    """pages → structured parsed rows (ParsePagesStage in task form):
    the PARSE-ONCE backbone. Downstream quad extraction AND mention
    detection both read this dataset, so ``parse_page`` runs exactly
    once per page per run (the html column dies here — the parsed table
    carries only text/title/metas/fact_sentences)."""
    def fn(t: pa.Table) -> pa.Table:
        return ParsePagesStage()(t)

    return pages_ds.map_batches(fn, batch_format="pyarrow",
                                batch_size=batch_size)


def extract_quads_from_parsed(parsed_ds, skip_empty_literals: bool = True,
                              batch_size: int = 4096):
    """Quads from an already-parsed pages dataset — byte-identical
    output to ``extract_quads_batch`` (same constant/meta/fact rows,
    same containment: a malformed page, parse_ok=false, emits only its
    constant quads), but with no ``parse_page`` call: the parse-once
    path for runs that also need mentions from the same parse."""
    def fn(batch: pa.Table, skip_empty_literals: bool = True) -> pa.Table:
        const_quads = page_quads_batch(batch)
        rows: list[tuple] = []
        for url, ok, title, names, vals, sents in zip(
                batch["url"].to_pylist(), batch["parse_ok"].to_pylist(),
                batch["title"].to_pylist(),
                batch["meta_names"].to_pylist(),
                batch["meta_values"].to_pylist(),
                batch["fact_sentences"].to_pylist()):
            if not ok:
                continue  # contained at parse time: constant quads only
            try:
                page = ParsedPage(title=title,
                                  metas=list(zip(names, vals)),
                                  fact_sentences=sents or [])
                page_rows = list(meta_quad_rows(url, page))
                page_rows.extend(fact_quad_rows(fact_rows_for_page(url, page)))
            except Exception:
                continue
            rows.extend(page_rows)
        out = pa.concat_tables([const_quads, _rows_to_quads(rows)])
        if skip_empty_literals:
            from .filters import skip_empty_literals_table

            out = skip_empty_literals_table(out)
        return out

    return parsed_ds.map_batches(
        fn, fn_kwargs={"skip_empty_literals": skip_empty_literals},
        batch_format="pyarrow", batch_size=batch_size)


class ParsePagesStage:
    """pages batch → one structured row per page (unfused path): url,
    parse_ok, title, meta names/values, text, fact sentence list. Feeds the
    separate NER / OpenIE / meta stages and unit tests."""

    def __init__(self):
        self.errors = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"url": [], "parse_ok": [], "title": [], "meta_names": [],
               "meta_values": [], "text": [], "fact_sentences": [],
               "warc_ts": [], "lang": []}
        ts = batch["warc_ts"].to_pylist()
        langs = batch["lang"].to_pylist()
        for i, (url, html) in enumerate(
            zip(batch["url"].to_pylist(), batch["html"].to_pylist())
        ):
            out["url"].append(url)
            out["warc_ts"].append(ts[i])
            out["lang"].append(langs[i])
            try:
                page = parse_page(html)
            except PageParseError:
                self.errors += 1
                out["parse_ok"].append(False)
                out["title"].append(None)
                out["meta_names"].append([])
                out["meta_values"].append([])
                out["text"].append("")
                out["fact_sentences"].append([])
                continue
            out["parse_ok"].append(True)
            out["title"].append(page.title)
            out["meta_names"].append([m[0] for m in page.metas])
            out["meta_values"].append([m[1] for m in page.metas])
            out["text"].append(page.text)
            out["fact_sentences"].append(page.fact_sentences)
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "warc_ts": pa.array(out["warc_ts"], pa.timestamp("us")),
                "lang": pa.array(out["lang"], pa.string()),
                "parse_ok": pa.array(out["parse_ok"], pa.bool_()),
                "title": pa.array(out["title"], pa.string()),
                "meta_names": pa.array(out["meta_names"], pa.list_(pa.string())),
                "meta_values": pa.array(out["meta_values"], pa.list_(pa.string())),
                "text": pa.array(out["text"], pa.string()),
                "fact_sentences": pa.array(out["fact_sentences"], pa.list_(pa.string())),
            }
        )
