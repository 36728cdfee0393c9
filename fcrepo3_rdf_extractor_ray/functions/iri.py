"""IRI / key normalization (the ``getBlobId`` analog).

The reference normalizes tokens into blob ids with UTF-8
percent-encoding of segments and *idempotent* prefixing
(``ObjectProcessor.getBlobId``, ObjectProcessor.java:293-341: a value
already carrying the ``info:fedora/`` prefix passes through unchanged),
and maps ids to filesystem paths via reversible encoding
(HashPathIdMapper.java:162-195). The web-corpus analogs:

- ``to_page_iri`` — idempotent ``page:`` prefixing with percent-encoded
  authority+path segments; round-trips via ``from_page_iri``.
- ``url_normalize`` — scheme/host case-fold, default-port drop,
  trailing-slash and fragment handling (deterministic, idempotent).
- ``hash_prefix`` — the MD5-hash-path layout analog
  (HashPathIdMapper.java:145-160): a stable short prefix for
  partition-directory naming.
"""

from __future__ import annotations

import hashlib
from urllib.parse import quote, unquote, urlsplit, urlunsplit

PAGE_PREFIX = "page:"

_SAFE = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-._~/:"


def url_normalize(url: str) -> str:
    """Deterministic, idempotent URL normalization: lowercase scheme and
    host, drop default ports and fragments, keep path/query verbatim,
    '/' path for empty path."""
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    if port and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    path = parts.path or "/"
    return urlunsplit((scheme, host, path, parts.query, ""))


def to_page_iri(url_or_iri: str) -> str:
    """url → ``page:`` IRI with percent-encoded remainder. Idempotent:
    an already-prefixed IRI passes through unchanged (the
    ``getBlobId`` prefix-idempotence contract)."""
    if url_or_iri.startswith(PAGE_PREFIX):
        return url_or_iri
    return PAGE_PREFIX + quote(url_normalize(url_or_iri), safe=_SAFE)


def from_page_iri(iri: str) -> str:
    """Reverse of ``to_page_iri`` (reversible encoding contract)."""
    if not iri.startswith(PAGE_PREFIX):
        raise ValueError(f"not a page IRI: {iri!r}")
    return unquote(iri[len(PAGE_PREFIX):])


def hash_prefix(key: str, depth: int = 2, width: int = 2) -> str:
    """MD5-hash-path partition prefix, e.g. 'a3/f1' — the
    HashPathIdMapper layout analog for output-directory sharding."""
    h = hashlib.md5(key.encode("utf-8")).hexdigest()
    return "/".join(h[i * width:(i + 1) * width] for i in range(depth))
