"""IRI/key normalization parity tests (the ObjectProcessorTest.java:101-143
layer: idempotent prefixing, reversible percent-encoding, hash-path
prefixing)."""

from hypothesis import given, strategies as st

from fcrepo3_rdf_extractor_ray.functions.iri import (
    from_page_iri,
    hash_prefix,
    to_page_iri,
    url_normalize,
)


def test_url_normalize_rules():
    assert url_normalize("HTTPS://ExAmPle.ORG:443/Path?q=1#frag") == \
        "https://example.org/Path?q=1"
    assert url_normalize("http://a.org:8080/x") == "http://a.org:8080/x"
    assert url_normalize("http://a.org") == "http://a.org/"


def test_url_normalize_idempotent():
    u = "https://Ex1.org:443/p/7?a=b#c"
    assert url_normalize(url_normalize(u)) == url_normalize(u)


def test_to_page_iri_idempotent_prefixing():
    # getBlobId contract: already-prefixed values pass through unchanged
    iri = to_page_iri("https://ex1.org/p/7")
    assert iri.startswith("page:")
    assert to_page_iri(iri) == iri


def test_page_iri_roundtrip():
    url = "https://ex1.org/p/7?q=a b&x=%20"
    assert from_page_iri(to_page_iri(url)) == url_normalize(url)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=1, max_size=40))
def test_page_iri_roundtrip_property(path):
    url = "https://ex.org/" + path
    n = url_normalize(url)
    assert from_page_iri(to_page_iri(n)) == n


def test_hash_prefix_stable_layout():
    assert hash_prefix("abc") == hash_prefix("abc")
    p = hash_prefix("abc", depth=2, width=2)
    parts = p.split("/")
    assert len(parts) == 2 and all(len(x) == 2 for x in parts)
    assert hash_prefix("abc") != hash_prefix("abd")
