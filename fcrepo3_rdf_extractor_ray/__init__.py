"""fcrepo3_rdf_extractor_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of the reference
(Smithsonian/fcrepo3-rdf-extractor: per-document triple extraction →
filter → graph-tagging → sharded deduplicated RDF output; see
/root/reference/src/main/java/edu/si/fcrepo/ObjectProcessor.java and
Extract.java) over Common-Crawl-style Parquet web corpora, built on
``ray.data.Dataset`` pipelines:

- stateless ``map_batches`` over zero-copy Arrow for parsing/projection,
- actor pools for stateful stages (NER / OpenIE / entity linking),
- explicit groupby shuffles (SipHash-64 keys, salt-split for head
  entities) for canonicalization and exact dedup,
- streaming execution end-to-end with checkpoint/lineage manifests.

Nothing here calls ``ray.init()``; sessions are owned by callers
(bench.py, CLI, the pytest fixture, or the evaluation driver).
"""

__version__ = "0.1.0"
