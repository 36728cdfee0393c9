"""Driver contract for the Ray-Data-native KG-construction engine.

``queries()`` exposes every implemented operator/pipeline (SURVEY.md §2 +
the training-data ops); ``oracle_sql()`` gives the DuckDB-equivalent SQL
over the same parquet tables wherever the op is SQL-expressible. The KG
pipelines run over a `pages` corpus synthesized *deterministically* from
the ``documents`` table (see sources/pages.py — the synthesis spec), so
the oracles regenerate the expected triples with plain SQL.

Ray is initialised by the driver before this module is imported; nothing
here calls ``ray.init()``/``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# ---------------------------------------------------------------------------
# Shared SQL fragments (mirror sources/pages.py synthesis spec verbatim)

_U_CTE = """
WITH u AS (
  SELECT doc_id,
         'https://ex' || (doc_id % 20)::VARCHAR || '.org/p/' || doc_id::VARCHAR AS url,
         'https://ex' || (doc_id % 20)::VARCHAR || '.org/' AS domain,
         strftime(make_timestamp(1700000000000000 + doc_id * 86400000000),
                  '%Y-%m-%dT%H:%M:%SZ') AS iso_ts,
         lang, text,
         (doc_id % 97 = 0) AS malformed
  FROM documents
)
"""

_PAGE_QUADS_SQL = """
SELECT 'kg:web' AS graph, url AS subj, 'rdf:type' AS pred, 'kg:WebPage' AS obj,
       FALSE AS obj_is_literal, '' AS obj_datatype, url AS src_url FROM u
UNION ALL
SELECT 'kg:web', url, 'kg:fetchedAt', iso_ts, TRUE, 'xsd:dateTime', url FROM u
UNION ALL
SELECT 'kg:web', url, 'kg:lang', lang, TRUE, '', url FROM u
UNION ALL
SELECT 'kg:web', url, 'kg:domain', domain, FALSE, '', url FROM u
"""

_META_QUADS_SQL = """
SELECT 'kg:web' AS graph, url AS subj, 'kg:title' AS pred,
       'Doc ' || doc_id::VARCHAR AS obj, TRUE AS obj_is_literal,
       '' AS obj_datatype, url AS src_url FROM u WHERE NOT malformed
UNION ALL
SELECT 'kg:web', url, 'kg:description', 'About ' || split_part(text, ' ', 1),
       TRUE, '', url FROM u WHERE NOT malformed AND doc_id % 11 <> 0
UNION ALL
SELECT 'kg:web', url, 'kg:keywords',
       'kw' || (doc_id % 5)::VARCHAR ||
       CASE WHEN doc_id % 13 = 0 THEN ',' || chr(10) ELSE ',' END || 'alpha',
       TRUE, '', url FROM u WHERE NOT malformed
UNION ALL
SELECT 'kg:web', url, 'kg:state',
       CASE WHEN doc_id % 19 = 0 THEN 'kg:Inactive' ELSE 'kg:Active' END,
       FALSE, '', url FROM u WHERE NOT malformed
"""

_FACT_QUADS_SQL = """
SELECT 'kg:web' AS graph,
       'ent:e' || (doc_id % 41)::VARCHAR AS subj,
       CASE doc_id % 3 WHEN 0 THEN 'kg:worksWith'
                       WHEN 1 THEN 'kg:acquired'
                       ELSE 'kg:basedIn' END AS pred,
       CASE WHEN doc_id % 17 = 0
            THEN 'ent:sk:widget' || (doc_id % 29)::VARCHAR
            ELSE 'ent:e' || ((7 * doc_id + 3) % 41)::VARCHAR END AS obj,
       FALSE AS obj_is_literal, '' AS obj_datatype, url AS src_url
FROM u WHERE NOT malformed
"""


def entry() -> Any:
    """Flagship pipeline (pages → canonical deduplicated quads) at sf0.001."""
    from fcrepo3_rdf_extractor_ray.pipelines.kg import run_kg

    return run_kg("/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# queries

def _q_kg_page_quads(sf_dir: str):
    from fcrepo3_rdf_extractor_ray.pipelines.kg import pages_for_sf
    from fcrepo3_rdf_extractor_ray.stages.extract import page_quads_batch

    return pages_for_sf(sf_dir).map_batches(page_quads_batch,
                                            batch_format="pyarrow")


def _q_kg_meta_quads(sf_dir: str):
    import pyarrow as pa

    from fcrepo3_rdf_extractor_ray.functions.textextract import (
        PageParseError, parse_page)
    from fcrepo3_rdf_extractor_ray.pipelines.kg import pages_for_sf
    from fcrepo3_rdf_extractor_ray.stages.extract import meta_quad_rows
    from fcrepo3_rdf_extractor_ray.stages.filters import skip_empty_literals_table
    from fcrepo3_rdf_extractor_ray.schema import empty_quads_table, quads_table

    def fn(t: pa.Table) -> pa.Table:
        rows = []
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            try:
                rows.extend(meta_quad_rows(url, parse_page(html)))
            except PageParseError:
                continue
        if not rows:
            return empty_quads_table()
        return skip_empty_literals_table(quads_table(*zip(*rows)))

    return pages_for_sf(sf_dir).map_batches(fn, batch_format="pyarrow")


def _q_kg_fact_quads(sf_dir: str):
    from fcrepo3_rdf_extractor_ray.pipelines.kg import (extract_raw_quads,
                                                        pages_for_sf)
    from fcrepo3_rdf_extractor_ray.sources.pages import build_alias_table
    from fcrepo3_rdf_extractor_ray.stages.canonicalize import (
        build_entity_map, resolve_quads)
    import pyarrow.compute as pc

    raw = extract_raw_quads(pages_for_sf(sf_dir))
    facts = raw.map_batches(
        lambda t: t.filter(pc.is_in(t["pred"], value_set=__import__("pyarrow")
                                    .array(["kg:worksWith", "kg:acquired",
                                            "kg:basedIn"]))),
        batch_format="pyarrow",
    ).materialize()
    mapping = build_entity_map(facts, build_alias_table())
    return resolve_quads(facts, mapping)


def _q_kg_quads_all(sf_dir: str):
    from fcrepo3_rdf_extractor_ray.pipelines.kg import run_kg

    return run_kg(sf_dir)


def _q_kg_extracted_text(sf_dir: str):
    from fcrepo3_rdf_extractor_ray.pipelines.kg import pages_for_sf
    from fcrepo3_rdf_extractor_ray.stages.extract import ExtractTextStage

    return pages_for_sf(sf_dir).map_batches(
        ExtractTextStage, batch_format="pyarrow",
        concurrency=__import__("fcrepo3_rdf_extractor_ray.runtime", fromlist=["pool"]).pool(0.5)
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "kg_page_quads": _q_kg_page_quads,
        "kg_meta_quads": _q_kg_meta_quads,
        "kg_fact_quads": _q_kg_fact_quads,
        "kg_quads_all": _q_kg_quads_all,
        "kg_extracted_text": _q_kg_extracted_text,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kg_page_quads": _U_CTE + _PAGE_QUADS_SQL,
        "kg_meta_quads": _U_CTE + _META_QUADS_SQL,
        "kg_fact_quads": _U_CTE + _FACT_QUADS_SQL,
        "kg_quads_all": (
            _U_CTE
            + "SELECT graph, subj, pred, obj, obj_is_literal, obj_datatype,\n"
            + "       min(src_url) AS src_url, count(*) AS n_src FROM (\n"
            + _PAGE_QUADS_SQL
            + " UNION ALL "
            + _META_QUADS_SQL
            + " UNION ALL "
            + _FACT_QUADS_SQL
            + ") q GROUP BY 1, 2, 3, 4, 5, 6"
        ),
        "kg_extracted_text": _U_CTE + "SELECT url, text FROM u WHERE NOT malformed",
    }
