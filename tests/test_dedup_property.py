"""Property-based dedup verification: on random quad tables, the Ray
dedup operator must agree with a DuckDB GROUP BY, for any salt/partition
configuration (hypothesis drives the shapes; the Ray round-trip runs on
a small deterministic subset of examples to keep session cost sane)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from fcrepo3_rdf_extractor_ray.schema import quads_table
from fcrepo3_rdf_extractor_ray.stages.dedup import dedup_quads


def _random_quads(seed: int, n: int) -> pa.Table:
    rng = np.random.RandomState(seed)
    subs = [f"s{rng.randint(5)}" for _ in range(n)]
    preds = [f"p{rng.randint(3)}" for _ in range(n)]
    objs = [f"o{rng.randint(4)}" for _ in range(n)]
    lits = [bool(rng.randint(2)) for _ in range(n)]
    dts = ["" if rng.randint(2) else "xsd:string" for _ in range(n)]
    srcs = [f"u{rng.randint(7)}" for _ in range(n)]
    return quads_table(["g"] * n, subs, preds, objs, lits, dts, srcs)


@pytest.mark.parametrize("seed,n,n_salts,n_parts", [
    (0, 50, 1, 4), (1, 200, 4, 8), (2, 333, 2, 16), (3, 10, 4, 64),
])
def test_dedup_matches_duckdb(seed, n, n_salts, n_parts):
    import ray.data as rd

    t = _random_quads(seed, n)
    ds = rd.from_arrow(t).repartition(3)
    got = dedup_quads(ds, n_salts=n_salts, n_parts=n_parts).to_pandas()

    con = duckdb.connect()
    con.register("q", t)
    want = con.execute("""
        SELECT graph, subj, pred, obj, obj_is_literal, obj_datatype,
               min(src_url) AS src_url, count(*) AS n_src
        FROM q GROUP BY 1,2,3,4,5,6
    """).df()
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert g.astype(str).equals(w.astype(str)), (seed, n, n_salts, n_parts)
