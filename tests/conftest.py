import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB connection with the testdata tables registered as views —
    mirrors the driver's oracle harness."""
    import duckdb

    con = duckdb.connect()
    for name in ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


@pytest.fixture()
def docs_ds(sf_dir, ray_session):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def to_pandas(result):
    """Normalize a Dataset / pyarrow Table / pandas DataFrame to pandas."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def assert_frames_equivalent(actual, expected, float_cols=(), atol=1e-9):
    """Order-insensitive frame comparison (the driver's hash-compare
    stand-in): sort columns by name, sort rows by all columns, compare."""
    import pandas as pd

    a, e = to_pandas(actual), to_pandas(expected)
    assert sorted(a.columns) == sorted(e.columns), (
        f"columns differ: {sorted(a.columns)} vs {sorted(e.columns)}")
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    e = e[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(e), f"row counts differ: {len(a)} vs {len(e)}"
    for c in cols:
        if c in float_cols:
            import numpy as np

            assert np.allclose(a[c].astype(float), e[c].astype(float),
                               atol=atol), f"float column {c} differs"
        else:
            av, ev = a[c].tolist(), e[c].tolist()
            assert av == ev, (
                f"column {c} differs; first mismatch: "
                f"{next(((x, y) for x, y in zip(av, ev) if x != y), None)}")
