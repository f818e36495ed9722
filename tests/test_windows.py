"""Tumbling / sliding window aggregate tests vs DuckDB."""

from __future__ import annotations

import duckdb
import numpy as np
import ray.data

from esmarc_ray.ops.windows import sliding_window, tumbling_window

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql: str):
    return duckdb.connect().execute(sql).df()


def test_tumbling_window_matches_duckdb(ray_session):
    events = ray.data.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts", "value"])
    got = (
        tumbling_window(
            events, width_s=900,
            aggs={"n_events": ("value", "count"), "total_value": ("value", "sum")},
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    expected = _duck(
        f"""
        select (floor(epoch(ts))::BIGINT // 900) * 900 ws, count(*) n, sum(value) tv
        from read_parquet('{SF_DIR}/events.parquet') group by 1 order by 1
        """
    )
    assert got["window_start"].tolist() == expected["ws"].tolist()
    assert got["n_events"].tolist() == expected["n"].tolist()
    assert np.allclose(got["total_value"], expected["tv"])


def test_sliding_window_matches_duckdb(ray_session):
    events = ray.data.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts", "value"])
    got = (
        sliding_window(
            events, width_s=3600, slide_s=900,
            aggs={"n_events": ("value", "count"), "total_value": ("value", "sum")},
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    expected = _duck(
        f"""
        select (floor(epoch(ts))::BIGINT // 900) * 900 - g.i * 900 ws, count(*) n, sum(value) tv
        from read_parquet('{SF_DIR}/events.parquet')
        cross join generate_series(0, 3) as g(i)
        group by 1 order by 1
        """
    )
    assert got["window_start"].tolist() == expected["ws"].tolist()
    assert got["n_events"].tolist() == expected["n"].tolist()
    assert np.allclose(got["total_value"], expected["tv"])
    # every event appears in exactly width/slide = 4 windows
    n_events = _duck(f"select count(*) n from read_parquet('{SF_DIR}/events.parquet')")["n"][0]
    assert got["n_events"].sum() == 4 * n_events


def test_sliding_window_rejects_nonmultiple(ray_session):
    import pytest

    events = ray.data.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts", "value"])
    with pytest.raises(ValueError):
        sliding_window(events, width_s=3600, slide_s=1000, aggs={"n": ("value", "count")})
