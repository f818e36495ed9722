"""Tumbling / sliding window aggregate tests vs DuckDB."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
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


def test_watermark_filter_flags_late_events(ray_session):
    """Watermark = running max(ts) - delay over arrival order; first arrival
    never late; prefix max crosses partition boundaries."""
    from esmarc_ray.ops.windows import watermark_filter

    base = pd.Timestamp("2026-07-01")
    # arrival order 0..5; event times (minutes): 0, 120, 30, 115, 200, 45
    # delay 60min: wm after arrivals: -inf, 0, 120, 120, 120, 200
    # late if ts < wm - 60: a2 (30 < 120-60=60) late, a3 (115 >= 60) ok,
    # a5 (45 < 200-60=140) late
    mins = [0, 120, 30, 115, 200, 45]
    df = pd.DataFrame(
        {
            "arrival": range(6),
            "event_id": range(6),
            "ts": [base + pd.Timedelta(minutes=m) for m in mins],
        }
    )
    got = (
        watermark_filter(
            ray.data.from_pandas(df),
            ts_column="ts",
            arrival_by=["arrival", "event_id"],
            delay="60 minutes",
            num_partitions=3,  # arrival span 0..5 -> 2 arrivals/partition
        )
        .to_pandas()
        .sort_values("arrival")
    )
    assert got["late"].tolist() == [False, False, True, False, False, True]


def test_split_ngram_overlap_planted(ray_session):
    """Test doc sharing its whole text with a train doc scores overlap 1;
    a disjoint test doc scores 0."""
    import ray.data

    from esmarc_ray.ops.text import split_ngram_overlap

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [shared, shared, "one two three four five six seven eight nine"],
            "lang": ["en", "en", "fr"],
            "split": ["train", "test", "test"],
        }
    )
    out = split_ngram_overlap(ray.data.from_pandas(rows)).sort_values("lang")
    assert out.loc[out["lang"] == "en", "overlap"].iloc[0] == 1.0
    assert out.loc[out["lang"] == "fr", "overlap"].iloc[0] == 0.0
