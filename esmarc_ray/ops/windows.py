"""Time-window aggregates over an event stream, Ray-Data-first.

The reference engine is batch-only (SURVEY.md §1.1: "no windows, no
watermarks"); these operators add the windowed-aggregate family a
training-data / telemetry pipeline needs:

* :func:`tumbling_window` — non-overlapping fixed windows: floor the
  timestamp to the window start inside ``map_batches`` (vectorized), then a
  partial/final groupby — the shuffle moves one partial row per
  (batch × window × key), never the events.
* :func:`sliding_window` — overlapping windows (width > slide): each event
  belongs to exactly ``width // slide`` windows, materialized with a
  vectorized numpy repeat inside ``map_batches`` (a flat_map would build
  Python rows), then the same partial/final groupby.  The fan-out factor is
  the knob to watch at scale: shuffle volume is (width/slide) × partial rows.

Both emit ``window_start`` as epoch seconds (int64) — deterministic across
engines and timezone-free, which is what makes the DuckDB oracles exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from esmarc_ray.ops.relational import partial_groupby_agg


def _epoch_seconds(ts: pd.Series) -> np.ndarray:
    # normalize to ns first — pandas 2.x preserves the parquet unit (us/ms),
    # so a bare astype(int64) would be unit-dependent
    return (ts.astype("datetime64[ns]").astype("int64") // 1_000_000_000).to_numpy()


def tumbling_window(
    events: ray.data.Dataset,
    *,
    ts_column: str = "ts",
    width_s: int = 3600,
    keys: list[str] | None = None,
    aggs: dict[str, tuple[str, str]],
) -> ray.data.Dataset:
    """Fixed non-overlapping windows of ``width_s`` seconds, optionally
    sub-grouped by ``keys``; ``aggs`` as in :func:`partial_groupby_agg`."""
    keys = keys or []
    agg_cols = sorted({src for src, _ in aggs.values()})

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[keys + agg_cols].copy()
        es = _epoch_seconds(batch[ts_column])
        out["window_start"] = (es // width_s) * width_s
        return out

    return partial_groupby_agg(events, ["window_start"] + keys, aggs, pre_map=bucket)


def sliding_window(
    events: ray.data.Dataset,
    *,
    ts_column: str = "ts",
    width_s: int = 3600,
    slide_s: int = 900,
    keys: list[str] | None = None,
    aggs: dict[str, tuple[str, str]],
) -> ray.data.Dataset:
    """Overlapping windows: width ``width_s``, advancing every ``slide_s``.

    ``width_s`` must be a multiple of ``slide_s``; every event lands in
    exactly ``width_s // slide_s`` windows (the window starting at
    ``floor(t/slide)*slide`` and the ``n-1`` preceding starts).
    """
    if width_s % slide_s:
        raise ValueError("width_s must be a multiple of slide_s")
    fanout = width_s // slide_s
    keys = keys or []
    agg_cols = sorted({src for src, _ in aggs.values()})

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        es = _epoch_seconds(batch[ts_column])
        base = (es // slide_s) * slide_s
        # row i repeated fanout times, window starts base, base-slide, ...
        rep = np.repeat(np.arange(len(batch)), fanout)
        shift = np.tile(np.arange(fanout, dtype=np.int64) * slide_s, len(batch))
        out = batch.iloc[rep][keys + agg_cols].reset_index(drop=True)
        out["window_start"] = base[rep] - shift
        return out

    return partial_groupby_agg(events, ["window_start"] + keys, aggs, pre_map=expand)
