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

from esmarc_ray.config import derive_width


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


@derive_width
def watermark_filter(
    events: ray.data.Dataset,
    *,
    ts_column: str = "ts",
    arrival_by: list[str] | None = None,
    delay: str = "1 hours",
    out_column: str = "late",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Streaming watermark / late-data flagging over a replayable stream:
    events are "processed" in ``arrival_by`` order; the watermark after each
    arrival is ``max(event time seen so far) - delay``; an event is LATE when
    its event time is already behind the watermark its predecessors set
    (the allowed-lateness drop rule of a streaming engine, evaluated exactly
    over the static table).

    Distributed as a two-pass prefix max — the streaming-fold analogue of a
    prefix sum, so the sequential fold never serializes on one node:

    1. RANGE-partition on ``arrival_by[0]`` (contiguous arrival spans, not
       hash — prefix semantics need order); one combiner pass emits each
       partition's max event time; the P partial maxima (P rows, nothing
       more) fold into exclusive per-partition offsets on the driver;
    2. each partition sorts locally by ``arrival_by``, takes the running max
       of event time shifted by one, folds in its offset, and flags
       ``ts < prev_max - delay``.  The very first arrival has no watermark
       and is never late.

    Output: input columns + boolean ``out_column``.
    """
    arrival_by = arrival_by or ["event_id"]
    akey = arrival_by[0]
    delay_us = pd.Timedelta(delay).value // 1_000  # ns -> us
    _SENTINEL = np.iinfo(np.int64).min

    bounds = events.aggregate(
        ray.data.aggregate.Min(akey), ray.data.aggregate.Max(akey)
    )
    lo, hi = int(bounds[f"min({akey})"]), int(bounds[f"max({akey})"])
    span = max(hi - lo + 1, 1)

    def _part(vals: np.ndarray) -> np.ndarray:
        return np.minimum(
            (vals.astype("int64") - lo) * num_partitions // span,
            num_partitions - 1,
        ).astype("int32")

    def _ts_us(batch: pd.DataFrame) -> np.ndarray:
        return (
            batch[ts_column].astype("datetime64[ns]").astype("int64") // 1_000
        ).to_numpy()

    def part_max(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"__wpart": _part(batch[akey].to_numpy()), "__mx": _ts_us(batch)}
        )
        return out.groupby("__wpart", as_index=False, sort=False)["__mx"].max()

    partials = partial_groupby_agg(
        events.map_batches(part_max, batch_format="pandas"),
        ["__wpart"],
        {"__mx": ("__mx", "max")},
    ).to_pandas()  # P rows — the fold's entire driver footprint
    partials = partials.sort_values("__wpart")
    offsets = np.full(num_partitions, _SENTINEL, dtype="int64")
    run = _SENTINEL
    for p, mx in zip(partials["__wpart"], partials["__mx"]):
        offsets[int(p)] = run  # exclusive: parts BEFORE p
        run = max(run, int(mx))
        # parts after the last non-empty one inherit the full prefix
    seen = set(partials["__wpart"].astype(int))
    for p in range(num_partitions):
        if p not in seen and p > 0:
            offsets[p] = max(offsets[p], offsets[p - 1])

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__part"] = _part(batch[akey].to_numpy())
        return batch

    def flag(part: pd.DataFrame) -> pd.DataFrame:
        out = (
            part.drop(columns="__part")
            .sort_values(arrival_by)
            .reset_index(drop=True)
        )
        ts_us = (
            out[ts_column].astype("datetime64[ns]").astype("int64") // 1_000
        ).to_numpy()
        run_local = np.maximum.accumulate(ts_us)
        prev = np.concatenate(([_SENTINEL], run_local[:-1]))
        off = offsets[int(part["__part"].iloc[0])]
        prev = np.maximum(prev, off)
        out[out_column] = (prev != _SENTINEL) & (ts_us < prev - delay_us)
        return out

    return (
        events.map_batches(add_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(flag, batch_format="pandas")
    )


@derive_width
def debounce(
    ds: "ray.data.Dataset",
    keys: list[str],
    ts_column: str,
    *,
    gap_us: int,
    order_tiebreak: list[str] | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Debounce / rate-limit dedup over an event stream: within each key
    group (ordered by time), an event survives only if the PREVIOUS event of
    the same key is more than ``gap_us`` microseconds older — the standard
    telemetry/click-stream cleanup that collapses double-fires and retry
    storms to their first occurrence.

    Note the chained semantics (matching SQL ``lag``): the gap compares to
    the previous RAW event, not the previous survivor — three events 40 s
    apart under a 60 s gap keep only the first... second comparison is
    40 s < 60 s to event 2, not 80 s to event 1.  One hash-partitioned
    shuffle on the keys; change detection is a vectorized grouped shift."""
    from esmarc_ray.ops.relational import partitioned_final

    tiebreak = order_tiebreak or []

    def final(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(keys + [ts_column] + tiebreak, kind="mergesort")
        us = part[ts_column].to_numpy().astype("datetime64[us]").astype("int64")
        part = part.assign(__us=us)
        prev = part.groupby(keys)["__us"].shift(1)
        keep = prev.isna() | ((part["__us"] - prev) > gap_us)
        return part.loc[keep].drop(columns="__us")

    return partitioned_final(ds, keys, final, num_partitions=num_partitions)


@derive_width
def funnel_steps(
    ds: "ray.data.Dataset",
    user_column: str,
    type_column: str,
    ts_column: str,
    steps: list[str],
    *,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Ordered funnel analysis: for each user, step k counts only if an
    event of ``steps[k]`` happens STRICTLY AFTER the user's step-(k-1)
    anchor time (anchor = the EARLIEST qualifying occurrence, the standard
    product-analytics rule).  Returns one row per step — (step_idx, step,
    n_users) — monotonically non-increasing down the funnel.

    One shuffle hash-partitioned by user; inside a partition every step
    resolves as a vectorized grouped min over the user's events (no per-user
    Python dispatch), and only the |steps|-row count table leaves."""
    from esmarc_ray.ops.relational import partitioned_final

    def final(part: pd.DataFrame) -> pd.DataFrame:
        counts = []
        anchor = None  # Series: user -> anchor ts of previous step
        for k, step in enumerate(steps):
            ev = part[part[type_column] == step]
            if anchor is not None:
                prev = ev[user_column].map(anchor)
                ev = ev[prev.notna() & (ev[ts_column] > prev)]
            anchor = ev.groupby(user_column)[ts_column].min()
            counts.append(
                {"step_idx": k + 1, "step": step, "n_users": int(len(anchor))}
            )
        return pd.DataFrame(counts, columns=["step_idx", "step", "n_users"])

    partials = partitioned_final(
        ds.select_columns([user_column, type_column, ts_column]),
        [user_column],
        final,
        num_partitions=num_partitions,
    )

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["step_idx", "step"], as_index=False)["n_users"].sum()
        return g

    return partials.repartition(1).map_batches(
        fold, batch_format="pandas", batch_size=None
    )
