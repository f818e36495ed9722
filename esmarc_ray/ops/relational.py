"""Generic relational operators expressed Ray-Data-first.

These back the SQL-checkable ``queries()`` entries of the driver contract and
demonstrate the engine's shuffle-avoidance idioms:

* :func:`partial_groupby_agg` — pre-aggregate inside map_batches (combiner),
  then a small final groupby: the shuffle moves one row per (batch × group)
  instead of every input row;
* :func:`broadcast_join` — the small side is pandas-merged inside
  map_batches; zero shuffle of the big side.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd
import ray.data


def partial_groupby_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    pre_map: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
) -> ray.data.Dataset:
    """Partial/final groupby aggregation.

    ``aggs``: output column → (input column, fn) with fn ∈ {sum, count, min,
    max, mean}.  mean is computed as a (sum, count) pair and finalized after
    the shuffle, so the partial step stays associative.
    """
    plan: list[tuple[str, str, str]] = []  # (out, src, fn)
    for out, (src, fn) in aggs.items():
        if fn == "mean":
            plan.append((f"__{out}_sum", src, "sum"))
            plan.append((f"__{out}_cnt", src, "count"))
        else:
            plan.append((out, src, fn))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if pre_map is not None:
            batch = pre_map(batch)
        if batch.empty:
            return pd.DataFrame(columns=keys + [p[0] for p in plan])
        grouped = batch.groupby(keys, as_index=False, sort=False)
        out = grouped.size()[keys]
        for name, src, fn in plan:
            if fn == "count":
                out[name] = grouped[src].count()[src].to_numpy()
            else:
                out[name] = grouped[src].agg(fn)[src].to_numpy()
        return out

    def final(group: pd.DataFrame) -> pd.DataFrame:
        row: dict[str, Any] = {k: [group.iloc[0][k]] for k in keys}
        partials: dict[str, Any] = {}
        for name, _, fn in plan:
            if fn in ("sum", "count"):
                partials[name] = group[name].sum()
            elif fn == "min":
                partials[name] = group[name].min()
            elif fn == "max":
                partials[name] = group[name].max()
        for out, (src, fn) in aggs.items():
            if fn == "mean":
                row[out] = [partials[f"__{out}_sum"] / partials[f"__{out}_cnt"]]
            else:
                row[out] = [partials[out]]
        return pd.DataFrame(row)

    return ds.map_batches(partial, batch_format="pandas").groupby(keys).map_groups(
        final, batch_format="pandas"
    )


def broadcast_join(
    big: ray.data.Dataset,
    small: pd.DataFrame,
    on: str | list[str],
    *,
    how: str = "inner",
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Map-side join: the small table rides in the task closure (serialized
    once per worker), each batch pandas-merges locally — no shuffle."""
    small = small if columns is None else small[columns]

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(small, on=on, how=how)

    return big.map_batches(join, batch_format="pandas")


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: tuple[str, ...],
    *,
    right_on: tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Both-sides-large join: hash-partitioned on the key (Ray's native
    ``Dataset.join``), each partition joined independently — use when the
    small side is too big to broadcast (otherwise prefer
    :func:`broadcast_join`, which moves nothing).  ``num_partitions`` bounds
    per-task memory at ~|side|/P and is the knob to raise with data size."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )


def sort_topk(ds: ray.data.Dataset, by: str, k: int, descending: bool = True) -> ray.data.Dataset:
    """Top-k with per-batch pruning before the global sort: each batch keeps
    its own k rows, so the sort sees ≤ k × n_batches rows."""

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.nlargest(k, by) if descending else batch.nsmallest(k, by)

    return ds.map_batches(prune, batch_format="pandas").sort(by, descending=descending).limit(k)


def topk_per_group(
    ds: ray.data.Dataset,
    group_keys: list[str],
    by: list[str],
    k: int,
    *,
    descending: bool = True,
) -> ray.data.Dataset:
    """Top-k rows per group (the window-function ``row_number() <= k`` idiom).

    Partial prune: each batch keeps its own per-group top-k, so the groupby
    shuffle moves ≤ k rows per (group × batch) instead of the full table.
    ``by`` should end in a unique tie-break column for determinism.
    """
    ascending = [not descending] + [True] * (len(by) - 1)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values(by, ascending=ascending)
            .groupby(group_keys, sort=False)
            .head(k)
        )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(by, ascending=ascending).head(k)

    return (
        ds.map_batches(local_topk, batch_format="pandas")
        .groupby(group_keys)
        .map_groups(final_topk, batch_format="pandas")
    )


def distinct_count(
    ds: ray.data.Dataset,
    group_keys: list[str],
    value_column: str,
    out_name: str = "n_distinct",
) -> ray.data.Dataset:
    """COUNT(DISTINCT value) per group, shuffle-light: each batch first
    drops local duplicates, so the shuffle carries unique (keys, value) pairs
    per batch, then the final group counts the union's uniques."""
    cols = group_keys + [value_column]

    def local_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[cols].drop_duplicates()

    def final(group: pd.DataFrame) -> pd.DataFrame:
        row = {key: [group.iloc[0][key]] for key in group_keys}
        row[out_name] = [group[value_column].nunique()]
        return pd.DataFrame(row)

    return (
        ds.map_batches(local_distinct, batch_format="pandas")
        .groupby(group_keys)
        .map_groups(final, batch_format="pandas")
    )


def broadcast_semi_join(
    big: ray.data.Dataset,
    keys,
    on: str,
    *,
    anti: bool = False,
) -> ray.data.Dataset:
    """Semi/anti join against a broadcast key collection — no shuffle; each
    batch filters locally against the (small) key set."""
    key_set = set(keys)

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        mask = batch[on].isin(key_set)
        return batch[~mask] if anti else batch[mask]

    return big.map_batches(filt, batch_format="pandas")


def broadcast_asof_join(
    left: ray.data.Dataset,
    right: pd.DataFrame,
    *,
    on: str,
    by: str | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> ray.data.Dataset:
    """As-of join: for each left row, the nearest right row at ``on`` ≤/≥ it
    (optionally per ``by`` partition).  The right side is broadcast and each
    batch runs a local ``pandas.merge_asof`` — zero shuffle of the big side.

    Partitioning assumption at scale: the right side fits in worker memory
    (index-sized); otherwise range-partition both sides on ``on`` first.
    """
    right_sorted = right.sort_values(on).reset_index(drop=True)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return batch
        right_local = right_sorted
        if right_local[on].dtype != batch[on].dtype:
            right_local = right_local.copy()
            right_local[on] = right_local[on].astype(batch[on].dtype)
        original_order = batch.index
        merged = pd.merge_asof(
            batch.sort_values(on),
            right_local,
            on=on,
            by=by,
            direction=direction,
            suffixes=("", suffix),
        )
        merged.index = batch.sort_values(on).index
        return merged.loc[original_order].reset_index(drop=True)

    return left.map_batches(join, batch_format="pandas")


def sessionize(
    events: ray.data.Dataset,
    *,
    user_column: str = "user_id",
    ts_column: str = "ts",
    gap: pd.Timedelta | float = 1800.0,
) -> ray.data.Dataset:
    """Session windows per user: a new session starts when the gap to the
    previous event exceeds ``gap``.  One groupby shuffle on the user key;
    the per-group body is vectorized (sort + diff + cumsum).

    Returns (user, n_sessions, n_events, longest_session_events).
    """
    if not isinstance(gap, pd.Timedelta):
        gap = pd.Timedelta(seconds=float(gap))

    def per_user(group: pd.DataFrame) -> pd.DataFrame:
        ts = group[ts_column].sort_values()
        new_session = ts.diff().gt(gap) | ts.diff().isna()
        session_ids = new_session.cumsum()
        sizes = session_ids.value_counts()
        return pd.DataFrame(
            {
                user_column: [group.iloc[0][user_column]],
                "n_sessions": [int(session_ids.max())],
                "n_events": [len(group)],
                "longest_session_events": [int(sizes.max())],
            }
        )

    return events.groupby(user_column).map_groups(per_user, batch_format="pandas")
