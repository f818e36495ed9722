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


def sort_topk(ds: ray.data.Dataset, by: str, k: int, descending: bool = True) -> ray.data.Dataset:
    """Top-k with per-batch pruning before the global sort: each batch keeps
    its own k rows, so the sort sees ≤ k × n_batches rows."""

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.nlargest(k, by) if descending else batch.nsmallest(k, by)

    return ds.map_batches(prune, batch_format="pandas").sort(by, descending=descending).limit(k)
