"""Property-based checks: relational operators vs in-memory pandas semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from hypothesis import given, settings, strategies as st

from esmarc_ray.ops import relational

_KEYS = st.integers(min_value=0, max_value=5)
_VALS = st.integers(min_value=-100, max_value=100)


def _frame(draw, n, cols):
    return pd.DataFrame({c: [draw(s) for _ in range(n)] for c, s in cols.items()})


@st.composite
def join_inputs(draw):
    n_left = draw(st.integers(min_value=0, max_value=12))
    n_right = draw(st.integers(min_value=0, max_value=6))
    left = _frame(draw, n_left, {"k": _KEYS, "x": _VALS})
    right_keys = draw(st.lists(_KEYS, min_size=n_right, max_size=n_right, unique=True))
    right = pd.DataFrame({"k": right_keys, "y": [draw(_VALS) for _ in right_keys]})
    return left, right


@settings(max_examples=12, deadline=None)
@given(join_inputs())
def test_partitioned_join_matches_pandas(ray_session, inputs):
    left, right = inputs
    got = relational.partitioned_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        "k",
        left_cols=["x"],
        right_cols=["y"],
        num_partitions=3,
    ).to_pandas()
    expected = (
        left.merge(right, on="k", how="inner")
        .sort_values(["k", "x", "y"])
        .reset_index(drop=True)
    )
    assert len(got) == len(expected)
    if expected.empty:
        # an all-empty join legitimately yields a schemaless empty dataset
        return
    got = got.sort_values(["k", "x", "y"]).reset_index(drop=True)
    assert got["k"].tolist() == expected["k"].tolist()
    assert got["x"].tolist() == expected["x"].tolist()
    assert got["y"].tolist() == expected["y"].tolist()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(_KEYS, st.integers(min_value=0, max_value=1000), _VALS),
        min_size=1,
        max_size=40,
    )
)
def test_running_window_matches_pandas(ray_session, rows):
    df = pd.DataFrame(rows, columns=["user", "ts", "value"])
    df["event_id"] = range(len(df))
    got = (
        relational.running_window(
            ray.data.from_pandas(df),
            partition_by="user",
            order_by=["ts", "event_id"],
            value_column="value",
            out_name="rv",
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    expected = df.sort_values(["ts", "event_id"]).copy()
    expected["rv"] = expected.groupby("user")["value"].cumsum()
    expected = expected.sort_values("event_id").reset_index(drop=True)
    assert got["rv"].tolist() == expected["rv"].tolist()


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(_KEYS, _KEYS, _VALS), min_size=1, max_size=40))
def test_rollup_agg_matches_pandas(ray_session, rows):
    df = pd.DataFrame(rows, columns=["a", "b", "v"])
    df["a"] = df["a"].astype(str)
    df["b"] = df["b"].astype(str)
    got = (
        relational.rollup_agg(
            ray.data.from_pandas(df), ["a", "b"], {"n": ("v", "count"), "s": ("v", "sum")}
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    fine = df.groupby(["a", "b"], as_index=False).agg(n=("v", "count"), s=("v", "sum"))
    mid = df.groupby(["a"], as_index=False).agg(n=("v", "count"), s=("v", "sum"))
    mid["b"] = "ALL"
    top = pd.DataFrame({"a": ["ALL"], "b": ["ALL"], "n": [len(df)], "s": [df["v"].sum()]})
    expected = (
        pd.concat([fine, mid, top], ignore_index=True)[["a", "b", "n", "s"]]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert got["a"].tolist() == expected["a"].tolist()
    assert got["b"].tolist() == expected["b"].tolist()
    assert got["n"].tolist() == expected["n"].tolist()
    assert got["s"].tolist() == expected["s"].tolist()
