"""Distributed ordered prefix sum: keyed_prefix_sum vs pandas cumsum.

The scan's coordination is O(blocks) — only block-edge partitions
exchange partials — so the tests force many blocks and plant both a
partition that spans most blocks and negative values (the segment
reset must be exact arithmetic, not monotone tricks)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from parallel_count_min_sketch_ray.stages.scan import keyed_prefix_sum


def _expected(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["part", "order"]).reset_index(drop=True)
    df["cum"] = df.groupby("part")["val"].cumsum()
    return df


def _run(df: pd.DataFrame, num_blocks: int) -> pd.DataFrame:
    import ray.data

    ds = ray.data.from_pandas(df).repartition(num_blocks)
    out = keyed_prefix_sum(ds, "part", "order", "val", "cum").to_pandas()
    return out.sort_values(["part", "order"]).reset_index(drop=True)


@pytest.mark.parametrize("num_blocks", [1, 3, 16])
def test_scan_matches_pandas_many_parts(ray_session, num_blocks):
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "part": [f"p{int(x):02d}" for x in rng.integers(0, 12, n)],
            "order": np.arange(n, dtype=np.int64),
            "val": rng.integers(-50, 100, n).astype(np.int64),
        }
    )
    got = _run(df, num_blocks)
    exp = _expected(df)
    pd.testing.assert_frame_equal(
        got[["part", "order", "val", "cum"]],
        exp[["part", "order", "val", "cum"]],
        check_dtype=False,
    )


def test_scan_giant_partition_spans_blocks(ray_session):
    """One partition holds 90% of the rows, so after the sort it spans
    nearly every block; its cross-block offsets must chain correctly."""
    rng = np.random.default_rng(11)
    n = 8000
    part = np.where(rng.random(n) < 0.9, "whale", "minnow")
    df = pd.DataFrame(
        {
            "part": part,
            "order": np.arange(n, dtype=np.int64),
            "val": rng.integers(0, 1000, n).astype(np.int64),
        }
    )
    got = _run(df, 20)
    exp = _expected(df)
    pd.testing.assert_frame_equal(
        got[["part", "order", "val", "cum"]],
        exp[["part", "order", "val", "cum"]],
        check_dtype=False,
    )
    # the scan's exchange is bounded: ≤2 edge rows per block regardless
    # of partition skew (asserted structurally: the whale's final cum
    # equals its exact total)
    whale_total = int(df.loc[df["part"] == "whale", "val"].sum())
    assert int(got.loc[got["part"] == "whale", "cum"].max()) == whale_total


def test_scan_single_row_parts(ray_session):
    df = pd.DataFrame(
        {
            "part": [f"u{i}" for i in range(64)],
            "order": np.zeros(64, dtype=np.int64),
            "val": np.arange(64, dtype=np.int64),
        }
    )
    got = _run(df, 8)
    assert (got["cum"] == got["val"]).all()


def test_scan_int_partitions_and_composite_order(ray_session):
    """Integer partition keys must order numerically (10 > 2), and the
    order key can be composite (date with ties broken by id)."""
    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame(
        {
            "part": rng.integers(0, 300, n).astype(np.int64),  # >255 parts
            "o1": rng.integers(0, 5, n).astype(np.int64),      # ties
            "o2": np.arange(n, dtype=np.int64),                # tiebreak
            "val": rng.integers(-10, 10, n).astype(np.int64),
        }
    )
    import ray.data

    ds = ray.data.from_pandas(df).repartition(16)
    got = (
        keyed_prefix_sum(ds, "part", ["o1", "o2"], "val", "cum")
        .to_pandas()
        .sort_values(["part", "o1", "o2"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["part", "o1", "o2"]).reset_index(drop=True)
    exp["cum"] = exp.groupby("part")["val"].cumsum()
    pd.testing.assert_frame_equal(
        got[["part", "o1", "o2", "val", "cum"]],
        exp[["part", "o1", "o2", "val", "cum"]],
        check_dtype=False,
    )


def test_scan_empty_and_single_row(ray_session):
    import ray.data

    empty = pd.DataFrame(
        {"part": pd.Series([], dtype=str),
         "order": pd.Series([], dtype=np.int64),
         "val": pd.Series([], dtype=np.int64)}
    )
    out = keyed_prefix_sum(
        ray.data.from_pandas(empty), "part", "order", "val", "cum"
    ).to_pandas()
    # Ray drops the schema of an all-empty dataset; the contract is
    # simply "no rows, no error"
    assert len(out) == 0

    one = pd.DataFrame({"part": ["x"], "order": [0], "val": [7]})
    out1 = keyed_prefix_sum(
        ray.data.from_pandas(one), "part", "order", "val", "cum"
    ).to_pandas()
    assert out1["cum"].tolist() == [7]


def test_scan_rejects_float_values(ray_session):
    """Float prefix sums are association-dependent; the scan refuses
    them instead of silently truncating (callers convert to cents)."""
    import ray.data

    df = pd.DataFrame(
        {"part": ["a", "a"], "order": [0, 1], "val": [1.5, 2.5]}
    )
    with pytest.raises(ValueError, match="integer"):
        keyed_prefix_sum(
            ray.data.from_pandas(df), "part", "order", "val", "cum"
        )


def test_scan_pin_and_spool_paths_agree(ray_session):
    """The spool path (deterministic parquet partitions, no plasma
    pin) and the pin path (materialize) produce identical running
    sums on the same input."""
    import ray.data

    rng = np.random.default_rng(23)
    n = 4000
    df = pd.DataFrame(
        {
            "part": [f"p{int(x)}" for x in rng.integers(0, 9, n)],
            "order": np.arange(n, dtype=np.int64),
            "val": rng.integers(-20, 80, n).astype(np.int64),
        }
    )
    outs = {}
    for via in ("spool", "pin"):
        ds = ray.data.from_pandas(df).repartition(8)
        outs[via] = (
            keyed_prefix_sum(ds, "part", "order", "val", "cum", via=via)
            .to_pandas()
            .sort_values(["part", "order"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(
        outs["spool"][["part", "order", "val", "cum"]],
        outs["pin"][["part", "order", "val", "cum"]],
    )

    with pytest.raises(ValueError, match="via"):
        keyed_prefix_sum(
            ray.data.from_pandas(df), "part", "order", "val", "cum", via="bogus"
        )
