"""Rerun-twice bit-identity for every rows-only query (VERDICT r3
Next #8): the 34 queries without a SQL oracle get a weaker rows-only
driver check, so their determinism contract is asserted here — run
each query twice (with the in-process memo caches CLEARED in between,
so the second run re-executes the distributed pipeline, not a cache
lookup) and require identical canonical output.

Nondeterminism here would mean Ray's block arrival order leaks into a
result — the class of bug the sorted-partial / fixed-association
conventions exist to prevent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_UNIT


def _rows_only_names():
    from parallel_count_min_sketch_ray import entry as em

    qs, orc = em.queries(), em.oracle_sql()
    return sorted(k for k in qs if k not in orc)


def _clear_memo_caches():
    """Reset every in-process memo so the rerun is a real rerun."""
    from parallel_count_min_sketch_ray.pipelines import (
        analytics,
        dedup,
        sketch_queries,
        textpipe,
    )

    # clear every module attribute that looks like a memo dict — the
    # generic sweep means a newly added memo can't silently make this
    # test vacuous (naming contract: memo dicts end in _cache/_CACHE)
    for mod in (analytics, dedup, sketch_queries, textpipe):
        for name in dir(mod):
            if name.endswith(("_cache", "_CACHE")) and isinstance(
                getattr(mod, name), dict
            ):
                getattr(mod, name).clear()


def _canonical(res) -> pd.DataFrame:
    """Materialize to pandas, order columns by name and rows by every
    column's string form (Datasets return blocks in arbitrary order)."""
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    df = res[sorted(res.columns)].copy()
    key = df.astype(str)
    order = np.lexsort([key[c].to_numpy() for c in reversed(key.columns)])
    return df.iloc[order].reset_index(drop=True)


def test_rows_only_query_set_is_expected():
    names = _rows_only_names()
    assert len(names) == 45, names  # +5 round-5 additions


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_query_rerun_bit_identical(ray_session, name):
    from parallel_count_min_sketch_ray import entry as em

    fn = em.queries()[name]
    first = _canonical(fn(SF_UNIT))
    _clear_memo_caches()
    second = _canonical(fn(SF_UNIT))
    pd.testing.assert_frame_equal(first, second, check_exact=True)
