"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in anything these
callables reach.  Implementation lives in
``parallel_count_min_sketch_ray.entry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parallel_count_min_sketch_ray import entry as _entry_mod
from parallel_count_min_sketch_ray.shipping import register_by_value

# Ray workers may not share this repo on sys.path — ship the package
# code inside task closures instead of relying on import-by-name.
register_by_value()


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return _entry_mod.entry()


def queries() -> dict[str, Callable[[str], Any]]:
    return _entry_mod.queries()


def oracle_sql() -> dict[str, str]:
    return _entry_mod.oracle_sql()
