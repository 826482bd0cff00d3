"""Ship this package to Ray workers by value.

The driver owns the Ray session and may have initialised it with any
cwd / PYTHONPATH; worker processes then cannot necessarily import
``parallel_count_min_sketch_ray`` by name.  Registering every package
module with cloudpickle's pickle-by-value makes task/actor closures
carry the code itself (a few tens of KB) instead of an import
reference — no runtime_env or installation needed.  Third-party
modules (numpy, pyarrow, ray) stay by-reference.
"""

from __future__ import annotations

import importlib
import pkgutil

_done = False


def register_by_value() -> None:
    global _done
    if _done:
        return
    from ray import cloudpickle

    import parallel_count_min_sketch_ray as pkg

    for info in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        try:
            mod = importlib.import_module(info.name)
            cloudpickle.register_pickle_by_value(mod)
        except Exception:
            pass  # optional subpackage failed to import; skip
    cloudpickle.register_pickle_by_value(pkg)
    _done = True
