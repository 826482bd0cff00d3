"""Ray-Data-native distributed sketch / approximate-aggregation library.

A from-scratch rebuild of the computational semantics of
``DavidePedrotti/Parallel-Count-Min-Sketch`` (reference at
``/root/reference``, an MPI/OpenMP C engine) on top of ``ray.data``:

- mergeable sketch kernels (Count-Min, HyperLogLog, Bloom, KLL, MinHash)
  as pure numpy state objects (:mod:`.state`);
- vectorized batch functions over zero-copy Arrow (:mod:`.functions`);
- stateful actor-pool accumulation stages and ``AggregateFn`` adapters
  (:mod:`.stages`);
- end-to-end pipelines: sketch builds, dedup, ANN, text analysis
  (:mod:`.pipelines`);
- sources/fixtures (:mod:`.sources`) and per-partition checkpointing
  with lineage (:mod:`.state.checkpoint`).

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
caller owns the Ray session.
"""

from parallel_count_min_sketch_ray.state.cms import CountMinSketch
from parallel_count_min_sketch_ray.state.hll import HyperLogLog
from parallel_count_min_sketch_ray.state.bloom import BloomFilter
from parallel_count_min_sketch_ray.state.kll import KLLSketch
from parallel_count_min_sketch_ray.state.minhash import MinHashSignature
from parallel_count_min_sketch_ray.state.topk import TopKSketch
from parallel_count_min_sketch_ray.state.base import sketch_from_bytes

__all__ = [
    "CountMinSketch",
    "HyperLogLog",
    "BloomFilter",
    "KLLSketch",
    "MinHashSignature",
    "TopKSketch",
    "sketch_from_bytes",
]

__version__ = "0.1.0"
