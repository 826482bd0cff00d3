"""Mergeable sketch state objects (pure numpy, no Ray dependency)."""

from parallel_count_min_sketch_ray.state.base import MergeableSketch, sketch_from_bytes
from parallel_count_min_sketch_ray.state.cms import CountMinSketch
from parallel_count_min_sketch_ray.state.hll import HyperLogLog
from parallel_count_min_sketch_ray.state.bloom import BloomFilter
from parallel_count_min_sketch_ray.state.kll import KLLSketch
from parallel_count_min_sketch_ray.state.minhash import MinHashSignature
from parallel_count_min_sketch_ray.state.topk import TopKSketch

__all__ = [
    "MergeableSketch",
    "sketch_from_bytes",
    "CountMinSketch",
    "HyperLogLog",
    "BloomFilter",
    "KLLSketch",
    "MinHashSignature",
    "TopKSketch",
]
