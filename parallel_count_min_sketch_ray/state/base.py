"""MergeableSketch protocol + binary serde framework.

The reference expresses "mergeable sketch" three ways (OpenMP critical
merge loops, per-row ``MPI_Reduce(MPI_SUM)``, atomic adds — see
``/root/reference/src/hybrid/hybridV1.c:175-188`` and
``/root/reference/src/mpi/mpiV2.c:163-175``).  Here the contract is a
single protocol so every sketch rides the same Ray Data machinery
(:mod:`..stages.accumulate`, :mod:`..stages.udaf`):

- ``empty_like()``   — fresh zero state sharing the parent's identity
  (hash params / seed / shape), the analogue of ``cms_init_private``
  (``src/core/count_min_sketch_hybridV1.c:79-109``);
- ``update(items)``  — vectorized accumulate of a numpy batch;
- ``merge(other)``   — associative + commutative combine; must raise
  on identity mismatch (mirrors the guards of ``cms_inner_product``,
  ``src/core/count_min_sketch.c:66-73``);
- ``to_bytes()`` / ``from_bytes()`` — stable binary serde so partials
  ride Arrow ``binary`` columns through the object store.

Serde format: 4-byte magic ``SKB1`` + uint32 header length + JSON
header (kind, params, array dtypes/shapes) + raw C-order array bytes.
Deliberately not pickle: partials written by one code version must be
readable by later ones (checkpoint/resume contract).
"""

from __future__ import annotations

import json
import struct
from typing import Any, ClassVar, Protocol, runtime_checkable

import numpy as np

_MAGIC = b"SKB1"

# kind string -> sketch class, filled by @register_sketch
_REGISTRY: dict[str, type] = {}


def register_sketch(cls):
    """Class decorator: register a sketch class for generic deserialization."""
    _REGISTRY[cls.KIND] = cls
    return cls


@runtime_checkable
class MergeableSketch(Protocol):
    """Structural protocol every sketch in :mod:`..state` satisfies."""

    KIND: ClassVar[str]

    def empty_like(self) -> "MergeableSketch": ...

    def update(self, items: np.ndarray, counts: np.ndarray | None = None) -> None: ...

    def merge(self, other: "MergeableSketch") -> "MergeableSketch": ...

    def to_bytes(self) -> bytes: ...


def pack(kind: str, params: dict[str, Any], arrays: dict[str, np.ndarray]) -> bytes:
    """Serialize (params, named arrays) into the SKB1 binary format."""
    header: dict[str, Any] = {"kind": kind, "params": params, "arrays": []}
    payload = bytearray()
    for name, arr in arrays.items():
        arr = np.ascontiguousarray(arr)
        header["arrays"].append(
            {"name": name, "dtype": arr.dtype.str, "shape": list(arr.shape)}
        )
        payload += arr.tobytes()
    hdr = json.dumps(header, separators=(",", ":")).encode()
    return _MAGIC + struct.pack("<I", len(hdr)) + hdr + bytes(payload)


def unpack(data: bytes) -> tuple[str, dict[str, Any], dict[str, np.ndarray]]:
    """Inverse of :func:`pack`."""
    if data[:4] != _MAGIC:
        raise ValueError("not a SKB1 sketch blob")
    (hlen,) = struct.unpack("<I", data[4:8])
    header = json.loads(data[8 : 8 + hlen].decode())
    arrays: dict[str, np.ndarray] = {}
    off = 8 + hlen
    for spec in header["arrays"]:
        dt = np.dtype(spec["dtype"])
        n = int(np.prod(spec["shape"])) if spec["shape"] else 1
        nbytes = dt.itemsize * n
        arrays[spec["name"]] = np.frombuffer(
            data, dtype=dt, count=n, offset=off
        ).reshape(spec["shape"]).copy()
        off += nbytes
    return header["kind"], header["params"], arrays


def sketch_from_bytes(data: bytes):
    """Deserialize any registered sketch from its SKB1 blob."""
    kind, params, arrays = unpack(data)
    try:
        cls = _REGISTRY[kind]
    except KeyError:
        raise ValueError(f"unknown sketch kind {kind!r}") from None
    return cls._from_state(params, arrays)


def check_compatible(a, b, fields: tuple[str, ...]) -> None:
    """Raise ValueError unless the two sketches share an identity.

    Mirrors the reference's merge precondition: rank 0's hash params are
    broadcast so every worker uses one hash family
    (``src/mpi/mpiV1.c:24-26``); merging sketches with different params
    must be an error (SURVEY.md §1.3).
    """
    if type(a) is not type(b):
        raise ValueError(f"cannot merge {type(a).__name__} with {type(b).__name__}")
    for f in fields:
        va, vb = getattr(a, f), getattr(b, f)
        same = np.array_equal(va, vb) if isinstance(va, np.ndarray) else va == vb
        if not same:
            raise ValueError(
                f"incompatible sketches: field {f!r} differs ({va!r} != {vb!r})"
            )


def check_counts(counts) -> np.ndarray:
    """Validate per-item ``counts`` for weighted sketch updates.

    Sketch counters are nonnegative integers; a float or negative count
    would silently truncate / wrap (breaking e.g. CMS's one-sided
    ``est >= true`` guarantee).  Accepts any integer dtype; rejects
    float dtypes and negatives with ValueError.  Returns int64.
    """
    counts = np.asarray(counts)
    if counts.dtype.kind not in "iu":
        raise ValueError(
            f"counts must be an integer array, got dtype {counts.dtype}"
        )
    counts = counts.astype(np.int64, copy=False).ravel()
    if counts.size and int(counts.min()) < 0:
        raise ValueError("counts must be nonnegative")
    return counts
