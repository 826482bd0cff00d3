"""Per-partition sketch checkpoints with lineage — resumable builds.

The reference has no fault tolerance (any failure → ``MPI_Abort``,
``/root/reference/src/mpi/mpiV1.c:21``; the whole job re-runs).  At
10^12-sequence scale the north_rule demands better: per-partition
partial sketches persisted with lineage so a resumed run recomputes
only missing partitions.

Design:

- A *partition* is an explicit, deterministic slice of the input:
  one parquet file × a row-group range (:func:`plan_partitions`).
  Parquet row groups are the natural re-alignment boundary — the
  platform-provided analogue of mpiV2's byte-range + newline-realign
  chunking (``src/mpi/mpiV2.c:39-83``).
- :class:`CheckpointStore` writes each partition's serialized sketches
  + a lineage record (input fragment, rows, items, wall time) to a
  temp file then atomically renames — a partial write is invisible,
  so completed partitions are exactly the renamed ones.
- :func:`build_sketches_checkpointed` schedules *pending* partitions
  as a Ray Data control dataset (``from_items(specs) → map_batches``);
  each task streams its row groups through pyarrow (never
  materializing the partition), folds them into partial sketches,
  checkpoints, and emits its lineage row.  The final merge folds ALL
  partitions' checkpoints (resumed + fresh), so resume == fresh run
  bit-for-bit (asserted in tests).
"""

from __future__ import annotations

import json
import os
import re
import time
from dataclasses import dataclass
from typing import Any

import numpy as np
import pyarrow.parquet as pq

from parallel_count_min_sketch_ray.functions.extract import make_extractor
from parallel_count_min_sketch_ray.state.base import sketch_from_bytes


def _safe_id(s: str) -> str:
    return re.sub(r"[^A-Za-z0-9._-]", "_", s)


def spec_fingerprint(specs, rows_per_partition: int) -> str:
    """Deterministic digest of everything that defines a checkpointed
    build: spec names, input columns, extractor kinds, sketch kinds +
    identity params, and the partition granularity.

    A ckpt_dir holds partials valid ONLY for this exact configuration;
    reusing it after changing a spec's column/kind (same names, same
    sketch identity) would otherwise silently fold stale partials for
    the wrong data into the final merge — merge()'s identity check
    cannot catch that.  The fingerprint is written to a dir-level
    manifest and every lineage record; mismatch fails fast.
    """
    import hashlib

    def jsonable(v):
        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            return float(v)
        return v

    desc = {
        "rows_per_partition": int(rows_per_partition),
        "specs": [
            {
                "name": s.name,
                "column": s.column,
                "kind": s.kind,
                "sketch": type(s.proto).KIND,
                "identity": {
                    f: jsonable(getattr(s.proto, f)) for f in s.proto._IDENTITY
                },
            }
            for s in specs
        ],
    }
    blob = json.dumps(desc, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()


def plan_partitions(paths: list[str], rows_per_partition: int = 500_000) -> list[dict]:
    """Deterministic partition specs: (file, row-group range) chunks of
    ~rows_per_partition rows, never splitting a row group.

    Partition ids embed a hash of the FULL path (not just the basename)
    so same-named files in different directories cannot collide — a
    collision would make a checkpointed build silently double-count one
    file and skip the other.
    """
    import hashlib

    specs: list[dict] = []
    for path in sorted(paths):
        md = pq.ParquetFile(path).metadata
        tag = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:8]
        base = f"{_safe_id(os.path.basename(path))}-{tag}"
        rg, nrg = 0, md.num_row_groups
        while rg < nrg:
            rows = 0
            rg_end = rg
            while rg_end < nrg and (rows == 0 or rows < rows_per_partition):
                rows += md.row_group(rg_end).num_rows
                rg_end += 1
            specs.append(
                {
                    "partition_id": f"{base}-rg{rg:05d}-{rg_end - 1:05d}",
                    "path": path,
                    "rg_start": rg,
                    "rg_end": rg_end,  # exclusive
                    "planned_rows": rows,
                }
            )
            rg = rg_end
    return specs


class CheckpointStore:
    """Atomic per-partition checkpoint files: ``<id>.ckpt`` (binary
    bundle of named SKB1 blobs) + ``<id>.lineage.json``."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _ckpt(self, pid: str) -> str:
        return os.path.join(self.root, f"{pid}.ckpt")

    def _lineage(self, pid: str) -> str:
        return os.path.join(self.root, f"{pid}.lineage.json")

    def is_done(self, pid: str) -> bool:
        return os.path.exists(self._ckpt(pid))

    def completed(self) -> list[str]:
        return sorted(
            f[: -len(".ckpt")] for f in os.listdir(self.root) if f.endswith(".ckpt")
        )

    def write(self, pid: str, blobs: dict[str, bytes], lineage: dict[str, Any]) -> None:
        # bundle: json header (name -> length) + concatenated blobs
        header = json.dumps({k: len(v) for k, v in blobs.items()}).encode()
        payload = len(header).to_bytes(4, "little") + header + b"".join(
            blobs.values()
        )
        tmp = self._ckpt(pid) + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        ltmp = self._lineage(pid) + ".tmp"
        with open(ltmp, "w") as f:
            json.dump(lineage, f)
            f.flush()
            os.fsync(f.fileno())  # lineage durable before the ckpt rename
        os.replace(ltmp, self._lineage(pid))
        os.replace(tmp, self._ckpt(pid))  # ckpt last: presence == complete
        self._fsync_dir()  # both renames durable: presence == complete survives power loss

    def _fsync_dir(self) -> None:
        fd = os.open(self.root, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)

    MANIFEST = "_manifest.json"

    def check_or_write_manifest(self, fingerprint: str) -> None:
        """Bind this ckpt_dir to one build configuration (fail fast on
        reuse with different specs — see :func:`spec_fingerprint`)."""
        path = os.path.join(self.root, self.MANIFEST)
        if not os.path.exists(path) and self.completed():
            # partials exist but no manifest (pre-manifest build, crashed
            # writer, or a concurrent builder) — adopting them under the
            # CURRENT fingerprint is exactly the stale-merge hazard the
            # manifest exists to prevent
            raise ValueError(
                f"checkpoint dir {self.root!r} contains partials but no "
                f"manifest; cannot verify they match the current spec "
                f"configuration — use a fresh ckpt_dir or delete it"
            )
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)["spec_fingerprint"]
            if existing != fingerprint:
                raise ValueError(
                    f"checkpoint dir {self.root!r} was built with a different "
                    f"spec configuration (manifest {existing[:12]}… != current "
                    f"{fingerprint[:12]}…); use a fresh ckpt_dir or delete it"
                )
            return
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"spec_fingerprint": fingerprint}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        self._fsync_dir()

    def read(self, pid: str) -> dict[str, bytes]:
        with open(self._ckpt(pid), "rb") as f:
            data = f.read()
        hlen = int.from_bytes(data[:4], "little")
        header = json.loads(data[4 : 4 + hlen].decode())
        blobs, off = {}, 4 + hlen
        for name, ln in header.items():
            blobs[name] = data[off : off + ln]
            off += ln
        return blobs

    def read_lineage(self, pid: str) -> dict[str, Any]:
        with open(self._lineage(pid)) as f:
            return json.load(f)


@dataclass
class CheckpointedReport:
    sketches: dict[str, Any]
    rows: int
    items: dict[str, int]
    wall_time: float
    partitions_total: int
    partitions_resumed: int
    partitions_built: int
    lineage: list[dict[str, Any]]

    def __getitem__(self, name: str):
        return self.sketches[name]


class _BuildPartition:
    """map_batches callable over the control dataset of partition specs.

    Streams the partition's row groups batch-by-batch (pyarrow
    ``iter_batches``) — peak memory is one record batch, not the
    partition.
    """

    def __init__(self, specs, ckpt_root: str, read_columns: list[str],
                 fingerprint: str = ""):
        self._specs = specs
        self._store = CheckpointStore(ckpt_root)
        self._columns = read_columns
        self._extractors = [make_extractor(s.column, s.kind) for s in specs]
        self._fingerprint = fingerprint

    def __call__(self, batch) -> dict:
        import pyarrow as pa

        out = {
            "partition_id": [],
            "rows": [],
            "items": [],
            "wall_time": [],
            "resumed": [],
        }
        for i in range(len(batch["partition_id"])):
            pid = batch["partition_id"][i]
            path = batch["path"][i]
            rg_start, rg_end = int(batch["rg_start"][i]), int(batch["rg_end"][i])
            t0 = time.perf_counter()
            if self._store.is_done(pid):
                lin = self._store.read_lineage(pid)
                out["partition_id"].append(pid)
                out["rows"].append(int(lin["rows"]))
                out["items"].append(json.dumps(lin["items"]))
                out["wall_time"].append(float(lin["wall_time"]))
                out["resumed"].append(True)
                continue
            sketches = [s.proto.empty_like() for s in self._specs]
            rows = 0
            items = [0] * len(self._specs)
            pf = pq.ParquetFile(path)
            for rb in pf.iter_batches(
                batch_size=65536,
                row_groups=list(range(rg_start, rg_end)),
                columns=self._columns,
            ):
                tbl = pa.Table.from_batches([rb])
                rows += tbl.num_rows
                for j, (sk, ex) in enumerate(zip(sketches, self._extractors)):
                    vals = ex(tbl)
                    sk.update(vals)
                    items[j] += int(vals.size)
            wall = time.perf_counter() - t0
            lineage = {
                "partition_id": pid,
                "input": {"path": path, "rg_start": rg_start, "rg_end": rg_end},
                "rows": rows,
                "items": {s.name: n for s, n in zip(self._specs, items)},
                "wall_time": wall,
                "sketches": [s.name for s in self._specs],
                "spec_fingerprint": self._fingerprint,
            }
            self._store.write(
                pid,
                {s.name: sk.to_bytes() for s, sk in zip(self._specs, sketches)},
                lineage,
            )
            out["partition_id"].append(pid)
            out["rows"].append(rows)
            out["items"].append(json.dumps(lineage["items"]))
            out["wall_time"].append(wall)
            out["resumed"].append(False)
        return out


def build_sketches_checkpointed(
    paths: list[str],
    specs: list,
    ckpt_dir: str,
    *,
    rows_per_partition: int = 500_000,
    concurrency: int | None = None,
) -> CheckpointedReport:
    """Resumable distributed build: only partitions without a checkpoint
    are recomputed; the final sketch merges every partition's checkpoint."""
    import ray.data

    t0 = time.perf_counter()
    specs = list(specs)
    store = CheckpointStore(ckpt_dir)
    fingerprint = spec_fingerprint(specs, rows_per_partition)
    store.check_or_write_manifest(fingerprint)
    parts = plan_partitions(paths, rows_per_partition)
    resumed = sum(1 for p in parts if store.is_done(p["partition_id"]))
    columns = sorted({s.column for s in specs})

    control = ray.data.from_items(parts)
    builder = _BuildPartition(tuple(specs), ckpt_dir, columns, fingerprint)
    kwargs = {"batch_size": 1, "batch_format": "numpy"}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    lineage_rows = control.map_batches(builder, **kwargs).take_all()

    merged = {s.name: s.proto.empty_like() for s in specs}
    total_rows, items = 0, {s.name: 0 for s in specs}
    for p in parts:
        blobs = store.read(p["partition_id"])
        lin = store.read_lineage(p["partition_id"])
        for s in specs:
            merged[s.name].merge(sketch_from_bytes(blobs[s.name]))
            items[s.name] += int(lin["items"][s.name])
        total_rows += int(lin["rows"])
    return CheckpointedReport(
        sketches=merged,
        rows=total_rows,
        items=items,
        wall_time=time.perf_counter() - t0,
        partitions_total=len(parts),
        partitions_resumed=resumed,
        partitions_built=len(parts) - resumed,
        lineage=[
            {
                "partition_id": str(r["partition_id"]),
                "rows": int(r["rows"]),
                "items": json.loads(str(r["items"])),
                "wall_time": float(r["wall_time"]),
                "resumed": bool(r["resumed"]),
            }
            for r in lineage_rows
        ],
    )
