"""Multimodal columns: opaque binary payloads + typed metadata.

The container has no image/audio codecs (no PIL/cv2/ffmpeg), so the
*decode kernels* are stubbed — either a clearly-marked
``NotImplementedError`` (strict mode) or a deterministic fake decoder —
while everything Ray-side is real and tested: schemas, actor-pool
signatures, batch sizing for large binary rows, and output layout.

Design rules for 100 TB of media (applied here, asserted in tests):

- media rides ``binary`` columns with sidecar metadata columns
  (width/height/codec/duration), never Python objects;
- decode/feature stages are actor pools (codec/model init once per
  actor in ``__init__``) with SMALL ``batch_size`` — a 4 MB image at
  batch_size 4096 would be a 16 GB batch;
- outputs are fixed-size feature vectors / resized payloads, written
  partitioned, so downstream stages (ANN over image embeddings,
  near-dup over frame hashes) reuse the embedding machinery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def synthesize_media_table(num_rows: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media corpus (binary payloads + metadata)."""
    rng = np.random.default_rng(seed)
    widths = rng.integers(32, 512, size=num_rows, dtype=np.int32)
    heights = rng.integers(32, 512, size=num_rows, dtype=np.int32)
    frames = rng.integers(1, 64, size=num_rows, dtype=np.int32)
    payloads = [rng.bytes(payload_bytes) for _ in range(num_rows)]
    return pa.table(
        {
            "media_id": np.arange(num_rows, dtype=np.int64),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(
                np.where(rng.random(num_rows) < 0.5, "image/fake", "video/fake")
            ),
            "width": widths,
            "height": heights,
            "n_frames": frames,
        }
    )


class ImageDecodeStage:
    """Actor-pool stage: binary payload -> decoded pixel tensor stats.

    ``strict=True`` raises NotImplementedError at the decode call (the
    honest no-codec posture); the default deterministic fake decoder
    hashes the payload into a fixed-size pseudo-pixel array so the
    Ray-side plumbing (schemas, batch shapes, actor lifecycle) is fully
    exercisable in tests.
    """

    #: per-actor init marker checked in tests (runs once per actor)
    def __init__(self, out_size: int = 64, strict: bool = False):
        self._out = int(out_size)
        self._strict = strict
        self._init_count = 1  # codec/model load would happen here

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self._strict:
            raise NotImplementedError(
                "image decode requires a codec library (PIL/cv2) not present "
                "in this container; run with strict=False for the "
                "deterministic fake decoder"
            )
        # deterministic fake: payload bytes -> uint8 'pixels'
        raw = np.frombuffer(payload, dtype=np.uint8)
        reps = int(np.ceil(self._out * self._out / max(raw.size, 1)))
        return np.tile(raw, reps)[: self._out * self._out].reshape(self._out, self._out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths = batch["width"].to_numpy(zero_copy_only=False)
        heights = batch["height"].to_numpy(zero_copy_only=False)
        means, stds, embeddings = [], [], []
        for p, w, h in zip(payloads, widths, heights):
            img = self._decode(p, int(w), int(h))
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            # fake "feature extract": row means of the pseudo image
            embeddings.append(img.mean(axis=1).astype(np.float32))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "pixel_mean": pa.array(means, pa.float64()),
                "pixel_std": pa.array(stds, pa.float64()),
                "embedding": pa.array(
                    [e.tolist() for e in embeddings], pa.list_(pa.float32())
                ),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: video payload -> k deterministic frame offsets
    + per-frame content hashes (the shape of a frame-dedup pipeline)."""

    def __init__(self, frames_per_video: int = 4):
        self._k = int(frames_per_video)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n_frames = batch["n_frames"].to_numpy(zero_copy_only=False)
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        out_id, out_frame, out_hash = [], [], []
        for mid, p, nf in zip(ids, payloads, n_frames):
            k = min(self._k, int(nf))
            # evenly-spaced deterministic frame sample
            offsets = np.linspace(0, int(nf) - 1, k).astype(np.int64)
            raw = np.frombuffer(p, dtype=np.uint8)
            for off in offsets:
                lo = int(off) * max(1, raw.size // max(int(nf), 1))
                chunk = raw[lo : lo + 256]
                out_id.append(int(mid))
                out_frame.append(int(off))
                out_hash.append(int(chunk.sum()) * 2654435761 % (1 << 63))
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame": pa.array(out_frame, pa.int64()),
                "frame_hash": pa.array(out_hash, pa.int64()),
            }
        )


def media_decode_stats(sf_dir: str, num_rows: int = 256) -> "object":
    """Driver query: decode + feature-extract over a deterministic
    synthetic media corpus (the testdata has no media table; payloads
    derive from a fixed seed so results are reproducible; rows-only
    check — the fake decoder is not SQL-expressible).

    Returns per-mime aggregate stats of the decode stage's outputs.
    """
    import pandas as pd

    import ray.data

    media = ray.data.from_arrow(synthesize_media_table(num_rows, seed=42))
    decoded = decode_pipeline(media, batch_size=32, concurrency=2).to_pandas()
    mimes = synthesize_media_table(num_rows, seed=42)["mime"].to_pandas()
    decoded = decoded.sort_values("media_id").reset_index(drop=True)
    decoded["mime"] = mimes.to_numpy()
    g = decoded.groupby("mime", as_index=False).agg(
        n=("media_id", "size"),
        pixel_mean_avg=("pixel_mean", "mean"),
        pixel_std_avg=("pixel_std", "mean"),
    )
    g["pixel_mean_avg"] = g["pixel_mean_avg"].round(6)
    g["pixel_std_avg"] = g["pixel_std_avg"].round(6)
    return g


def decode_pipeline(ds, *, batch_size: int = 64, concurrency=(1, 4), strict: bool = False):
    """media table -> per-image stats + embeddings (actor pool, small
    batches for large binary rows)."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample_pipeline(ds, *, frames_per_video: int = 4, batch_size: int = 64,
                          concurrency=(1, 4)):
    """media table -> (media_id, frame, frame_hash) rows."""
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"frames_per_video": frames_per_video},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
