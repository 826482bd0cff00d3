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


def resolve_image_codec():
    """Codec plug-point: return ``decode(payload, width, height) ->
    np.ndarray`` (2-D uint8 grayscale pixels) backed by a REAL imaging
    library when one is importable — PIL first, then cv2 — else None.

    This container ships neither, so callers fall back to strict-raise
    or the deterministic fake; in a production image the same code
    auto-uses the real codec with no changes (asserted by a test that
    injects a tiny decoder through this plug-point).
    """
    try:
        import io as _io

        from PIL import Image  # noqa: F401

        def _pil_decode(payload: bytes, width: int, height: int) -> np.ndarray:
            return np.asarray(
                Image.open(_io.BytesIO(payload)).convert("L"), dtype=np.uint8
            )

        return _pil_decode
    except ImportError:
        pass
    try:
        import cv2  # noqa: F401

        def _cv2_decode(payload: bytes, width: int, height: int) -> np.ndarray:
            img = cv2.imdecode(np.frombuffer(payload, np.uint8), cv2.IMREAD_GRAYSCALE)
            if img is None:
                raise ValueError("undecodable image payload")
            return img.astype(np.uint8)

        return _cv2_decode
    except ImportError:
        return None


class ImageDecodeStage:
    """Actor-pool stage: binary payload -> decoded pixel tensor stats.

    Decoder resolution order (once per actor, in ``__init__``):
    an explicit ``decoder`` callable (tests / dependency injection) →
    :func:`resolve_image_codec` (real PIL/cv2 when importable) →
    ``strict=True`` raises NotImplementedError (the honest no-codec
    posture) → deterministic fake decoder (payload bytes as pseudo
    pixels), so the Ray-side plumbing (schemas, batch shapes, actor
    lifecycle) is fully exercisable in tests.  Output schema is
    identical on every path.
    """

    #: per-actor init marker checked in tests (runs once per actor)
    def __init__(self, out_size: int = 64, strict: bool = False, decoder=None):
        self._out = int(out_size)
        self._strict = strict
        self._decoder = decoder if decoder is not None else resolve_image_codec()
        self._init_count = 1  # codec/model load happens here, once per actor

    def _normalize(self, img: np.ndarray) -> np.ndarray:
        """Any decoded pixel grid -> fixed (out, out) uint8 via
        deterministic nearest-neighbor sampling (codec-agnostic)."""
        img = np.atleast_2d(np.asarray(img, dtype=np.uint8))
        yi = np.linspace(0, img.shape[0] - 1, self._out).astype(np.int64)
        xi = np.linspace(0, img.shape[1] - 1, self._out).astype(np.int64)
        return img[np.ix_(yi, xi)]

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self._decoder is not None:
            return self._normalize(self._decoder(payload, width, height))
        if self._strict:
            raise NotImplementedError(
                "image decode requires a codec library (PIL/cv2) not present "
                "in this container; run with strict=False for the "
                "deterministic fake decoder, or inject decoder=..."
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

    table = synthesize_media_table(num_rows, seed=42)
    # from_arrow(one table) is ONE block — slice so the actor pool's
    # minimum concurrency actually has inputs to run on
    step = max(1, num_rows // 8)
    media = ray.data.from_arrow(
        [table.slice(i, step) for i in range(0, num_rows, step)]
    )
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


def decode_pipeline(ds, *, batch_size: int = 64, concurrency=(1, 4), strict: bool = False,
                    decoder=None):
    """media table -> per-image stats + embeddings (actor pool, small
    batches for large binary rows).  ``decoder`` plumbs a real codec
    callable through to every actor (cloudpickled with the constructor
    kwargs — monkeypatching the module in the driver would NOT reach
    worker processes)."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"strict": strict, "decoder": decoder},
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


class ResizeStage:
    """Actor-pool stage: decoded pixel payload -> fixed (out_w, out_h)
    thumbnail payload + metadata.

    The interpolation kernel is the stubbed part (no codec/imaging
    library in this container): strict mode raises; the default is a
    deterministic nearest-neighbor downsample over the fake-decoded
    pixel grid, so batch plumbing (binary in -> smaller binary out,
    metadata rewrite, small-batch discipline) is fully exercised.
    """

    def __init__(self, out_w: int = 32, out_h: int = 32, strict: bool = False):
        self._w, self._h = int(out_w), int(out_h)
        self._strict = strict

    def _resize(self, payload: bytes, width: int, height: int) -> bytes:
        if self._strict:
            raise NotImplementedError(
                "image resize requires an imaging library (PIL/cv2) not "
                "present in this container; run with strict=False for the "
                "deterministic nearest-neighbor stub"
            )
        raw = np.frombuffer(payload, dtype=np.uint8)
        side = max(int(np.sqrt(raw.size)), 1)
        grid = np.resize(raw, side * side).reshape(side, side)
        yi = np.linspace(0, side - 1, self._h).astype(np.int64)
        xi = np.linspace(0, side - 1, self._w).astype(np.int64)
        return grid[np.ix_(yi, xi)].tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths = batch["width"].to_numpy(zero_copy_only=False)
        heights = batch["height"].to_numpy(zero_copy_only=False)
        out = [self._resize(p, int(w), int(h))
               for p, w, h in zip(payloads, widths, heights)]
        n = len(out)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out, pa.binary()),
                "mime": batch["mime"],
                "width": pa.array(np.full(n, self._w, dtype=np.int32)),
                "height": pa.array(np.full(n, self._h, dtype=np.int32)),
            }
        )


class AudioWindowStage:
    """Actor-pool stage: audio payload -> per-window RMS-style features
    (the shape of an audio feature-extract pipeline: one row per fixed
    window, like FrameSampleStage's one row per sampled frame).

    Decode is the stub (payload bytes ARE the fake PCM stream); the
    windowing, per-window reduction and row-explosion plumbing are
    real.
    """

    def __init__(self, window_bytes: int = 1024, max_windows: int = 8):
        self._w = int(window_bytes)
        self._max = int(max_windows)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        out_id, out_win, out_rms, out_peak = [], [], [], []
        for mid, p in zip(ids, payloads):
            raw = np.frombuffer(p, dtype=np.uint8).astype(np.float64) - 128.0
            n_win = min(self._max, max(1, raw.size // self._w))
            for wi in range(n_win):
                seg = raw[wi * self._w : (wi + 1) * self._w]
                out_id.append(int(mid))
                out_win.append(wi)
                out_rms.append(float(np.sqrt((seg**2).mean())) if seg.size else 0.0)
                out_peak.append(float(np.abs(seg).max()) if seg.size else 0.0)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "window": pa.array(out_win, pa.int64()),
                "rms": pa.array(out_rms, pa.float64()),
                "peak": pa.array(out_peak, pa.float64()),
            }
        )


def resize_pipeline(ds, *, out_w: int = 32, out_h: int = 32, batch_size: int = 64,
                    concurrency=(1, 4), strict: bool = False):
    """media table -> resized media table (same schema, smaller payloads)."""
    return ds.map_batches(
        ResizeStage,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_window_pipeline(ds, *, window_bytes: int = 1024, batch_size: int = 64,
                          concurrency=(1, 4)):
    """media table -> (media_id, window, rms, peak) feature rows."""
    return ds.map_batches(
        AudioWindowStage,
        fn_constructor_kwargs={"window_bytes": window_bytes},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synthesize_media_with_dups(
    num_rows: int, seed: int = 43, dup_fraction: float = 0.1
) -> tuple[pa.Table, set[tuple[int, int]]]:
    """Media corpus with planted byte-identical duplicates: a seeded
    set of rows in the second half copies (payload, width, height)
    from first-half rows.  Returns the table and the planted pair set
    — identical payloads must produce identical features on EVERY
    decoder path (real codec, injected, or fake), so the pairs are the
    ground truth for the composed near-dup chain."""
    t = synthesize_media_table(num_rows, seed)
    rng = np.random.default_rng(seed + 1)
    n_dup = max(1, int(num_rows * dup_fraction))
    dst = rng.choice(
        np.arange(num_rows // 2, num_rows), size=n_dup, replace=False
    )
    src = rng.integers(0, num_rows // 2, size=n_dup)
    payloads = t["payload"].to_pylist()
    widths = t["width"].to_numpy().copy()
    heights = t["height"].to_numpy().copy()
    planted: set[tuple[int, int]] = set()
    for d, s in zip(dst.tolist(), src.tolist()):
        payloads[d] = payloads[s]
        widths[d] = widths[s]
        heights[d] = heights[s]
        planted.add((s, d))
    out = pa.table(
        {
            "media_id": t["media_id"],
            "payload": pa.array(payloads, pa.binary()),
            "mime": t["mime"],
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "n_frames": t["n_frames"],
        }
    )
    return out, planted


def media_near_dup(
    sf_dir: str,
    num_rows: int = 256,
    dup_fraction: float = 0.1,
    threshold: float = 0.9999,
) -> "object":
    """Composed multimodal chain: decode (actor pool) → per-image
    feature embedding → cosine near-dup over the decoded features —
    the image-dedup pipeline every multimodal training corpus runs,
    end-to-end through the Ray plumbing.

    The pair scoring here collects the (tiny, demo-scale) feature
    matrix and scores exactly; at corpus scale the same embedding
    column feeds ``ann.embedding_near_dup_lsh`` (hyperplane buckets)
    unchanged.  Returns one summary row including recall on the
    planted byte-identical duplicates (must be 1.0: same payload →
    same pixels → same embedding on any decoder path).
    """
    import pandas as pd

    import ray.data

    table, planted = synthesize_media_with_dups(
        num_rows, seed=43, dup_fraction=dup_fraction
    )
    step = max(1, num_rows // 8)
    media = ray.data.from_arrow(
        [table.slice(i, step) for i in range(0, num_rows, step)]
    )
    decoded = decode_pipeline(media, batch_size=32, concurrency=2).to_pandas()
    decoded = decoded.sort_values("media_id").reset_index(drop=True)
    mat = np.stack(decoded["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / np.maximum(norms, 1e-30)[:, None]
    sims = unit @ unit.T
    iu, ju = np.triu_indices(len(unit), k=1)
    hit = sims[iu, ju] >= threshold
    pairs = {
        (int(a), int(b)) for a, b in zip(iu[hit].tolist(), ju[hit].tolist())
    }
    found = sum(1 for p in planted if p in pairs)
    return pd.DataFrame(
        {
            "n_media": [num_rows],
            "n_pairs": [len(pairs)],
            "n_planted": [len(planted)],
            "planted_found": [found],
            "planted_recall": [np.float64(found) / len(planted)],
        }
    )
