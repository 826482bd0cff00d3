"""Hash functions shared by the sketches.

- Carter-Wegman universal hashing with the Mersenne prime 2**31-1
  matches the reference's family (``/root/reference/src/core/
  count_min_sketch.c:121-138``, ``count_min_sketch.h:15``) but computed
  in uint64 (see :mod:`..state.cms` for the documented divergence).
- djb2 string pre-hash mod ``LONG_PRIME`` mirrors ``cms_hashstr``
  (``src/core/count_min_sketch.c:14-21``).
- splitmix64 (public-domain finalizer, Steele et al. / Vigna) provides
  the 64-bit avalanche hash that HLL / Bloom / MinHash need; the
  31-bit universal family is too weak for leading-zero statistics.

All kernels are numpy-vectorized; uint64 arithmetic wraps mod 2**64 by
design.
"""

from __future__ import annotations

import numpy as np

MERSENNE_PRIME_31 = (1 << 31) - 1  # reference PRIME, count_min_sketch.h:15
LONG_PRIME = 4294967311  # reference LONG_PRIME, count_min_sketch.h:16
MERSENNE_PRIME_61 = (1 << 61) - 1  # wider family for MinHash permutations


def djb2(s: str | bytes) -> int:
    """djb2 string hash mod LONG_PRIME, truncated to uint32.

    Parity with ``cms_hashstr`` (src/core/count_min_sketch.c:14-21):
    ``h = h*33 + c`` over the bytes, mod 4294967311, as uint32.
    """
    if isinstance(s, str):
        s = s.encode("utf-8")
    h = 5381
    for c in s:
        h = (h * 33 + c) % LONG_PRIME
    return h & 0xFFFFFFFF


def djb2_array(strings) -> np.ndarray:
    """djb2 over a sequence of strings -> uint64 array.

    Python loop over the (already-deduplicated) strings — hot pipelines
    call this on per-batch *unique* values only (value_counts first),
    so the loop is over the vocabulary, not the token stream.
    """
    return np.fromiter((djb2(s) for s in strings), dtype=np.uint64, count=len(strings))


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 -> well-mixed uint64.

    uint64 wraparound is the algorithm (mod-2**64 arithmetic); numpy
    flags it only on the 0-d/scalar path, so silence that one class of
    warning here rather than at every call site.
    """
    with np.errstate(over="ignore"):
        z = np.asarray(x).astype(np.uint64, copy=True)
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


_HASH64_CHUNK = 8192  # keep the padded byte matrix cache-resident:
# column sweeps over a (n, maxlen) row-major matrix thrash cache above
# ~10^5 rows (measured 8x slowdown at 180k rows vs 4k-row chunks)


def hash64_strings(strings) -> np.ndarray:
    """Stable 64-bit content hash per string -> uint64 array.

    FNV-1a over UTF-8 bytes, vectorized over a padded byte matrix so the
    cost is O(total_bytes) numpy work, not a per-character Python loop.
    Large inputs are processed in cache-sized chunks (identical result).
    """
    n = len(strings)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if n > _HASH64_CHUNK:
        return np.concatenate(
            [
                hash64_strings(strings[i : i + _HASH64_CHUNK])
                for i in range(0, n, _HASH64_CHUNK)
            ]
        )
    enc = [s.encode("utf-8") if isinstance(s, str) else bytes(s) for s in strings]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    # pad into an (n, maxlen) uint8 matrix
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
    ends = np.cumsum(lens)
    starts = ends - lens
    # scatter rows: one slice-assign per distinct length group would be
    # fancier; a row loop over n strings copying numpy slices is fine
    # (the per-row work is a memcpy, not per-char Python).
    for i in range(n):
        if lens[i]:
            mat[i, : lens[i]] = flat[starts[i] : ends[i]]
    h = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    active_cols = mat.T  # (maxlen, n)
    alive = np.arange(maxlen)[:, None] < lens[None, :]
    for j in range(maxlen):
        m = alive[j]
        if not m.any():
            break
        h[m] = (h[m] ^ active_cols[j][m].astype(np.uint64)) * prime
    return h


def universal_hash(
    x: np.ndarray, a: np.ndarray, b: np.ndarray, prime: int, width: int
) -> np.ndarray:
    """``((a*x + b) % prime) % width`` row-vectorized: (d,) params × (n,)
    items -> (d, n) indices, uint64 math (hash_val analogue,
    src/core/count_min_sketch.c:136-138)."""
    x = np.asarray(x).astype(np.uint64, copy=False)
    return ((a[:, None] * x[None, :] + b[:, None]) % np.uint64(prime)) % np.uint64(width)
