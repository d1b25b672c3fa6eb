"""Vectorized StreamHash kernels (numpy; called from Arrow/pandas UDFs).

These reproduce the reference's scalar kernels exactly, batched:

- ``hashmulti``: Kaser-Lemire strongly-universal multilinear string hash to
  {-1,+1} with uint64 wrap-around arithmetic (reference hash.cpp:20-26).
- sketch = sign(projection), projection = sum over shingle chunks of
  count * hashmulti(chunk, H_i) (reference streamhash.cpp:22-41).
- StreamHash similarity = fraction of equal bits (streamhash.cpp:17-20).
- LSH banding: band i = sketch bits [R*i, R*i+R) as an R-bit integer
  (cluster.cpp:23-42; bitset indexing => bit j of the band value is
  sketch bit R*i + j).

uint64 overflow fidelity: all arithmetic stays in ``np.uint64``; numpy integer
ops wrap modulo 2**64 exactly like C++ unsigned arithmetic.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import numpy as np

_MASK64 = 0xFFFFFFFFFFFFFFFF


def chunk_byte_matrix(chunks: Sequence[str], chunk_length: int) -> np.ndarray:
    """Encode chunk strings to a zero-padded (n, chunk_length) uint64 byte matrix.

    Zero padding is exact: a padded byte multiplies its H coefficient by 0,
    contributing nothing — identical to the reference's loop over the actual
    string length (hash.cpp:22-24).  latin-1 keeps char == byte for 0..255.
    """
    n = len(chunks)
    buf = bytearray(n * chunk_length)
    for i, c in enumerate(chunks):
        b = c.encode("latin-1")
        buf[i * chunk_length : i * chunk_length + len(b)] = b
    return (
        np.frombuffer(bytes(buf), dtype=np.uint8)
        .reshape(n, chunk_length)
        .astype(np.uint64)
    )


def hashmulti_batch(chunks: Sequence[str], H: np.ndarray) -> np.ndarray:
    """Hash n chunk strings with all L functions -> (n, L) int8 of +/-1.

    ``H`` is (L, chunk_length + 2) uint64 from ``rng.allocate_random_bits``.
    sum_i = H[i,0] + sum_j H[i,j+1] * byte_j  (mod 2**64);  out = 2*MSB - 1.
    """
    L, width = H.shape
    chunk_length = width - 2
    if len(chunks) == 0:
        return np.empty((0, L), dtype=np.int8)
    M = chunk_byte_matrix(chunks, chunk_length)           # (n, C) uint64
    with np.errstate(over="ignore"):
        sums = M @ H[:, 1 : chunk_length + 1].T           # (n, L) uint64, wraps
        sums = sums + H[:, 0][None, :]
    return (2 * ((sums >> np.uint64(63)) & np.uint64(1)).astype(np.int8) - 1)


def hashmulti(key: str, randbits: Iterable[int]) -> int:
    """Scalar reference oracle: exact re-derivation of hash.cpp:20-26."""
    rb = [int(x) for x in randbits]  # np.uint64 * python int promotes to float
    s = rb[0]
    for i, ch in enumerate(key.encode("latin-1")):
        s = (s + rb[i + 1] * ch) & _MASK64
    return 2 * ((s >> 63) & 1) - 1


def get_string_chunks(s: str, length: int) -> list[str]:
    """Split a shingle into fixed-length chunks (graph.cpp:432-438)."""
    return [s[off : off + length] for off in range(0, len(s), length)]
