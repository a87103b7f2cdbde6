"""Vectorized 64-bit hashing kernels (numpy uint64, no Python row loops).

These back the shuffle bucketing and the dedup family (MinHash shingles,
SimHash tokens). Everything here is explicit arithmetic on numpy uint64 —
deterministic across processes, machines and library versions (the round-1
`_key_hash` relied on pandas' siphash key staying fixed across versions; on
a heterogeneous cluster a version skew would silently corrupt bucketing).

Kernels:

- ``splitmix64(x)``       — the public SplitMix64 finalizer (Steele et al.,
                            "Fast splittable pseudorandom number generators",
                            OOPSLA 2014); full-avalanche 64-bit mixer.
- ``hash_string_array(a)``— one 64-bit hash per row of an Arrow string/binary
                            array, computed with position-weighted byte sums
                            (np.add.reduceat over the value buffer) and a
                            splitmix64 finalize. No per-row Python.
- ``mulmod_mersenne61``   — (a*x) mod (2^61-1) in uint64 via 32-bit limb
                            products (the classic Mersenne-prime fold:
                            2^64 ≡ 8 mod p).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U64 = np.uint64
MERSENNE61 = _U64((1 << 61) - 1)
_MASK32 = _U64((1 << 32) - 1)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 finalizer over uint64 (wrapping arithmetic)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += _U64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
        x ^= x >> _U64(31)
    return x


# 256 odd position weights, themselves derived from splitmix64 — fixed forever.
_POS_WEIGHTS = splitmix64(np.arange(256, dtype=np.uint64)) | _U64(1)
# an INDEPENDENT weight table for the second 64-bit lane of 128-bit ids —
# the per-byte map is linear, so a seed mixed only into the finalizer would
# collide whenever the first lane's weighted sum collides; different weights
# make the two lanes' sums independent linear forms
_POS_WEIGHTS_HI = splitmix64(
    np.arange(256, dtype=np.uint64) + _U64(0xA076_1D64_78BD_642F)
) | _U64(1)


def _hash_bytes_rows(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """One uint64 hash per variable-length row of `data` (uint8), rows
    delimited by `offsets` (int64, len = nrows+1). Vectorized: each byte
    contributes (byte+1) * weight(pos_in_row), rows are summed with
    np.add.reduceat, then splitmix64-finalized with the row length mixed in.

    The per-byte map is linear (weights repeat mod 256 but are also scaled
    by an odd function of the absolute position), which is plenty for
    bucketing and token identity; the finalizer provides avalanche.
    """
    n = len(offsets) - 1
    lengths = np.diff(offsets)
    if len(data) == 0:
        return splitmix64(lengths.astype(np.uint64))
    starts = offsets[:-1]
    pos = np.arange(len(data), dtype=np.int64) - np.repeat(starts, lengths)
    with np.errstate(over="ignore"):
        contrib = (
            (data.astype(np.uint64) + _U64(1))
            * _POS_WEIGHTS[pos & 255]
            * (pos.astype(np.uint64) * _U64(2) + _U64(1))
        )
        # reduceat quirks: an index == len(contrib) is invalid, and an empty
        # segment returns the element AT its index. Append a 0 sentinel so
        # every start is a valid index (the sentinel lands in the final
        # row's sum, adding 0), then zero out empty rows.
        contrib = np.concatenate([contrib, np.zeros(1, np.uint64)])
        sums = np.add.reduceat(contrib, starts) if n else np.empty(0, np.uint64)
        sums[lengths == 0] = _U64(0)
        sums ^= lengths.astype(np.uint64) * _U64(0x9E3779B97F4A7C15)
    return splitmix64(sums)


def _string_bytes_view(arr) -> tuple[np.ndarray, np.ndarray]:
    """(data uint8, rebased offsets int64) view of an Arrow string/binary
    array's value window. Null rows view as empty strings."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        off_dtype = np.int32
    else:  # large_string / large_binary
        off_dtype = np.int64
    if arr.null_count:
        arr = arr.fill_null("" if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type) else b"")
    buffers = arr.buffers()
    raw_off = np.frombuffer(buffers[1], dtype=off_dtype)
    offsets = raw_off[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    # slice the value buffer to this array's window and rebase offsets
    base = offsets[0]
    return data[base : offsets[-1]], offsets - base


def hash_string_array(arr) -> np.ndarray:
    """uint64 hash per element of an Arrow string/large_string/binary array
    (or ChunkedArray). Null rows hash as empty strings."""
    data, offsets = _string_bytes_view(arr)
    return _hash_bytes_rows(data, offsets)


def _hash_bytes_rows_hi(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """The second (independent) 64-bit lane: same reduceat structure as
    _hash_bytes_rows but over _POS_WEIGHTS_HI, a different position mix,
    and a different length constant."""
    n = len(offsets) - 1
    lengths = np.diff(offsets)
    if len(data) == 0:
        return splitmix64(lengths.astype(np.uint64) ^ _U64(0xD1B5_4A32_D192_ED03))
    starts = offsets[:-1]
    pos = np.arange(len(data), dtype=np.int64) - np.repeat(starts, lengths)
    with np.errstate(over="ignore"):
        contrib = (
            (data.astype(np.uint64) + _U64(0x9E37))
            * _POS_WEIGHTS_HI[pos & 255]
            * (pos.astype(np.uint64) * _U64(4) + _U64(3))
        )
        contrib = np.concatenate([contrib, np.zeros(1, np.uint64)])
        sums = np.add.reduceat(contrib, starts) if n else np.empty(0, np.uint64)
        sums[lengths == 0] = _U64(0)
        sums ^= lengths.astype(np.uint64) * _U64(0xD1B5_4A32_D192_ED03)
    return splitmix64(sums)


def hash128_string_array(arr) -> tuple[np.ndarray, np.ndarray]:
    """(lo, hi) uint64 lanes of a 128-bit content hash per element — two
    independent linear byte maps over one buffer view (the 10^12-distinct-
    value id space: 64-bit ids hit the birthday bound near 10^9-10^10)."""
    data, offsets = _string_bytes_view(arr)
    return _hash_bytes_rows(data, offsets), _hash_bytes_rows_hi(data, offsets)


def mulmod_mersenne61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a * x) mod (2^61-1), element-wise uint64, via 32-bit limb products.
    Requires a, x < 2^61. 2^64 ≡ 8 (mod p) folds the 128-bit product."""
    p = MERSENNE61
    with np.errstate(over="ignore"):
        a_lo, a_hi = a & _MASK32, a >> _U64(32)
        x_lo, x_hi = x & _MASK32, x >> _U64(32)
        ll = a_lo * x_lo
        lh = a_lo * x_hi
        hl = a_hi * x_lo
        hh = a_hi * x_hi
        cross = (ll >> _U64(32)) + (lh & _MASK32) + (hl & _MASK32)
        lo = ((cross & _MASK32) << _U64(32)) | (ll & _MASK32)
        hi = hh + (lh >> _U64(32)) + (hl >> _U64(32)) + (cross >> _U64(32))
        # value = hi*2^64 + lo ; 2^64 ≡ 8 (mod p); hi < 2^58 so hi*8 < 2^61
        r = hi * _U64(8) + (lo & p) + (lo >> _U64(61))
        r = (r & p) + (r >> _U64(61))
    r[r >= p] -= p
    return r


def tokenize_column(text_col) -> tuple[np.ndarray, np.ndarray]:
    """Split an Arrow string column on single spaces (C-level kernel) and
    hash every token: returns (token_hashes uint64, doc_offsets int64) where
    doc_offsets[i]:doc_offsets[i+1] are row i's tokens. Matches Python
    ``text.split(" ")`` semantics (empty strings preserved)."""
    import pyarrow.compute as pc

    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    if text_col.null_count:
        text_col = text_col.fill_null("")
    toks = pc.split_pattern(text_col, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offs = np.asarray(toks.offsets).astype(np.int64)
    return hash_string_array(flat), offs - offs[0]
