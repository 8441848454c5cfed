"""Pure-Python xxHash64, bit-identical to Spark's ``F.xxhash64``.

Spark's ``XxHash64`` expression (seed 42) folds its children through the
public xxHash64 algorithm (Yann Collet's spec, also in
org.apache.spark.sql.catalyst.expressions.XXH64): strings hash their UTF-8
bytes through the full streaming body, longs/ints hash through the
fixed-width finalizers, and composite children (arrays, multiple children)
FOLD — each element is hashed with the running hash as its seed.

This module exists so driver-side REPLAY ORACLES can re-derive
xxhash64-based engine output (MinHash band keys, SimHash fingerprints,
hash-split assignments) independently of every JVM code path they check —
the same numpy-replay technique as the multimodal expected-ok contract.
Bit-equality with ``F.xxhash64`` is pinned in tests/test_operators.py over
strings (all tail lengths, multi-byte UTF-8, >=32-byte stripes), signed
longs, ints, arrays, and the multi-child band-key form.

Throughput is ~µs/hash (pure Python) — fine for bounded replay samples,
never for the data path (that's what the JVM expression is for).
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SEED = 42  # Spark's default xxhash64 seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= 1 << 63 else h


def hash_long(value: int, seed: int) -> int:
    """XXH64 of one 64-bit word — Spark's hash for LongType (and the
    per-element fold step for array<long>).  Signed in, signed out."""
    value &= _M64
    h = (seed & _M64) + _P5 + 8 & _M64
    k = _rotl((value * _P2) & _M64, 31) * _P1 & _M64
    h ^= k
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _signed(_fmix(h))


def hash_int(value: int, seed: int) -> int:
    """XXH64 of one 32-bit word — Spark's hash for IntegerType children
    (e.g. the band index in ``xxhash64(slice, j)``)."""
    h = (seed & _M64) + _P5 + 4 & _M64
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _signed(_fmix(h))


def hash_bytes(data: bytes, seed: int) -> int:
    """XXH64 over a byte string — Spark's hash for StringType (UTF-8
    bytes).  Full streaming body: 32-byte stripes with 4 accumulators,
    then 8-/4-/1-byte tails."""
    seed &= _M64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little") * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little") * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little") * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        k = (_rotl((int.from_bytes(data[i:i + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
        h ^= k
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _signed(_fmix(h))


def hash_str(s: str, seed: int = SEED) -> int:
    """``F.xxhash64(string_col)`` twin."""
    return hash_bytes(s.encode("utf-8"), seed)


def hash_long_array(values, seed: int = SEED) -> int:
    """``F.xxhash64(array<long>_col)`` twin: fold hash_long over the
    elements (nulls skipped), seeded with the running hash."""
    h = seed
    for v in values:
        if v is not None:
            h = hash_long(int(v), h)
    return h


def band_key(sig_slice, band_idx: int, seed: int = SEED) -> int:
    """``F.xxhash64(slice(sig, ...), band_idx)`` twin (the MinHash LSH
    band key): fold the array child, then the int child."""
    return hash_int(band_idx, hash_long_array(sig_slice, seed))
