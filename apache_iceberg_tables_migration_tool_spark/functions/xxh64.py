"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` bit-for-bit
(seed 42, per-type input layouts from
`org.apache.spark.sql.catalyst.expressions.XXH64`):

- int  → 4-byte tail round over the unsigned 32-bit value
- long → one 8-byte round
- string → full XXH64 over the UTF-8 bytes

Why it exists: manifest planning (`SnapTable.plan_files`) runs on the
DRIVER with no SparkSession, but pruning a ``bucket(N, col)`` hidden
partition for a point predicate needs the engine's hash of the
literal. Parity with the JVM implementation is pinned by
``tests/test_xxh64.py`` over randomized ints/longs/strings — any
drift breaks that test before it can mis-prune a scan.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _to_signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def xxh64_long(value: int, seed: int = SPARK_SEED) -> int:
    """≡ ``F.xxhash64(col.cast("bigint"))`` (also tinyint/smallint/int
    columns are promoted? NO — see :func:`xxh64_int`)."""
    v = value & _M  # two's complement
    h = (seed + _P5 + 8) & _M
    k1 = (_rotl((v * _P2) & _M, 31) * _P1) & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _to_signed(_fmix(h))


def xxh64_int(value: int, seed: int = SPARK_SEED) -> int:
    """≡ ``F.xxhash64(col)`` for int/short/byte columns (Spark hashes
    them through the 4-byte path, NOT promoted to long)."""
    v = value & 0xFFFFFFFF
    h = (seed + _P5 + 4) & _M
    h ^= (v * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _to_signed(_fmix(h))


def xxh64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """Full XXH64 ≡ ``F.xxhash64(string_col)`` on the UTF-8 bytes."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            for _j, upd in enumerate((0, 8, 16, 24)):
                k = int.from_bytes(data[i + upd : i + upd + 8], "little")
                if upd == 0:
                    v1 = (_rotl((v1 + k * _P2) & _M, 31) * _P1) & _M
                elif upd == 8:
                    v2 = (_rotl((v2 + k * _P2) & _M, 31) * _P1) & _M
                elif upd == 16:
                    v3 = (_rotl((v3 + k * _P2) & _M, 31) * _P1) & _M
                else:
                    v4 = (_rotl((v4 + k * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _to_signed(_fmix(h))


def spark_xxhash64(value, dtype_simple: str, seed: int = SPARK_SEED) -> int | None:
    """Dispatch on a Spark ``simpleString()`` type name; None when the
    type's layout isn't covered (callers must then skip pruning)."""
    if dtype_simple in ("tinyint", "smallint", "int"):
        return xxh64_int(int(value), seed)
    if dtype_simple == "bigint":
        return xxh64_long(int(value), seed)
    if dtype_simple == "string":
        return xxh64_bytes(str(value).encode("utf-8"), seed)
    return None
