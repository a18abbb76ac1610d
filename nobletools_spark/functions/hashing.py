"""Portable deterministic hashing expressions.

The engine needs content hashes that (a) run JVM-side (no Python UDF in
the hot path) and (b) are reproducible by an independent ANSI-SQL oracle
(DuckDB) for the correctness gate. ``xxhash64``/``hash`` differ between
engines, so the portable primitive is the first 15 hex digits of md5
interpreted as a 60-bit integer:

    Spark : CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB: ('0x' || substring(md5(s), 1, 15))::UBIGINT

Both yield the same non-negative value < 2^60 (verified in
tests/test_ops_oracle.py). On a real cluster where cross-engine parity
is not needed, swap ``h64`` for ``F.xxhash64`` — same fan-out shape,
~3× cheaper; every operator below takes the hash builder as an injectable
so that swap is one argument.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

HASH_BITS = 60
HASH_MOD = 1 << 31  # rolling-hash modulus: keeps acc*31+h < 2^63 (no overflow)


def h64(col: Column | str) -> Column:
    """60-bit portable content hash of a string column (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h64_seeded(seed: int, col: Column | str) -> Column:
    """Seeded variant: hash of '<seed>|<value>' — the minhash family."""
    c = F.col(col) if isinstance(col, str) else col
    return h64(F.concat(F.lit(f"{seed}|"), c))


def h64_py(s: str) -> int:
    """Pure-Python rendering of ``h64`` — used where a deterministic
    driver-side decision (e.g. the IVF quantizer's fit sample / init
    seed) must be replayable by the DuckDB oracle without Spark."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def sql_h64(expr: str) -> str:
    """DuckDB rendering of ``h64`` over an arbitrary SQL expression."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::UBIGINT)::BIGINT"


def sql_h64_seeded(seed: int, expr: str) -> str:
    return sql_h64(f"'{seed}|' || {expr}")
