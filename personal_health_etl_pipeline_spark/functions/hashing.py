"""Portable deterministic hashing.

Dedup / LSH operators need hashes that (a) are stable across executors
and Spark versions, and (b) can be reproduced by the DuckDB oracle so
the driver's differential check covers them. ``xxhash64``/``hash`` are
Spark-internal, so the engine standardizes on **md5-derived hashes**:

* ``md5_hex(col)`` — 128-bit hex digest, identical in any engine.
* ``md5_long(col)`` — first 15 hex chars as a non-negative 60-bit
  bigint: ``conv(substr(md5(x),1,15),16,10)``. DuckDB equivalent:
  ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)`` (verified identical).
* ``seeded(col, seed)`` — family of independent hash functions for
  MinHash: hash of ``value || '|' || seed``.

md5 is ~3x slower than xxhash64 but still JVM-side/codegen; swap
``PORTABLE=False`` at real scale if oracle parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 15  # 60 bits, fits bigint with headroom


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def md5_hex(col: Column | str) -> Column:
    return F.md5(_col(col).cast("string"))


def md5_long(col: Column | str) -> Column:
    """Non-negative 60-bit bigint hash, reproducible in DuckDB."""
    return F.conv(F.substring(md5_hex(col), 1, HEX_CHARS), 16, 10).cast("bigint")


def seeded(col: Column | str, seed: int) -> Column:
    """The ``seed``-th member of a portable hash family (for MinHash)."""
    return F.concat(_col(col).cast("string"), F.lit(f"|{seed}"))


def md5_hex_seeded(col: Column | str, seed: int) -> Column:
    return F.md5(seeded(col, seed))


def md5_long_seeded(col: Column | str, seed: int) -> Column:
    return F.conv(F.substring(md5_hex_seeded(col, seed), 1, HEX_CHARS), 16, 10).cast(
        "bigint"
    )


# --- DuckDB oracle-side equivalents (SQL snippet builders) -----------

def duckdb_md5_long(expr: str) -> str:
    return f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, {HEX_CHARS}) AS BIGINT)"


def duckdb_md5_long_seeded(expr: str, seed: int) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR) || '|{seed}'), 1, "
        f"{HEX_CHARS}) AS BIGINT)"
    )
