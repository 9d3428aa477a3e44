"""Cross-engine deterministic hashing.

The reference partitions and samples with ``mmh3.hash(str(k)) % n``
(MRSystemSimulator2020.py:98-101, sampler_v02.py:80). Spark's builtin
``hash``/``xxhash64`` and DuckDB's ``hash`` are three mutually incompatible
functions — fine statistically, fatal for differential testing (SURVEY.md
§7.4 "hash parity"). The engine therefore standardizes on an MD5-derived
60-bit integer, computable bit-identically in Spark SQL, DuckDB, and Python:

    h64(x, seed) = int(md5(f"{seed}:{x}")[:15 hex chars], 16)   # 60 bits

MD5 here is a deterministic mixer, not cryptography. 15 hex chars = 60 bits
keeps the value positive in a signed int64 in every engine.

At scale this is one codegen'd JVM expression per row (no Python); if a hot
path ever shows md5 cost, swap to ``xxhash64`` on the Spark side only — the
oracle-facing queries keep md5.

Measured (round 2, sf0.1, local[32]): replacing the 32 per-seed md5 calls in
minhash signature construction with one md5 + per-seed integer mixing saves
only ~0.15 s of a ~5 s LSH query — the cost of those queries is shingling,
distinct, and the band/candidate joins, not the hash. The md5-per-seed form
stays: it is the simplest thing that is bit-identical in both engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F

H_BITS = 60


def _seeded(col: Column | str, seed: int | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(f"{seed}:"), c.cast("string"))


def h64(col: Column | str, seed: int | str = 0) -> Column:
    """60-bit deterministic hash of a column (Spark side)."""
    return F.conv(F.substring(F.md5(_seeded(col, seed)), 1, 15), 16, 10).cast("long")


def h64_sql(expr: str, seed: int | str = 0) -> str:
    """Identical 60-bit hash as a DuckDB SQL fragment."""
    return f"('0x' || substr(md5('{seed}:' || CAST({expr} AS VARCHAR)), 1, 15))::BIGINT"


def h64_py(value, seed: int | str = 0) -> int:
    """Identical 60-bit hash in pure Python (for unit-test golden values)."""
    return int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:15], 16)


def hex_bucket(col: Column | str, n_hex_chars: int = 1, seed: int | str = 0) -> Column:
    """Entity bucket as the first hex chars of the seeded md5 (16**n buckets).

    Used by the one-pass hash-bucket sampler (sampler_v02.py:63-87): keeping
    bucket '0' of 1 hex char keeps ~1/16 of *entities* — every kept entity is
    kept completely, the property the reference's multi-level sampler is about.
    """
    return F.substring(F.md5(_seeded(col, seed)), 1, n_hex_chars)


def hex_bucket_sql(expr: str, n_hex_chars: int = 1, seed: int | str = 0) -> str:
    return f"substr(md5('{seed}:' || CAST({expr} AS VARCHAR)), 1, {n_hex_chars})"
