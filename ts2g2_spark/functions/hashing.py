"""Portable hashing helpers.

Everything is md5-derived so Spark and any ANSI-ish oracle engine can
reproduce the exact same integers (Spark's hash()/xxhash64 seeds differ
across engines; md5 is bit-stable everywhere).  h64(s) = first 15 hex chars
of md5 as a non-negative int64 — 60 bits of the digest, collision-safe at
any realistic scale here.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def h64(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash of a string column (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h64_py(s: str) -> int:
    """Python twin of h64 for kernel-side use (identical values)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def normalize_text(col: Column | str) -> Column:
    """Canonical text form for fingerprinting: lowercase, collapse
    whitespace, strip non-alphanumerics (locale-free).

    Whitespace is the EXPLICIT class [ \\t\\n\\f\\r] — RE2's ``\\s`` —
    rather than Java's ``\\s`` (which additionally matches vertical tab
    \\x0B), so every DuckDB oracle written with RE2 ``\\s`` tokenizes
    identically even on \\x0B-bearing input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), "[^a-z0-9 \t\n\f\r]", ""),
            "[ \t\n\f\r]+", " "
        )
    )
