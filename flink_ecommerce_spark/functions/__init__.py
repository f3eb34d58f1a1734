"""Scalar/array helper functions.

- ``portable``: deterministic hashes that produce IDENTICAL values in
  Spark and in ANSI-SQL engines (DuckDB) — the foundation of the
  oracle-checkable dedup/fingerprint operators.
- ``vector``: embedding math (dot, norm, cosine) as built-in Spark
  higher-order functions (JVM-side, whole-stage-codegen'd — no Python
  in the hot path).
"""

from .portable import hash32, sql_hash32  # noqa: F401
from .vector import cosine_sim, dot, l2_norm  # noqa: F401
