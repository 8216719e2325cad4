"""Skew mitigation — salted joins for hot keys (SCALE.md: the manual fallback
when AQE's skew-join splitting isn't enough, e.g. a single key holding >5% of
a 100 TB fact table).

Technique: append a deterministic salt in [0, n) to the skewed (big) side's
key, replicate the small side n× (one row per salt value), join on
(key, salt). The hot key's rows spread over n tasks instead of one. The salt
derives from a hash of the whole row — deterministic, no RNG, so re-runs and
retries produce identical partitioning (same reproducibility contract as the
rest of the engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted n ways.

    Result is identical to ``big.join(small, key, how)`` — only the physical
    distribution changes. Supported ``how``: inner/left (the skewed side must
    be the preserved side; for right/full, swap the inputs)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).alias("_salt")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    joined = big_s.join(small_s, [key, "_salt"], how)
    return joined.drop("_salt")
