"""Explicit skew-defusing joins (north-rule technique: salted joins for
hot-entity keys like AAPL/SEC).

Three complementary tools exist in this engine for skewed joins, in order
of preference:

1. **Broadcast** (dimension-sized small side) — no shuffle at all; used on
   every gazetteer/canonical-map join. Skew is irrelevant.
2. **AQE skew-join splitting** (`spark.sql.adaptive.skewJoin`, on in
   session.py) — runtime splitting of oversized shuffle blocks for
   sort-merge joins. Zero code, but only kicks in past size thresholds and
   only for SMJ.
3. **Explicit salting** (this module) — when the small side is too big to
   broadcast and the key distribution is known-pathological (one entity in
   a third of all rows), salt the big side and replicate the other side
   across the salt space: the hot key's rows spread over `salt_factor`
   reducers deterministically, independent of AQE's thresholds.

The salt must be DETERMINISTIC (no rand(): it breaks retry/resume
semantics — a recomputed task must produce the same rows). We derive it
from xxhash64 over the row's other columns, which distributes a hot key's
rows uniformly without any RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    other: DataFrame,
    key: str,
    salt_factor: int = 16,
    how: str = "inner",
    row_id: str | None = None,
) -> DataFrame:
    """Equi-join `big` ⋈ `other` on `key` with the hot-key shuffle defused.

    big side: salt = pmod(xxhash64(all non-key columns), salt_factor) — a
    deterministic spread of each key's rows across salt_factor buckets.
    other side: replicated salt_factor times via posexplode of a literal
    range (rows x salt_factor — acceptable when `other` is the smaller,
    skew-prone-dimension side that still exceeds the broadcast threshold).
    The join key becomes (key, salt): a key carrying 30% of the table now
    lands on salt_factor reducers instead of one.

    CAVEAT (deterministic-salt limitation): rows of a hot key that are
    FULLY duplicate across the non-key columns hash to the same salt
    bucket, so skew survives on duplicate-heavy inputs. When the caller has
    a stable unique row id, pass it as `row_id` — the salt then hashes only
    (key, row_id), which spreads even identical payload rows. rand() is NOT
    an option: a recomputed task must produce the same rows (resume/retry
    contract).

    Semantics are EXACTLY the plain join's (asserted by
    tests/test_analytics.py::test_salted_join_equals_plain_join): every
    (big row, other row) pair with equal keys meets in exactly one salt
    bucket. Supported how: inner / left (the shapes the read path uses)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if "_salt" in big.columns or "_salt" in other.columns:
        raise ValueError(
            "salted_join: an input already has a '_salt' column — it would "
            "be silently overwritten/dropped; rename it first"
        )
    if row_id is not None and row_id not in big.columns:
        raise ValueError(f"salted_join: row_id {row_id!r} not in big side")
    non_key = [c for c in big.columns if c != key]
    # degenerate key-only frame: nothing to derive a spread from (and
    # nothing to gain — the join output is key-only anyway)
    if row_id is not None:
        salt = F.pmod(F.xxhash64(F.col(key), F.col(row_id)), F.lit(salt_factor))
    elif non_key:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in non_key]), F.lit(salt_factor)
        )
    else:
        salt = F.lit(0)
    b = big.withColumn("_salt", salt)
    o = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    return b.join(o, [key, "_salt"], how).drop("_salt")
