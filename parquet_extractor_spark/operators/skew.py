"""Skew-mitigation join utilities.

AQE's skew-join splitting handles most skew transparently (it is on in
session.py), but two cases still need explicit treatment at 100 TB:

1. a *broadcast-too-big, hopelessly-skewed* key distribution on a
   shuffle join — handled by **salting**: the skewed side gets a
   random salt in [0, SALT), the other side is replicated SALT times,
   and the join key becomes (key, salt), spreading each hot key over
   SALT reducers;
2. a *repeated* join against the same huge table — handled by
   **bucketing** (sinks/dataset.write_bucketed): pay one shuffle at
   write time, then every subsequent equi-join on the bucket key runs
   shuffle-free.

Salting trades a SALT× blow-up of the smaller side for even reducer
load; use it when one side is orders of magnitude smaller but still
over the broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 8


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = DEFAULT_SALT,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the skewed side salted.

    ``skewed`` rows get a uniform salt in [0, salt); ``other`` rows are
    exploded into all `salt` copies. Result equals
    ``skewed.join(other, on, how)`` for inner/left joins (each skewed
    row matches exactly the copies carrying its salt). The join key
    becomes (on, _salt), so one hot key's rows land on `salt` distinct
    reducers instead of one.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_l = skewed.withColumn(
        "_salt", (F.rand(seed) * salt).cast("int")
    )
    replicated_r = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_l.join(replicated_r, [on, "_salt"], how)
    return out.drop("_salt")
