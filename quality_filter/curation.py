"""Corpus-curation operators beyond the per-document gates: per-key
contribution caps (RefinedWeb/Dolma-style per-domain limits).

New module (rather than extending sampling.py) so the driver-window
rotation audit keeps its per-module change detection useful: operators
added here leave existing rows' import closures untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cap_per_key(
    df: DataFrame,
    key_col: str = "source",
    k: int = 1000,
    order_col: str | None = None,
    ascending: bool = False,
    tiebreak_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``k`` rows per ``key_col`` group — the per-domain
    document cap of RefinedWeb/Dolma-style corpus curation (bound any
    single host's contribution to the training mix).

    Rows are ranked by ``order_col`` (descending by default — "keep the
    k best"; ``ascending=True`` flips it) with ``tiebreak_col`` as the
    deterministic tiebreaker; ``order_col=None`` ranks by
    ``tiebreak_col`` alone ("keep the k first").

    Scale: expressed as a rank-limit window (``row_number() <= k``),
    which Spark 3.5+ plans as a WindowGroupLimit with a PARTIAL
    (map-side) pass before the exchange — every mapper keeps only its
    own top-k per key, so a 10^9-row domain ships at most tasks × k
    rows through the shuffle instead of 10^9 rows into one sort task
    (the same plan shape as the bucket-occupancy guard).  Asserted by
    plan test (tests/test_round7.py)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    order = []
    if order_col is not None:
        c = F.col(order_col)
        order.append(c.asc() if ascending else c.desc())
    order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
