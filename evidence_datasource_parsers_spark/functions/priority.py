"""Priority ranking over delimited lists — D3 re-expressed natively.

The reference picks the highest-priority SO code from a ';'-separated list
with a Python UDF holding a rank dict (``modules/Gene2Phenotype.py:153-191``).
Here the rank map becomes a ``create_map`` literal and the argmax is
``array_max`` over (rank, value) structs — fully codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def highest_priority(
    col: Column | str,
    ranking: dict[str, int],
    sep: str = ";",
    default_rank: int = -1,
) -> Column:
    """Highest-ranked item of a delimited list; unknown items rank
    ``default_rank``.  Ties break toward the lexicographically greatest item
    (struct comparison), deterministic."""
    c = F.col(col) if isinstance(col, str) else col
    rank_map = F.create_map(
        *[F.lit(x) for kv in ranking.items() for x in kv]
    )
    items = F.transform(F.split(c, sep), lambda x: F.trim(x))
    scored = F.transform(
        items,
        lambda x: F.struct(
            F.coalesce(rank_map[x], F.lit(default_rank)).alias("rank"),
            x.alias("value"),
        ),
    )
    return F.array_max(scored)["value"]
