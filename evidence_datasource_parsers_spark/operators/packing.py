"""Pack materialization: pack assignments → trainer-ready token rows.

q51-style packing ASSIGNS documents to fixed-budget context bins; a
trainer consumes the other half — per pack, ONE concatenated token array
plus the document boundary offsets (attention masks / position resets
are derived from boundaries, and loss masking per source document needs
them).  This operator materializes that row.

Shape: one shuffle on (partition key, pack id); within a pack, documents
concatenate in deterministic ``order_col`` order via a sorted struct
collect — array_sort on (order, tokens) structs, so the result is
independent of partitioning (the same discipline as every collect in the
catalog).  A pack holds O(context budget) tokens by construction, so the
collected arrays are bounded — this is exactly the place collect_list is
safe, and the boundary math is a pure array fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def materialize_packs(
    df: DataFrame,
    tokens_col: str,
    pack_col: str = "pack_id",
    order_col: str = "doc_id",
    partition_cols: list[str] | None = None,
    id_col: str | None = "doc_id",
) -> DataFrame:
    """(partition_cols…, ``pack_col``, input_ids, doc_offsets, doc_ids,
    n_tokens, n_docs): the pack's concatenated tokens, the START offset of
    each member document (0-based; ``doc_offsets[i]`` to
    ``doc_offsets[i+1]`` is document i), member ids in concat order, and
    sizes.

    ``tokens_col`` is an array column (BPE ids or strings — dtype is
    preserved).  NULL token arrays contribute zero tokens but still
    appear in ``doc_ids`` (a trainer should know the doc was scheduled).
    """
    parts = list(partition_cols or [])
    sort_struct = F.struct(
        F.col(order_col).alias("o"),
        F.coalesce(
            F.col(tokens_col), F.array().cast(dict(df.dtypes)[tokens_col])
        ).alias("t"),
        *( [F.col(id_col).alias("i")] if id_col else [] ),
    )
    grouped = df.groupBy(*parts, pack_col).agg(
        F.array_sort(F.collect_list(sort_struct)).alias("__m")
    )
    members = F.col("__m")
    tokens = F.flatten(F.transform(members, lambda m: m["t"]))
    sizes = F.transform(members, lambda m: F.size(m["t"]))
    # offsets: exclusive prefix sums of member sizes (0, s0, s0+s1, …)
    offsets = F.slice(
        F.aggregate(
            sizes,
            F.array(F.lit(0).cast("int")),
            lambda acc, s: F.concat(
                acc, F.array(F.element_at(acc, -1) + s)
            ),
        ),
        1,
        F.size(sizes),
    )
    out = [
        *parts,
        pack_col,
        tokens.alias("input_ids"),
        offsets.alias("doc_offsets"),
        F.size(tokens).cast("long").alias("n_tokens"),
        F.size(members).cast("int").alias("n_docs"),
    ]
    if id_col:
        out.insert(
            len(parts) + 3,
            F.transform(members, lambda m: m["i"]).alias("doc_ids"),
        )
    return grouped.select(*out)
