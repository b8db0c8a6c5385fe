"""Sequence packing — the last stage of LLM training-data prep.

Documents are tokenized, concatenated into one stream, and cut into
fixed-length training sequences (the "packing" every large-model data
pipeline runs so short documents don't waste context window). A single
global stream is inherently sequential, so the distributed form packs
WITHIN independent groups (per source / per shard — how production
pipelines do it: each group's stream is deterministic and the groups
parallelize), using a window cumulative sum:

    cum      = sum(n_tokens) over (partition by group order by doc_id)
    chunk_id = floor((cum - n_tokens) / seq_len)   -- chunk the doc STARTS in

Docs spill across chunk boundaries exactly as the concatenated stream
would (greedy concatenation, no padding between docs). Everything is
integer arithmetic over a deterministic order — bit-reproducible, and
the whole operator is one exchange (the group key) + one Window node.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tokens_col: Column | str,
    seq_len: int,
) -> DataFrame:
    """Append ``cum_tokens`` (tokens up to and including this doc within
    its group's stream) and ``chunk_id`` (the seq_len-sized training
    sequence this doc starts in). Deterministic given (group, order)."""
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(t).over(w).cast("long")
    return df.withColumn("cum_tokens", cum).withColumn(
        "chunk_id", F.floor((F.col("cum_tokens") - t) / seq_len).cast("long")
    )
