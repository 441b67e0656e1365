"""Exactly-once STREAMING dedup: first occurrence per key wins, across
micro-batches, via ``applyInPandasWithState`` (the custom-stateful-operator
path the built-in `dropDuplicates` can't replace when the emitted row must
be a deterministic representative rather than an arbitrary first arrival).

Semantics (mirrors the batch ``operators.dedup.dedup_keep_first`` contract):
for each key (e.g. a normalized-text fingerprint), emit exactly one row —
the minimum by ``order_cols`` WITHIN the first micro-batch that contains
the key — and nothing ever again for that key. State per key is a single
"seen" flag; with watermark-based state timeout the state is dropped once
no duplicate can still arrive (bounded state at unbounded stream length).

Scale: state is hash-partitioned by key across executors (one shuffle per
micro-batch, same key-partitioning the batch dedup uses); per-key state is
one boolean, so 10¹² seen-keys is a state-store sizing problem, not a
driver problem — pair with the timeout to bound it.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(stream: DataFrame, key_col: str, order_cols: list[str],
                 timeout: str = "NoTimeout") -> DataFrame:
    """streaming df → append-mode deduplicated df (first key occurrence).

    ``order_cols`` break ties deterministically inside a micro-batch (the
    cross-batch order is arrival order, exactly-once by keyed state).
    """
    schema = stream.schema
    out_type = schema

    def dedup_fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # key already emitted in an earlier micro-batch: swallow rows
            for _ in pdfs:
                pass
            return
        first = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(order_cols, kind="mergesort").head(1)
            if first is None:
                first = cand
            else:
                both = pd.concat([first, cand], ignore_index=True)
                first = both.sort_values(order_cols, kind="mergesort").head(1)
        if first is not None:
            state.update((True,))
            yield first

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_type,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def stream_dedup_to_parquet(stream: DataFrame, out_dir: str, ck_dir: str,
                            key_col: str, order_cols: list[str]):
    """Wire ``dedup_stream`` to a parquet sink (append, exactly-once via
    the checkpointed state store). Returns the StreamingQuery."""
    deduped = dedup_stream(stream, key_col, order_cols)
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .outputMode("append")
        .start()
    )
