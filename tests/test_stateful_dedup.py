"""Exactly-once streaming dedup (streaming/stateful_dedup.py).

Contracts: (1) within a micro-batch, one deterministic representative per
key (min by order_cols); (2) across micro-batches, a key emitted earlier is
never emitted again (keyed state, not watermark luck); (3) the final sink
equals the batch ``dedup_keep_first`` answer on the concatenated input —
stream/batch parity for the dedup operator family.
"""

import pandas as pd


def _write(spark, rows, path, mode="overwrite"):
    df = spark.createDataFrame(rows, "doc_id long, fp string")
    df.write.mode(mode).parquet(path)


def test_stream_dedup_exactly_once_across_batches(spark, tmp_path):
    from leiden_communities_openmp_spark.streaming.stateful_dedup import (
        stream_dedup_to_parquet,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # batch 1: fp "a" twice (ids 7, 3 — min wins), fp "b" once
    _write(spark, [(7, "a"), (3, "a"), (5, "b")], src)
    stream = spark.readStream.schema("doc_id long, fp string").parquet(src)
    q = stream_dedup_to_parquet(stream, out, ck, key_col="fp",
                                order_cols=["doc_id"])
    q.processAllAvailable()

    # batch 2: late duplicates of both keys + one new key
    _write(spark, [(1, "a"), (2, "b"), (9, "c")], src, mode="append")
    q.processAllAvailable()
    q.stop()

    got = {(r["fp"], r["doc_id"]) for r in spark.read.parquet(out).collect()}
    # "a" -> 3 (min of first batch, NOT the later 1), "b" -> 5, "c" -> 9
    assert got == {("a", 3), ("b", 5), ("c", 9)}


def test_stream_matches_batch_keep_first_semantics(spark, tmp_path):
    """Single-batch case: streaming answer == batch keep-first (min id per
    key) on the same rows."""
    from leiden_communities_openmp_spark.streaming.stateful_dedup import (
        stream_dedup_to_parquet,
    )

    rows = [(4, "x"), (2, "x"), (8, "y"), (6, "y"), (1, "z")]
    src, out, ck = (str(tmp_path / d) for d in ("src2", "out2", "ck2"))
    _write(spark, rows, src)
    stream = spark.readStream.schema("doc_id long, fp string").parquet(src)
    q = stream_dedup_to_parquet(stream, out, ck, key_col="fp",
                                order_cols=["doc_id"])
    q.processAllAvailable()
    q.stop()

    batch = (
        pd.DataFrame(rows, columns=["doc_id", "fp"])
        .sort_values("doc_id").groupby("fp", as_index=False).first()
    )
    want = {(r.fp, r.doc_id) for r in batch.itertuples()}
    got = {(r["fp"], r["doc_id"]) for r in spark.read.parquet(out).collect()}
    assert got == want
