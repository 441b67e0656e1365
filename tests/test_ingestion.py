"""Ingestion slice (north rule): byte-identical text extraction per url,
outlink extraction, deterministic url→id mapping, edge-table invariants."""

from pyspark.sql import functions as F

from leiden_communities_openmp_spark.sources.fixtures import pages_spark_df
from leiden_communities_openmp_spark.sources.pages import (
    build_edge_table, extract, ingest, url_ids,
)

N_PAGES = 200


def test_text_extraction_byte_identical(spark):
    """input_hint invariant: extracted text == expected text, byte for byte,
    for every url."""
    pages = pages_spark_df(spark, N_PAGES, with_expected=True)
    got = extract(pages).select("url", "text", "expected_text").collect()
    assert len(got) == N_PAGES
    for r in got:
        assert r["text"] == r["expected_text"], f"extraction mismatch for {r['url']}"


def test_outlink_extraction_exact(spark):
    pages = pages_spark_df(spark, N_PAGES, with_expected=True)
    got = extract(pages).select("outlinks", "expected_outlinks").collect()
    for r in got:
        assert list(r["outlinks"]) == list(r["expected_outlinks"])


def test_url_ids_dense_and_deterministic(spark):
    pages = pages_spark_df(spark, N_PAGES)
    ids1 = {r["url"]: r["id"] for r in url_ids(pages).collect()}
    ids2 = {r["url"]: r["id"] for r in url_ids(pages.repartition(7)).collect()}
    assert ids1 == ids2  # partitioning-independent
    assert sorted(ids1.values()) == list(range(N_PAGES))  # dense 0-based
    assert [u for u, _ in sorted(ids1.items(), key=lambda kv: kv[1])] == sorted(ids1)


def test_edge_table_invariants(spark):
    pages = pages_spark_df(spark, N_PAGES)
    edges, ids = build_edge_table(pages)
    n = edges.count()
    assert n > 0
    assert edges.dropDuplicates(["src", "dst"]).count() == n  # S5 dedup
    mx = edges.agg(F.max("src"), F.max("dst")).collect()[0]
    assert max(mx) < N_PAGES
    sym, _ = ingest(pages)
    pairs = {(r["src"], r["dst"]) for r in sym.collect()}
    assert all((b, a) in pairs for (a, b) in pairs)  # symmetric closure


def test_end_to_end_pages_leiden(spark):
    """pages → edges → Leiden: communities roughly recover the planted
    blocks (>= half the blocks distinguishable, modularity positive)."""
    from leiden_communities_openmp_spark.operators.kernel import LeidenOptions
    from leiden_communities_openmp_spark.operators.leiden import leiden_scale

    pages = pages_spark_df(spark, N_PAGES)
    edges, _ = ingest(pages)
    res = leiden_scale(spark, edges, LeidenOptions())
    assert res.modularity > 0.3
    ncomm = res.membership.select("community").distinct().count()
    assert 4 <= ncomm <= 40
