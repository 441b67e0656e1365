"""leiden_communities_openmp_spark — a from-scratch PySpark-native link-graph
analytics engine with the query/data-processing capabilities of the reference
GVE-Leiden (puzzlef/leiden-communities-openmp, read-only at /root/reference).

Layout
------
- ``sources``   : MTX reader, Common-Crawl-style pages ingestion, edge-table
                  normalization, deterministic fixtures (SURVEY.md §2.1, §7 P0-P1).
- ``operators`` : graph transforms, aggregations, the Leiden/Louvain engines
                  (exact-match kernel + distributed scale mode), companion
                  operators (PageRank / CC / LPA / triangles), dedup &
                  similarity & text-analysis ops (SURVEY.md §2.2-2.6).
- ``functions`` : column-expression helpers (delta-modularity, hashing, text).
- ``plans``     : checkpoint/resume manager (per-super-step parquet + metrics).
- ``streaming`` : batch-update application (tidy/apply, SURVEY.md §2.2 T7-T9).
"""

__version__ = "0.1.0"
