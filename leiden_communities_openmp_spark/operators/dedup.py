"""Deduplication & similarity operators over document/embedding tables
(training-data pipeline ops).

Scale designs:
- exact dedup: hash-groupBy on a normalized fingerprint (1 shuffle).
- n-gram Jaccard: explode shingles → inverted index → pair generation
  restricted to shared shingles → exact Jaccard on candidate pairs only.
- MinHash-LSH: per-doc signature via deterministic xxhash64 permutations
  (all JVM-side), banded into buckets, bucket-join for candidates — the
  sub-quadratic path at 100 TB.
- SimHash: sign-aggregated token hashes → 64-bit code; near-dups share
  codes within small Hamming distance (bucketed by code here).
- embedding cosine: brute-force top-k via zip_with dot products (baseline)
  and an LSH-bucketed variant (random-hyperplane signs) as the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import fingerprint, word_ngrams


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-equal (after whitespace/case normalization) documents
    → (fp, n, doc_ids sorted). Only groups with n >= 2."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n"), F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .filter(F.col("n") >= 2)
    )


def dedup_keep_first(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per normalized-text group, keeping the smallest id
    (deterministic survivor selection)."""
    w = Window.partitionBy("fp").orderBy(F.col(id_col))
    return (
        docs.withColumn("fp", fingerprint(text_col))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("fp", "rn")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, candidate-pruned)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.8, n: int = 3,
                        max_df: int | None = None,
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact word-n-gram Jaccard similarity for all pairs sharing >= 1
    *discriminative* shingle → (a, b, jaccard) with a < b and
    jaccard >= threshold.

    ``max_df=None`` (default) preserves exact semantics: every pair sharing
    any shingle is a candidate. Scale-sensitive callers OPT IN to the
    hot-shingle cap (e.g. ``max_df=1000``) — required at web scale, where
    one boilerplate shingle shared by 10⁶ docs makes 10¹² candidate rows.

    Plan: shingle-set per doc → explode → inverted index → pair generation
    within posting lists → |A∩B| by count, |A∪B| = |A|+|B|−|A∩B|.
    ``max_df`` caps posting-list length: shingles with document frequency
    > max_df (boilerplate shared by ~everyone) are dropped from the
    CANDIDATE join only — without the cap one stop-shingle shared by 10⁶
    docs makes 10¹² join rows before the groupBy. |A∩B| then undercounts
    pairs whose ONLY shared shingles are hot, so the final Jaccard is
    recomputed exactly on the surviving candidates from the full shingle
    sets (array_intersect on the pair — each side's set already in the
    row). Threshold semantics are preserved whenever near-dup pairs share
    at least one sub-hot shingle — guaranteed for threshold-Jaccard pairs
    unless every shared shingle has df > max_df (standard accepted miss
    mode for inverted-index dedup; raise max_df to trade skew for recall).
    """
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(word_ngrams(text_col, n)).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles")).filter(F.col("n_sh") > 0)
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    if max_df is not None:
        hot = (
            ex.groupBy("shingle").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df).select("shingle")
        )
        ex = ex.join(hot, "shingle", "left_anti")
    cand = (
        ex.select(F.col("doc_id").alias("a"), "shingle")
        .join(ex.select(F.col("doc_id").alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b").distinct()
    )
    sa = sh.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sa"),
                   F.col("n_sh").alias("na"))
    sb = sh.select(F.col("doc_id").alias("b"), F.col("shingles").alias("sb"),
                   F.col("n_sh").alias("nb"))
    return (
        cand.join(sa, "a").join(sb, "b")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 9).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(docs: DataFrame, num_hashes: int = 16, n: int = 3,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sig array<long>): sig[h] = min over shingles of
    xxhash64(shingle, seed=h). All JVM-side (no Python)."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(word_ngrams(text_col, n)).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    sig = F.array(*[
        F.array_min(F.transform("shingles", lambda s, h=h: F.xxhash64(s, F.lit(h))))
        for h in range(num_hashes)
    ]).alias("sig")
    return sh.select("doc_id", sig)


def minhash_lsh_candidates(docs: DataFrame, num_hashes: int = 16, bands: int = 4,
                           n: int = 3, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Banded LSH candidate pairs → (a, b) distinct, a < b. rows-per-band =
    num_hashes / bands; docs sharing any full band land in one bucket."""
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, n, id_col, text_col)
    banded = sigs.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band"),
                     F.xxhash64(F.concat_ws(",", *[
                         F.element_at("sig", bi * rows + r + 1).cast("string")
                         for r in range(rows)
                     ])).alias("bucket"))
            for bi in range(bands)
        ])).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    l = banded.select(F.col("doc_id").alias("a"), "band", "bucket")
    r = banded.select(F.col("doc_id").alias("b"), "band", "bucket")
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b").distinct()
    )


def minhash_dedup_pairs(docs: DataFrame, threshold: float = 0.8, num_hashes: int = 16,
                        bands: int = 4, n: int = 3, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """LSH candidates verified by exact Jaccard → (a, b, jaccard)."""
    cand = minhash_lsh_candidates(docs, num_hashes, bands, n, id_col, text_col)
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(word_ngrams(text_col, n)).alias("shingles"),
    )
    a = sh.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("shingles").alias("sb"))
    scored = (
        cand.join(a, "a").join(b, "b")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn("uni", F.size(F.array_union("sa", "sb")))
        .withColumn("jaccard", F.col("inter") / F.col("uni"))
        .filter(F.col("jaccard") >= threshold)
    )
    return scored.select("a", "b", F.round("jaccard", 9).alias("jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(docs: DataFrame, bits: int = 64, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(doc_id, simhash long): sign-aggregate of token xxhash64 bits.
    bit b of the code = 1 iff Σ_tokens sign(bit b of hash(token)) > 0."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    hashed = toks.withColumn("h", F.xxhash64("tok"))
    bit_sums = hashed.groupBy("doc_id").agg(*[
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{b}")
        for b in range(bits)
    ])
    code = sum(
        (F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")) * F.lit(2 ** b).cast("long"))
        for b in range(min(bits, 62))
    )
    return bit_sums.select("doc_id", code.alias("simhash"))


def simhash_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Documents sharing an identical simhash code (Hamming distance 0
    bucketing; simhash_near_pairs extends to distance > 0 via band
    rotation)."""
    s = simhash(docs, 62, id_col, text_col)
    return (
        s.groupBy("simhash")
        .agg(F.count("*").alias("n"), F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .filter(F.col("n") >= 2)
    )


_SIMHASH_BITS = 62


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact Hamming-≤k simhash retrieval via band decomposition →
    (a, b, hamming) with a < b.

    Pigeonhole: split the 62-bit code into ``max_hamming + 1`` bands; two
    codes within Hamming distance k agree EXACTLY on at least one band, so
    bucketing by (band_index, band_value) and joining within buckets finds
    every qualifying pair (no recall loss), then ``bit_count(xor)`` verifies
    the true distance — all JVM-side integer arithmetic, no Python.

    Scale: the band join is |docs| × (k+1) rows keyed by ~62/(k+1)-bit
    buckets; degenerate buckets (billions of near-identical boilerplate
    docs) concentrate — AQE skew-join splits them, and the distinct() on
    pairs bounds re-verification.
    """
    bands = max_hamming + 1
    width = _SIMHASH_BITS // bands + (1 if _SIMHASH_BITS % bands else 0)
    s = simhash(docs, _SIMHASH_BITS, id_col, text_col)
    banded = s.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), bi * width)
                .bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
            )
            for bi in range(bands)
        ])).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.key")
    l = banded.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "band", "key")
    r = banded.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "band", "key")
    return (
        l.join(r, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b",
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding similarity
# ---------------------------------------------------------------------------

def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: (query_id, neighbor_id, cosine, rank) for
    each query against the full corpus. zip_with/aggregate keeps the math
    JVM-side; the cross join is the scale ceiling — see lsh_cosine_topk."""
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.sqrt(_dot(F.col(vec_col).cast("array<double>"), F.col(vec_col).cast("array<double>"))).alias("nv"),
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q"),
        F.sqrt(_dot(F.col(vec_col).cast("array<double>"), F.col(vec_col).cast("array<double>"))).alias("nq"),
    )
    scored = (
        qs.crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot(F.col("q"), F.col("v")) / (F.col("nq") * F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 9).alias("cosine"), "rank")
    )


def ivf_cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                    nlist: int = 8, nprobe: int = 3, lloyd_iters: int = 3,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF (inverted-file) cosine ANN: coarse-quantize the corpus into
    ``nlist`` cells with a few deterministic Lloyd iterations, then search
    only each query's ``nprobe`` nearest cells → (query_id, neighbor_id,
    cosine, rank).

    Scale design: centroids are a tiny broadcast DataFrame (nlist × dim);
    assignment is one broadcast-join + max_by argmax over the corpus (no
    shuffle of the vectors, plan size O(1) in nlist — supports the 10³-10⁴
    cells a 100 TB corpus needs); the query fan-out is |queries| × nprobe
    joined against cell-partitioned lists — the standard sub-linear ANN
    layout (FAISS-style IVF-Flat) expressed as DataFrame ops. Lloyd means
    collect only nlist × dim floats per iteration. Deterministic: centroids
    initialize from the ``nlist`` smallest vec_ids; score ties keep the
    smaller cell id (probe order: larger cell first, matching array_sort
    descending on (score, cell)).
    """
    spark = embeddings.sparkSession
    v = embeddings.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("vec"))
    norm = F.sqrt(_dot(F.col("vec"), F.col("vec")))
    v = v.withColumn("unit", F.transform("vec", lambda x: x / norm)).drop("vec")

    # deterministic seed centroids: the nlist smallest ids (unit-normalized)
    cent = [list(r["unit"]) for r in v.orderBy("nid").limit(nlist).collect()]

    def cent_df(cents):
        return spark.createDataFrame(
            [(ci, cv) for ci, cv in enumerate(cents)], "cell int, cvec array<double>")

    def assign(cents_df):
        # broadcast-join argmax: score every (vector, centroid) pair map-side,
        # then one partial-aggregating max_by per vector. Ties (equal score)
        # keep the SMALLER cell id via max of (score, -cell).
        scored = v.join(F.broadcast(cents_df), how="cross").select(
            "nid", "unit",
            F.struct(_dot(F.col("unit"), F.col("cvec")).alias("s"),
                     (-F.col("cell")).alias("negcell")).alias("sc"))
        return (scored.groupBy("nid")
                .agg(F.first("unit").alias("unit"), F.max("sc").alias("best"))
                .select("nid", "unit", (-F.col("best.negcell")).cast("int").alias("cell")))

    dim = len(cent[0])
    for _ in range(lloyd_iters):
        means = (
            assign(cent_df(cent)).groupBy("cell")
            .agg(*[F.avg(F.element_at("unit", i + 1)).alias(f"m{i}") for i in range(dim)])
            .collect()
        )
        by_cell = {int(r["cell"]): [float(r[f"m{i}"]) for i in range(dim)] for r in means}
        new_cent = []
        for ci, old in enumerate(cent):
            m = by_cell.get(ci, old)
            n = sum(x * x for x in m) ** 0.5 or 1.0
            new_cent.append([x / n for x in m])
        cent = new_cent
    assigned = assign(cent_df(cent))

    # each query probes its nprobe nearest cells: broadcast-join queries ×
    # centroids, rank per query by (score desc, cell desc) — identical order
    # to a descending array_sort on (score, cell) structs
    qs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv"))
    qn = F.sqrt(_dot(F.col("qv"), F.col("qv")))
    qs = qs.withColumn("unit", F.transform("qv", lambda x: x / qn)).drop("qv")
    pw = Window.partitionBy("query_id").orderBy(
        F.desc(F.col("ps")), F.desc("cell"))
    qs = (
        qs.join(F.broadcast(cent_df(cent)), how="cross")
        .withColumn("ps", _dot(F.col("unit"), F.col("cvec")))
        .withColumn("prank", F.row_number().over(pw))
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "unit", "cell")
    )

    cand = (
        qs.join(assigned.select(F.col("nid").alias("neighbor_id"),
                                F.col("unit").alias("nunit"), "cell"), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot(F.col("unit"), F.col("nunit")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 9).alias("cosine"), "rank")
    )


def lsh_cosine_topk_banded(embeddings: DataFrame, queries: DataFrame,
                           k: int = 5, planes: int = 16, bands: int = 4,
                           seed: int = 42, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Banded random-hyperplane LSH ANN — the production-parameter shape.

    ``planes`` sign bits split into ``bands`` contiguous bands (planes/bands
    bits each); a corpus vector is a candidate for a query iff they agree on
    ALL bits of at least one band (the MinHash-LSH band trick applied to
    hyperplane signatures). Single-table LSH at 16+ planes shatters the
    space into 2^16 buckets and recall collapses; banding keeps the
    collision probability per band at cos-similarity^(planes/bands) while
    the candidate set stays sub-linear. Exact cosine re-rank on candidates.

    Scale plan: signature computation is whole-stage codegen (no Python);
    candidates come from ``bands`` equi-joins on (band, band_code) — each a
    hash join on a 2^(planes/bands)-bucket key, skew-handled by AQE; the
    re-rank touches candidates only."""
    import numpy as np

    rng = np.random.RandomState(seed)
    first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(first["d"])
    hyper = rng.randn(planes, dim)
    bits_per_band = planes // bands

    def band_codes(vc):
        codes = []
        for b in range(bands):
            code = None
            for p in range(b * bits_per_band, (b + 1) * bits_per_band):
                plane = F.array(*[F.lit(float(x)) for x in hyper[p]])
                bit = F.when(_dot(vc, plane) >= 0, F.lit(1).cast("long")) \
                    .otherwise(F.lit(0).cast("long"))
                code = bit if code is None else code * 2 + bit
            codes.append(code)
        return codes

    def with_bands(df, idc):
        codes = band_codes(F.col("v"))
        return df.select(
            idc, "v",
            F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"), codes[b].alias("code"))
                for b in range(bands)])).alias("bc"),
        ).select(idc, "v", F.col("bc.band").alias("band"), F.col("bc.code").alias("code"))

    corpus = with_bands(
        embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).cast("array<double>").alias("v")),
        "neighbor_id").withColumnRenamed("v", "nv")
    qs = with_bands(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("v")),
        "query_id").withColumnRenamed("v", "qv")

    cand = (
        qs.join(corpus, ["band", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine",
        _dot(F.col("qv"), F.col("nv"))
        / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("nv"), F.col("nv")))),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 9).alias("cosine"), "rank")
    )


def clustered_embeddings(spark, n: int = 100_000, dim: int = 32,
                         clusters: int = 256, noise_scale: float = 0.2) -> DataFrame:
    """Deterministic clustered embedding fixture at ANN-recall scale: pure
    integer arithmetic over spark.range (fully distributed generation, no
    driver data), ``clusters`` planted centers (spread ±1 per dim) + a
    prime-modulus hash noise of amplitude ±noise_scale/2 per dim — small
    noise makes neighbors strictly same-cluster (easy), large noise pushes
    true neighbors across quantizer-cell boundaries so recall@k curves
    against probe depth are informative rather than saturated. Noise comes
    from xxhash64 (true avalanche), NOT a linear congruence — an LCG mod m
    makes every id pair ≡ mod m share its entire noise vector, silently
    planting near-duplicate twins that saturate any recall measure."""
    c = (F.col("id") % clusters).cast("long")
    cols = []
    for d in range(dim):
        center = F.pmod(F.xxhash64(c, F.lit(-d - 1)), F.lit(2000)) / 1000.0 - 1.0
        noise = (F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(10000)) / 10000.0
                 - 0.5) * noise_scale
        cols.append((center + noise).cast("float"))
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*cols).cast("array<float>").alias("embedding"))


def lsh_cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                    planes: int = 4, seed: int = 42, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH ANN: bucket by sign pattern of ``planes``
    deterministic pseudo-random hyperplanes; each query probes its own
    bucket plus every Hamming-1 neighbor bucket (single-plane sign flips —
    multi-probe). Approximate — recall measured in tests against
    cosine_topk."""
    import numpy as np

    rng = np.random.RandomState(seed)
    first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(first["d"])
    hyper = rng.randn(planes, dim)

    def bucket_expr(vc):
        code = None
        for p in range(planes):
            plane = F.array(*[F.lit(float(x)) for x in hyper[p]])
            bit = F.when(_dot(vc, plane) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
            code = bit if code is None else code * 2 + bit
        return code

    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", bucket_expr(F.col("v")))
    # multi-probe: each query also searches every Hamming-1 neighbor bucket
    # (one hyperplane sign flipped) — the standard recall remedy for vectors
    # near a plane boundary, at (planes+1)× candidate cost instead of the
    # 2^planes cost of widening the bucket space
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q"),
    ).withColumn("bucket0", bucket_expr(F.col("q"))).select(
        "query_id", "q",
        F.explode(F.array(
            F.col("bucket0"),
            *[F.col("bucket0").bitwiseXOR(F.lit(1 << p)) for p in range(planes)],
        )).alias("bucket"),
    )

    cand = (
        qs.join(corpus, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine",
        _dot(F.col("q"), F.col("v"))
        / (F.sqrt(_dot(F.col("q"), F.col("q"))) * F.sqrt(_dot(F.col("v"), F.col("v")))),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 9).alias("cosine"), "rank")
    )

def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: every unordered pair
    (a < b) with cosine similarity >= ``threshold``. Brute-force referee —
    the self-join is the documented scale ceiling (same role cosine_topk
    plays for ANN); ``lsh_near_dup_pairs`` is the sub-quadratic path whose
    recall is measured against this. Columns (a, b, cosine)."""
    sides = []
    for name in ("a", "b"):
        vc = F.col(vec_col).cast("array<double>")
        sides.append(embeddings.select(
            F.col(id_col).alias(name),
            vc.alias(f"v_{name}"),
            F.sqrt(_dot(vc, vc)).alias(f"n_{name}")))
    return (
        sides[0].join(sides[1], F.col("a") < F.col("b"))
        .withColumn("cosine", _dot(F.col("v_a"), F.col("v_b"))
                    / (F.col("n_a") * F.col("n_b")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", F.round("cosine", 9).alias("cosine"))
    )


def lsh_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                       planes: int = 16, bands: int = 4, seed: int = 42,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup at scale: banded random-hyperplane LSH
    self-join for candidates (a pair is a candidate iff its sign signatures
    agree on ALL bits of >= 1 band), then EXACT cosine verification — only
    survivors >= ``threshold`` are returned, so precision is 1.0 by
    construction and recall is the only approximation (measured in
    tests/test_ann_scale.py against embedding_near_dup_pairs).

    Scale plan: signatures are whole-stage-codegen column expressions; the
    candidate join is ``bands`` equi-joins on (band, band_code) — hash joins
    on a 2^(planes/bands)-bucket key, AQE-handled skew; a < b halves the
    candidate space and kills self-pairs before the verify. At a near-dup
    threshold (cos >= 0.95 -> bit-agreement p ~ 0.9 per plane) a 4-bit band
    collides with p ~ 0.66, so 4 bands miss a true pair with p ~ 1.5%."""
    import numpy as np

    rng = np.random.RandomState(seed)
    first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(first["d"])
    hyper = rng.randn(planes, dim)
    bits_per_band = planes // bands

    vc = F.col(vec_col).cast("array<double>")
    base = embeddings.select(F.col(id_col).alias("id"), vc.alias("v"))
    codes = []
    for b in range(bands):
        code = None
        for p in range(b * bits_per_band, (b + 1) * bits_per_band):
            plane = F.array(*[F.lit(float(x)) for x in hyper[p]])
            bit = F.when(_dot(F.col("v"), plane) >= 0,
                         F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
            code = bit if code is None else code * 2 + bit
        codes.append(code)
    sig = base.select(
        "id", "v",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), codes[b].alias("code"))
            for b in range(bands)])).alias("bc"),
    ).select("id", "v", F.col("bc.band").alias("band"),
             F.col("bc.code").alias("code"))

    left = sig.select(F.col("id").alias("a"), F.col("v").alias("v_a"),
                      "band", "code")
    right = sig.select(F.col("id").alias("b"), F.col("v").alias("v_b"),
                       "band", "code")
    cand = (
        left.join(right, ["band", "code"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    return (
        cand.withColumn(
            "cosine",
            _dot(F.col("v_a"), F.col("v_b"))
            / (F.sqrt(_dot(F.col("v_a"), F.col("v_a")))
               * F.sqrt(_dot(F.col("v_b"), F.col("v_b")))))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", F.round("cosine", 9).alias("cosine"))
    )


def near_dup_clusters(docs: DataFrame, threshold: float = 0.8, n: int = 3,
                      max_df: int | None = None,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Transitive near-duplicate CLUSTERS → (doc_id, cluster_id, is_rep).

    The standard web-corpus dedup composite (keep one representative per
    near-dup group): threshold-Jaccard pairs (``ngram_jaccard_pairs``) form
    an undirected graph whose connected components are the dedup clusters —
    transitivity matters because A~B and B~C often hold at threshold while
    A~C falls just below it. cluster_id = smallest doc_id in the component
    (singletons cluster with themselves); is_rep = 1 on the kept doc.

    Scale: pair generation is the inverted-index path (opt-in ``max_df``
    hot-shingle cap kills the boilerplate blowup); the component step is the
    O(log n)-round large-star/small-star operator over pair edges — pair
    count is near-linear in docs at dedup thresholds, and AQE handles the
    giant-cluster star-root skew. No driver-side state in either stage.
    """
    from .companions import connected_components

    pairs = ngram_jaccard_pairs(docs, threshold, n, max_df,
                                id_col=id_col, text_col=text_col)
    comp = connected_components(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    out = (
        docs.select(F.col(id_col).cast("long").alias("doc_id")).distinct()
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select("doc_id",
                F.coalesce("component", "doc_id").cast("long").alias("cluster_id"))
    )
    return out.withColumn(
        "is_rep", (F.col("doc_id") == F.col("cluster_id")).cast("int"))
