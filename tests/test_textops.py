"""Text-analysis, dedup, similarity, and multimodal-plumbing operators."""

from pyspark.sql import functions as F

from leiden_communities_openmp_spark.functions import text as tx
from leiden_communities_openmp_spark.operators import dedup as dd


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),      # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat", "en"),      # near dup
        (3, "der schnelle braune fuchs ist und bleibt hier", "de"),
        (4, "", "en"),
        (5, "completely different text about spark and shuffles in the engine", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_token_count(spark):
    got = {r["doc_id"]: r["t"] for r in
           _docs(spark).select("doc_id", tx.token_count("text").alias("t")).collect()}
    assert got[0] == 9 and got[4] == 0


def test_lang_guess(spark):
    got = {r["doc_id"]: r["g"] for r in
           _docs(spark).select("doc_id", tx.lang_guess("text").alias("g")).collect()}
    assert got[0] == "en" and got[3] == "de" and got[4] == "other"


def test_fingerprint_normalization(spark):
    d = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, "other")], "doc_id long, text string")
    got = {r["doc_id"]: r["fp"] for r in
           d.select("doc_id", tx.fingerprint("text").alias("fp")).collect()}
    assert got[0] == got[1] != got[2]


def test_rolling_fingerprint_matches_python(spark):
    """Independent Python recomputation of the Rabin–Karp fold, covering
    normalization, the 256-char prefix cap, empty text, and non-ASCII."""
    import re

    def py_fp(text, base=31, mod=2**31 - 1, prefix=256):
        norm = re.sub(r"\s+", " ", text.strip().lower())[:prefix]
        acc = 0
        for c in (norm or "\0"):          # Spark split('','') == [''] → ascii 0
            acc = (acc * base + (ord(c) if c != "\0" else 0)) % mod
        return acc

    rows = [(0, "Hello  World"), (1, "hello world"), (2, ""),
            (3, "héj ünïcode"), (4, "x" * 1000), (5, "x" * 256)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["fp"] for r in
           d.select("doc_id", tx.rolling_fingerprint("text").alias("fp")).collect()}
    for i, t in rows:
        assert got[i] == py_fp(t), (i, t[:20], got[i], py_fp(t))
    assert got[0] == got[1]               # normalization collapses whitespace/case
    assert got[4] == got[5]               # prefix cap: fingerprint of the head


def test_word_ngrams(spark):
    d = spark.createDataFrame([(0, "a b c d"), (1, "a b")], "doc_id long, text string")
    got = {r["doc_id"]: r["g"] for r in
           d.select("doc_id", tx.word_ngrams("text", 3).alias("g")).collect()}
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []


def test_exact_duplicates(spark):
    groups = dd.exact_duplicates(_docs(spark)).collect()
    assert len(groups) == 1 and sorted(groups[0]["doc_ids"]) == [0, 1]


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = {(r["a"], r["b"]) for r in
             dd.ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert not any(3 in p or 5 in p for p in pairs)


def test_minhash_lsh_recall(spark):
    exact = {(r["a"], r["b"]) for r in
             dd.ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    lsh = {(r["a"], r["b"]) for r in
           dd.minhash_dedup_pairs(_docs(spark), threshold=0.5).collect()}
    assert lsh == exact  # high-similarity pairs: LSH must not miss at this scale


def test_simhash_buckets_exact_dups(spark):
    got = dd.simhash_duplicates(_docs(spark)).collect()
    assert any(sorted(r["doc_ids"])[:2] == [0, 1] for r in got)


def test_simhash_near_pairs_exact_retrieval(spark):
    """Band-rotated Hamming-<=k retrieval is EXACT (pigeonhole): the pair
    set must equal brute-force Hamming over all simhash pairs."""
    from itertools import combinations
    docs = _docs(spark)
    codes = {r["doc_id"]: r["simhash"] for r in dd.simhash(docs, 62).collect()}
    for k in (2, 8):
        brute = {(a, b) for a, b in combinations(sorted(codes), 2)
                 if bin(codes[a] ^ codes[b]).count("1") <= k}
        got = {(r["a"], r["b"]) for r in
               dd.simhash_near_pairs(docs, max_hamming=k).collect()}
        assert got == brute
        for r in dd.simhash_near_pairs(docs, max_hamming=k).collect():
            assert r["hamming"] == bin(codes[r["a"]] ^ codes[r["b"]]).count("1")


def test_ngram_jaccard_hot_shingle_cap(spark):
    """One boilerplate shingle shared by every doc must not quadratically
    explode the candidate join: with max_df below the corpus size the hot
    shingle is dropped from candidate generation, while near-dup pairs that
    also share a discriminative shingle keep their EXACT jaccard score."""
    boiler = "copyright footer text"
    rows = [(i, f"unique words number {i} {i} {i} " + boiler) for i in range(40)]
    rows += [(100, "alpha beta gamma delta epsilon " + boiler),
             (101, "alpha beta gamma delta zeta " + boiler)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in
             dd.ngram_jaccard_pairs(d, threshold=0.3, n=3, max_df=10).collect()}
    assert (100, 101) in pairs
    # exact jaccard over FULL shingle sets (hot shingles included in the
    # score, only excluded from candidate generation)
    import re
    def grams(t):
        toks = re.sub(r"\s+", " ", t.strip().lower()).split(" ")
        return {" ".join(toks[i:i+3]) for i in range(len(toks) - 2)}
    ga, gb = grams(rows[-2][1]), grams(rows[-1][1])
    expect = len(ga & gb) / len(ga | gb)
    assert abs(pairs[(100, 101)] - round(expect, 9)) < 1e-9
    # pairs whose ONLY shared shingles are hot are not candidates
    assert not any(a < 40 and b < 40 for a, b in pairs)


def test_cosine_topk_and_lsh(spark):
    import random
    rng = random.Random(42)
    rows = []
    for i in range(40):
        base = [rng.gauss(0, 1) for _ in range(8)]
        rows.append((i, [float(x + (i % 4)) for x in base], i % 4))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = emb.filter(F.col("vec_id") < 3)
    bf = dd.cosine_topk(emb, q, k=3).collect()
    assert len(bf) == 9
    for r in bf:
        assert -1.0 <= r["cosine"] <= 1.0 + 1e-9
    # ranks are 1..3 per query, deterministic
    ranks = {}
    for r in bf:
        ranks.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in ranks.values())
    lsh = dd.lsh_cosine_topk(emb, q, k=3, planes=2).collect()
    assert len(lsh) > 0  # approximate: non-empty, valid schema
    assert set(lsh[0].asDict()) == {"query_id", "neighbor_id", "cosine", "rank"}


def test_multimodal_plumbing(spark):
    from leiden_communities_openmp_spark.operators.multimodal import (
        gen_media_df, image_features, sample_frames,
    )
    media = gen_media_df(spark, 30)
    feats = image_features(media).collect()
    assert len(feats) == 10  # one per image row
    assert all(len(r["feature"]) == 16 for r in feats)
    frames = sample_frames(media).collect()
    assert len(frames) > 0
    assert all(r["frame_idx"] >= 0 for r in frames)


def test_png_codec_roundtrip():
    """Vendored PNG codec: encode→decode is identity for greyscale, and the
    decoder inverts every scanline filter type (reference filterer built
    independently from the spec in this test)."""
    import struct
    import zlib

    import numpy as np

    from leiden_communities_openmp_spark.functions import png

    rng = np.random.RandomState(3)
    for shape in [(1, 1), (5, 7), (16, 16), (33, 9)]:
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        assert np.array_equal(png.decode_png(png.encode_png_gray(img)), img)

    # hand-filtered stream exercising filters 0..4 on successive rows
    img = rng.randint(0, 256, size=(5, 6)).astype(np.uint8)
    raw = bytearray()
    prev = np.zeros(6, dtype=np.int32)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = img[y].astype(np.int32)
        if ftype == 0:
            filt = cur.copy()
        elif ftype == 1:
            filt = cur.copy()
            filt[1:] = (cur[1:] - cur[:-1]) % 256
        elif ftype == 2:
            filt = (cur - prev) % 256
        elif ftype == 3:
            filt = cur.copy()
            for x in range(6):
                left = cur[x - 1] if x else 0
                filt[x] = (cur[x] - ((left + prev[x]) >> 1)) % 256
        else:
            filt = cur.copy()
            for x in range(6):
                a = int(cur[x - 1]) if x else 0
                c = int(prev[x - 1]) if x else 0
                filt[x] = (cur[x] - png._paeth(a, int(prev[x]), c)) % 256
        raw.append(ftype)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))
    assert np.array_equal(png.decode_png(data), img)

    # RGB luma: pure-red/green/blue pixels hit the 299/587/114 weights
    rgb = np.zeros((1, 3, 3), dtype=np.uint8)
    rgb[0, 0, 0] = 255
    rgb[0, 1, 1] = 255
    rgb[0, 2, 2] = 255
    assert png.to_grayscale(rgb).tolist() == [[76, 149, 29]]


def test_real_decode_differs_from_fake(spark):
    """A true PNG payload must go through the REAL decode (pixel mean), not
    the byte-grid fake — the two produce different mean_luma for the same
    payload bytes."""
    import numpy as np

    from leiden_communities_openmp_spark.functions.png import encode_png_gray
    from leiden_communities_openmp_spark.operators.multimodal import (
        MEDIA_SCHEMA, image_features,
    )

    img = np.full((16, 16), 200, dtype=np.uint8)
    payload = encode_png_gray(img)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), "image/png", 16, 16, 0)], MEDIA_SCHEMA)
    row = image_features(media).collect()[0]
    assert abs(row["mean_luma"] - 200.0) < 1e-9       # real decode: exact pixel mean
    fake = np.frombuffer(bytes(payload[:256]).ljust(256, b"\0"), dtype=np.uint8)
    assert abs(row["mean_luma"] - float(fake.mean())) > 1.0  # not the fake path


def test_resize_images_real_chain(spark):
    """resize_images decodes, nearest-neighbor-resamples, and re-encodes:
    output payloads are valid PNGs of the requested size with the exact
    resampled pixels."""
    import numpy as np

    from leiden_communities_openmp_spark.functions import png
    from leiden_communities_openmp_spark.operators.multimodal import (
        gen_png_media_df, resize_images,
    )

    media = gen_png_media_df(spark, 6)
    originals = {r["media_id"]: png.decode_png(bytes(r["payload"]))
                 for r in media.collect()}
    out = resize_images(media, 12, 10).collect()
    assert len(out) == 6
    for r in out:
        assert (r["width"], r["height"], r["mime"]) == (12, 10, "image/png")
        got = png.decode_png(bytes(r["payload"]))
        want = png.resize_nearest(originals[r["media_id"]], 12, 10)
        assert got.shape == (10, 12)
        assert np.array_equal(got, want)


def test_sample_frames_real_pngv_chain(spark):
    """sample_frames on a PNGV container extracts REAL decodable PNG
    frames at the right timestamps: sampling every 1000ms from a 6-frame
    500ms-interval video yields frames 0,2,4 with exact pixels."""
    import numpy as np

    from leiden_communities_openmp_spark.functions import png
    from leiden_communities_openmp_spark.operators.multimodal import (
        decode_pngv, gen_pngv_media_df, sample_frames,
    )

    media = gen_pngv_media_df(spark, n_videos=3, n_frames=6, interval_ms=500)
    originals = {r["media_id"]: decode_pngv(bytes(r["payload"]))[0]
                 for r in media.collect()}
    out = sample_frames(media, every_ms=1000).collect()
    assert len(out) == 3 * 3                     # 3000ms / 1000ms per video
    for r in out:
        want_src = originals[r["media_id"]][r["frame_idx"] * 2]
        assert bytes(r["frame"]) == want_src     # the actual container frame
        img = png.decode_png(bytes(r["frame"]))  # and it really decodes
        assert img.shape == (8, 8)
        v, k = r["media_id"], r["frame_idx"] * 2
        yy, xx = np.mgrid[0:8, 0:8]
        assert np.array_equal(img, ((yy * 3 + xx * 5 + v * 11 + k * 29) % 256
                                    ).astype(np.uint8))


def test_audio_features_real_wav_chain(spark):
    """audio_features on real WAV triangle tones (transcendental-free
    fixture — see gen_wav_media_df): duration exact, RMS within 0.5% of
    the triangle-wave closed form amp/sqrt(3), ZCR within 2% of 2f/rate —
    i.e. the REAL decode ran, not the byte fake. A non-WAV payload takes
    the fake path and reports the nominal fake rate."""
    import numpy as np

    from leiden_communities_openmp_spark.functions.wav import decode_wav, encode_wav_pcm16
    from leiden_communities_openmp_spark.operators.multimodal import (
        MEDIA_SCHEMA, audio_features, gen_wav_media_df,
    )

    rate = 8000
    media = gen_wav_media_df(spark, n=6, rate=rate)
    out = {r["media_id"]: r for r in audio_features(media).collect()}
    assert len(out) == 6
    for i in range(6):
        freq, amp = 200.0 * (i + 1), 0.1 + 0.1 * (i % 8)
        dur = 0.5 + 0.25 * (i % 3)
        r = out[i]
        assert r["sample_rate"] == rate
        assert abs(r["duration_s"] - dur) < 1.0 / rate
        # exact discrete expectation: recompute the triangle samples with
        # the fixture formula (the DISCRETE RMS differs from the continuous
        # amp/sqrt(3) by up to ~6% at 8 samples/period); only 16-bit
        # quantization noise should remain
        k = np.arange(int(rate * dur), dtype=np.float64)
        ph = k * freq / rate
        tri = amp * (4.0 * np.abs((ph - np.floor(ph)) - 0.5) - 1.0)
        assert abs(r["rms"] - float(np.sqrt(np.mean(tri * tri)))) < 1e-4
        assert abs(r["zero_crossing_rate"] - 2 * freq / rate) < 0.02

    # round-trip sanity of the codec itself (stereo averaging incl.)
    s, r_ = decode_wav(encode_wav_pcm16(np.array([0.0, 0.5, -0.5]), 44100))
    assert r_ == 44100 and np.allclose(s, [0.0, 0.5, -0.5], atol=1e-4)

    fake = spark.createDataFrame(
        [(99, "audio", bytearray(b"\x01\x02\x03\x04" * 64), "audio/opus", 0, 0, 0)],
        MEDIA_SCHEMA)
    fr = audio_features(fake).collect()[0]
    assert fr["sample_rate"] == 8000 and fr["duration_s"] > 0


def test_batch_updates(spark):
    from leiden_communities_openmp_spark.streaming.batch_updates import (
        apply_batch, tidy_batch,
    )
    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)], "src long, dst long, w double")
    dels = spark.createDataFrame([(1, 2, 1.0), (9, 9, 1.0)], "src long, dst long, w double")
    ins = spark.createDataFrame([(2, 3, 1.0), (4, 5, 1.0)], "src long, dst long, w double")
    td, ti = tidy_batch(e, dels, ins)
    assert {(r["src"], r["dst"]) for r in td.collect()} == {(1, 2)}   # must exist
    assert {(r["src"], r["dst"]) for r in ti.collect()} == {(4, 5)}   # must not exist
    after = {(r["src"], r["dst"]) for r in apply_batch(e, td, ti).collect()}
    assert after == {(2, 3), (3, 4), (4, 5)}


def test_ivf_cosine_recall(spark):
    """IVF ANN recall vs brute force on a clustered synthetic corpus: every
    query's true top-1 must be found (same-cluster vectors land in the same
    coarse cell), and scores on found pairs are exact."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(64):
        center = i % 4
        base = [1.0 if d == center else 0.0 for d in range(8)]
        vec = [b + rng.uniform(-0.05, 0.05) for b in base]
        rows.append((i, vec))
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = d.filter(F.col("vec_id") < 4)
    brute = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in dd.cosine_topk(d, q, k=1).collect()}
    ivf = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in dd.ivf_cosine_topk(d, q, k=1, nlist=4, nprobe=2).collect()}
    assert ivf == brute


def test_ivf_cosine_recall_nlist64(spark):
    """Production-shape parameters: nlist=64 coarse cells over a 1024-vector
    clustered corpus (plan size must stay O(1) in nlist — centroids ride a
    broadcast DataFrame, not literal expressions). Recall@1 ≥ 0.9 with
    nprobe=8, and every returned cosine is exact (same dot expression)."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(1024):
        center = i % 32
        base = [1.0 if d == (center % 16) else (0.5 if d == (center // 16) else 0.0)
                for d in range(16)]
        vec = [b + rng.uniform(-0.05, 0.05) for b in base]
        rows.append((i, vec))
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = d.filter(F.col("vec_id") < 16)
    brute = {r["query_id"]: r["neighbor_id"]
             for r in dd.cosine_topk(d, q, k=1).collect()}
    ivf = {r["query_id"]: r["neighbor_id"]
           for r in dd.ivf_cosine_topk(d, q, k=1, nlist=64, nprobe=8).collect()}
    hits = sum(1 for qid, nid in brute.items() if ivf.get(qid) == nid)
    assert hits >= 0.9 * len(brute), f"recall@1 {hits}/{len(brute)}"


def test_lsh_cosine_recall_planes8(spark):
    """Production-shape hyperplane count: planes=8 (256 buckets) over a
    512-vector clustered corpus. Multi-probe (own bucket + every Hamming-1
    flip) must hold recall@1 >= 0.9 vs brute force, and scores on found
    pairs are exact (same dot expression)."""
    import random

    rng = random.Random(13)
    rows = []
    for i in range(512):
        center = i % 16
        base = [2.0 if d == center else 0.0 for d in range(16)]
        vec = [b + rng.uniform(-0.1, 0.1) for b in base]
        rows.append((i, vec))
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = d.filter(F.col("vec_id") < 16)
    brute = {r["query_id"]: r["neighbor_id"]
             for r in dd.cosine_topk(d, q, k=1).collect()}
    lsh = {r["query_id"]: r["neighbor_id"]
           for r in dd.lsh_cosine_topk(d, q, k=1, planes=8).collect()}
    hits = sum(1 for qid, nid in brute.items() if lsh.get(qid) == nid)
    assert hits >= 0.9 * len(brute), f"recall@1 {hits}/{len(brute)}"


def test_near_dup_clusters_transitive(spark):
    """A~B and B~C at threshold (0.778 each) but A!~C directly (0.6) → one cluster (the whole
    point of clustering over pairwise filtering); singletons self-cluster
    and every cluster has exactly one representative (its min doc_id)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (10, base),                                       # A
        (11, base.replace("kappa", "lambda")),            # B ~ A
        (12, base.replace("kappa", "lambda")
                 .replace("alpha", "omega")),             # C ~ B, farther from A
        (13, "utterly unrelated words about spark plans and shuffles here"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["cluster_id"], r["is_rep"])
           for r in dd.near_dup_clusters(d, threshold=0.7, n=3).collect()}
    assert got[10] == (10, 1)
    assert got[11] == (10, 0)
    assert got[12] == (10, 0)          # transitive member via B
    assert got[13] == (13, 1)          # singleton
    # direct A~C jaccard is below the threshold — transitivity did the work
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in dd.ngram_jaccard_pairs(d, threshold=0.0, n=3).collect()}
    assert pairs[(10, 12)] < 0.7 <= min(pairs[(10, 11)], pairs[(11, 12)])


def test_png_decode_ignores_pil_presence(monkeypatch):
    """VERDICT r4 #8: a PIL-equipped cluster must produce the same mean_luma
    the vendored codec does, or the captured image oracle hash flips with the
    environment. The gate's contract (multimodal._decode_image): PNG payloads
    take the vendored codec FIRST, regardless of PIL; only non-PNG payloads
    may reach PIL. Simulated here with a fake PIL whose decode result is
    deliberately different — PNG output must not change, and the non-PNG
    payload must route through the fake (proving the gate order, not a
    short-circuit)."""
    import numpy as np

    from leiden_communities_openmp_spark.functions import png
    from leiden_communities_openmp_spark.operators import multimodal

    img = ((np.arange(64, dtype=np.uint8).reshape(8, 8) * 37) % 256).astype(np.uint8)
    payload = png.encode_png_gray(img)
    vendored = multimodal._decode_image(payload)          # PIL absent (container truth)
    assert np.array_equal(vendored, img)

    class _FakeIm:
        def __enter__(self):
            return self
        def __exit__(self, *a):
            return False
        def convert(self, mode):
            return np.full((4, 4), 255, dtype=np.uint8)   # poisoned decode

    class _FakePIL:
        @staticmethod
        def open(fp):
            return _FakeIm()

    monkeypatch.setattr(multimodal, "_PILImage", _FakePIL)
    with_pil = multimodal._decode_image(payload)
    assert np.array_equal(with_pil, vendored)             # PNG never reaches PIL

    routed = multimodal._decode_image(b"JFIF-not-a-png")  # non-PNG DOES reach PIL
    assert routed.shape == (4, 4) and (routed == 255).all()
