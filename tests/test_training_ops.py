"""Dedup / similarity / text / multimodal operator tests."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat today"),  # near dup of 1
        (4, "completely different text about spark dataframes and shuffles here"),
        (5, "short"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    from import_spark.operators.dedup import exact_dedup

    out = {r.doc_id: r.n_copies for r in exact_dedup(docs).collect()}
    assert out[1] == 2  # doc 2 folded into doc 1 (min id wins)
    assert 2 not in out and out[3] == 1


def test_minhash_near_dup(docs):
    from import_spark.operators.dedup import minhash_dedup

    comp = {(r.doc_id, r.canon_id) for r in minhash_dedup(docs, k=3).collect()}
    # docs 1/2/3 cluster together under canon 1; 4 and 5 don't
    assert (2, 1) in comp and (3, 1) in comp
    assert not any(d in (4, 5) for d, _ in comp)


def test_simhash_similarity(docs):
    from import_spark.operators.dedup import simhash

    sigs = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert sigs[1] == sigs[2]  # identical text → identical simhash

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    # near-dup is closer than unrelated text
    assert hamming(sigs[1], sigs[3]) < hamming(sigs[1], sigs[4])


def test_ngram_jaccard(docs, spark):
    from import_spark.operators.dedup import ngram_jaccard_pairs

    pairs = spark.createDataFrame([(1, 3), (1, 4)], ["id_a", "id_b"])
    rows = {(r.id_a, r.id_b): r for r in ngram_jaccard_pairs(docs, pairs).collect()}
    out = {k: r.jaccard for k, r in rows.items()}
    assert out[(1, 3)] > 0.5  # one word changed
    assert (1, 4) not in out or out[(1, 4)] < 0.1
    r13 = rows[(1, 3)]
    assert r13.n_union >= r13.n_common > 0
    assert abs(r13.jaccard - round(r13.n_common / r13.n_union, 6)) < 1e-9


def test_dedup_jaccard_query_blocking(spark):
    """The gated query's blocker: df-capped shingles bound the pair
    fanout — a shingle shared by > cap docs contributes no pairs."""
    from import_spark.queries import q_dedup_jaccard

    out = q_dedup_jaccard(spark, "/root/testdata/sf0.001")
    pdf = out.toPandas()
    assert set(pdf.columns) == {"id_a", "id_b", "n_common", "n_union"}
    assert (pdf.n_common >= 1).all() and (pdf.n_union >= pdf.n_common).all()
    assert (pdf.id_a < pdf.id_b).all()


def test_cosine_topk_bruteforce(spark):
    from import_spark.operators.similarity import cosine_topk_bruteforce

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    q = spark.createDataFrame([(100, [1.0, 0.0])], ["query_id", "embedding"])
    out = cosine_topk_bruteforce(corpus, q, k=2)
    rows = [(r.vec_id, r.rank) for r in out.orderBy("rank").collect()]
    assert rows == [(1, 1), (2, 2)]  # self first, near second


def test_lsh_ann_recall(spark):
    import numpy as np

    from import_spark.operators.similarity import lsh_ann_topk

    rng = np.random.RandomState(0)
    base = rng.standard_normal((20, 16)).astype("float32")
    corpus = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(20)], ["vec_id", "embedding"]
    )
    q = spark.createDataFrame([(0, base[3].tolist())], ["query_id", "embedding"])
    out = lsh_ann_topk(corpus, q, dim=16, k=3, n_planes=6)
    top = out.orderBy("rank").first()
    assert top.vec_id == 3  # identical vector lands in the same bucket → rank 1


def test_text_ops(docs):
    from import_spark.operators.textops import fingerprint, language_id, quality_score, token_stats

    ts = {r.doc_id: (r.ws_tokens, r.word_tokens) for r in token_stats(docs).collect()}
    assert ts[1] == (10, 10) and ts[5] == (1, 1)
    q = {r.doc_id: r.quality_bp for r in quality_score(docs).collect()}
    assert q[1] > q[5]  # longer + stopwords beats "short"
    lang = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
    assert lang[1] == "en" and lang[5] == "und"
    fp = {r.doc_id: r.fp_md5 for r in fingerprint(docs).collect()}
    assert fp[1] == fp[2] and fp[1] != fp[4]


def test_repetition_stats(spark):
    """Gopher repetition signals on handcrafted docs: exact expected
    fractions for duplicate lines and the top-bigram mode (computed
    in-array as a sorted longest-equal-run — verify vs hand counts)."""
    from import_spark.operators.textops import repetition_stats

    rows = [
        # 4 non-empty lines, 2 distinct -> dup 0.5; toks: a b a b c d
        # c d -> 7 bigrams, top ("a b" or "c d") occurs 2x -> 2/7
        (1, "a b\na b\n\nc d\nc d"),
        (2, "x"),              # single token -> no bigrams -> 0.0
        (3, ""),               # empty -> both 0.0
        (4, "u v w u v"),      # bigrams: uv vw wu uv -> top 2/4 = 0.5
        (5, "one two three"),  # all distinct -> top 1/2 = 0.5, dup 0.0
        (6, "t t t t"),        # one line -> dup 0.0; t t x3 of 3 -> 1.0
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: (r.dup_line_frac, r.top_bigram_frac) for r in repetition_stats(df).collect()}
    assert got[1] == (0.5, 2 / 7)
    assert got[2] == (0.0, 0.0)
    assert got[3] == (0.0, 0.0)
    assert got[4] == (0.0, 0.5)
    assert got[5] == (0.0, 0.5)
    assert got[6] == (0.0, 1.0)


def test_multimodal_plumbing(spark):
    from import_spark.operators.multimodal import extract_features, frame_sample_plan, synth_media

    media = synth_media(spark, 12, feature_dim=4)
    feats = extract_features(media, feature_dim=4)
    rows = feats.collect()
    assert len(rows) == 12
    assert all(len(r.feature) == 4 for r in rows)
    # deterministic: same media id → same sha16 across runs
    again = {r.media_id: r.sha16 for r in extract_features(media, feature_dim=4).collect()}
    assert all(again[r.media_id] == r.sha16 for r in rows)
    # real decoder is an explicit stub
    with pytest.raises(NotImplementedError):
        extract_features(media, decoder="real")
    plan = frame_sample_plan(media, every_ms=1000)
    assert plan.count() > 0


def test_embedding_near_dup_lsh(spark):
    """Planted duplicates: the LSH scale path maps each dup cluster to
    its min id; exact baseline agrees."""
    import numpy as np
    from import_spark.operators.dedup import (
        embedding_near_dup,
        embedding_near_dup_pairs_exact,
    )

    rng = np.random.RandomState(0)
    base = rng.standard_normal((20, 16)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((str(i), [float(x) for x in v]))
        if i < 5:  # plant a near-duplicate of the first five
            rows.append((f"{i}_dup", [float(x) for x in v + rng.standard_normal(16) * 0.01]))
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    keep = {r.vec_id: r.canon for r in embedding_near_dup(emb, threshold=0.98).collect()}
    for i in range(5):
        pair = sorted([str(i), f"{i}_dup"])
        assert keep.get(pair[1]) == pair[0]
    # no false merges of independent gaussians at 0.98
    assert len(keep) == 5
    exact = embedding_near_dup_pairs_exact(emb, threshold=0.98).count()
    assert exact == 5


def test_ivf_ann_recall(spark):
    import numpy as np
    from import_spark.operators.similarity import cosine_topk_bruteforce, ivf_ann_topk

    rng = np.random.RandomState(1)
    vecs = rng.standard_normal((200, 16)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<float>",
    )
    q = emb.filter("vec_id < 5").selectExpr("vec_id as query_id", "embedding")
    exact = cosine_topk_bruteforce(emb, q, k=5)
    approx = ivf_ann_topk(emb, q, dim=16, k=5, n_centroids=8, n_probe=4)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall


def test_ivf_quantizer_unbiased_on_clustered_input(spark):
    """The quantizer must train on a RANDOM sample: with `limit()` a
    clustered/sorted corpus trains centroids on the first cluster only
    and recall on the rest collapses. Build 4 well-separated clusters
    ordered cluster-by-cluster, cap the train sample below one
    cluster's size, and require the centroids to cover all clusters."""
    import numpy as np
    from import_spark.operators.similarity import ivf_train_centroids

    rng = np.random.RandomState(3)
    offsets = np.eye(4, 16, dtype="float32") * 50.0
    rows = []
    for c in range(4):  # ordered by cluster — limit() would see only c=0
        for i in range(100):
            v = offsets[c] + rng.standard_normal(16).astype("float32")
            rows.append((c * 100 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>"
    ).coalesce(1).sortWithinPartitions("vec_id")
    cents = ivf_train_centroids(emb, dim=16, n_centroids=4, sample_rows=80, seed=7)
    # each true cluster center must have a nearby centroid (cosine > .9)
    cn = cents / (np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12)
    on = offsets / (np.linalg.norm(offsets, axis=1, keepdims=True) + 1e-12)
    best = (on @ cn.T).max(axis=1)
    assert (best > 0.9).all(), best


def test_language_id_independent_fixture(spark):
    """Independence check for the language-ID heuristic: the driver's
    DuckDB oracle is GENERATED from LANG_MARKERS (shared source of
    truth — a wrong marker set would pass both sides), so this fixture
    of hand-labeled natural sentences (tests/fixtures/lang_id_fixture
    .json, not derived from the marker table) restores an external
    ground truth."""
    import json
    import os

    from import_spark.operators.textops import language_id

    path = os.path.join(os.path.dirname(__file__), "fixtures", "lang_id_fixture.json")
    with open(path) as f:
        samples = json.load(f)["samples"]
    df = spark.createDataFrame(
        [(i, s["text"], s["lang"]) for i, s in enumerate(samples)],
        "doc_id int, text string, want string",
    )
    pred = language_id(df).join(df.select("doc_id", "want"), "doc_id")
    rows = pred.collect()
    wrong = [(r.doc_id, r.want, r.lang_pred) for r in rows if r.lang_pred != r.want]
    assert not wrong, wrong


def test_language_id_eight_languages(spark):
    """Marker-profile language ID distinguishes all 8 supported
    languages; tie/empty → 'und'; the DuckDB oracle twin is generated
    from the same marker table."""
    from import_spark.operators.textops import language_id

    rows = [
        (1, "der hund ist nicht auf dem tisch und die katze auch nicht"),
        (2, "le chat est dans la maison avec les enfants et pour nous"),
        (3, "el perro no está en la casa pero los gatos son muy bonitos"),
        (4, "il cane non è nella casa ma sono anche con il gatto per questo"),
        (5, "o cão não está em casa mas são muito bonitos para ele já"),
        (6, "de hond is niet in het huis maar ook een kat bij deze"),
        (7, "anjing itu tidak ada di rumah tetapi mereka juga akan ke sana dengan saya"),
        (8, "the quick brown fox jumps over the lazy dog and runs from this"),
        (9, "zzz qqq xxx"),  # no markers → und
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.lang_pred for r in language_id(df).collect()}
    assert got == {1: "de", 2: "fr", 3: "es", 4: "it", 5: "pt", 6: "nl", 7: "id", 8: "en", 9: "und"}


def test_resize_images_plumbing(spark):
    """Resize plumbing: deterministic fake output at the target dims;
    real decoder honestly stubbed."""
    import pytest as _pytest

    from import_spark.operators.multimodal import resize_images, synth_media

    media = synth_media(spark, 12)
    out = resize_images(media, 64, 32).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images
    assert all(r.width == 64 and r.height == 32 for r in out)
    assert all(len(bytes(r.payload)) == 64 * 32 // 64 for r in out)
    # deterministic across runs
    again = {r.media_id: bytes(r.payload) for r in resize_images(media, 64, 32).collect()}
    assert {r.media_id: bytes(r.payload) for r in out} == again
    with _pytest.raises(NotImplementedError):
        resize_images(media, 64, 32, decoder="real")


def test_cosine_udf_bitwise_matches_native_fold(spark):
    """similarity._cosine (Arrow-batched scorer) must be BITWISE equal
    to the native _dot/_norm fold it replaces — float32 products,
    left-to-right float64 accumulation — on adversarial float32 values
    (denormal-adjacent, sign-mixed, wide magnitude range). Raw doubles
    compared, not the rounded form, so a last-ulp divergence fails."""
    import numpy as np
    from pyspark.sql import functions as F

    from import_spark.operators.similarity import _cosine, _dot, _norm

    rng = np.random.default_rng(13)
    n, dim = 500, 37  # odd dim: no SIMD-friendly shape to hide behind
    scale = rng.choice([1e-6, 1.0, 1e6], size=(n, dim))
    a = (rng.standard_normal((n, dim)) * scale).astype(np.float32)
    b = (rng.standard_normal((n, dim)) * scale).astype(np.float32)
    df = spark.createDataFrame(
        [(i, a[i].tolist(), b[i].tolist()) for i in range(n)],
        "id long, va array<float>, vb array<float>",
    )
    out = df.select(
        "id",
        (_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))).alias("nat"),
        _cosine(F.col("va"), F.col("vb")).alias("pdc"),
    ).collect()
    assert len(out) == n
    for r in out:
        assert r.nat == r.pdc, (r.id, r.nat.hex(), r.pdc.hex())


def test_embedding_near_dup_hot_bucket_star(spark):
    """A degenerate all-identical cluster LARGER than max_bucket must
    still dedup to one canon: over-cap (band, bucket)s emit star edges
    to the bucket minimum (the minhash cap policy) instead of being
    dropped — the former behavior detected ZERO duplicates for exactly
    the most-duplicated vectors."""
    from import_spark.operators.dedup import embedding_near_dup

    n = 40
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(n)]
    rows.append((n, [-4.0, 3.0, -2.0, 1.0]))  # unrelated vector
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    keep = embedding_near_dup(emb, threshold=0.9, max_bucket=10)
    m = {int(r["vec_id"]): r["canon"] for r in keep.collect()}
    # all 40 identical vectors collapse into one component rooted at 0
    # (the root maps to itself implicitly and is absent from the map)
    assert set(m.keys()) == set(range(1, n))
    assert set(m.values()) == {"0"}
    assert n not in m  # the unrelated vector forms no pair


def test_multimodal_decoder_injection_seam(spark):
    """The codec injection seam: a user-supplied callable replaces the
    fake decoder with ZERO operator changes — it rides the UDF closure
    to executors, schema/batching untouched. A PIL/ffmpeg swap is this
    exact shape."""
    from import_spark.operators.multimodal import (
        extract_features,
        resize_images,
        synth_media,
    )

    media = synth_media(spark, 8, feature_dim=4)

    class FakeCodec:
        """Stands in for e.g. PIL: decode → featurize / resize."""

        def features(self, payload: bytes, dim: int):
            return [float(len(payload) % 97)] * dim

        def resize(self, payload: bytes, w: int, h: int) -> bytes:
            return bytes([w % 256, h % 256]) + payload[:4]

    codec = FakeCodec()
    rows = extract_features(media, feature_dim=4, decoder=codec.features).collect()
    assert len(rows) == 8
    # the injected featurizer emits a constant 4-vector per payload
    assert all(len(r.feature) == 4 and r.feature.count(r.feature[0]) == 4 for r in rows)

    resized = resize_images(media, 64, 32, decoder=codec.resize).collect()
    assert all(bytes(r.payload)[:2] == bytes([64, 32]) for r in resized)
    assert all(r.width == 64 and r.height == 32 for r in resized)

    with pytest.raises(ValueError):
        extract_features(media, decoder=123)
    with pytest.raises(ValueError):
        resize_images(media, 8, 8, decoder=object())


def test_pii_scan_and_redact(spark):
    from import_spark.operators.textops import pii_redact, pii_scan

    docs = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@mail.example.org or 10.1.2.3"),
            (2, "ssn 123-45-6789 and phone +1 (555) 010-9999"),
            (3, "plain text with the year 2020"),
        ],
        "doc_id long, text string",
    )
    s = {r.doc_id: r for r in pii_scan(docs).collect()}
    assert s[1].n_email == 1 and s[1].n_ipv4 == 1 and s[1].n_phone == 0
    # the SSN also matches the looser phone shape — counts are per-pattern
    assert s[2].n_ssn == 1 and s[2].n_phone == 2 and s[2].n_email == 0
    assert s[3].n_pii == 0

    r = {x.doc_id: x.text for x in pii_redact(docs).collect()}
    assert r[1] == "mail me at <EMAIL> or <IP>"
    # SSN redacted BEFORE the phone pattern can eat it
    assert r[2] == "ssn <SSN> and phone <PHONE>"
    assert r[3] == "plain text with the year 2020"


def test_decontaminate_ngram_overlap(spark):
    from import_spark.operators.textops import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "prefix THE QUICK Brown Fox Jumps over something"),  # 5-gram hit (case-folded)
            (2, "the quick brown cat sleeps all day long here"),  # no shared 5-gram
            (3, "quick brown fox jumps over the lazy dog indeed"),  # multiple hits
            (4, "short text"),  # fewer than n tokens
        ],
        "doc_id long, text string",
    )
    hits = {r.doc_id: r.n_hits for r in decontaminate(docs, bench, n=5).collect()}
    assert 1 in hits and 3 in hits and 2 not in hits and 4 not in hits
    assert hits[3] > hits[1] >= 1


def test_stratified_sample_deterministic_and_partition_invariant(spark):
    """Membership is a pure function of (stratum, id, salt): the same
    keep-set across repartitionings; different salts redraw; fractions
    0 and 1 are exact."""
    from import_spark.operators.textops import stratified_sample

    rows = [(i, f"s{i % 3}", "x") for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    fr = {"s0": 1.0, "s1": 0.0, "s2": 0.5}
    kept1 = {r.doc_id for r in stratified_sample(d, fr).collect()}
    kept2 = {r.doc_id for r in stratified_sample(d.repartition(7), fr).collect()}
    assert kept1 == kept2
    assert {i for i in kept1 if i % 3 == 0} == {i for i in range(300) if i % 3 == 0}
    assert not any(i % 3 == 1 for i in kept1)
    n_half = sum(1 for i in kept1 if i % 3 == 2)
    assert 25 <= n_half <= 75  # ~50 of 100, loose md5-uniformity bound
    other = {r.doc_id for r in stratified_sample(d, fr, salt="other").collect()}
    assert other != kept1  # independent redraw
