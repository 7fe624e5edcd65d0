"""Dedup + similarity operators: exactness and recall properties."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mundipy_spark.operators import dedup, multimodal, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_exact_dedup_finds_planted_duplicates(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["hello  world", "hello world", "unique doc", "Hello World"],
            }
        )
    )
    out = {r.doc_id: r.dup_count for r in dedup.exact_dedup(df).collect()}
    # whitespace-normalized + lowercased fingerprint: all three collapse
    assert out == {1: 3, 3: 1}


def test_minhash_similar_docs_share_signature_minima(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    far = "completely different words in this entirely other document text"
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": [base, near, far]})
    )
    sigs = {r.doc_id: [r[f"mh{i}"] for i in range(16)] for r in
            dedup.minhash_signatures(df, n_hashes=16).collect()}
    agree_near = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    agree_far = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert agree_near > agree_far
    assert agree_near >= 8  # high jaccard -> most minima agree


def test_lsh_pipeline_finds_planted_near_dup(spark):
    filler = " ".join(f"w{j}" for j in range(30))
    texts = [f"document number {i} starts here {filler} ends here" for i in range(20)]
    texts.append(texts[0].replace("number 0", "number zero"))  # near-dup of doc 0
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(21), "text": texts})
    )
    sigs = dedup.minhash_signatures(df, n_hashes=16)
    cand = dedup.lsh_candidate_pairs(sigs, n_hashes=16, bands=4)
    verified = dedup.jaccard_ngram_pairs(df, cand, threshold=0.5)
    pairs = {(r.a, r.b) for r in verified.collect()}
    assert (0, 20) in pairs


def test_simhash_planted_near_dup(spark):
    # realistic near-dup regime: long doc, one token edited -> small
    # hamming distance; unrelated text -> ~32 bits apart
    base = " ".join(f"w{i}" for i in range(100))
    texts = {
        1: base,
        2: base.replace("w99", "zz"),  # 1 of 100 tokens changed
        3: " ".join(f"v{i}" for i in range(100)),  # unrelated, same length
    }
    df = spark.createDataFrame(pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}))
    pairs = {(r.a, r.b): r.hamming for r in dedup.simhash_dedup(df, max_hamming=6).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_simhash_memo_eviction_stable():
    """Memo overflow must not orphan tokens the current batch still
    reads (the executor-crash regime at web-scale vocab): force eviction
    with a tiny limit and require identical signatures. Runs the raw
    kernel in-process (module-level UDFs pickle by reference, so a
    driver-side limit change would not reach Spark's python workers)."""
    from mundipy_spark.functions import text as tx

    kernel = tx.simhash56.func
    texts = pd.Series([" ".join(f"w{i}" for i in range(50)), "a b c", ""])
    tx._TOKEN_HASH_MEMO.clear()
    before = list(kernel(texts))
    old = tx._TOKEN_HASH_MEMO_LIMIT
    tx._TOKEN_HASH_MEMO_LIMIT = 10  # every batch overflows
    try:
        # memo is pre-warmed from the first pass: eviction now fires with
        # previously-memoized tokens still needed — the r01 KeyError path
        after1 = list(kernel(texts))
        after2 = list(kernel(pd.Series(["w0 w1 brandnew " + " ".join(f"x{i}" for i in range(30))])))
        after3 = list(kernel(texts))
    finally:
        tx._TOKEN_HASH_MEMO_LIMIT = old
        tx._TOKEN_HASH_MEMO.clear()
    assert before == after1 == after3
    assert len(after2) == 1


def test_simhash_portable_hash():
    """simhash56's token hash must equal the md5_int primitive the
    DuckDB oracle uses (14 hex chars of md5)."""
    import hashlib

    from mundipy_spark.functions.text import _token_hash56

    for w in ["spark", "window", "a", "ümlaut"]:
        assert _token_hash56(w) == int(
            hashlib.md5(w.encode("utf-8")).hexdigest()[:14], 16
        )


def test_brute_force_topk_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )
    got = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=3)
    got_pairs = {(r.qid, r.rank): r.nid for r in got.collect()}

    pdf = emb.toPandas()
    M = np.stack(pdf["embedding"].to_numpy())
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    for q in range(3):
        qi = np.nonzero(ids == q)[0][0]
        sims = M @ M[qi]
        sims[qi] = -np.inf
        # engine tie-break: round(cos,6) desc, id asc
        order = sorted(
            [(round(s, 6), -i) for s, i in zip(sims, ids) if i != q], reverse=True
        )
        expect = [-i for _, i in order[:3]]
        assert [got_pairs[(q, r)] for r in (1, 2, 3)] == expect


def test_lsh_ann_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )
    q = emb.filter(F.col("vec_id") < 20)
    exact = similarity.brute_force_topk(emb, q, k=5)
    approx = similarity.lsh_bucket_topk(emb, q, k=5, dim=64, n_tables=6, n_planes=8)
    e = {(r.qid, r.nid) for r in exact.collect()}
    a = {(r.qid, r.nid) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall  # bucketed ANN: recall >> random, tunable


def test_multimodal_plumbing(spark, docs):
    feats = multimodal.extract_image_features(
        multimodal.attach_fake_payloads(docs.limit(50))
    )
    rows = feats.collect()
    assert len(rows) == 50
    assert all(0 <= r.mean_intensity <= 255 for r in rows)
    assert all(r.aspect > 0 for r in rows)
    small = multimodal.resize_images(
        multimodal.attach_fake_payloads(docs.limit(5)), target=16
    ).collect()
    assert all(len(r.payload) == 16 * 16 * 3 for r in small)


def test_ivf_ann_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )
    q = emb.filter(F.col("vec_id") < 20)
    exact = similarity.brute_force_topk(emb, q, k=5)
    approx = similarity.ivf_topk(emb, q, k=5, n_clusters=8, n_probe=3, dim=64)
    e = {(r.qid, r.nid) for r in exact.collect()}
    a = {(r.qid, r.nid) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # probing 3/8 clusters must beat the random-subset baseline by far
    assert recall >= 0.6, recall


def test_frame_sampling_plumbing(spark, docs):
    vids = multimodal.attach_fake_video(docs.limit(10))
    frames = multimodal.sample_frames(vids, k=4, size=8).collect()
    assert len(frames) == 40
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert len(r.payload) == 8 * 8 * 3
        assert abs(r.ts_sec - r.frame_idx / 30.0) < 1e-9
    assert all(len(v) == 4 for v in by_doc.values())
    # frames are evenly spaced: first is 0, last is n_frames-1
    for v in by_doc.values():
        idxs = sorted(x.frame_idx for x in v)
        assert idxs[0] == 0


def test_image_codec_roundtrip():
    """Pure-numpy BMP and PPM encoders/decoders are exact inverses,
    including BMP row padding (odd widths) and bottom-up flip."""
    rng = np.random.default_rng(3)
    for w, h in [(17, 5), (16, 16), (3, 7), (1, 1), (33, 2)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(multimodal.decode_image(multimodal.encode_bmp(img)), img)
        assert np.array_equal(multimodal.decode_image(multimodal.encode_ppm(img)), img)
    # the codec seam: compressed magic raises loudly
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n" + b"\0" * 64)


def test_image_features_closed_form(spark, docs):
    """No-stub image path: REAL BMP/PPM payloads decode in numpy and the
    per-image stats match the gradient's closed forms exactly."""
    feats = multimodal.extract_image_features(
        multimodal.attach_image_payloads(docs.limit(60))
    ).collect()
    assert len(feats) == 60
    for r in feats:
        w, h, seed = 16 + (r.doc_id % 8) * 8, 16 + (r.doc_id % 5) * 8, r.doc_id % 64
        assert (r.width, r.height) == (w, h)  # from decoded pixels
        assert abs(r.mean_intensity - ((w - 1) / 2.0 + (h - 1) + seed)) < 1e-9
        assert abs(r.std_intensity - np.sqrt((w * w - 1) / 12.0 + (h * h - 1) / 3.0)) < 1e-9
        assert abs(r.aspect - w / h) < 1e-12


def test_audio_features_closed_form(spark, docs):
    """No-stub multimodal path: float32 PCM synth -> FFT features match
    closed forms (integer-cycle tones: RMS = amp/sqrt(2), dominant bin
    = the tone frequency, ZCR ~ 2f/sr)."""
    from mundipy_spark.operators import multimodal

    feats = multimodal.extract_audio_features(
        multimodal.attach_fake_audio(docs.limit(60))
    ).collect()
    assert len(feats) == 60
    for r in feats:
        f = 100.0 + (r.doc_id % 20) * 40.0
        amp = 0.1 + (r.doc_id % 5) * 0.1
        assert abs(r.rms - amp / np.sqrt(2.0)) < 1e-6
        assert r.dominant_hz == f
        assert abs(r.zcr - 2.0 * f / multimodal.AUDIO_SR) < 0.01


def test_winnowing_guarantee_and_pairs(spark):
    """Winnowing's core guarantee (Schleimer et al. 2003): any shared
    substring of length >= k + w - 1 yields a shared fingerprint; and
    disjoint texts share none. Candidate pairs rank true overlaps
    first."""
    from mundipy_spark.operators import fingerprint as fpx

    shared = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = spark.createDataFrame(
        [
            (0, "AAA " + shared + " BBB unrelated tail text goes here"),
            (1, "CCC prefix words then " + shared + " DDD"),
            (2, "completely different content about spark shuffles and joins"),
        ],
        "doc_id long, text string",
    )
    fps = fpx.winnow_fingerprints(docs, k=16, w=8)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[0] & by_doc[1]  # shared substring -> shared fingerprint
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])

    pairs = {(r.a, r.b): r.n_shared for r in
             fpx.fingerprint_candidate_pairs(fps).collect()}
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] >= 1


def test_brute_force_near_dup_exact_baseline(spark):
    """brute_force_near_dup recovers exactly the planted twin pairs and
    nothing else; the LSH path's pairs are a subset of it (it is the
    exactness yardstick)."""
    import numpy as np

    from mundipy_spark.operators import similarity

    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 64))
    rows = [(i, base[i].tolist()) for i in range(30)]
    # twins: sign-flip one SMALL coordinate -> cosine just under 1
    for i in range(0, 30, 10):
        v = base[i].copy()
        j = int(np.argmin(np.abs(v)))
        v[j] = -v[j]
        rows.append((100 + i, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.a, r.b)
        for r in similarity.brute_force_near_dup(df, threshold=0.9).collect()
    }
    assert got == {(0, 100), (10, 110), (20, 120)}

    lsh = {
        (r.a, r.b)
        for r in similarity.embedding_near_dup(df, threshold=0.9).collect()
    }
    assert lsh <= got


def test_brute_force_near_dup_arrow_matches_catalyst(spark):
    """The Arrow matmul path and the pure-Catalyst fold path agree
    pair-for-pair on the round-6 values."""
    import numpy as np

    from mundipy_spark.operators import similarity

    rng = np.random.default_rng(23)
    rows = [(i, rng.normal(size=32).tolist()) for i in range(40)]
    rows += [(100 + i, rows[i][1]) for i in range(5)]  # exact dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {
        (r.a, r.b): r.cos_r6
        for r in similarity.brute_force_near_dup(df, 0.9, arrow=True).collect()
    }
    c = {
        (r.a, r.b): r.cos_r6
        for r in similarity.brute_force_near_dup(df, 0.9, arrow=False).collect()
    }
    assert a == c and len(a) == 5


def test_embedding_near_dup_large_cluster_uncapped(spark):
    """A near-dup cluster LARGER than any fixed per-query top-k cap:
    every above-threshold pair must be reported (the old k=50 cap lost
    overflow pairs whose reverse direction the qid<nid filter then
    discarded). 60 near-identical vectors -> C(60,2) pairs."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(60):
        v = base + rng.standard_normal(16) * 1e-4
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    # plus distant distractors that must not pair with anything
    for i in range(60, 70):
        v = rng.standard_normal(16)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.embedding_near_dup(
        df, threshold=0.98, dim=16, n_planes=8
    ).collect()
    pairs = {(r.a, r.b) for r in got}
    want = {(a, b) for a in range(60) for b in range(a + 1, 60)}
    # LSH recall is probabilistic but near-identical vectors share
    # every sign bit: all planted pairs land in the same buckets
    assert pairs == want


def test_lsh_jaccard_oracle_mirrors_banding_on_midrange_pairs(spark):
    """The DuckDB twin of the LSH pipeline must mirror BANDING, not
    compute all pairs >= threshold: a mid-range pair (jaccard ~0.2-0.6)
    collides only sometimes (P = 1-(1-j^rows)^bands), so the all-pairs
    twin this replaced disagreed with Spark on exactly the corpora
    where LSH behaves as designed (review pass 8)."""
    import duckdb
    import pandas as pd

    from mundipy_spark.operators import dedup, textstats  # noqa: F401

    # near-identical pair (0,1), several mid-range pairs (2..9 share a
    # sliding fraction of tokens with doc 2), and unrelated docs
    docs = []
    base = [f"tok{i}" for i in range(40)]
    docs.append((0, " ".join(base)))
    docs.append((1, " ".join(base[:-1] + ["changed"])))
    for d in range(2, 10):
        k = 4 * (d - 2)
        toks = base[k : k + 20] + [f"only{d}_{j}" for j in range(10)]
        docs.append((d, " ".join(toks)))
    for d in range(10, 16):
        docs.append((d, " ".join(f"z{d}_{j}" for j in range(25))))
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])

    sdf = spark.createDataFrame(pdf)
    sigs = dedup.minhash_signatures(sdf, n_hashes=8)
    cand = dedup.lsh_candidate_pairs(sigs, n_hashes=8, bands=4)
    got = dedup.jaccard_ngram_pairs(sdf, cand, threshold=0.2)
    spark_pairs = sorted(
        (r["a"], r["b"], round(r["jaccard"], 6)) for r in got.collect()
    )

    con = duckdb.connect()
    con.register("documents", pdf)
    twin = con.execute(
        dedup.lsh_jaccard_pairs_sql(
            n_hashes=8, bands=4, bucket_cap=200, shingle_k=3, threshold=0.2
        )
    ).fetchall()
    twin_pairs = sorted((a, b, round(j, 6)) for a, b, j in twin)
    assert spark_pairs == twin_pairs

    # the corpus really exercises the gap: all-pairs >= 0.2 is a strict
    # superset of what LSH examines here
    allpairs = con.execute(
        """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[\\s\\x0b]+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i : i + 2], ' ') AS shingle
  FROM toks, UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS ninter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT count(*) FROM inter i
JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
WHERE CAST(i.ninter AS DOUBLE) / (sa.n + sb.n - i.ninter) >= 0.2
"""
    ).fetchone()[0]
    assert allpairs > len(spark_pairs)
