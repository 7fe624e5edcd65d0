"""Tests for the round-3 training-pipeline tail: PII scrubbing,
repetition signals, as-of join, and Bloom-prefiltered incremental
dedup."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mundipy_spark.operators import dedup, scrub, temporal


# ---------------------------------------------------------------------------
# scrub_pii
# ---------------------------------------------------------------------------


def test_scrub_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (0, "write to john.doe+x@sub.example.co.uk today"),
            (1, "call 555-123-4567 or 555 987 6543 now"),
            (2, "server at 192.168.0.1 and 10.0.0.255"),
            (3, "plain text, nothing to scrub"),
            (4, "combo a@b.io 555-000-1111 127.0.0.1"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in scrub.scrub_pii(df).collect()}
    assert (rows[0].n_email, rows[0].n_phone, rows[0].n_ip) == (1, 0, 0)
    assert rows[0].text_redacted == "write to <EMAIL> today"
    assert (rows[1].n_email, rows[1].n_phone, rows[1].n_ip) == (0, 2, 0)
    assert rows[1].text_redacted == "call <PHONE> or <PHONE> now"
    assert (rows[2].n_email, rows[2].n_phone, rows[2].n_ip) == (0, 0, 2)
    assert rows[2].text_redacted == "server at <IP> and <IP>"
    assert (rows[3].n_email, rows[3].n_phone, rows[3].n_ip) == (0, 0, 0)
    assert rows[3].text_redacted == rows[3].text
    assert rows[4].text_redacted == "combo <EMAIL> <PHONE> <IP>"


def test_scrub_pii_ip_host_is_ip_not_email(spark):
    # user@10.0.0.1: the email pattern requires an alphabetic TLD, so
    # an IP-host address is NOT an email — the IP pass redacts the
    # octets instead (same in Java regex and RE2).
    df = spark.createDataFrame([(0, "mail user@10.0.0.1 ok")], "doc_id long, text string")
    r = scrub.scrub_pii(df).collect()[0]
    assert r.text_redacted == "mail user@<IP> ok"
    assert r.n_email == 0
    assert r.n_ip == 1


# ---------------------------------------------------------------------------
# repetition_signals
# ---------------------------------------------------------------------------


def test_repetition_signals_closed_form(spark):
    df = spark.createDataFrame(
        [
            (0, "a a b"),
            (1, "x y z w"),
            (2, "t t t t"),
            (3, ""),
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in scrub.repetition_signals(df).collect()}

    # doc 0: tokens [a,a,b] -> dup 1 - 2/3; bigrams {"a a","a b"} top 1/2;
    # entropy -(2/3 ln 2/3 + 1/3 ln 1/3)
    ent0 = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    assert got[0].dup_token_frac == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert got[0].top_bigram_frac == pytest.approx(0.5, abs=1e-6)
    assert got[0].token_entropy == pytest.approx(ent0, abs=1e-6)

    # doc 1: all distinct -> dup 0, every bigram unique -> 1/3, entropy ln 4
    assert got[1].dup_token_frac == 0.0
    assert got[1].top_bigram_frac == pytest.approx(1 / 3, abs=1e-6)
    assert got[1].token_entropy == pytest.approx(math.log(4), abs=1e-6)

    # doc 2: one distinct token of 4 -> dup 0.75, "t t" x3 of 3 -> 1.0,
    # entropy 0
    assert got[2].dup_token_frac == pytest.approx(0.75, abs=1e-6)
    assert got[2].top_bigram_frac == 1.0
    assert got[2].token_entropy == 0.0

    # empty doc -> all zeros; single token -> no bigrams
    assert (got[3].dup_token_frac, got[3].top_bigram_frac, got[3].token_entropy) == (
        0.0, 0.0, 0.0,
    )
    assert got[4].dup_token_frac == 0.0
    assert got[4].top_bigram_frac == 0.0
    assert got[4].token_entropy == 0.0


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------


def _asof_frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", 5, "e1"),
            ("u1", 10, "e2"),
            ("u1", 20, "e3"),
            ("u2", 7, "e4"),
            ("u3", 9, "e5"),
        ],
        "uid string, ts long, ev string",
    )
    right = spark.createDataFrame(
        [
            ("u1", 10, 1.5),   # equal-ts: visible to e2 (backward inclusive)
            ("u1", 12, 2.5),
            ("u2", 3, 9.0),
            # u3 has no reference rows at all
        ],
        "uid string, ts long, price double",
    )
    return left, right


def test_asof_join_backward_inclusive(spark):
    left, right = _asof_frames(spark)
    out = temporal.asof_join(left, right, by="uid", ts_col="ts")
    got = {r.ev: r.price for r in out.collect()}
    assert got == {
        "e1": None,      # before any right row
        "e2": 1.5,       # ts == right ts -> inclusive
        "e3": 2.5,       # latest of the two
        "e4": 9.0,
        "e5": None,      # key absent from right
    }
    assert out.count() == left.count()


def test_asof_join_right_ts_alias_and_value_cols(spark):
    left, right = _asof_frames(spark)
    right2 = right.withColumnRenamed("ts", "effective_at").withColumn(
        "note", F.concat(F.lit("n"), F.col("price").cast("int").cast("string"))
    )
    out = temporal.asof_join(
        left, right2, by="uid", ts_col="ts",
        value_cols=["price", "note"], right_ts="effective_at",
    )
    got = {r.ev: (r.price, r.note) for r in out.collect()}
    assert got["e3"] == (2.5, "n2")
    assert got["e1"] == (None, None)
    assert "effective_at" not in out.columns


def test_asof_join_null_payload_member_is_row_atomic(spark):
    """A genuine NULL in one value column of the matched right row must
    NOT be back-filled from an older right row: the payload is filled
    as one atomic struct (matches DuckDB's native ASOF JOIN)."""
    left = spark.createDataFrame(
        [("u1", 20, "e1")], "uid string, ts long, ev string"
    )
    right = spark.createDataFrame(
        [
            ("u1", 5, 1.0, "old"),
            ("u1", 15, 7.0, None),  # matched row: note is genuinely NULL
        ],
        "uid string, ts long, price double, note string",
    )
    row = temporal.asof_join(left, right, by="uid", ts_col="ts").collect()[0]
    assert row.price == 7.0
    assert row.note is None  # NOT "old"


def test_asof_join_null_right_ts_matches_nothing(spark):
    """SQL comparison semantics: a NULL right timestamp satisfies no
    ts_right <= ts_left, so it must never fill a probe — under the
    union-window plan it would otherwise sort FIRST (nulls-first asc)
    and back-fill every probe before the first real reference row."""
    left = spark.createDataFrame(
        [("u1", 5, "early"), ("u1", 20, "late"), ("u1", None, "nullts")],
        "uid string, ts long, ev string",
    )
    right = spark.createDataFrame(
        [("u1", None, 99.0), ("u1", 10, 1.0)],
        "uid string, ts long, price double",
    )
    got = {
        r.ev: r.price
        for r in temporal.asof_join(left, right, by="uid", ts_col="ts").collect()
    }
    # DuckDB: ASOF LEFT JOIN gives early->NULL, late->1.0, nullts->NULL
    assert got == {"early": None, "late": 1.0, "nullts": None}


def test_asof_join_rejects_column_clash(spark):
    left, right = _asof_frames(spark)
    with pytest.raises(ValueError, match="collide"):
        temporal.asof_join(
            left, right.withColumnRenamed("price", "ev"), by="uid", ts_col="ts"
        )


def test_asof_join_matches_bruteforce_on_events(spark, sf_dir):
    """Differential vs a driver-side brute force over real testdata."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    probe = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    ref = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("v"))
    )
    out = temporal.asof_join(probe, ref, by="user_id", ts_col="ts", value_cols=["v"])
    got = {r.event_id: r.v for r in out.collect()}

    ref_rows = sorted(ref.collect(), key=lambda r: r.ts)
    by_user = {}
    for r in ref_rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.v))
    import bisect

    for p in probe.collect():
        cand = by_user.get(p.user_id, [])
        i = bisect.bisect_right([t for t, _ in cand], p.ts)
        want = cand[i - 1][1] if i else None
        assert got[p.event_id] == want, p.event_id
    assert len(got) == probe.count()


# ---------------------------------------------------------------------------
# Bloom / incremental dedup
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    df = spark.createDataFrame([(i * 7919 % (1 << 56),) for i in range(500)], "h long")
    bloom = dedup.build_bloom56(df, "h", m_bits=1 << 14, k=4)
    mc = dedup.bloom_might_contain(spark, bloom, m_bits=1 << 14, k=4)
    # every inserted value must test positive
    n_neg = df.withColumn("hit", mc(F.col("h"))).filter(~F.col("hit")).count()
    assert n_neg == 0


def test_incremental_dedup_exact_despite_bloom_fps(spark, sf_dir):
    """Tiny bitmap (256 bits for thousands of docs) forces a high Bloom
    false-positive rate; the anti-join must still make the result
    exactly equal to the brute-force NOT-IN."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    newb = docs.filter(F.col("doc_id") % 4 == 0)
    snap = docs.filter(F.col("doc_id") % 4 != 0)

    out = dedup.incremental_dedup(newb, snap, m_bits=256, k=2)
    got = sorted(r.doc_id for r in out.select("doc_id").collect())

    from mundipy_spark.functions import text as tx

    fp = tx.fingerprint_expr(F.col("text"))
    want = sorted(
        r.doc_id
        for r in newb.withColumn("fp", fp)
        .join(snap.select(fp.alias("fp")).distinct(), on="fp", how="left_anti")
        .select("doc_id")
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_incremental_dedup_bloom_prefilter_prunes(spark):
    """With a roomy bitmap, rows absent from the snapshot skip the
    anti-join entirely (definite-new path) — asserted by running with a
    snapshot that shares no fingerprints and checking everything
    survives."""
    newb = spark.createDataFrame(
        [(i, f"unique new doc {i}") for i in range(50)], "doc_id long, text string"
    )
    snap = spark.createDataFrame(
        [(1000 + i, f"old corpus doc {i}") for i in range(50)],
        "doc_id long, text string",
    )
    out = dedup.incremental_dedup(newb, snap, m_bits=1 << 16, k=4)
    assert out.count() == 50
