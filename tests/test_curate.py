"""Composed curation pipeline: gates, dedup interaction, decontam."""

from mundipy_spark.plans import curate


def _long_unique(prefix: str, n: int = 160) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_curate_gates_and_selection(spark):
    base = _long_unique("word")           # 160 distinct alpha tokens
    df = spark.createDataFrame(
        [
            (0, base, "en"),              # eval doc (0 % 97 == 0)
            (1, _long_unique("fresh"), "en"),   # clean unique doc
            (2, base, "en"),              # full dup of doc 0 -> keep-ratio gate
            (3, _long_unique("autre"), "fr"),   # fails lang gate
            (4, "x! 1 2 3", "en"),        # digits/punct -> low quality
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in curate.curate(df).collect()}
    # 2 deduped away (0 kept pars), 3 lang-gated, 4 quality-gated
    assert set(out) == {0, 1}
    assert out[0].selected is False       # eval doc overlaps itself
    assert out[0].n_hits == out[0].n_grams
    assert out[1].selected is True        # unique doc survives
    assert out[1].n_hits == 0
    assert out[1].n_grams == 160 - 7      # 8-grams over 160 tokens


def test_curate_gopher_gate_drops_short_docs(spark):
    """gopher=True prepends the rule gate as a pure projection: docs
    failing the word-count rule never reach paragraph dedup, while a
    long stop-word-bearing doc flows through."""
    from mundipy_spark.plans import curate as curate_plan

    long_text = (
        "the quick brown fox jumps over and over the lazy dog that it "
        "met with great joy near the old stone bridge where children "
        "have played for years and the river bends to meet the sea "
        "while birds of every kind sing songs that carry far and wide "
        "across quiet valleys below"
    )
    docs = spark.createDataFrame(
        [(1, long_text, "en"), (2, "short and with that text", "en")],
        "doc_id long, text string, lang string",
    )
    out = curate_plan.curate(docs, gopher=True, eval_mod=1000003)
    rows = {r.doc_id for r in out.collect()}
    assert rows == {1}

    ungated = curate_plan.curate(docs, eval_mod=1000003)
    assert {r.doc_id for r in ungated.collect()} == {1, 2}
