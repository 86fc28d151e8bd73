"""Text analysis: langid, token counts, quality, fingerprints, winnowing."""

from __future__ import annotations

from dp_search_data_importer_spark.operators import textstats as ts


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in the house of that king"),
            (2, "der hund und die katze ist nicht in den garten mit ein"),
            (3, "el perro y la casa es en los campos que por la tarde con"),
            (4, "qqq www zzz xyz"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_guess"] for r in ts.language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "und"}


def test_token_counts_golden(spark):
    df = spark.createDataFrame(
        [(1, "Hello world, x1 foo_bar  baz!")], "doc_id long, text string"
    )
    r = ts.token_counts(df).collect()[0]
    assert r["ws_tokens"] == 5
    assert r["analyzer_tokens"] == 6   # hello world x1 foo bar baz
    assert r["bpeish_tokens"] == 7     # hello world x 1 foo bar baz


def test_quality_scores_bands(spark):
    long_ok = "the " + " ".join(f"word{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, long_ok), (2, "tiny"), (3, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in ts.quality_scores(df).collect()}
    assert rows[1]["quality_score"] >= 0.7
    assert rows[2]["quality_score"] <= 0.6  # fails length band
    assert rows[3]["n_tokens"] == 0 and rows[3]["quality_score"] == 0.0


def test_doc_fingerprints_order_invariant(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha alpha")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ts.doc_fingerprints(df).collect()}
    assert rows[1]["termset_md5"] == rows[2]["termset_md5"]
    assert rows[1]["exact_md5"] != rows[2]["exact_md5"]


def test_winnowing_engine_matches_reference(spark):
    texts = [
        (1, " ".join(f"tok{i % 17}" for i in range(60))),
        (2, " ".join(f"tok{i % 17}" for i in range(3))),   # shorter than k
        (3, "a b c d e f g h i j"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got: dict[int, list[int]] = {}
    for r in ts.winnowing_fingerprints(df).collect():
        got.setdefault(r["doc_id"], []).append(r["fp"])
    for doc_id, text in texts:
        assert sorted(got.get(doc_id, [])) == ts.winnowing_py(text), doc_id


def test_winnowing_shared_fingerprints_for_overlap(spark):
    base = " ".join(f"w{i}" for i in range(40))
    overlapping = base + " extra tail words here"
    df = spark.createDataFrame(
        [(1, base), (2, overlapping), (3, " ".join(f"z{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    fps: dict[int, set] = {}
    for r in ts.winnowing_fingerprints(df).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert len(fps[1] & fps[2]) > 0.5 * len(fps[1])  # heavy overlap
    assert not fps[1] & fps[3]                        # disjoint content
