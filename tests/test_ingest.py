"""Ingest/normalize + synthetic corpus determinism (SURVEY.md §2 A3-A6, A12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dp_search_data_importer_spark.operators.ingest import (
    normalize_repo_files,
    verify_sha_invariant,
)
from dp_search_data_importer_spark.sources.repo_files import synthetic_repo_files


def test_empty_key_rows_dropped(spark):
    """Reference drops events with empty uid (handler/handler.go:80-83);
    generalized to the (repo,path,commit) key."""
    rows = [
        ("org/a", "x.py", "c1", "py", "import foo"),
        ("", "x.py", "c2", "py", "dropped"),
        ("org/a", None, "c3", "py", "dropped"),
        ("org/a", "y.py", "", "py", "dropped"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    out = normalize_repo_files(df)
    assert out.count() == 1
    row = out.collect()[0]
    assert row["doc_id"] is not None
    # sha256 of 'import foo'
    import hashlib

    assert row["content_sha256"] == hashlib.sha256(b"import foo").hexdigest()


def test_sha_invariant_holds(spark, corpus):
    docs = normalize_repo_files(corpus)
    assert verify_sha_invariant(corpus, docs) == 0


def test_corpus_deterministic_across_partitioning(spark):
    """Same (seed, n) at different parallelism → identical rows (required for
    the local[8]-vs-local[32] scaling bench to index the same corpus)."""
    a = synthetic_repo_files(spark, n_docs=50, seed=7, num_partitions=2)
    b = synthetic_repo_files(spark, n_docs=50, seed=7, num_partitions=8)
    assert a.exceptAll(b).union(b.exceptAll(a)).count() == 0


def test_corpus_keys_unique(spark, corpus):
    n = corpus.count()
    assert corpus.select("repo", "path", "commit").distinct().count() == n
    docs = normalize_repo_files(corpus)
    assert docs.select("doc_id").distinct().count() == n


def test_corpus_has_hot_terms(spark, corpus):
    """Zipf vocab: 'import'/'def' must be genuinely hot (north_star skew)."""
    from dp_search_data_importer_spark.functions.tokenize import code_term_freqs
    from dp_search_data_importer_spark.operators.postings import doc_freqs

    docs = normalize_repo_files(corpus)
    tf = code_term_freqs(docs, id_col="doc_id", text_col="content")
    dfs = {r["term"]: r["df"] for r in doc_freqs(tf).collect()}
    n_docs = corpus.count()
    assert dfs.get("import", 0) > 0.5 * n_docs
    assert dfs.get("def", 0) > 0.5 * n_docs


def test_synthetic_corpus_golden_hash():
    """The synthetic corpus is a fixed fixture: oracle-checked stored-index
    queries depend on its exact bytes, so any generator change must keep it
    byte-identical (these hashes were captured before the chunked-join
    rewrite and verified equal after it)."""
    import hashlib

    import pandas as pd

    from dp_search_data_importer_spark.sources.repo_files import _gen_batches

    golden = {
        False: "f69bba559904f7810e080b2d1cdcf5ca349cb90974e2ded20e3c4aad128a4e9f",
        True: "57fc0da250c7b3ba3f9315e5e108ee5a5409e62d53739f752a09e119db718373",
    }
    pdf = pd.DataFrame({"id": range(500)})
    for bursty, want in golden.items():
        out = pd.concat(list(_gen_batches(iter([pdf]), 42, 120, 2400,
                                          bursty=bursty)))
        h = hashlib.sha256()
        for c in ["repo", "path", "commit", "lang", "content"]:
            for v in out[c]:
                h.update(v.encode())
                h.update(b"\0")
        assert h.hexdigest() == want, bursty
