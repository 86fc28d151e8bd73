"""Dedup operators: exact, n-gram Jaccard, MinHash-LSH, SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from dp_search_data_importer_spark.operators import dedup as dd
from dp_search_data_importer_spark.operators import simhash as sh

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat today"),    # near dup
    (4, "completely different content about spark indexes"),
    (5, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicate_groups(spark):
    rows = dd.exact_duplicate_groups(_docs(spark)).collect()
    assert len(rows) == 1
    assert rows[0]["n_dups"] == 3
    assert rows[0]["keep_doc_id"] == 1


def test_dedup_exact_keeps_representative(spark):
    out = dd.dedup_exact(_docs(spark))
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3, 4]


def _py_jaccard(a: str, b: str, n: int = 3) -> float:
    def sh_set(t):
        toks = t.split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = sh_set(a), sh_set(b)
    return len(sa & sb) / len(sa | sb)


def test_ngram_jaccard_matches_python(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(_docs(spark), threshold=0.1).collect()
    }
    assert pairs[(1, 2)] == 1.0
    expected_13 = round(_py_jaccard(DOCS[0][1], DOCS[2][1]), 4)
    assert abs(pairs[(1, 3)] - expected_13) < 1e-9
    assert (1, 4) not in pairs


def test_minhash_estimates_jaccard(spark):
    sigs = dd.minhash_signatures(_docs(spark), n_hashes=64, shingle_n=3)
    pairs = dd.minhash_candidates(sigs, bands=8)
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dd.minhash_jaccard_estimate(sigs, pairs).collect()
    }
    assert est[(1, 2)] == 1.0  # identical docs: identical signatures
    true_13 = _py_jaccard(DOCS[0][1], DOCS[2][1])
    if (1, 3) in est:  # candidate found (probabilistic but seeded → stable)
        assert abs(est[(1, 3)] - true_13) < 0.35  # 64 hashes → coarse estimate
    # dissimilar docs must not be confidently similar
    assert est.get((1, 4), 0.0) < 0.3


def test_simhash_identical_and_near(spark):
    fps = sh.simhash_fingerprints(_docs(spark))
    rows = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    assert rows[1] == rows[2] == rows[5]
    assert rows[1] == sh.simhash64_py(DOCS[0][1])  # engine == reference kernel
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in sh.simhash_candidate_pairs(fps, max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 4) not in pairs  # different content: far fingerprint


def test_shingles_expr_matches_python(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    got = sorted(r["shingle"] for r in dd.shingle_sets(df, n=2).collect())
    assert got == ["a b", "b c", "c d"]
    # doc shorter than n → no rows
    tiny = spark.createDataFrame([(2, "a")], "doc_id long, text string")
    assert dd.shingle_sets(tiny, n=3).count() == 0


def test_ngram_jaccard_lsh_subset_and_recall(spark):
    """The LSH-restricted exact Jaccard returns a subset of the global
    all-pairs result (identical values where present); raising n_hashes/bands
    recovers the full set on this corpus."""
    docs = _docs(spark)
    glob = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_lsh(
            docs, n=3, threshold=0.5, n_hashes=16, bands=4).collect()
    }
    assert set(lsh) <= set(glob)
    for k, v in lsh.items():
        assert v == glob[k]  # exact Jaccard, not an estimate
    hi = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_lsh(
            docs, n=3, threshold=0.5, n_hashes=32, bands=16).collect()
    }
    assert hi == glob  # r=2 rows/band: P(candidate | J>=0.5) > 0.99


def test_ngram_jaccard_lsh_no_global_shingle_self_join(spark):
    """Plan regression: every join touching the shingle relation must be
    keyed on a doc column too — the global shingle-only equi-join (the d²/2
    explosion) must not appear anywhere in the optimized plan."""
    docs = _docs(spark)
    plan = dd.ngram_jaccard_lsh(docs, n=3, threshold=0.5)._jdf.queryExecution(
    ).optimizedPlan().toString()
    import re

    for cond in re.findall(r"Join [a-zA-Z]+, (\(.*\))", plan):
        if "shingle" in cond:
            assert "doc_" in cond, f"shingle-only join found: {cond}"


def test_connected_components_chain_and_singletons(spark):
    """Min-label propagation: a 6-node chain (diameter 5 — several
    propagation rounds), a separate pair, and an isolated node."""
    from dp_search_data_importer_spark.operators.dedup import (
        connected_components,
    )
    from dp_search_data_importer_spark.session import local_df

    pairs = local_df(
        spark,
        [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (20, 21)],
        "doc_a long, doc_b long")
    nodes = local_df(spark, [(i,) for i in
                             [10, 11, 12, 13, 14, 15, 20, 21, 30]],
                     "doc_id long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs, nodes=nodes).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10,
                   20: 20, 21: 20, 30: 30}


def test_near_dup_clusters_and_dedup_near(spark):
    """Transitive clustering over LSH pairs: exact copies + truncated
    near-copies collapse into their original's cluster; dedup_near keeps
    exactly one representative per cluster."""
    from dp_search_data_importer_spark.operators.dedup import (
        dedup_near,
        near_dup_clusters,
    )

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest tonight with friends")
    rows = [(1, base),
            (2, base),                                  # exact dup of 1
            (3, base.rsplit(" ", 3)[0]),                # near-dup of 1
            (4, "completely different text about spark shuffles and "
                "partitions and executors and very large clusters"),
            (5, "another unrelated document mentioning benchmarks "
                "latency throughput scaling and single disk hosts")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["cluster_id"]
           for r in near_dup_clusters(df, threshold=0.4).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 4 and got[5] == 5
    kept = sorted(r["doc_id"] for r in
                  dedup_near(df, threshold=0.4).collect())
    assert kept == [1, 4, 5]


def test_connected_components_raises_on_nonconvergence(spark):
    """ADVICE r3: exiting the propagation loop without a fixpoint must fail
    loudly — silent split labels would leak duplicate representatives."""
    import pytest as _pytest

    from dp_search_data_importer_spark.operators.dedup import (
        connected_components,
    )
    from dp_search_data_importer_spark.session import local_df

    chain = local_df(spark, [(i, i + 1) for i in range(12)],
                     "doc_a long, doc_b long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    # and with enough iterations the same graph converges to one cluster
    labels = connected_components(chain, max_iter=20).collect()
    assert {r["cluster_id"] for r in labels} == {0}


def test_decontamination_flags_and_drops(spark):
    """Cross-corpus n-gram decontamination: a train doc sharing an n-gram
    with the eval set is flagged with the right distinct-overlap count;
    the keep-pass drops exactly the flagged docs."""
    from dp_search_data_importer_spark.operators.dedup import (
        cross_ngram_overlap,
        decontaminate,
    )
    from dp_search_data_importer_spark.session import local_df

    train = local_df(spark, [
        (1, "the quick brown fox jumps high"),      # shares 'quick brown fox'
        (2, "totally unrelated text here now"),
        (3, "quick brown fox quick brown fox"),     # shares, repeated
        (4, "short"),
    ], "doc_id long, text string")
    ev = local_df(spark, [(100, "a quick brown fox appears")],
                  "doc_id long, text string")
    flagged = {r["doc_id"]: r["n_overlapping"]
               for r in cross_ngram_overlap(train, ev, n=3).collect()}
    assert set(flagged) == {1, 3}
    assert flagged[1] == 1 and flagged[3] == 1  # distinct shingles, not occurrences
    kept = sorted(r["doc_id"] for r in decontaminate(train, ev, n=3).collect())
    assert kept == [2, 4]


def test_stratified_sample_deterministic_and_proportional(spark):
    """Domain-mixing sample: per-source keep fraction tracks the rate,
    the same rows are kept regardless of partitioning (hash of (salt,
    id), not of placement), and a different salt draws a different
    sample."""
    from dp_search_data_importer_spark.operators.textstats import (
        stratified_sample,
    )

    from pyspark.sql import functions as F

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("source"))
    rates = {"s0": 0.8, "s1": 0.2}
    got = stratified_sample(df, rates, key_col="source").collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert abs(len(by_src["s0"]) / 2000 - 0.8) < 0.05
    assert abs(len(by_src["s1"]) / 2000 - 0.2) < 0.05
    # partition-invariant: identical keep set at a different parallelism
    again = stratified_sample(df.repartition(13), rates,
                              key_col="source").collect()
    assert {(r["doc_id"]) for r in again} == {r["doc_id"] for r in got}
    # a different salt draws an independent sample
    other = stratified_sample(df, rates, key_col="source",
                              salt="mix2").collect()
    assert {r["doc_id"] for r in other} != {r["doc_id"] for r in got}


def test_duplicate_spans_and_keep_pass(spark):
    """Substring dedup: shared runs produce merged maximal spans; the
    keep-pass removes exactly the span tokens and leaves clean docs
    verbatim (token-wise)."""
    from dp_search_data_importer_spark.operators.dedup import (
        duplicate_spans,
        strip_duplicate_spans,
    )
    from dp_search_data_importer_spark.session import local_df

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = local_df(spark, [
        (1, shared + " unique one two"),
        (2, "intro words " + shared + " tail"),
        (3, "totally different content with no overlap at all here now"),
        (4, "short doc"),
    ], "doc_id long, text string")
    spans = duplicate_spans(docs, n=8).collect()
    got = {(r["doc_id"], r["start_pos"], r["end_pos"]) for r in spans}
    # the 10-token shared run: three overlapping 8-gram shingles merge
    # into ONE maximal span per doc
    assert got == {(1, 0, 10), (2, 2, 12)}
    assert all(r["n_tokens"] == r["end_pos"] - r["start_pos"]
               for r in spans)

    stripped = {r["doc_id"]: r["text_stripped"]
                for r in strip_duplicate_spans(
                    docs, duplicate_spans(docs, n=8)).collect()}
    assert stripped[1] == "unique one two"
    assert stripped[2] == "intro words tail"
    # clean docs: token stream unchanged
    assert stripped[3].split() == (
        "totally different content with no overlap at all here now".split())
    assert stripped[4] == "short doc"


def test_duplicate_spans_min_docs_gate(spark):
    """A run present in only one doc is never a duplicate span; raising
    min_docs drops spans shared by fewer docs."""
    from dp_search_data_importer_spark.operators.dedup import duplicate_spans
    from dp_search_data_importer_spark.session import local_df

    run = "one two three four five six seven eight nine ten"
    docs = local_df(spark, [
        (1, run + " solo suffix text here"),
        (2, run + " other ending entirely"),
        (3, "nothing shared in this one at all beyond chance words"),
    ], "doc_id long, text string")
    assert duplicate_spans(docs, n=8, min_docs=3).count() == 0
    assert duplicate_spans(docs, n=8, min_docs=2).count() == 2
