"""BPE vocabulary induction (Sennrich 2016) + application."""

from __future__ import annotations

import pytest

from dp_search_data_importer_spark.operators import bpe


def _wf(spark, pairs):
    return spark.createDataFrame(pairs, "word string, freq long")


def test_train_bpe_textbook_example(spark):
    """The classic low/lower/newest/widest corpus: the first merges must
    pick the (count desc, pair asc) winners deterministically."""
    wf = _wf(spark, [("low", 5), ("lower", 2), ("newest", 6),
                     ("widest", 3)])
    merges = bpe.train_bpe(wf, 4)
    # 'es' occurs 9 (newest 6 + widest 3); 'st' also 9 but ('e','s') <
    # ('s','t') lexicographically; then 'est</w>' chains; 'lo' = 7 next.
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", bpe.END)
    assert merges[3] == ("l", "o")
    # early stop: a tiny dictionary runs out of >=min_pair_freq pairs
    small = bpe.train_bpe(_wf(spark, [("ab", 1)]), 50, min_pair_freq=2)
    assert small == []


def test_segment_and_apply_conserve_characters(spark):
    wf = _wf(spark, [("low", 5), ("lower", 2), ("newest", 6),
                     ("widest", 3)])
    merges = bpe.train_bpe(wf, 6)
    ranks = {p: i for i, p in enumerate(merges)}
    seg = bpe.segment_word("lowest", ranks)
    assert "".join(seg) == "lowest" + bpe.END  # characters conserved
    assert "est" + bpe.END in seg  # learned subword reused on unseen word

    docs = spark.createDataFrame(
        [(1, "low lower"), (2, "newest widest lowest"), (3, "zzz")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in bpe.apply_bpe(docs, merges).collect()}
    assert out[1]["n_tokens"] == len(out[1]["tokens"])
    for did, text in ((1, "low lower"), (2, "newest widest lowest")):
        joined = "".join(out[did]["tokens"]).replace(bpe.END, "")
        assert joined == text.replace(" ", "")
    # unseen-alphabet word falls back to characters
    assert out[3]["tokens"] == ["z", "z", "z", bpe.END]


def test_word_frequencies_cap_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta beta gamma gamma gamma") for i in range(3)],
        "doc_id long, text string")
    top2 = {(r["word"], r["freq"])
            for r in bpe.word_frequencies(docs, max_words=2).collect()}
    assert top2 == {("gamma", 9), ("beta", 6)}
    # equal-frequency ties break on word asc
    tie = spark.createDataFrame([(1, "bb aa")], "doc_id long, text string")
    assert [r["word"] for r in
            bpe.word_frequencies(tie, max_words=1).collect()] == ["aa"]


def test_train_matches_pure_python_reference(spark):
    """Cross-check the trainer against an independent step-by-step
    implementation on a random-ish word-frequency table."""
    pairs = [("".join("abcd"[(i * j) % 4] for j in range(2 + i % 4)),
              1 + (i * 13) % 7) for i in range(20)]
    # dedup words, keep the LAST freq (matches groupBy semantics: unique)
    table = {}
    for w, f in pairs:
        table[w] = table.get(w, 0) + f
    wf = _wf(spark, sorted(table.items()))

    def ref(vocab_in, n):
        vocab = {tuple(w) + (bpe.END,): f for w, f in vocab_in.items()}
        out = []
        for _ in range(n):
            pc = {}
            for sym, fr in vocab.items():
                for p in zip(sym, sym[1:]):
                    pc[p] = pc.get(p, 0) + fr
            if not pc:
                break
            (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if c < 2:
                break
            out.append((a, b))
            nv = {}
            for sym, fr in vocab.items():
                s, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and (sym[i], sym[i + 1]) == (a, b):
                        s.append(a + b)
                        i += 2
                    else:
                        s.append(sym[i])
                        i += 1
                nv[tuple(s)] = nv.get(tuple(s), 0) + fr
            vocab = nv
        return out

    assert bpe.train_bpe(wf, 10) == ref(table, 10)
