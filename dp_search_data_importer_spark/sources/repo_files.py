"""Deterministic synthetic ``repo_files`` corpus (FIXTURES.md §1).

Spark-native re-imagining of the reference's interactive test-event producer
(A12, ``/root/reference/cmd/producer/main.go:25-80``): instead of stdin →
Avro → Kafka, we generate the engine's input table
``(repo, path, commit, lang, content)`` distributively and deterministically —
``spark.range(n)`` partitions the id space, and every value is a pure function
of ``(seed, id)``, so the same call yields byte-identical corpora at any
parallelism (required for the resume/scaling benches).

Vocabulary is Zipf-distributed so ``import``/``def`` are genuinely hot terms
(north_star skew requirement); identifiers mix camelCase and snake_case so the
code-aware tokenizer has real work to do.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ("py", "go", "js", "java", "rs")
_EXT = {"py": "py", "go": "go", "js": "js", "java": "java", "rs": "rs"}

_KEYWORDS = ["import", "def", "class", "return", "self", "func", "var", "let",
             "const", "public", "static", "void", "fn", "struct", "impl"]

_SYLLABLES = ["get", "set", "user", "name", "data", "index", "query", "parse",
              "build", "merge", "sort", "scan", "batch", "stream", "token",
              "score", "doc", "term", "shard", "block", "count", "hash",
              "read", "write", "load", "store", "map", "filter", "join",
              "agg", "row", "col", "key", "val", "buf", "ctx", "cfg", "util"]


def _make_vocab(seed: int, size: int = 5000) -> tuple[list[str], np.ndarray]:
    """(vocab, cumulative Zipf weights). Deterministic in ``seed``."""
    rng = random.Random(seed)
    vocab: list[str] = list(_KEYWORDS)
    seen = set(vocab)
    while len(vocab) < size:
        parts = [rng.choice(_SYLLABLES) for _ in range(rng.randint(1, 3))]
        if rng.random() < 0.5:  # camelCase
            w = parts[0] + "".join(p.capitalize() for p in parts[1:])
        else:  # snake_case
            w = "_".join(parts)
        w = f"{w}{rng.randint(0, 999)}" if rng.random() < 0.3 else w
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    weights = 1.0 / ranks  # Zipf s=1: rank-1 terms (import, def) dominate
    cum = np.cumsum(weights / weights.sum())
    return vocab, cum


def _gen_batches(
    batches: Iterator[pd.DataFrame], seed: int, min_words: int,
    max_words: int, bursty: bool = False,
) -> Iterator[pd.DataFrame]:
    import hashlib

    vocab, cum = _make_vocab(seed)
    vocab_arr = np.array(vocab, dtype=object)
    for pdf in batches:
        ids = pdf["id"].to_numpy()
        repos, paths, commits, langs, contents = [], [], [], [], []
        for i in ids:
            i = int(i)
            rng = np.random.default_rng(seed * 1_000_003 + i)
            lang = LANGS[i % len(LANGS)]
            repo = f"org{i % 7}/project{i % 41}"
            path = f"src/pkg{i % 13}/module_{i % 97}.{_EXT[lang]}"
            commit = hashlib.sha1(f"{repo}|{path}|{i}".encode()).hexdigest()
            if bursty:
                # heavy-tail doc lengths (lognormal, clipped to the range):
                # most docs short, a fat tail of huge ones — realistic web
                # corpora, and exactly the dl variance that gives BM25
                # block-max bounds discrimination headroom
                span = max_words - min_words
                n_words = min_words + int(min(
                    span, rng.lognormal(mean=np.log(max(span, 2) / 12.0),
                                        sigma=1.1)))
            else:
                n_words = min_words + int(
                    rng.integers(0, max_words - min_words + 1))
            words = vocab_arr[np.searchsorted(cum, rng.random(n_words))]
            if bursty and n_words > 8:
                # term burstiness (Church/Gale): a few content terms repeat
                # far above their corpus rate in the docs they occur in —
                # the tf variance that makes per-block max impacts differ
                # sharply between blocks (low-variance tf was why WAND's
                # win was modest in round 2; BENCH/ANALYSIS.md)
                n_burst = int(rng.integers(1, 4))
                for _ in range(n_burst):
                    t = vocab_arr[int(rng.integers(20, len(vocab_arr)))]
                    reps = int(rng.integers(5, 60))
                    pos = rng.integers(0, n_words, size=reps)
                    words[pos] = t
            # line structure: a keyword-led statement every ~8 words.
            # Chunked slice-joins, byte-identical to the original per-word
            # append loop (A/B-verified over 3000 docs) at ~3× less Python
            # time — this generator runs inside every scan of the corpus
            # frame, so its per-word Python cost is on the build's critical
            # path (guide §4.2: do bulk work in C, not row-at-a-time).
            wl = words.tolist()
            lines = [" ".join(wl[j:j + 8]) for j in range(0, len(wl), 8)]
            repos.append(repo)
            paths.append(path)
            commits.append(commit)
            langs.append(lang)
            contents.append("\n".join(lines))
        yield pd.DataFrame(
            {"repo": repos, "path": paths, "commit": commits,
             "lang": langs, "content": contents}
        )


REPO_FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"


def synthetic_repo_files(
    spark: SparkSession,
    n_docs: int = 1000,
    seed: int = 42,
    min_words: int = 120,
    max_words: int = 2400,
    num_partitions: int | None = None,
    bursty: bool = False,
) -> DataFrame:
    """Deterministic corpus with the BASELINE.json ``input_hint`` shape.

    Values depend only on ``(seed, row id)`` — partitioning-invariant, so
    local[8] and local[32] runs index the identical corpus.

    ``bursty=True`` (round 3) switches to heavy-tail doc lengths
    (lognormal) and bursty within-doc term repetition — the high-variance
    tf/dl regime where block-max bounds actually discriminate (the uniform
    default yields low tf variance, which caps WAND's pruning headroom;
    measured in BENCH/ANALYSIS.md).
    """
    base = spark.range(0, n_docs, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return base.mapInPandas(
        lambda it: _gen_batches(it, seed, min_words, max_words,
                                bursty=bursty),
        schema=REPO_FILES_SCHEMA,
    )
