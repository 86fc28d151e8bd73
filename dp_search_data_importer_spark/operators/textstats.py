"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting — the per-doc curation stages of a training-data
pipeline. All pure Catalyst expressions (whole-stage codegen; zero Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dp_search_data_importer_spark.config import ENGLISH_STOPWORDS
from dp_search_data_importer_spark.functions.tokenize import tokenize_expr

# tiny deterministic marker-word profiles (n-gram-free heuristic langid;
# real profiles would be fastText/CLD3 — out of scope, but the operator
# shape, join-free argmax over marker hits, is the real thing)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "as"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es": ("el", "la", "los", "las", "es", "y", "en", "que", "por", "con"),
    "fr": ("le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"),
}


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))


def langid_expr(text: Column) -> Column:
    """Best-scoring language by marker hits; 'und' when nothing matches.
    Deterministic tie-break: language order as declared."""
    toks = tokenize_expr(text)
    # argmax as nested CASE; earlier-declared languages win ties
    score_cols = [(lang, _hits(toks, ws)) for lang, ws in LANG_MARKERS.items()]
    m = F.greatest(*[s for _, s in score_cols])
    out = F.lit("und")
    for lang, s in reversed(score_cols):
        out = F.when((s == m) & (m > 0), F.lit(lang)).otherwise(out)
    return out


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col).alias("doc_id"),
                     langid_expr(F.col(text_col)).alias("lang_guess"))


def token_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens, analyzer tokens, and BPE-ish subword count
    (alpha runs + digit runs + other marks, the classic pre-tokenizer
    regex) — all via regexp_count / split, JVM-side."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(F.split(t, r"\s+"), lambda x: x != F.lit("")))
        .cast("long").alias("ws_tokens"),
        F.size(tokenize_expr(t)).cast("long").alias("analyzer_tokens"),
        F.regexp_count(F.lower(t), F.lit("[a-z]+|[0-9]+"))
        .cast("long").alias("bpeish_tokens"),
    )


def quality_scores(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Heuristic doc-quality features + a composite score in [0, 1]:
    length band, stopword ratio band, mean token length band — the
    C4/Gopher-style rule family, expressed as one Catalyst projection."""
    toks = tokenize_expr(F.col(text_col))
    sw = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOPWORDS)])
    n = F.size(toks)
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    mean_len = F.when(
        n > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, n_sw.cast("double") / n).otherwise(F.lit(0.0))
    score = (
        F.when((n >= 20) & (n <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_len >= 2.0) & (mean_len <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.6), F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


def doc_fingerprints(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Content-defined fingerprint: md5 over the sorted distinct term set —
    invariant to token order/duplication (bag-of-words identity), plus the
    exact md5. Both engine- and SQL-expressible for the oracle."""
    toks = tokenize_expr(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("exact_md5"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
        .alias("termset_md5"),
    )


def winnowing_py(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Pure-numpy winnowing kernel (also the test reference): k-gram hashes
    (md5-derived, deterministic cross-platform), sliding-window min, distinct."""
    import hashlib

    import numpy as np

    from dp_search_data_importer_spark.functions.tokenize import _simple_tokens_py

    toks = _simple_tokens_py(text or "")
    if len(toks) < k:
        return []
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    h = np.array(
        [int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big") for g in grams],
        dtype=np.uint64,
    )
    if len(h) < window:
        mins = np.array([h.min()], dtype=np.uint64)
    else:
        sw = np.lib.stride_tricks.sliding_window_view(h, window)
        mins = sw.min(axis=1)
    return sorted({int(x.astype(np.int64)) for x in mins})


def winnowing_fingerprints(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 5,
                           window: int = 4) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003): k-gram rolling
    hashes, min per sliding window of w, distinct mins = the doc's
    fingerprint set. Arrow mapInPandas + numpy sliding_window_view (the
    equivalent nested higher-order Catalyst expression falls off the codegen
    fast path — measured 400 ms/row interpreted vs ~0.2 ms/row here).
    Returns exploded (doc_id, fp) rows for fingerprint-level joins."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                mins = winnowing_py(text, k, window)
                ids.extend([doc_id] * len(mins))
                fps.extend(mins)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "fp": pd.Series(fps, dtype="int64"),
            })

    return df.select(id_col, text_col).mapInPandas(
        gen, schema="doc_id long, fp long"
    )
