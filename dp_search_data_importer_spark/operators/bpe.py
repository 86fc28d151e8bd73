"""Byte-pair-encoding vocabulary induction + application — the
tokenizer-training half of a pretraining data pipeline.

Sennrich, Haddow & Birch 2016 ("Neural Machine Translation of Rare Words
with Subword Units"): repeatedly merge the most frequent adjacent symbol
pair. The classical trainer operates on the WORD-FREQUENCY dictionary,
not the running text — which is exactly what makes it distributable at
100 TB: the corpus-sized work is ONE explode + ONE hash aggregation
(word counts, map-side partials), and the merge loop runs driver-side
over a deterministically capped dictionary (``max_words`` most frequent
types — standard practice: GPT-2's BPE was trained on a capped/sampled
dictionary too, and the tail of a Zipf distribution moves pair counts by
O(1)). Driver memory is bounded by ``max_words``, never by data size.

Application (:func:`apply_bpe`) is an Arrow-batched pass with per-batch
word memoization — the same word never re-segments twice in a batch,
and code/text corpora repeat words heavily (Zipf again), so the
per-row python cost amortizes to a dict lookup.

Everything is deterministic: the dictionary cap and every merge choice
tie-break on (count desc, pair lexicographic), so two runs — or two
cluster sizes — produce byte-identical vocabularies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dp_search_data_importer_spark.functions.tokenize import tokenize_expr

END = "</w>"  # end-of-word marker (Sennrich §3.2): merges can't cross words


def word_frequencies(docs: DataFrame, *, text_col: str = "text",
                     max_words: int = 100_000) -> DataFrame:
    """(word, freq) for the ``max_words`` most frequent word types —
    deterministic cap via (freq desc, word asc) TakeOrdered
    (``orderBy().limit()``), never a constant-key window. This is the
    only corpus-sized stage of BPE training."""
    return (docs.select(F.explode(tokenize_expr(F.col(text_col)))
                        .alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("word").asc())
            .limit(int(max_words)))


def train_bpe(word_freqs: DataFrame, n_merges: int,
              *, min_pair_freq: int = 2) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from a (word, freq) frame. The
    frame is collected (bounded by the :func:`word_frequencies` cap);
    the loop is the textbook trainer: count adjacent symbol pairs
    weighted by word frequency, merge the (count desc, pair asc) winner,
    stop early when no pair reaches ``min_pair_freq``. Returns the
    ordered merge list — order IS the vocabulary (application replays
    merges by rank)."""
    rows = word_freqs.collect()
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r["word"]) + (END,)
        vocab[sym] = vocab.get(sym, 0) + int(r["freq"])

    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pairs: dict[tuple[str, str], int] = {}
        for sym, freq in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < int(min_pair_freq):
            break
        (a, b), _cnt = best
        merges.append((a, b))
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word by replaying merges in rank order (the GPT-2
    ``bpe()`` algorithm shape): repeatedly apply the lowest-ranked
    applicable merge until none applies."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def apply_bpe(docs: DataFrame, merges: list[tuple[str, str]], *,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, tokens array<string>, n_tokens) — the corpus tokenized
    with the learned vocabulary. Arrow-batched ``mapInPandas`` with a
    per-batch word→segmentation memo (Zipf makes this a dict lookup for
    almost every occurrence); the merge table broadcasts as a task
    closure (``n_merges`` entries — KBs)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    words = docs.select(F.col(id_col).alias("doc_id"),
                        tokenize_expr(F.col(text_col)).alias("words"))

    def gen(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col = []
            for ws in pdf["words"]:
                toks: list[str] = []
                for w in ws:
                    seg = memo.get(w)
                    if seg is None:
                        seg = segment_word(w, ranks)
                        memo[w] = seg
                    toks.extend(seg)
                toks_col.append(toks)
            import pandas as pd

            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "tokens": toks_col})

    out = words.mapInPandas(
        gen, schema="doc_id long, tokens array<string>")
    return out.select("doc_id", "tokens",
                      F.size("tokens").cast("long").alias("n_tokens"))
