"""SimHash near-dup fingerprints (Charikar 2002; used by Manku et al.,
WWW 2007 for web-scale dedup) — Arrow-vectorized.

Per doc: every term contributes its tf as weight to the 64 bit positions of
its md5-derived hash (+w where the bit is 1, −w where 0); the fingerprint's
bit i is the sign of the accumulated weight. Near-dups differ in few bits.

Hot path is numpy over Arrow batches (no per-row Python at the Spark
boundary); candidate pairing uses 16-bit band equality (any of 4 bands equal
⇒ hamming distance ≤ 3 guaranteed found — pigeonhole), a plain Catalyst
join on uniform keys.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dp_search_data_importer_spark.functions.tokenize import _simple_tokens_py


def _term_hash64(term: str) -> int:
    return int.from_bytes(hashlib.md5(term.encode()).digest()[:8], "big")


def simhash64_py(text: str) -> int:
    """Pure-Python/numpy reference (also the UDF kernel)."""
    toks = _simple_tokens_py(text or "")
    if not toks:
        return 0
    terms, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    hashes = np.array([_term_hash64(t) for t in terms], dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
    acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    fp = np.uint64(0)
    for i in np.flatnonzero(acc > 0):
        fp |= np.uint64(1) << np.uint64(i)
    return int(fp.astype(np.int64))  # store as signed for Spark LongType


def simhash_fingerprints(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash long) via mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "simhash": pd.Series(
                    [simhash64_py(t) for t in pdf[text_col]], dtype="int64"
                ),
            })

    return df.select(id_col, text_col).mapInPandas(
        gen, schema="doc_id long, simhash long"
    )


def simhash_candidate_pairs(fps: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming, found via 4×16-bit band
    blocking (exact for max_hamming ≤ 3) then verified with bit_count."""
    banded = fps.select(
        "doc_id", "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn(
        "bh", F.expr("shiftrightunsigned(simhash, band * 16) & 65535"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("b.simhash").alias("sh_b"))
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
