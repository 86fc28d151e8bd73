"""SimHash near-dup fingerprints (Charikar 2002; used by Manku et al.,
WWW 2007 for web-scale dedup) — pure Catalyst.

Per doc: every term contributes its tf as weight to the 64 bit positions of
its md5-derived hash (+w where the bit is 1, −w where 0); the fingerprint's
bit i is the sign of the accumulated weight. Near-dups differ in few bits.

The whole pipeline is JVM-side (built-in md5 + bit-explode + two hash aggs
with map-side partials, all whole-stage-codegen'd); candidate pairing uses
16-bit band equality (any of 4 bands equal ⇒ hamming distance ≤ 3 guaranteed
found — pigeonhole), a plain Catalyst join on uniform keys.
"""

from __future__ import annotations

import hashlib

import numpy as np
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
    """(doc_id, simhash long) — pure Catalyst, zero Python on the data path.

    Each distinct (doc, term) row is hashed ONCE with the built-in ``md5``
    (JVM-side, whole-stage-codegen'd; a previous kernel called hashlib.md5
    per term inside an Arrow batch loop — per-token Python on the hot path).
    The 64 bit positions explode from the tf table, accumulate ±tf per
    (doc, bit) with map-side partial aggregation, and the fingerprint
    reassembles as Σ 1<<bit over positive accumulators. Docs that tokenize
    to zero terms keep fingerprint 0 (left join back to the doc set).
    ``simhash64_py`` remains as the independent numpy test kernel."""
    from dp_search_data_importer_spark.functions.tokenize import tokenize_expr
    from dp_search_data_importer_spark.operators.textstats import hex16_to_long

    base = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    tf = (
        base.select("doc_id", F.explode(tokenize_expr(F.col("_t"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    hashed = tf.select(
        "doc_id", "tf",
        hex16_to_long(F.substring(F.md5("term"), 1, 16)).alias("hv"),
    )
    bits = hashed.select(
        "doc_id", "tf", "hv",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
    ).select(
        "doc_id", "bit",
        # column-valued shift amounts need the SQL form (the python wrapper
        # only takes int literals)
        F.when(
            F.expr("shiftrightunsigned(hv, bit) & 1") == 1, F.col("tf")
        ).otherwise(-F.col("tf")).alias("w"),
    )
    acc = bits.groupBy("doc_id", "bit").agg(F.sum("w").alias("acc"))
    fp = acc.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("acc") > 0, F.expr("shiftleft(1L, bit)"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
    return (
        base.select("doc_id")
        .join(fp, "doc_id", "left")
        .select("doc_id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
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
