"""Ingest / normalize (SURVEY.md §2 A3-A6).

Reference behavior carried over:
- A4 non-empty-key filter — the reference drops events with empty ``uid``
  (``/root/reference/handler/handler.go:80-83``, "no uid … no transformation
  possible"). Generalized: drop rows with null/empty key parts
  ``(repo, path, commit)``.
- Keyed identity — the reference keys ES docs by ``uid``
  (``handler/handler.go:146``); ours is ``doc_id = xxhash64(repo,path,commit)``.
- Per-row invariant (input_hint): ``content_sha256 = sha256(content)`` —
  built-in ``F.sha2``, no UDF.

Everything here is a pure Catalyst projection+filter: it fuses into the scan
stage under whole-stage codegen and pushes the non-null filters to parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_COLS = ("repo", "path", "commit")


def normalize_repo_files(df: DataFrame) -> DataFrame:
    """repo_files → docs: keyed, hashed, filtered; content retained."""
    cond = None
    for c in KEY_COLS:
        this = F.col(c).isNotNull() & (F.col(c) != "")
        cond = this if cond is None else (cond & this)
    return (
        df.filter(cond)
        .withColumn("doc_id", F.xxhash64(*[F.col(c) for c in KEY_COLS]))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
    )


def doc_id_collisions(docs: DataFrame) -> DataFrame:
    """doc_ids claimed by more than one distinct natural key.

    ``doc_id = xxhash64(repo, path, commit)`` is 64-bit; at the 10^12-doc
    design point birthday collisions are expected (~n²/2⁶⁵ pairs) and would
    silently merge distinct documents' postings and dedup groups. The
    reference keys by the raw uid string (no lossy hash), so it cannot
    collide — this check restores that guarantee at build time. Returns the
    offending (doc_id, n_keys) rows; empty ⇒ safe."""
    return (
        docs.groupBy("doc_id")
        .agg(F.count_distinct(*[F.col(c) for c in KEY_COLS]).alias("n_keys"))
        .filter(F.col("n_keys") > 1)
    )


def assert_no_doc_id_collisions(docs: DataFrame) -> None:
    """Fail the build loudly on any 64-bit doc_id collision (the scale-path
    alternative is widening to 128 bits via a second hash column)."""
    hits = doc_id_collisions(docs).limit(5).collect()
    if hits:
        raise ValueError(
            f"doc_id collisions detected (first {len(hits)}): "
            + ", ".join(str(r["doc_id"]) for r in hits)
            + " — widen the key (two-hash 128-bit) or re-salt"
        )


def verify_sha_invariant(source: DataFrame, docs: DataFrame) -> int:
    """Count rows whose ``sha256(content)`` differs between source and docs —
    must be 0 (input_hint per-row invariant). Join on the natural key."""
    s = source.select(*KEY_COLS, F.sha2("content", 256).alias("src_sha"))
    d = docs.select(*KEY_COLS, "content_sha256")
    return (
        s.join(d, on=list(KEY_COLS), how="inner")
        .filter(F.col("src_sha") != F.col("content_sha256"))
        .count()
    )
