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
