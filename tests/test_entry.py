"""Driver-contract smoke: entry() + every query runs and returns rows."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_all_queries_have_rows_at_sf0001(spark):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() > 0, name


def test_oracle_keys_subset_of_queries():
    qs = set(entry_mod.queries())
    os_ = set(entry_mod.oracle_sql())
    assert os_ <= qs


def test_registry_rotation_puts_stalest_first():
    """The driver's gate checks a fixed-size registry prefix; the registry
    must therefore order least-recently-driver-checked queries first so
    every query cycles through the hard check (round-4 hole: the 14 tail
    entries never got a driver row)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for k in json.load(open(path)):
            last[k] = max(last.get(k, -1), rnd)
    if not last:  # no history committed — nothing to assert
        return
    keys = list(entry_mod.queries())
    ranks = [last.get(k, -1) for k in keys]
    assert ranks == sorted(ranks), (
        "registry not ordered stalest-first: " + repr(list(zip(keys, ranks)))
    )
    # oracle dict must share the ordering (the driver zips the prefixes)
    osk = [k for k in keys if k in entry_mod.oracle_sql()]
    assert list(entry_mod.oracle_sql()) == osk


def test_full_pipeline_curate_dedup_index_search(spark, tmp_path):
    """The switch-from-the-reference narrative end-to-end: raw docs →
    fused curation screens → exact+near dedup → positional index build →
    BM25 / phrase / filtered search — every stage an operator from this
    engine, composing on one SparkSession."""
    from pyspark.sql import functions as F

    from dp_search_data_importer_spark.config import EngineConfig
    from dp_search_data_importer_spark.operators.dedup import (
        dedup_exact,
        dedup_near,
    )
    from dp_search_data_importer_spark.operators.phrase import phrase_topk
    from dp_search_data_importer_spark.operators.textstats import (
        curation_verdicts,
    )
    from dp_search_data_importer_spark.plans import query as q
    from dp_search_data_importer_spark.plans.build_index import build_index
    from dp_search_data_importer_spark.session import local_df
    from dp_search_data_importer_spark.sources.repo_files import (
        synthetic_repo_files,
    )

    cfg = EngineConfig(n_shards=4, block_size=32)
    src = synthetic_repo_files(spark, n_docs=120, seed=7)
    from dp_search_data_importer_spark.operators.ingest import (
        normalize_repo_files,
    )

    docs = normalize_repo_files(src)

    # curation: the synthetic corpus is code-ish; screen on quality +
    # repetition only (language gate off via a permissive keep set)
    v = curation_verdicts(docs, text_col="content",
                          keep_langs=("en", "und"), min_quality=0.3)
    keep = v.filter(F.col("keep") == 1).select("doc_id")
    kept = docs.join(keep, "doc_id", "left_semi")
    n0, n1 = docs.count(), kept.count()
    assert 0 < n1 <= n0

    kept = dedup_exact(kept, text_col="content")
    kept = dedup_near(kept, text_col="content", threshold=0.9)
    assert kept.count() > 0

    out = str(tmp_path / "pipeline_idx")
    stats = build_index(spark, kept, out, cfg, already_normalized=True,
                        waves=1, positions=True)
    assert stats["n_docs"] == kept.count()

    queries = local_df(spark, [(1, "import def")],
                       "query_id long, query_text string")
    hits = q.exact_topk(spark, out, queries, cfg, 10).collect()
    assert len(hits) > 0
    w = q.wand_topk(spark, out, queries, cfg, 10).collect()
    assert {(r["doc_id"], r["score"]) for r in w} == \
        {(r["doc_id"], r["score"]) for r in hits}
    ph = phrase_topk(spark, out, [(1, "import def")], cfg, 10).collect()
    assert len(ph) > 0  # positional index answers phrases from blocks
    # filter on the most frequent language actually present in the index
    # (curation may have thinned any single language arbitrarily)
    top_lang = (spark.read.parquet(f"{out}/docs").groupBy("lang").count()
                .orderBy(F.desc("count")).first()["lang"])
    flt = q.filtered_topk(spark, out, queries, F.col("lang") == top_lang,
                          cfg, 10).collect()
    lang_ids = {r["doc_id"] for r in
                spark.read.parquet(f"{out}/docs")
                .filter(F.col("lang") == top_lang).collect()}
    assert flt and {r["doc_id"] for r in flt} <= lang_ids
