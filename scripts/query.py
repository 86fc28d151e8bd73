"""spark-submit entry point: top-k BM25 queries over a built index.

    spark-submit --py-files dp_search_data_importer_spark.zip \
        scripts/query.py --index /path/to/index --k 10 \
        --query "import def" --query "getUserName parse"

``--path exact`` runs the Catalyst oracle scorer; default is block-max WAND
(rank-identical, faster).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--path", default="wand", choices=["wand", "exact"])
    args = ap.parse_args()

    from dp_search_data_importer_spark.config import EngineConfig
    from dp_search_data_importer_spark.plans import query as qp
    from dp_search_data_importer_spark.session import get_spark, local_df

    spark = get_spark(app_name="bm25-query")
    queries = local_df(
        spark, list(enumerate(args.query, 1)), "query_id long, query_text string"
    )
    cfg = EngineConfig()
    fn = qp.wand_topk if args.path == "wand" else qp.exact_topk
    res = fn(spark, args.index, queries, cfg, args.k)
    out = qp.resolve_docs(spark, args.index, res)
    for r in out.orderBy("query_id", out.score.desc()).collect():
        print(f"q{r.query_id}\t{r.score:10.4f}\t{r.repo}/{r.path}@{r.commit[:8]}")


if __name__ == "__main__":
    main()
