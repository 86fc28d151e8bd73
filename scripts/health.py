"""spark-submit entry point: index health probe (A13 ``GET /health`` twin).

    python scripts/health.py --index /path/to/index

Prints the health verdict as one JSON line and exits 0 iff status is OK
(1 for DEGRADED, 2 for CORRUPT) — wire it into whatever serving layer or
orchestrator fronts the index on a cluster.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    args = ap.parse_args()

    from dp_search_data_importer_spark.health import CORRUPT, OK, index_health
    from dp_search_data_importer_spark.session import get_spark

    spark = get_spark(app_name="index-health")
    h = index_health(spark, args.index)
    print(json.dumps(h, sort_keys=True))
    return 0 if h["status"] == OK else (2 if h["status"] == CORRUPT else 1)


if __name__ == "__main__":
    sys.exit(main())
