"""One-shot wall-time sweep over registered query keys (ranking only).

Times ONE noop-sink materialization per key at $SPARK_GRAFT_SF_DIR —
numbers include planning and are session-order-contaminated, so they are
for RANKING the slow tail (guide §1: find where the time goes), never for
before/after claims; every change gets a controlled same-session A/B
(scripts/ab_bench.py) before it lands.

Usage:
    cd /tmp && python /root/repo/scripts/sweep_time.py OUT.json [KEY ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from recommendersystems_bigdata_spark import registry  # noqa: E402
from recommendersystems_bigdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    if not keys:
        keys = sorted(registry.QUERIES)
    spark = get_spark(app_name="sweep_time")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    for i, key in enumerate(keys):
        spark.sparkContext.setJobDescription(f"sweep:{key}")
        t0 = time.perf_counter()
        try:
            registry.QUERIES[key](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[key] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            times[key] = -1.0
            print(f"ERR {key}: {ex}", file=sys.stderr)
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{len(keys)}", file=sys.stderr)
            with open(out_path, "w", encoding="utf-8") as fh:
                json.dump(times, fh, indent=0, sort_keys=True)
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(times, fh, indent=0, sort_keys=True)
    for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v:8.2f}  {k}")
    spark.stop()


if __name__ == "__main__":
    main()
