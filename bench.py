#!/usr/bin/env python
"""Driver benchmark: one JSON line with the headline metric.

Headline: SIFT-small INT8 batched brute-force throughput (batch=32, k=5),
the reference's flagship config — Snapdragon 8 Gen 2 HTP achieved 5208 QPS
at 100% recall (reference README.md:143, BASELINE.md).  ``vs_baseline`` is
our QPS / 5208.
"""

import json
import sys

REFERENCE_QPS = 5208.0  # reference README.md:143 (batch=32 INT8 brute force)


def main() -> None:
    from rag_on_edge_tpu.harness.bench_bruteforce import run

    r = run(
        dataset="siftsmall",
        batch=32,
        k=5,
        dtype="int8",
        repeats=50,
        outdir=None,
        quiet=True,
    )
    print(
        json.dumps(
            {
                "metric": "siftsmall_int8_bruteforce_qps_b32",
                "value": round(r["qps"], 1),
                "unit": "QPS",
                "vs_baseline": round(r["qps"] / REFERENCE_QPS, 3),
                "recall_at_5": round(r["recall"], 4),
                "batch_latency_ms_p50": round(r["latency"].p50, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
