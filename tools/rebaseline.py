"""Regenerate BENCH_BASELINE.json from a fresh bench.py run.

Round-7 verdict "What's wrong #4": the committed anchor was per-query
MIN-of-3 while bench.py publishes MEDIAN-of-3, a systematic ~10%
apparent inflation on every comparison. This tool makes the anchor the
SAME statistic bench.py publishes, records that in a machine-readable
methodology field, pretty-prints with a trailing newline (single-line
JSON made per-query diffs unreadable — ADVICE r7), and re-anchors
every query at the current code state (which retires the stale
dedup_semantic 1.92s anchor that predated the chain-chase fix).

Usage: python tools/rebaseline.py [label]
Prints the old-vs-new total ratio so a degraded capture is visible
before committing the file.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "BENCH_BASELINE.json"
    env = dict(os.environ)
    subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        capture_output=True, text=True, env=env, check=True,
    )
    # Round 12: bench.py's stdout line is BUDGETED for the driver's
    # 2000-char capture (truncated `queries`, no `methodology`) — the
    # full per-query maps live in BENCH_DETAIL.json written next to
    # bench.py by the same run. Re-anchoring from the stdout line
    # would silently drop the cheap tail's baselines.
    with open(os.path.join(HERE, "BENCH_DETAIL.json")) as f:
        run = json.load(f)
    path = os.path.join(HERE, "BENCH_BASELINE.json")
    old_total = None
    try:
        with open(path) as f:
            old = json.load(f)
        common = [k for k in run["queries"] if k in old.get("queries", {})]
        if common:
            old_total = sum(old["queries"][k] for k in common)
            new_total = sum(run["queries"][k] for k in common)
            print(f"common {len(common)} queries: old {old_total:.1f}s "
                  f"new {new_total:.1f}s ratio "
                  f"{new_total / old_total:.3f}")
    except (OSError, ValueError):
        pass
    baseline = {
        "label": label,
        "sf": run["sf"],
        "statistic": "per-query median-of-3",
        "methodology": run["methodology"],
        "value": run["value"],
        "value_cold": run.get("value_cold"),
        "queries": run["queries"],
    }
    with open(path, "w") as f:
        json.dump(baseline, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}: {len(run['queries'])} queries, "
          f"total {run['value']}s")


if __name__ == "__main__":
    main()
