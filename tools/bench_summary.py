#!/usr/bin/env python
"""Collect BENCH_<mode>_r<N>.json sidecars into one markdown table.

Usage: python tools/bench_summary.py [round]   (default: 5)
Writes BENCH_SUMMARY_r<N>.md at the repo root and prints it.
No jax imports — safe to run anywhere, any time.
"""

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(rnd: int) -> str:
    rows = []
    for path in sorted(glob.glob(os.path.join(ROOT, f"BENCH_*_r{rnd}.json"))):
        m = re.match(rf"BENCH_(.+)_r{rnd}\.json", os.path.basename(path))
        if not m:
            continue
        with open(path) as f:
            rec = json.load(f)
        rows.append((m.group(1), rec))
    lines = [
        f"# Round-{rnd} measured benchmark lines",
        "",
        "One row per `BENCH_MODE` engine; every number reproducible via",
        f"`tools/r{rnd}_measure.sh` (full log: `tools/r{rnd}_measure.log`).",
        "All timings slope-timed (`ipmzoo_tpu/utils/timing.py`).",
        "",
        "| mode | value | unit | vs baseline | metric |",
        "|---|---|---|---|---|",
    ]
    for name, rec in rows:
        lines.append(
            f"| `{name}` | {rec['value']:,} | {rec['unit']} | "
            f"{rec['vs_baseline']:,}x | {rec['metric']} |")
    out = "\n".join(lines) + "\n"
    dest = os.path.join(ROOT, f"BENCH_SUMMARY_r{rnd}.md")
    with open(dest, "w") as f:
        f.write(out)
    return out


if __name__ == "__main__":
    print(main(int(sys.argv[1]) if len(sys.argv) > 1 else 5))
