"""Collect TPU-run logs (one JSON line each) into a markdown summary.

The hardware queue (/tmp/tpu_runner*.sh during builds, or any directory
of bench logs) leaves one log per leg; each bench prints a single JSON
line. This tool tails every *.log, extracts the last JSON object, and
prints a table — the source for README's performance section.

Usage: python benches/collect_results.py [logdir]   (default /tmp/tpu_runs)
"""

from __future__ import annotations

import glob
import json
import os
import sys


def last_json(path: str):
    try:
        with open(path, "r", errors="ignore") as f:
            lines = f.read().splitlines()
    except OSError:
        return None
    for ln in reversed(lines):
        ln = ln.strip()
        if ln.startswith("{") and ln.endswith("}"):
            try:
                return json.loads(ln)
            except json.JSONDecodeError:
                continue
    return None


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_runs"
    rows = []
    for path in sorted(glob.glob(os.path.join(d, "*.log"))):
        res = last_json(path)
        name = os.path.basename(path)[:-4]
        if res is None:
            rows.append((name, "(no JSON result — see log)", "", ""))
            continue
        metric = res.get("metric", "?")
        val = res.get("value", "")
        unit = res.get("unit", "")
        extra = {k: v for k, v in res.items()
                 if k not in ("metric", "value", "unit")
                 and isinstance(v, (int, float))}
        extras = ", ".join(f"{k}={v}" for k, v in sorted(extra.items()))
        rows.append((name, metric, f"{val} {unit}".strip(), extras))

    if not rows:
        print(f"no logs in {d}")
        return
    w = max(len(r[0]) for r in rows)
    print(f"| {'leg'.ljust(w)} | metric | value | details |")
    print(f"|{'-' * (w + 2)}|---|---|---|")
    for name, metric, val, extras in rows:
        print(f"| {name.ljust(w)} | {metric} | {val} | {extras} |")


if __name__ == "__main__":
    main()
