"""Round-over-round bench regression diff.

Compares two bench.py JSON outputs (per-query seconds) and flags
regressions beyond a noise threshold, so "which queries regressed"
is answered mechanically each round instead of by eyeballing totals.

Usage:
    python bench.py > /tmp/bench_now.json
    python tools/bench_diff.py BENCH_r01.json /tmp/bench_now.json
    python tools/bench_diff.py BENCH_r01.json /tmp/bench_now.json --ratio 1.3
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accepts either bench.py's raw JSON line or the driver's
    BENCH_r{N}.json wrapper (bench line embedded in a "tail" field)."""
    with open(path) as f:
        text = f.read()
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        obj = None
    if isinstance(obj, dict) and "queries" in obj:
        return obj
    if isinstance(obj, dict) and "tail" in obj:
        text = obj["tail"]
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON line found in {path}")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ratio = 1.3
    if "--ratio" in sys.argv:
        ratio = float(sys.argv[sys.argv.index("--ratio") + 1])
        args = [a for a in args if a != str(ratio)]
    if len(args) != 2:
        print(__doc__)
        return 2
    prev, cur = load(args[0]), load(args[1])
    pq, cq = prev.get("queries", {}), cur.get("queries", {})
    regressions, improvements = [], []
    for name in sorted(set(pq) & set(cq)):
        a, b = pq[name], cq[name]
        if a <= 0:
            continue
        r = b / a
        if r >= ratio and b - a > 0.2:  # ignore sub-noise absolute deltas
            regressions.append((name, a, b, r))
        elif r <= 1 / ratio and a - b > 0.2:
            improvements.append((name, a, b, r))
    print(f"total: {prev.get('value')}s -> {cur.get('value')}s "
          f"({cur.get('value', 0) / max(prev.get('value', 1), 1e-9):.2f}x)")
    print(f"queries compared: {len(set(pq) & set(cq))} "
          f"(new: {sorted(set(cq) - set(pq))}, dropped: {sorted(set(pq) - set(cq))})")
    if regressions:
        print(f"\nREGRESSIONS (>= {ratio:.2f}x and > 0.2s):")
        for name, a, b, r in sorted(regressions, key=lambda t: -t[3]):
            print(f"  {name}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    else:
        print(f"\nno regressions >= {ratio:.2f}x")
    if improvements:
        print(f"\nimprovements (<= {1/ratio:.2f}x):")
        for name, a, b, r in sorted(improvements, key=lambda t: t[3]):
            print(f"  {name}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
