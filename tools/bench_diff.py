#!/usr/bin/env python3
"""Compare two bench JSON lines per query (driver-side tooling).

Usage:
  python3 tools/bench_diff.py BENCH_r03.json BENCH_r04.json [threshold]

Prints per-query ratios (new/old) sorted worst-first, flagging queries
above the threshold (default 1.5x). Queries present in only one file
are listed separately. With median-of-3 benches (round 4+), a flagged
ratio is a real regression candidate, not host noise.
"""
import json
import sys


def load(path):
    """Accepts a raw Bench line, a log containing one, or the driver's
    wrapper JSON whose 'tail' holds a (possibly truncated) suffix of
    the line — per-query pairs are recovered by regex in that case."""
    import re
    with open(path) as f:
        text = f.read()
    if '{"metric"' in text:
        start = text.index('{"metric"')
        line = text[start:]
        if "\n" in line:
            line = line[:line.index("\n")]
        return json.loads(line)
    wrapper = json.loads(text)
    tail = wrapper.get("tail", "")
    queries = {m.group(1): float(m.group(2)) for m in
               re.finditer(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)', tail)}
    for k in ("metric", "value", "unit", "reps", "errors", "sf"):
        queries.pop(k, None)
    return {"queries": queries, "value": sum(queries.values())}


def main(old_path, new_path, threshold=1.5):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq),
                    key=lambda k: -(nq[k] / oq[k] if oq[k] > 0 else 0))
    flagged = 0
    print(f"{'query':30s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for k in common:
        ratio = nq[k] / oq[k] if oq[k] > 0 else float("inf")
        mark = "  <-- REGRESSION" if ratio >= threshold else ""
        if mark:
            flagged += 1
        if mark or ratio <= 1 / threshold:
            print(f"{k:30s} {oq[k]:8.2f} {nq[k]:8.2f} {ratio:7.2f}{mark}")
    print(f"\ncommon totals: old {sum(oq[k] for k in common):.1f}s"
          f" new {sum(nq[k] for k in common):.1f}s over {len(common)} queries")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): " + ", ".join(
            f"{k}={nq[k]:.2f}s" for k in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    print(f"{flagged} queries at or above {threshold}x")
    return 1 if flagged else 0


if __name__ == "__main__":
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], threshold))
