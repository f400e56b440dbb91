"""Aggregate device-op time from a jax.profiler trace (xplane.pb) directory.

Usage: python scripts/trace_ops.py /tmp/prof_dir [N]

Prints the top-N HLO ops by total self time (xprof "hlo_stats" tool), plus
a by-category rollup — the quick "where does the step actually go" view used
for the MFU work in docs/PERF.md.
"""

from __future__ import annotations

import csv
import glob
import io
import sys
from collections import defaultdict


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        sys.exit(f"no xplane.pb under {trace_dir}")

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    # gviz DataTable JSON: {"cols":[{"id",...}], "rows":[{"c":[{"v":..},..]}]}
    import json

    table = json.loads(data)
    ids = [c["id"] for c in table["cols"]]
    rows = [
        {ids[i]: (cell or {}).get("v") for i, cell in enumerate(r["c"])}
        for r in table["rows"]
    ]
    if not rows:
        sys.exit("hlo_stats returned no rows")

    def f(row, key):
        try:
            return float(row.get(key, 0) or 0)
        except ValueError:
            return 0.0

    # column names vary slightly across xprof versions — resolve by substring
    cols = rows[0].keys()

    def col(*subs):
        for c in cols:
            lc = c.lower()
            if all(s in lc for s in subs):
                return c
        return None

    c_time = col("total", "self") or col("self", "time") or col("total", "time")
    c_occ = col("occur") or col("count")
    c_name = col("hlo", "op", "name") or col("op", "name") or col("name")
    c_cat = col("category") or col("type")
    if c_time is None or c_name is None:
        sys.exit(f"unrecognized hlo_stats columns: {list(cols)}")

    by_op = defaultdict(lambda: [0.0, 0])
    by_cat = defaultdict(float)
    total = 0.0
    for r in rows:
        t = f(r, c_time)
        name = r.get(c_name, "?")
        # strip trailing .N so repeated instances aggregate
        base = name.rsplit(".", 1)[0] if name.rsplit(".", 1)[-1].isdigit() else name
        by_op[base][0] += t
        by_op[base][1] += int(f(r, c_occ)) if c_occ else 1
        if c_cat:
            by_cat[r.get(c_cat, "?")] += t
        total += t

    print(f"total device self-time: {total/1e3:.1f} ms  ({len(rows)} op rows)")
    if by_cat:
        print("\nby category:")
        for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1])[:15]:
            print(f"  {t/1e3:9.2f} ms  {100*t/total:5.1f}%  {cat}")
    print(f"\ntop {top_n} ops:")
    for name, (t, n) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:top_n]:
        print(f"  {t/1e3:9.2f} ms  {100*t/total:5.1f}%  x{n:5d}  {name[:90]}")


if __name__ == "__main__":
    main()
