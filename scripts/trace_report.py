"""Summarize a jax.profiler trace: top HLO ops by self time.

Usage: python scripts/trace_report.py /tmp/trace1 [--top 40] [--tool hlo_stats]

Finds the newest *.xplane.pb under the trace dir and renders the requested
tensorboard_plugin_profile tool table (default hlo_stats) as text.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--tool", default="hlo_stats")
    args = p.parse_args()

    paths = sorted(glob.glob(os.path.join(
        args.trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        sys.exit(f"no xplane.pb under {args.trace_dir}")
    xplane = paths[-1]
    print(f"# {xplane}", file=sys.stderr)

    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], args.tool, {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    try:
        parsed = json.loads(data)
    except Exception:
        print(data[:20000])
        return

    # hlo_stats JSON: list with one gviz-style table {cols, rows}.
    table = parsed[0] if isinstance(parsed, list) else parsed
    cols = [c.get("label", c.get("id", "?")) for c in table["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in table["rows"]]

    def col(name_sub):
        for i, c in enumerate(cols):
            if name_sub.lower() in str(c).lower():
                return i
        return None

    i_self = col("total self time (us)") or col("self time")
    i_name = col("hlo op expression") or col("hlo op name") or 0
    i_cat = col("category")
    rows.sort(key=lambda r: -(r[i_self] or 0))
    total = sum((r[i_self] or 0) for r in rows)
    print(f"total self time: {total/1e3:.2f} ms over {len(rows)} ops")
    agg = {}
    for r in rows:
        cat = r[i_cat] if i_cat is not None else "?"
        agg[cat] = agg.get(cat, 0) + (r[i_self] or 0)
    for cat, t in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {t/1e3:9.2f} ms  {100*t/total:5.1f}%  {cat}")
    print("\ntop ops:")
    for r in rows[:args.top]:
        name = str(r[i_name])[:110]
        cat = r[i_cat] if i_cat is not None else "?"
        print(f"  {(r[i_self] or 0)/1e3:9.3f} ms  [{cat}] {name}")


if __name__ == "__main__":
    main()
