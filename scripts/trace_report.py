"""Summarize a jax.profiler trace: top TPU ops by total device time.

Parses the xplane.pb directly (the installed tensorboard_plugin_profile
converter is incompatible with the baked-in TF), aggregates event durations
by op name on the TPU device plane, and buckets them into coarse categories.

Usage: python scripts/trace_report.py /tmp/trace1 [--top 40]
Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (set automatically).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def categorize(name: str) -> str:
    n = name.lower()
    if "convolution" in n or "conv" in n:
        return "conv"
    if re.search(r"\bdot\b|dot_general|matmul", n):
        return "dot"
    if "fusion" in n:
        return "fusion"
    if "copy" in n or "transpose" in n:
        return "copy/transpose"
    if "reduce" in n:
        return "reduce"
    if "dynamic" in n and "slice" in n:
        return "dyn-slice"
    if "scatter" in n or "gather" in n:
        return "gather/scatter"
    if "infeed" in n or "outfeed" in n or "send" in n or "recv" in n:
        return "io"
    return "other"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--line", default="",
                   help="substring filter for trace line name")
    args = p.parse_args()

    paths = sorted(glob.glob(os.path.join(
        args.trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        sys.exit(f"no xplane.pb under {args.trace_dir}")
    xplane = paths[-1]
    print(f"# {xplane}", file=sys.stderr)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        xs.ParseFromString(f.read())

    tpu = next((pl for pl in xs.planes if "/device:TPU" in pl.name
                or "/device:CUSTOM" in pl.name and pl.lines), None)
    if tpu is None or not tpu.lines:
        sys.exit("no TPU device plane with events")

    meta = {m_id: m.name for m_id, m in tpu.event_metadata.items()}

    for line in tpu.lines:
        if args.line and args.line not in line.name:
            continue
        if not line.events:
            continue
        agg = collections.Counter()
        cnt = collections.Counter()
        for ev in line.events:
            name = meta.get(ev.metadata_id, "?")
            agg[name] += ev.duration_ps
            cnt[name] += 1
        total = sum(agg.values())
        span_ps = (max(ev.offset_ps + ev.duration_ps for ev in line.events)
                   - min(ev.offset_ps for ev in line.events))
        print(f"\n== line '{line.name}': busy {total/1e9:.2f} ms over "
              f"{len(line.events)} events, span {span_ps/1e9:.2f} ms, "
              f"occupancy {100*total/max(span_ps,1):.0f}%")
        bycat = collections.Counter()
        for name, ps in agg.items():
            bycat[categorize(name)] += ps
        for cat, ps in bycat.most_common():
            print(f"  {ps/1e9:9.2f} ms  {100*ps/total:5.1f}%  {cat}")
        print("  top ops:")
        for name, ps in agg.most_common(args.top):
            print(f"  {ps/1e9:9.3f} ms  x{cnt[name]:<6d} "
                  f"[{categorize(name)}] {name[:100]}")


if __name__ == "__main__":
    main()
