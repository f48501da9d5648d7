"""Per-module device-time breakdown from a jax.profiler trace.

Parses the xplane protobuf (via tensorflow.tsl's bundled xplane_pb2 — no
tensorboard needed), takes the TPU device plane, and groups XLA op events
by the leading frames of their `tf_op`/op_name metadata (e.g.
``encoder/block1/conv2`` -> ``encoder/block1``). This answers "where does
the step time actually go" at op granularity — XLA cost analysis gives
FLOPs/bytes but not time, and remote-tunnel latency makes naive per-op
timing impossible.

Usage: python tools/trace_breakdown.py /tmp/trace_dir [--depth 2] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import os
import warnings
from collections import defaultdict


def load_xplanes(trace_dir: str):
    warnings.filterwarnings("ignore")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def device_planes(xs):
    for plane in xs.planes:
        n = plane.name.lower()
        if "tpu" in n or "device" in n or "/device" in n:
            if "host" not in n:
                yield plane


def group_key(name: str, depth: int) -> str:
    parts = [p for p in name.split("/") if p and not p.startswith("jit(")]
    # strip transpose(...)/jvp(...) wrappers but remember backward-ness
    tag = ""
    if "transpose(" in name:
        tag = " [bwd]"
    parts = [p.replace("transpose(jvp(", "").replace("jvp(", "").rstrip(")")
             for p in parts]
    parts = [p for p in parts if p]
    return "/".join(parts[:depth]) + tag if parts else (name[:40] + tag)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--min_ms", type=float, default=0.0)
    args = ap.parse_args()

    groups = defaultdict(float)
    total = 0.0
    nevents = 0
    for path, xs in load_xplanes(args.trace_dir):
        for plane in device_planes(xs):
            meta = plane.event_metadata
            smeta = plane.stat_metadata
            for line in plane.lines:
                # Only the exclusive-duration op line: 'Async XLA Ops' spans
                # overlap with compute and 'XLA Modules'/'Steps' span whole
                # programs — summing those double-counts wildly.
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    md = meta.get(ev.metadata_id)
                    if md is None:
                        continue
                    dur_ms = ev.duration_ps / 1e9
                    name = md.display_name or md.name
                    # prefer the tf_op / op_name stat (module path) if present
                    opname = None
                    for st in ev.stats:
                        sm = smeta.get(st.metadata_id)
                        if sm is not None and sm.name in ("tf_op", "op_name", "hlo_op"):
                            if st.str_value:
                                opname = st.str_value
                                break
                    for st in md.stats:
                        if opname:
                            break
                        sm = smeta.get(st.metadata_id)
                        if sm is not None and sm.name in ("tf_op", "op_name"):
                            if st.str_value:
                                opname = st.str_value
                    key = group_key(opname or name, args.depth)
                    groups[key] += dur_ms
                    total += dur_ms
                    nevents += 1
    print(f"# {nevents} device events, {total:.1f} ms total (all steps in trace)")
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1])[: args.top]:
        if v < args.min_ms:
            break
        print(f"{v:10.2f} ms  {100*v/total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
