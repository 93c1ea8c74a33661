"""Aggregate a jax.profiler xplane.pb into per-HLO-op self times.

The tensorboard_plugin_profile native converter is incompatible with the
installed TF build, so this parses the XSpace proto directly
(tensorflow.tsl.profiler.protobuf.xplane_pb2): for the TPU device plane,
sum event durations per op name across the trace, divide by the number of
profiled steps, and print the top table.

Usage: python scripts/xplane_top.py [xplane.pb] [--steps 3] [--top 50]
"""

import argparse
import collections
import glob
import os
import sys


def load(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default=None)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=50)
    ap.add_argument("--group", action="store_true",
                    help="group ops by name prefix (fusion family)")
    args = ap.parse_args()

    path = args.path or sorted(
        glob.glob("/tmp/jax-trace/**/*.xplane.pb", recursive=True),
        key=os.path.getmtime,
    )[-1]
    xs = load(path)

    tpu = [p for p in xs.planes if "TPU" in p.name or "/device" in p.name]
    if not tpu:
        print([p.name for p in xs.planes])
        sys.exit("no TPU plane found")
    for plane in tpu:
        if not plane.lines:
            continue
        ev_meta = plane.event_metadata
        per_op = collections.Counter()
        per_line = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                per_op[name] += ev.duration_ps
                per_line[line.name] += ev.duration_ps
        if not per_op:
            continue
        print(f"== plane {plane.name}")
        print("   lines:", dict(per_line))
        total = max(per_line.values())
        print(f"   busiest-line total: {total/1e6/args.steps:.0f} us/step")
        items = per_op.most_common()
        if args.group:
            g = collections.Counter()
            for name, ps in items:
                key = name.split(".")[0].rstrip("0123456789")
                g[key] += ps
            items = g.most_common()
        for name, ps in items[: args.top]:
            us = ps / 1e6 / args.steps
            print(f"{us:10.0f} us {100*ps/total:5.1f}%  {name[:120]}")


if __name__ == "__main__":
    main()
