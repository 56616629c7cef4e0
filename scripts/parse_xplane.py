#!/usr/bin/env python
"""Summarize a jax.profiler xplane trace: device-busy per step + top ops.

Why: wall-clock per step over the tunneled backend includes dispatch
overhead that varies by process (measured 77 vs 169 ms for the identical
train step in two processes); the trace's 'XLA Modules' line gives the true
device-busy time, which is the number to optimize against.

Usage:
    with jax.profiler.trace("/tmp/tr"): ... N steps ...
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/parse_xplane.py /tmp/tr N [top_k]

(The env var works around the prebuilt tensorboard profile plugin's
descriptor mismatch; this script parses the raw xplane proto instead.)
"""

import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    trace_dir = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    top_k = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        sys.exit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())

    for p in xs.planes:
        if not p.name.startswith("/device:"):
            continue
        print(f"== {p.name}")
        op_line = None
        for line in p.lines:
            if not line.events:
                continue
            dur = sum(ev.duration_ps for ev in line.events)
            print(f"  line '{line.name}': {len(line.events)} events, "
                  f"{dur / 1e12 * 1000 / steps:.2f} ms/step")
            if line.name == "XLA Ops":
                op_line = line
        if op_line is None:
            continue
        total = {}
        for ev in op_line.events:
            md = p.event_metadata[ev.metadata_id]
            total[md.name] = total.get(md.name, 0) + ev.duration_ps
        print(f"  top {top_k} ops:")
        for name, ps in sorted(total.items(), key=lambda kv: -kv[1])[:top_k]:
            print(f"    {ps / 1e12 * 1000 / steps:8.3f} ms/step  {name[:120]}")


if __name__ == "__main__":
    main()
