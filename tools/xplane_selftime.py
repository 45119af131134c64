"""Per-XLA-op SELF-time attribution from a raw ``*.xplane.pb`` profile.

The tensorboard profile plugin's converter is broken in this environment
(protobuf descriptor error, then a missing ``xspace_to_tools_data`` native
symbol), so this parses the xplane directly: find the TPU device plane's
"XLA Ops" line, build an interval stack per event nest (events are sorted
by offset; a child's duration is subtracted from its parent), and print
ops ranked by summed self time.

Usage:
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/xplane_selftime.py <trace.xplane.pb> [top_n]

Reading the output: fusion ops are named by their output shape; ``n=``
exec counts identify loop position (per-traversal-step ops run
waves×steps times, per-ctrl ops ~ctrl count).
"""
import sys
from collections import defaultdict


def parse(pb_path: str, top_n: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(pb_path, "rb") as f:
        xs.ParseFromString(f.read())

    plane = next((p for p in xs.planes if "TPU" in p.name and "device" in p.name.lower()),
                 None) or next((p for p in xs.planes if "TPU" in p.name), None)
    if plane is None:
        raise SystemExit(f"no TPU plane; planes = {[p.name for p in xs.planes]}")
    ev_names = {k: v for k, v in plane.event_metadata.items()}

    line = next((ln for ln in plane.lines if ln.name == "XLA Ops"), None)
    if line is None:
        raise SystemExit(f"no 'XLA Ops' line; lines = {[ln.name for ln in plane.lines]}")

    evs = sorted(((e.offset_ps, e.duration_ps,
                   ev_names[e.metadata_id].name) for e in line.events))
    self_ps = defaultdict(int)
    count = defaultdict(int)
    stack = []  # (start, end, name)
    for off, dur, name in evs:
        end = off + dur
        while stack and stack[-1][1] <= off:
            stack.pop()
        self_ps[name] += dur
        count[name] += 1
        if stack:  # child time is not the parent's self time
            self_ps[stack[-1][2]] -= dur
        stack.append((off, end, name))

    total = sum(self_ps.values())
    print(f"total device self time: {total/1e9:.2f} ms over "
          f"{sum(count.values())} events\n")
    print(f"{'self ms':>9} {'%':>5} {'n':>7}  op")
    for name, ps in sorted(self_ps.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{ps/1e9:9.2f} {100*ps/total:5.1f} {count[name]:7d}  {name[:110]}")


if __name__ == "__main__":
    parse(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
