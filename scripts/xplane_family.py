"""Aggregate the 'XLA Ops' line of an xplane.pb by op family (name prefix
before the first '.'), excluding the outer while/module events. Gives a
per-family ms total + count + one example name, sorted by time.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python scripts/xplane_family.py <vm.xplane.pb> [topN]
"""
import collections
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def family(name):
    # "%attn1.136 = bf16[34,4096,320]{...} custom-call(...)" -> attn1 | shape
    m = re.match(r"%([A-Za-z0-9_\-]+)(?:\.\d+)? = (\S+?)\{", name)
    if not m:
        return name[:40]
    op, shape = m.group(1), m.group(2)
    return f"{op} {shape}"


def main(path, topn=60):
    topn = int(topn)
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(open(path, "rb").read())
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            totals = collections.Counter()
            count = collections.Counter()
            example = {}
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                if name.startswith("%while") or name.startswith("jit_"):
                    continue
                f = family(name)
                totals[f] += ev.duration_ps
                count[f] += 1
                example.setdefault(f, name)
            grand = sum(totals.values())
            print(f"== XLA Ops (op-level, outer excluded) total={grand/1e9:.3f} ms")
            for f, ps in totals.most_common(topn):
                print(f"  {ps/1e9:9.3f} ms  x{count[f]:<5d} {f}")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
