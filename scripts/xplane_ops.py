"""Per-line xplane dump: shows each plane line separately so module-level and
op-level events aren't conflated (xplane_summary.py sums all lines, which
double-counts the outer while/jit events into 'other').

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python scripts/xplane_ops.py <vm.xplane.pb> [topN]
"""
import collections
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def main(path, topn=40):
    topn = int(topn)
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(open(path, "rb").read())
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            totals = collections.Counter()
            count = collections.Counter()
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps
                count[name] += 1
            if not totals:
                continue
            grand = sum(totals.values())
            print(f"\n== line: {line.name!r}  events={sum(count.values())} total={grand/1e9:.3f} ms")
            for name, ps in totals.most_common(topn):
                print(f"  {ps/1e9:9.3f} ms  x{count[name]:<5d} {name[:130]}")
            buckets = collections.Counter()
            for name, ps in totals.items():
                n = name.lower()
                if n.startswith("%while") or n.startswith("jit_"):
                    buckets["(module/outer)"] += ps
                elif "custom-call" in n:
                    buckets["pallas/custom"] += ps
                elif "convolution" in n or "conv" in n:
                    buckets["conv"] += ps
                elif "copy" in n or "transpose" in n or "bitcast" in n:
                    buckets["copy/transpose"] += ps
                elif "fusion" in n:
                    buckets["fusion"] += ps
                elif "dot" in n:
                    buckets["dot"] += ps
                elif "pad" in n or "slice" in n or "concatenate" in n:
                    buckets["pad/slice/concat"] += ps
                else:
                    buckets["other"] += ps
            print("  -- buckets:")
            for b, ps in buckets.most_common():
                print(f"    {b:18s} {ps/1e9:9.3f} ms ({100*ps/grand:.1f}%)")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
