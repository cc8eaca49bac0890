"""Per-fusion-name xplane rollup, cross-referenced against an optimized-HLO
text dump to classify each fusion (conv emitter / kLoop relayout / stats /
dot / custom-call). Use to separate real MXU work from layout glue that a
family-level rollup conflates (conv+stats kOutput fusions share the
"fusion (f32[n,c]" family with pure relayout kLoop fusions).

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python scripts/xplane_classify.py \
      <vm.xplane.pb> <hlo_dump.txt> [topN]
"""
import collections
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def load_hlo_index(path):
    """Map '%name.123' -> dict(kind, emitter, opname, shape) from an HLO text."""
    idx = {}
    pat = re.compile(
        r"^\s*(%\S+) = (\(.*?\)|\S+) fusion\(.*?kind=(k\w+), calls=%(\S+?)[,)]")
    for line in open(path):
        m = pat.match(line)
        if not m:
            # also index custom-calls / convolutions
            m2 = re.match(r"^\s*(%\S+) = (\S+) (custom-call|convolution)\(", line)
            if m2:
                idx[m2.group(1)] = {
                    "kind": m2.group(3), "emitter": "", "opname": "", "shape": m2.group(2)}
            continue
        name, shape, kind = m.group(1), m.group(2), m.group(3)
        em = re.search(r'"emitter":"(\w+)"', line)
        op = re.search(r'op_name="([^"]+)"', line)
        idx[name] = {
            "kind": kind,
            "emitter": em.group(1) if em else "",
            "opname": op.group(1) if op else "",
            "shape": shape,
        }
    return idx


def classify(name, info):
    if info is None:
        return "unindexed"
    if info["kind"] == "custom-call":
        return "custom-call(pallas)"
    if info["kind"] == "convolution":
        return "convolution"
    if info["emitter"]:
        # a conv/dot emitter did real MXU work inside this fusion
        if "conv" in info["opname"] or "Emit" in info["emitter"] and (
                "conv_general" in info["opname"]):
            return f"conv+epilogue [{info['emitter']}]"
        return f"dot+epilogue [{info['emitter']}]"
    if info["kind"] == "kLoop":
        return "kLoop (relayout/elementwise/stats)"
    return f"{info['kind']} (no emitter)"


def main(pb_path, hlo_path, topn=60):
    topn = int(topn)
    hlo = load_hlo_index(hlo_path)
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(open(pb_path, "rb").read())
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            per_name = collections.Counter()
            count = collections.Counter()
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                if name.startswith("%while") or name.startswith("jit_"):
                    continue
                key = name.split(" = ")[0]
                per_name[key] += ev.duration_ps
                count[key] += 1
            # per-class totals
            cls_tot = collections.Counter()
            for key, ps in per_name.items():
                info = hlo.get(key)
                cls_tot[classify(key, info)] += ps
            grand = sum(per_name.values())
            print(f"== per-class totals (grand={grand/1e9:.3f} ms)")
            for c, ps in cls_tot.most_common():
                print(f"  {ps/1e9:9.3f} ms  {c}")
            print(f"== top {topn} individual ops")
            for key, ps in per_name.most_common(topn):
                info = hlo.get(key)
                c = classify(key, info)
                op = (info or {}).get("opname", "")
                shape = (info or {}).get("shape", "")
                # strip the long jit prefix for readability
                op = re.sub(r"^jit\(denoise\)/while/body/closed_call/", "", op)
                print(f"  {ps/1e9:8.3f} ms x{count[key]:<4d} {key:<34s} "
                      f"{c:<44s} {shape[:42]:<42s} {op[:70]}")


if __name__ == "__main__":
    main(*sys.argv[1:])
