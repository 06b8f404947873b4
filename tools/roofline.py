"""Per-instruction roofline table from an optimized HLO dump.

For every top-level instruction in the ENTRY computation, estimate

    t_lb = max(flops / PEAK_FLOPS, bytes_touched / PEAK_BW)

where flops are reconstructed from shapes for convolution/dot ops (the only
MXU consumers) and bytes_touched = output bytes + operand bytes (operand
shapes resolved from each instruction's defining line).  Summing t_lb over
the module gives a hardware lower bound for one execution; comparing against
the measured step time quantifies how far from speed-of-light the program
runs and which instructions carry the gap.

This intentionally over-counts reuse (an operand read by two consumers is
charged twice) and ignores on-chip fusion locality, so the bound is
conservative for bandwidth-bound programs.  Conv flops are exact for
forward convs but the shape heuristic badly over-counts gradient-filter
convolutions (their "kernel" operand is an activation tensor); use the
compiler's ``cost_analysis()['flops']`` for the module-level MXU bound and
read the per-op MXU column as indicative only.

Usage: python tools/roofline.py /tmp/trainstep.hlo [--peak-tf 197]
       [--peak-gbs 819] [--top 25] [--measured-ms N]
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import Counter

DT = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
      "s8": 1, "u8": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2, "u16": 2}

SHAPE_RE = re.compile(
    r"(f32|bf16|f16|s32|u32|pred|s8|u8|s64|u64|f64|s16|u16)\[([0-9,]*)\]")


def shape_bytes(s: str) -> int:
    total = 0
    for m in SHAPE_RE.finditer(s):
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        total += n * DT[m.group(1)]
    return total


def shape_elems(s: str):
    m = SHAPE_RE.search(s)
    if not m:
        return None, 1
    dims = [int(d) for d in m.group(2).split(",") if d]
    n = 1
    for d in dims:
        n *= d
    return dims, n


def parse_entry(txt: str):
    m = re.search(r"^ENTRY [^{]+\{(.*?)^\}", txt, re.S | re.M)
    if not m:
        sys.exit("no ENTRY computation found")
    return m.group(1)


def conv_flops(line: str, defs: dict) -> float:
    """2 * out_elems * Cin_per_group * kh * kw for a convolution line."""
    mm = re.match(r"\s*(?:ROOT )?%?(\S+) = (\S+?) convolution\(([^)]*)\)", line)
    if not mm:
        return 0.0
    out_dims, out_elems = shape_elems(mm.group(2))
    ops = [o.strip().lstrip("%") for o in mm.group(3).split(",")]
    # kernel operand: second argument
    kshape = defs.get(ops[1], "")
    kdims, _ = shape_elems(kshape)
    dnums = re.search(r"dim_labels=(\S+?)[ ,]", line)
    if not kdims:
        return 0.0
    # dim_labels like b01f_01io->b01f: kernel spatial dims are the '01',
    # input feature 'i', output feature 'o' positions in the kernel labels
    if dnums:
        klabels = dnums.group(1).split("_")[1].split("-")[0]
        k_spatial = 1
        cin = 1
        for d, lab in zip(kdims, klabels):
            if lab in "0123456789":
                k_spatial *= d
            elif lab == "i":
                cin = d
    else:  # default io01 fallback
        cin, k_spatial = kdims[0], kdims[2] * kdims[3]
    # NB: the kernel's 'i' dimension is already per-group Cin, so no division
    # by feature_group_count is needed here.
    return 2.0 * out_elems * cin * k_spatial


def dot_flops(line: str, defs: dict) -> float:
    mm = re.match(r"\s*(?:ROOT )?%?(\S+) = (\S+?) dot\(([^)]*)\)", line)
    if not mm:
        return 0.0
    _, out_elems = shape_elems(mm.group(2))
    ops = [o.strip().lstrip("%") for o in mm.group(3).split(",")]
    contract = re.search(r"rhs_contracting_dims=\{([0-9,]*)\}", line)
    rdims, _ = shape_elems(defs.get(ops[1], ""))
    k = 1
    if contract and rdims:
        for ci in contract.group(1).split(","):
            if ci:
                k *= rdims[int(ci)]
    return 2.0 * out_elems * k


def computation_bodies(txt: str) -> dict:
    """name -> body text for every non-ENTRY computation block."""
    out = {}
    for m in re.finditer(r"^%?([\w.\-]+) [^{\n]*\{(.*?)^\}", txt, re.S | re.M):
        out[m.group(1)] = m.group(2)
    return out


def body_flops(body: str):
    """(direct conv/dot flops, referenced computation names) for one body."""
    defs = {}
    fl = 0.0
    refs = []
    entries = []
    for raw in body.splitlines():
        line = raw.strip()
        mm = re.match(r"(?:ROOT )?%?(\S+) = (\([^)]*\)|\S+?) (\w+)\(", line)
        if not mm:
            continue
        defs[mm.group(1)] = mm.group(2)
        entries.append((mm.group(3), line))
    for kind, line in entries:
        if kind == "convolution":
            fl += conv_flops(line, defs)
        elif kind == "dot":
            fl += dot_flops(line, defs)
        else:
            for cm in re.finditer(r"(?:calls|body|condition)=%?([\w.\-]+)",
                                  line):
                refs.append(cm.group(1))
    return fl, refs


def resolve_flops(comps: dict) -> dict:
    """Transitively resolve nested computation flops (memoized)."""
    direct = {}
    refs = {}
    for name, b in comps.items():
        direct[name], refs[name] = body_flops(b)
    memo = {}

    def total(name, stack=()):
        if name in memo:
            return memo[name]
        if name in stack or name not in direct:
            return 0.0
        t = direct[name] + sum(total(r, stack + (name,))
                               for r in refs[name])
        memo[name] = t
        return t

    return {name: total(name) for name in comps}


def analyze(path: str, peak_tf: float, peak_gbs: float, top: int,
            measured_ms: float | None):
    txt = open(path).read()
    body = parse_entry(txt)
    comps = computation_bodies(txt)
    comp_flops = resolve_flops(comps)

    # name -> output shape string (for operand byte resolution)
    defs = {}
    lines = []
    for raw in body.splitlines():
        line = raw.strip()
        mm = re.match(r"(?:ROOT )?%?(\S+) = (\([^)]*\)|\S+?) (\w+)\(([^)]*)\)", line)
        if not mm:
            continue
        name, shape, kind, operands = mm.groups()
        defs[name] = shape
        lines.append((name, shape, kind, operands, line))

    rows = []
    for name, shape, kind, operands, line in lines:
        # bitcasts move no data; parameters/get-tuple-element are aliases
        if kind in ("bitcast", "parameter", "get-tuple-element", "tuple",
                    "constant"):
            continue
        out_b = shape_bytes(shape)
        opd_b = 0
        for o in operands.split(","):
            o = o.strip().lstrip("%")
            if o in defs:
                opd_b += shape_bytes(defs[o])
        fl = 0.0
        if kind == "convolution":
            fl = conv_flops(line, defs)
        elif kind == "dot":
            fl = dot_flops(line, defs)
        elif kind in ("fusion", "call", "while", "conditional", "custom-call"):
            # flops of convs/dots nested inside the called computation(s)
            for cm in re.finditer(r"calls=%?([\w.\-]+)", line):
                fl += comp_flops.get(cm.group(1), 0.0)
            for cm in re.finditer(r"(?:body|condition|branch_computations)="
                                  r"\{?%?([\w.\-]+)", line):
                fl += comp_flops.get(cm.group(1), 0.0)
        t_flops = fl / (peak_tf * 1e12)
        t_bytes = (out_b + opd_b) / (peak_gbs * 1e9)
        bound = "MXU" if t_flops > t_bytes else "HBM"
        nm = re.search(r'op_name="([^"]+)"', line)
        rows.append({
            "name": name, "kind": kind, "flops": fl,
            "bytes": out_b + opd_b, "t_lb": max(t_flops, t_bytes),
            "bound": bound, "op_name": (nm.group(1) if nm else "")[:100],
        })

    total_t = sum(r["t_lb"] for r in rows)
    total_fl = sum(r["flops"] for r in rows)
    total_by = sum(r["bytes"] for r in rows)
    print(f"instructions: {len(rows)}")
    print(f"total conv/dot flops: {total_fl/1e12:.3f} TF  "
          f"-> {total_fl/(peak_tf*1e12)*1e3:.2f} ms at {peak_tf} TF/s")
    print(f"total bytes touched:  {total_by/1e9:.2f} GB  "
          f"-> {total_by/(peak_gbs*1e9)*1e3:.2f} ms at {peak_gbs} GB/s")
    print(f"sum of per-instruction lower bounds: {total_t*1e3:.2f} ms")
    if measured_ms:
        print(f"measured: {measured_ms:.2f} ms  ->  "
              f"{total_t*1e3/measured_ms*100:.0f}% of speed-of-light bound")

    by_kind = Counter()
    for r in rows:
        by_kind[r["kind"] + "/" + r["bound"]] += r["t_lb"]
    print("\n== lower-bound ms by op kind/bound ==")
    for k, v in by_kind.most_common(12):
        print(f"{v*1e3:8.3f}  {k}")

    print(f"\n== top {top} instructions by lower bound ==")
    hdr = f"{'ms_lb':>8} {'bound':5} {'kind':12} {'GF':>8} {'MB':>9}  op"
    print(hdr)
    for r in sorted(rows, key=lambda r: -r["t_lb"])[:top]:
        print(f"{r['t_lb']*1e3:8.3f} {r['bound']:5} {r['kind']:12} "
              f"{r['flops']/1e9:8.2f} {r['bytes']/1e6:9.1f}  {r['op_name']}")

    agg = Counter()
    for r in rows:
        parts = r["op_name"].split("/")
        key = "/".join(parts[1:4]) if len(parts) > 3 else r["op_name"]
        agg[key] += r["t_lb"]
    print("\n== lower-bound ms by module path ==")
    for k, v in agg.most_common(25):
        print(f"{v*1e3:8.3f}  {k}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("hlo", nargs="?", default="/tmp/trainstep.hlo")
    p.add_argument("--peak-tf", type=float, default=197.0,
                   help="bf16 peak TFLOP/s (v5e: 197)")
    p.add_argument("--peak-gbs", type=float, default=819.0,
                   help="HBM GB/s (v5e: 819)")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--measured-ms", type=float, default=None)
    a = p.parse_args()
    analyze(a.hlo, a.peak_tf, a.peak_gbs, a.top, a.measured_ms)
