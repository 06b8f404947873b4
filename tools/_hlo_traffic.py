"""Parse an optimized HLO dump: top-level instruction output sizes by op kind.

Approximates HBM write traffic (each top-level instruction materializes its
output); reads are operands (counted once via producers, so total traffic
~= 2x writes minus reuse).
"""
import re
import sys
from collections import Counter, defaultdict

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trainstep.hlo"
txt = open(path).read()

# find the ENTRY computation block
m = re.search(r"^ENTRY [^{]+\{(.*?)^\}", txt, re.S | re.M)
body = m.group(1)

DT = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
      "s8": 1, "u8": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2, "u16": 2}

def shape_bytes(s):
    # s like "f32[64,80,80,128]{...}" or tuple "(f32[...], bf16[...])"
    total = 0
    for mm in re.finditer(r"(f32|bf16|f16|s32|u32|pred|s8|u8|s64|u64|f64|s16|u16)\[([0-9,]*)\]", s):
        n = 1
        for d in mm.group(2).split(","):
            if d:
                n *= int(d)
        total += n * DT[mm.group(1)]
    return total

by_kind = Counter()
rows = []
for line in body.splitlines():
    line = line.strip()
    mm = re.match(r"%?\S+ = (\([^)]*\)|\S+?) (\w+)\(", line)
    if not mm:
        continue
    out_bytes = shape_bytes(mm.group(1))
    kind = mm.group(2)
    # refine fusion kinds by their fused op
    op_name = ""
    nm = re.search(r'op_name="([^"]+)"', line)
    if nm:
        op_name = nm.group(1)
    by_kind[kind] += out_bytes
    rows.append((out_bytes, kind, op_name[:110]))

total = sum(b for b, _, _ in rows)
print(f"top-level instrs: {len(rows)}   total output bytes: {total/1e9:.2f} GB")
print("\n== by op kind (GB written) ==")
for k, v in by_kind.most_common(15):
    print(f"{v/1e9:8.2f}  {k}")
print("\n== top 30 largest outputs ==")
for b, k, nm in sorted(rows, reverse=True)[:30]:
    print(f"{b/1e6:9.1f} MB  {k:12s} {nm}")

# aggregate by module path (2nd+3rd component of op_name)
agg = Counter()
for b, k, nm in rows:
    parts = nm.split("/")
    key = "/".join(parts[1:4]) if len(parts) > 3 else nm
    agg[key] += b
print("\n== by module path (GB) ==")
for k, v in agg.most_common(25):
    print(f"{v/1e9:8.2f}  {k}")
