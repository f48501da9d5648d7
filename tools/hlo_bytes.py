"""Static HBM-traffic attribution from optimized HLO text.

`jax.stages.Compiled.cost_analysis()` reports one total "bytes accessed"
number; for a bandwidth-bound program (the flagship train step measures
~60% HBM vs ~29% MFU) the *per-site* ranking is what picks the next fusion
target. XLA's HLO text carries typed operand references on every
instruction, so result+operand bytes per instruction can be summed
statically and grouped by the source `op_name` metadata.

Caveats (ranking tool, not an exact model): while-loop bodies are counted
once per trip only if trip count is static in metadata (usually not — the
train step has no data loops, decode does); parameter-passing between
fusions counts both as producer-write and consumer-read, which matches HBM
reality for non-fused neighbors.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Dict, List, Tuple

_DTYPE_BYTES = {
    "pred": 1, "s2": 0.25, "u2": 0.25, "s4": 0.5, "u4": 0.5,
    "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4,
    "f64": 8, "s64": 8, "u64": 8, "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"\b([a-z0-9]+)\[([0-9,]*)\]")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def _shape_bytes(dtype: str, dims: str) -> float:
    if dtype not in _DTYPE_BYTES:
        return 0.0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def _clean_op_name(name: str) -> str:
    # jit(train_step)/jit(main)/transpose(jvp(...))/encoder/block1/... ->
    # keep the informative tail; strip jit()/named wrappers
    parts = [p for p in name.split("/") if not p.startswith("jit(")]
    return "/".join(parts[-5:]) if parts else name


def instruction_bytes(hlo_text: str) -> List[Tuple[str, float, str]]:
    """[(op_name_group, bytes, one example instruction head)] per instruction
    in non-fusion computations."""
    out = []
    in_fused = False
    for line in hlo_text.splitlines():
        s = line.strip()
        if s.startswith("%fused_") or (s.startswith("fused_") and s.endswith("{")):
            in_fused = True
            continue
        if in_fused:
            if s.startswith("}"):  # end of fused computation body
                in_fused = False
            continue
        if "=" not in s or not (s.startswith("%") or s.startswith("ROOT")):
            continue
        # skip non-traffic instructions (declarations / layout no-ops)
        if re.search(r"=\s*[^=]*?\b(parameter|constant|tuple|get-tuple-element|bitcast)\(", s):
            continue
        # one instruction: result shape + typed operand references
        shapes = _SHAPE_RE.findall(s.split("metadata=")[0])
        if not shapes:
            continue
        total = sum(_shape_bytes(d, dims) for d, dims in shapes)
        m = _OPNAME_RE.search(s)
        group = _clean_op_name(m.group(1)) if m else s.split(" = ")[0]
        out.append((group, total, s[:120]))
    return out


def grouped(hlo_text: str) -> Dict[str, float]:
    g: Dict[str, float] = defaultdict(float)
    for name, b, _ in instruction_bytes(hlo_text):
        g[name] += b
    return dict(g)


def print_top(compiled, top: int = 30) -> None:
    text = compiled.as_text()
    rows = sorted(grouped(text).items(), key=lambda kv: -kv[1])
    total = sum(b for _, b in rows)
    print(f"# static HLO traffic attribution: {total/1e9:.1f} GB summed over "
          f"{len(rows)} op groups (top {top})")
    cum = 0.0
    for name, b in rows[:top]:
        cum += b
        print(f"{b/1e9:8.2f} GB  {100*b/total:5.1f}%  (cum {100*cum/total:5.1f}%)  {name}")


if __name__ == "__main__":
    import sys

    print_top_from = sys.argv[1] if len(sys.argv) > 1 else None
    if print_top_from:
        with open(print_top_from) as f:
            text = f.read()
        rows = sorted(grouped(text).items(), key=lambda kv: -kv[1])
        for name, b in rows[:40]:
            print(f"{b/1e9:8.2f} GB  {name}")
