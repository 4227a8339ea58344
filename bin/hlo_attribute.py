#!/usr/bin/env python
"""Attribute an optimized-HLO dump's top-level result bytes to model
components via instruction metadata op_name paths.

Skips fusion-body internals (their intermediates never touch HBM);
counts only instructions in ENTRY / while-body / conditional
computations — a good proxy for real HBM traffic per component.

Usage: python bin/hlo_attribute.py /tmp/hlo_hilam_500x500_L4.txt
"""

import re
import sys
from collections import defaultdict
from pathlib import Path

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}
SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def component(op_name: str) -> str:
    """Map a jax op_name path to a coarse component label."""
    bwd = "transpose(jvp())" in op_name
    # find the deepest informative module segment
    segs = [s for s in op_name.split("/") if s]
    label = "other"
    for pat, lab in (
        ("m2g", "m2g"),
        ("g2m", "g2m"),
        ("grid_embed", "embed"),
        ("mesh_embed", "embed"),
        ("emb_", "edge_embed"),
        ("decode", "decode"),
        ("processor", "processor"),
        ("sweep", "processor"),
        ("intra", "processor"),
        ("up_", "processor"),
        ("down_", "processor"),
        ("block", "processor"),
        ("loss", "loss"),
        ("rollout", "rollout"),
        ("adam", "optimizer"),
        ("opt", "optimizer"),
    ):
        if any(pat in s for s in segs):
            label = lab
            break
    return f"{label}{'/bwd' if bwd else ''}"


def main():
    path = Path(sys.argv[1])
    by_comp = defaultdict(lambda: [0, 0])
    by_opcode_top = defaultdict(lambda: [0, 0])
    in_fusion_body = False
    inst_re = re.compile(
        r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^)]*\)|\S+?)\s+([\w\-]+)\("
    )
    comp_re = re.compile(r"^%?([\w.\-]+)\s+(?:\([^)]*\)\s*->|\{)")
    meta_re = re.compile(r'op_name="([^"]*)"')

    for line in path.read_text().splitlines():
        if not line.startswith(" "):  # computation header or closing brace
            in_fusion_body = bool(
                re.match(r"^%?(fused_computation|region)", line.lstrip("%"))
            )
            continue
        if in_fusion_body:
            continue
        m = inst_re.match(line)
        if not m:
            continue
        name, shape_txt, opcode = m.groups()
        if opcode in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast", "while", "conditional", "call"):
            continue
        b = shape_bytes(shape_txt)
        mm = meta_re.search(line)
        comp = component(mm.group(1)) if mm else "no-meta"
        by_comp[comp][0] += b
        by_comp[comp][1] += 1
        by_opcode_top[opcode][0] += b
        by_opcode_top[opcode][1] += 1

    print("== top-level result bytes by component ==")
    for comp, (b, c) in sorted(by_comp.items(), key=lambda kv: -kv[1][0]):
        if b > 1e7:
            print(f"{comp:<22} {b / 1e9:8.3f} GB  ({c} ops)")
    print("\n== top-level result bytes by opcode ==")
    for op, (b, c) in sorted(by_opcode_top.items(), key=lambda kv: -kv[1][0])[:18]:
        print(f"{op:<22} {b / 1e9:8.3f} GB  ({c} ops)")


if __name__ == "__main__":
    main()
