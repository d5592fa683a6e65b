"""Attribute the IOD kernel's non-loop ("base") cost from optimized HLO.

The axon tunnel supports ``compiled.as_text()`` (optimized, scheduled HLO),
so the base-36ms attribution (docs/DESIGN.md roadmap item 2) no longer needs
stage chops: this script compiles the bench-shape IOD kernel, parses the
entry schedule, and ranks every non-while fusion by an HBM-traffic estimate
(sum of operand+result buffer bytes — v5e kernels outside the latency-bound
while loops are bandwidth-bound, so bytes/819 GB/s approximates time).

Usage: python tools/hlo_attribution.py [--lsq] [--out FILE]
"""

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from outfit_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"\b([a-z]\d+|pred)\[([\d,]*)\]")


def shape_bytes(text):
    """Sum the buffer sizes of every shape literal in an HLO type string."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def parse_entry_schedule(hlo):
    """Yield (name, op, result_bytes, line) for the entry computation."""
    # the entry computation is the one declared with ENTRY
    m = re.search(r"^ENTRY [^{]+\{(.*?)^\}", hlo, re.S | re.M)
    if not m:
        raise SystemExit("no ENTRY computation found")
    for line in m.group(1).splitlines():
        line = line.strip()
        mm = re.match(r"%?([\w.\-]+) = ([^ ]+) ([\w\-]+)\(", line)
        if not mm:
            continue
        name, restype, op = mm.groups()
        yield name, op, shape_bytes(restype), line


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lsq", action="store_true")
    ap.add_argument("--n-traj", type=int, default=8192)
    ap.add_argument("--out", default=None)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _synthetic_batch
    from outfit_tpu.iod.api import _iod_kernel
    from outfit_tpu.iod.params import IODParams

    params = IODParams(
        n_noise_realizations=3, precision="mixed", newton_max_it=20
    )
    tri, obs_arrays, lane_traj, window = _synthetic_batch(
        n_traj=args.n_traj, lanes_per_traj=8, n_obs=12, seed=7
    )
    fn = jax.jit(lambda t, o, lt, w: _iod_kernel(t, o, lt, w, params))
    print("lowering+compiling (cached shapes are fast) ...", file=sys.stderr)
    comp = fn.lower(tri, obs_arrays, lane_traj, window).compile()
    hlo = comp.as_text()
    print(f"optimized HLO: {len(hlo)/1e6:.1f} MB", file=sys.stderr)
    if args.out:
        with open(args.out, "w") as f:
            f.write(hlo)

    rows = list(parse_entry_schedule(hlo))
    by_op = defaultdict(lambda: [0, 0])
    whiles = []
    for name, op, nbytes, line in rows:
        by_op[op][0] += 1
        by_op[op][1] += nbytes
        if op == "while":
            whiles.append((name, nbytes, line[:160]))

    print(f"\nentry schedule: {len(rows)} instructions")
    print("\n== op histogram (count, result GB) ==")
    for op, (cnt, b) in sorted(by_op.items(), key=lambda kv: -kv[1][1]):
        print(f"  {op:24s} {cnt:6d}  {b/1e9:8.3f} GB")

    print(f"\n== while loops in entry: {len(whiles)} ==")
    for name, nbytes, line in whiles:
        print(f"  {name}: state {nbytes/1e6:.1f} MB")

    # rank non-while instructions by result-buffer size (HBM write traffic)
    big = sorted(
        (r for r in rows if r[1] not in ("while", "parameter", "constant")),
        key=lambda r: -r[2],
    )[: args.top]
    print(f"\n== top {args.top} non-while instructions by result bytes ==")
    for name, op, nbytes, line in big:
        print(f"  {nbytes/1e6:9.2f} MB  {op:12s} {line[:140]}")

    total_nonwhile = sum(r[2] for r in rows if r[1] != "while")
    print(
        f"\nnon-while entry result bytes: {total_nonwhile/1e9:.3f} GB "
        f"(~{total_nonwhile/819e9*1e3:.1f} ms at 819 GB/s HBM)"
    )


if __name__ == "__main__":
    main()
