"""Compare the IOD kernel's TPU (emulated f64) output against CPU.

Run on a machine with the axon TPU visible: python tools/tpu_accuracy_check.py
Records the achieved cross-backend tolerance for the f64-emulation budget
(docs/DESIGN.md "Numerics").
"""
import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from __graft_entry__ import entry, _enable_compile_cache


def main():
    _enable_compile_cache()
    fn, args = entry()
    jfn = jax.jit(fn)
    out_tpu = jax.block_until_ready(jfn(*args))
    with jax.default_device(jax.devices("cpu")[0]):
        out_cpu = jax.block_until_ready(jax.jit(fn)(*args))

    names = ["best_rms", "kind", "elements", "equinoctial", "epoch", "corrected"]
    for name, a, b in zip(names, out_tpu, out_cpu):
        a = np.asarray(a)
        b = np.asarray(b)
        if a.dtype == bool or np.issubdtype(a.dtype, np.integer):
            agree = float((a == b).mean())
            print(f"{name:12s} agreement: {agree*100:.1f}%")
        else:
            both = np.isfinite(a) & np.isfinite(b)
            d = np.abs(a[both] - b[both])
            rel = d / (1.0 + np.abs(b[both]))
            print(f"{name:12s} max |abs diff| {d.max():.3e}  max rel {rel.max():.3e}  "
                  f"finite match {float((np.isfinite(a)==np.isfinite(b)).mean())*100:.1f}%")


if __name__ == "__main__":
    main()
