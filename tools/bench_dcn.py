#!/usr/bin/env python
"""Per-op DCNv2 microbenchmark on the current jax device.

Times, at the DLA hot shapes, each piece of the Pallas DCN path against the
plain-conv reference bar (the CUDA driver makes DCN cost ~ im2col + one
GEMM, /root/reference/src/cuda/dcn_v2_cuda.cu:42-163):
  conv        plain 3x3 conv (XLA)
  fwd         fused Pallas forward
  bwd         full Pallas backward (single fused kernel)
  fwd+bwd     value_and_grad through the custom_vjp op

OFFSET_STD environment knob controls the offset spread (default 1.0 px).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timeit(fn, sync, steps=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    from centernet_uda_tpu.ops import dcn_pallas

    shapes = os.environ.get("SHAPES", "16x128x128x64")
    offset_std = float(os.environ.get("OFFSET_STD", 1.0))
    steps = int(os.environ.get("STEPS", 20))

    def sync(value):
        # fetch ONE element (device-side slice): a full-array fetch through
        # the axon tunnel (~28 MB/s) would dominate every timing
        leaf = jax.tree.leaves(value)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    for spec in shapes.split(","):
        b, h, w, c = (int(v) for v in spec.split("x"))
        cout = c
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        off = jnp.asarray(
            (rng.randn(b, h, w, 18) * offset_std).astype(np.float32))
        mask = jnp.asarray(
            (1 / (1 + np.exp(-rng.randn(b, h, w, 9)))).astype(np.float32))
        wt = jnp.asarray(
            (rng.randn(3, 3, c, cout) * 0.05).astype(np.float32))
        bias = jnp.zeros((cout,), jnp.float32)
        g = jnp.asarray(rng.randn(b, h, w, cout).astype(np.float32))

        conv = jax.jit(lambda x, wt: jax.lax.conv_general_dilated(
            x, wt, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        fwd = functools.partial(dcn_pallas.dcn_v2_pallas, max_shift=14)
        bwd = functools.partial(dcn_pallas.dcn_v2_pallas_bwd, max_shift=14)

        res = {"shape": spec, "offset_std": offset_std}
        res["conv_ms"] = _timeit(lambda: conv(x, wt), sync, steps)
        res["fwd_ms"] = _timeit(
            lambda: fwd(x, off, mask, wt, bias), sync, steps)
        res["bwd_ms"] = _timeit(
            lambda: bwd(x, off, mask, wt, g), sync, steps)

        # split backward if the internals are importable
        if hasattr(dcn_pallas, "dcn_v2_pallas_bwd_params"):
            res["bwd_params_ms"] = _timeit(
                lambda: dcn_pallas.dcn_v2_pallas_bwd_params(
                    x, off, mask, wt, g), sync, steps)
        if hasattr(dcn_pallas, "dcn_v2_pallas_bwd_dx"):
            res["bwd_dx_ms"] = _timeit(
                lambda: dcn_pallas.dcn_v2_pallas_bwd_dx(
                    x, off, mask, wt, g), sync, steps)
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in res.items()}))


if __name__ == "__main__":
    main()
