"""A/B the fused lanes DCN kernels at the hot DLA node shape per DCN_RBLK.

The in-model hot layer is the IDAUp node conv (16x128x128x64 -> 64,
backends/dla.py:375-441 in the reference); five of them account for
~31 ms of the 109 ms train step (profile r05). DCN_RBLK is read at
trace time, so run one process per value:

    for r in 8 16 32; do DCN_RBLK=$r python tools/bench_fused_rblk.py; done
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import __graft_entry__  # noqa: F401  (enables the compile cache)

import jax
import jax.numpy as jnp
import numpy as np

from centernet_uda_tpu.ops import dcn_pallas as dp


def sync(v):
    leaf = jax.tree.leaves(v)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def bench(f, args, n=30):
    y = f(*args)
    sync(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(*args)
    sync(y)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    spec = os.environ.get("SHAPE", "16x128x128x64")
    b, h, w, cin = (int(v) for v in spec.split("x"))
    cout = cin
    std = float(os.environ.get("OFFSET_STD", "0.5"))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32), jnp.bfloat16)
    wgt = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05,
                      jnp.bfloat16)
    bias = jnp.zeros((cout,), jnp.float32)
    # offset-conv weights scaled so the om output has ~std spread
    omk = jnp.asarray(
        rng.randn(3, 3, cin, 27).astype(np.float32) * (std / max(cin, 1) ** 0.5 / 3.0))
    omb = jnp.zeros((27,), jnp.float32)
    g = jnp.asarray(rng.randn(b, h, w, cout).astype(np.float32), jnp.bfloat16)

    fwd = jax.jit(lambda *a: dp.dcn_v2_pallas_lanes_fused(*a))
    bwd = jax.jit(lambda *a: dp.dcn_v2_pallas_bwd_lanes_fused(*a))
    t_f = bench(fwd, (x, omk, omb, wgt, bias))
    t_b = bench(bwd, (x, omk, omb, wgt, g))
    rblk = os.environ.get("DCN_RBLK", "(default)")
    print(f"{spec} std={std} DCN_RBLK={rblk}: "
          f"fused fwd {t_f:.3f} ms, fused bwd {t_b:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
