"""A/B benchmark: select vs lanes Pallas DCN kernels vs the XLA path.

SHAPES env: comma-separated BxHxWxCin specs (default the hot DLA layer).
OFFSET_STD env: offset spread in px (default "0.1,1.0").
Used to pick the per-shape dispatch tier in ops/dcn.py.
"""
import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# shared, guarded compile-cache helper (repo root already on sys.path):
# importing __graft_entry__ enables the .jaxcache compile cache
import __graft_entry__  # noqa: F401

import jax, jax.numpy as jnp
import numpy as np
from centernet_uda_tpu.ops import dcn_pallas as dp


def sync(v):
    # fetch ONE element: a full-array fetch through the axon tunnel
    # (~28 MB/s) would dominate every timing
    leaf = jax.tree.leaves(v)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def bench(f, args, n=20):
    y = f(*args); sync(y)
    t0 = time.perf_counter()
    for _ in range(n): y = f(*args)
    sync(y)
    return (time.perf_counter()-t0)/n*1e3


def xla_fwd_bwd(x, off, m, wgt, bias, g):
    from centernet_uda_tpu.ops.dcn import dcn_v2

    fwd = jax.jit(lambda *a: dcn_v2(*a))

    def loss(xx, oo, mm, ww):
        return jnp.vdot(dcn_v2(xx, oo, mm, ww, bias), g)

    bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    return fwd, bwd


shapes = os.environ.get("SHAPES", "16x128x128x64")
stds = [float(s) for s in os.environ.get("OFFSET_STD", "0.1,1.0").split(",")]
with_xla = os.environ.get("WITH_XLA", "0") == "1"

for spec in shapes.split(","):
    b, h, w, cin = (int(v) for v in spec.split("x"))
    cout = min(cin, 256)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b,h,w,cin).astype(np.float32), jnp.bfloat16)
    wgt = jnp.asarray(rng.randn(3,3,cin,cout).astype(np.float32)*0.05, jnp.bfloat16)
    bias = jnp.zeros((cout,), jnp.float32)
    m = jax.nn.sigmoid(jnp.asarray(rng.randn(b,h,w,9).astype(np.float32)))
    g = jnp.asarray(rng.randn(b,h,w,cout).astype(np.float32))

    for std in stds:
        off = jnp.asarray((rng.randn(b,h,w,18)*std).astype(np.float32))
        for ver in ("select", "lanes"):
            dp.set_kernel_version(ver)
            try:
                fwd = jax.jit(lambda *a, _v=ver: dp.dcn_v2_pallas(*a))
                t_f = bench(fwd, (x,off,m,wgt,bias))
                bwdf = jax.jit(lambda x,o,mm,ww,gg, _v=ver: dp.dcn_v2_pallas_bwd(x,o,mm,ww,gg))
                t_b = bench(bwdf, (x,off,m,wgt,g))
                print(f"{spec} std={std} {ver}: fwd {t_f:.2f} ms, bwd {t_b:.2f} ms", flush=True)
            except Exception as exc:
                print(f"{spec} std={std} {ver}: FAILED {type(exc).__name__}: {str(exc)[:200]}", flush=True)
        if with_xla:
            try:
                fwd, bwd = xla_fwd_bwd(x, off, m, wgt, bias, g)
                t_f = bench(fwd, (x,off,m,wgt,bias), n=5)
                t_b = bench(bwd, (x,off,m,wgt), n=5)
                print(f"{spec} std={std} xla:  fwd {t_f:.2f} ms, fwd+bwd {t_b:.2f} ms", flush=True)
            except Exception as exc:
                print(f"{spec} std={std} xla: FAILED {type(exc).__name__}: {str(exc)[:200]}", flush=True)
