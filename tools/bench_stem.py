"""A/B the DLA stem variants (unpacked vs 2x2 vs 4x4 packing) on the TPU.

The stem (base 7x7 Cin=3 + level0 + level1, backends/dla.py:236-247,
277-287) profiled at ~8-14 ms of a ~115 ms DLA-34 train step with the 2x2
space-to-depth packing: the base conv feeds the MXU only 12 contraction
channels. The 4x4 packing raises that to 48 (Cout 256) at H/4 but needs a
4x4->2x2 rephase that costs more than the conv saves (BASELINE.md round 3).
This times fwd and fwd+bwd of the isolated stem for all variants.

Every timed call reduces to a scalar INSIDE the jit: the axon debug tunnel
ships each call's output buffers to the host (~0.5 GB/s), so returning the
(16,256,256,32) level-1 map would time the tunnel, not the stem.

Knobs: STEM_BATCH (16), STEM_SIZE (512), STEM_STEPS (30).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# shared, guarded compile-cache helper (repo root already on sys.path):
# importing __graft_entry__ enables the .jaxcache compile cache
import __graft_entry__  # noqa: F401


import jax
import jax.numpy as jnp
import numpy as np


def main():
    from centernet_uda_tpu.models.dla import DLATrunk

    batch = int(os.environ.get("STEM_BATCH", 16))
    size = int(os.environ.get("STEM_SIZE", 512))
    steps = int(os.environ.get("STEM_STEPS", 30))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, size, size, 3).astype(np.float32))

    def sync(v):
        np.asarray(jax.tree.leaves(v)[0])

    for label, kwargs in (
        ("unpacked", {"stem_s2d": False}),
        ("pack=2", {"base_pack": 2}),
        ("pack=4", {"base_pack": 4}),
    ):
        # full trunk, but only outputs[0:2] (base+level0+level1) are used:
        # XLA dead-code-eliminates the level2..5 trees from both jits
        trunk = DLATrunk(dtype=jnp.bfloat16, **kwargs)
        v = trunk.init(jax.random.PRNGKey(0), x, train=False)

        fwd = jax.jit(lambda p, xx: sum(
            jnp.sum(o.astype(jnp.float32))
            for o in trunk.apply(p, xx, train=False)[:2]))

        def loss(params, xx):
            outs = trunk.apply({"params": params,
                                "batch_stats": v["batch_stats"]},
                               xx, train=True, mutable=["batch_stats"])[0]
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs[:2])

        def bwd_scalar(params, xx):
            g = jax.grad(loss)(params, xx)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(g))

        bwd = jax.jit(bwd_scalar)

        y = fwd(v, x); sync(y)
        t0 = time.perf_counter()
        for _ in range(steps):
            y = fwd(v, x)
        sync(y)
        fwd_ms = (time.perf_counter() - t0) / steps * 1e3

        g = bwd(v["params"], x); sync(g)
        t0 = time.perf_counter()
        for _ in range(steps):
            g = bwd(v["params"], x)
        sync(g)
        fb_ms = (time.perf_counter() - t0) / steps * 1e3
        print(f"{label}: stem fwd {fwd_ms:.2f} ms, "
              f"fwd+bwd {fb_ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
