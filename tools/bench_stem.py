"""A/B the DLA stem's base-conv phase packing (2x2 vs 4x4) on the TPU.

The stem (base 7x7 Cin=3 + level0 + level1, backends/dla.py:236-247,
277-287) profiled at ~11.5 ms of a 116 ms DLA-34 train step with the 2x2
space-to-depth packing: the base conv feeds the MXU only 12 contraction
channels. The 4x4 packing raises that to 48 (Cout 256) at H/4. This times
fwd and fwd+bwd of the isolated stem for both packings.

Knobs: STEM_BATCH (16), STEM_SIZE (512), STEM_STEPS (30).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

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

    for pack in (2, 4):
        # full trunk, but only outputs[0:2] (base+level0+level1) are used:
        # XLA dead-code-eliminates the level2..5 trees from both jits
        trunk = DLATrunk(base_pack=pack, dtype=jnp.bfloat16)
        v = trunk.init(jax.random.PRNGKey(0), x, train=False)

        fwd = jax.jit(lambda p, xx: trunk.apply(p, xx, train=False)[1])

        def loss(params, xx):
            outs = trunk.apply({"params": params,
                                "batch_stats": v["batch_stats"]},
                               xx, train=True, mutable=["batch_stats"])[0]
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs[:2])

        bwd = jax.jit(jax.grad(loss))

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
        print(f"pack={pack}: stem fwd {fwd_ms:.2f} ms, "
              f"fwd+bwd {fb_ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
