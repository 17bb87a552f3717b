#!/usr/bin/env python
"""Analytic model-FLOPs counter: walks the jaxpr of a backend forward and
sums the matmul/conv math only (dot_general + conv_general_dilated), i.e.
the FLOPs a roofline/MFU calculation should credit. Elementwise/sampling
arithmetic (the DCN bilinear weights, BN, activations) is excluded on
purpose — it is implementation overhead, not model math.

Usage: JAX_PLATFORMS=cpu python tools/flops_count.py [backend] [size]
Prints the per-image forward GFLOPs used by bench.py's ``_FWD_GFLOPS_IMG``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def _dot_flops(eqn) -> int:
    out = eqn.outvars[0].aval
    lhs = eqn.invars[0].aval
    dnums = eqn.params["dimension_numbers"]
    contract = dnums[0][0]
    k = 1
    for d in contract:
        k *= lhs.shape[d]
    return 2 * out.size * k


def _conv_flops(eqn) -> int:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval  # kernel
    dnums = eqn.params["dimension_numbers"]
    # kernel input-feature dim (already per-group for grouped convs) times
    # the kernel spatial dims
    k = rhs.shape[dnums.rhs_spec[1]]
    for d in dnums.rhs_spec[2:]:
        k *= rhs.shape[d]
    return 2 * out.size * k


def count_forward_flops(jaxpr) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            total += _dot_flops(eqn)
        elif eqn.primitive.name == "conv_general_dilated":
            total += _conv_flops(eqn)
        # recurse into sub-jaxprs (pjit, custom_vjp, checkpoint, scan ...)
        for v in eqn.params.values():
            sub = getattr(v, "jaxpr", None)
            if sub is not None:
                total += count_forward_flops(sub)
            elif isinstance(v, (list, tuple)):
                for vi in v:
                    subi = getattr(vi, "jaxpr", None)
                    if subi is not None:
                        total += count_forward_flops(subi)
    return total


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "dla"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from centernet_uda_tpu import models as model_registry
    from centernet_uda_tpu.ops import dcn as dcn_ops

    # the XLA DCN path: its dot_generals carry exactly the conv math
    # (the (B, HoWo, K*Cin) @ (K*Cin, Cout) contraction); the Pallas path
    # hides the same math inside pallas_call, which a jaxpr walk can't see
    dcn_ops.set_pallas_default(False)
    be = model_registry.build(backend, **(
        {"num_classes": 6} if backend != "resnet"
        else {"num_layers": 18, "num_classes": 6, "pretrained": False}))
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = be.module.init(jax.random.PRNGKey(0), x, train=False)
    jaxpr = jax.make_jaxpr(
        lambda v, xx: be.module.apply(v, xx, train=False))(variables, x)
    flops = count_forward_flops(jaxpr.jaxpr)
    print(f"{backend} {size}px forward: {flops / 1e9:.2f} GFLOP/img "
          "(dot_general + conv only)")


if __name__ == "__main__":
    main()
