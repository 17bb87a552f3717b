"""Deformable PS-RoI pooling tests — the reference's pooling properties
(libs/DCNv2/testcuda.py: check_pooling_zero_offset :100-119, gradcheck
:134-166) plus a scalar numpy oracle of the CUDA kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centernet_uda_tpu.ops.dcn_pooling import DCNPooling, dcn_v2_pooling


def np_psroi(x, rois, trans, spatial_scale, ps, output_dim, no_trans,
             g=1, part=None, sp=4, trans_std=0.0):
    """Scalar-loop oracle of DeformablePSROIPoolForwardKernelCuda."""
    b, h, w, c = x.shape
    n = rois.shape[0]
    part = ps if part is None else part
    num_classes = 1 if no_trans else trans.shape[1] // 2
    cec = max(output_dim // num_classes, 1)
    out = np.zeros((n, ps, ps, output_dim), np.float64)

    def bilinear(plane, py, px):
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        dy, dx = py - y0, px - x0
        return (plane[y0, x0] * (1 - dy) * (1 - dx)
                + plane[y0, x1] * (1 - dy) * dx
                + plane[y1, x0] * dy * (1 - dx)
                + plane[y1, x1] * dy * dx)

    for ni in range(n):
        bi = int(rois[ni, 0])
        sw = round(rois[ni, 1]) * spatial_scale - 0.5
        sh = round(rois[ni, 2]) * spatial_scale - 0.5
        ew = (round(rois[ni, 3]) + 1.0) * spatial_scale - 0.5
        eh = (round(rois[ni, 4]) + 1.0) * spatial_scale - 0.5
        rw, rh = max(ew - sw, 0.1), max(eh - sh, 0.1)
        bw, bh = rw / ps, rh / ps
        sbw, sbh = bw / sp, bh / sp
        for ctop in range(output_dim):
            cls = ctop // cec
            for ph in range(ps):
                for pw in range(ps):
                    p_h = int(np.floor(ph / ps * part))
                    p_w = int(np.floor(pw / ps * part))
                    tx = 0.0 if no_trans else trans[ni, cls * 2, p_h, p_w] * trans_std
                    ty = 0.0 if no_trans else trans[ni, cls * 2 + 1, p_h, p_w] * trans_std
                    ws = pw * bw + sw + tx * rw
                    hs = ph * bh + sh + ty * rh
                    gw = min(max(int(np.floor(pw * g / ps)), 0), g - 1)
                    gh = min(max(int(np.floor(ph * g / ps)), 0), g - 1)
                    chan = (ctop * g + gh) * g + gw
                    total, cnt = 0.0, 0
                    for ih in range(sp):
                        for iw in range(sp):
                            sx = ws + iw * sbw
                            sy = hs + ih * sbh
                            if sx < -0.5 or sx > w - 0.5 or sy < -0.5 or sy > h - 0.5:
                                continue
                            sx = min(max(sx, 0.0), w - 1.0)
                            sy = min(max(sy, 0.0), h - 1.0)
                            total += bilinear(x[bi, :, :, chan], sy, sx)
                            cnt += 1
                    out[ni, ph, pw, ctop] = 0.0 if cnt == 0 else total / cnt
    return out


@pytest.fixture
def pool_inputs(rng):
    b, h, w = 2, 16, 16
    output_dim, g, ps = 4, 2, 4
    c = output_dim * g * g
    x = rng.randn(b, h, w, c).astype(np.float32)
    rois = np.array(
        [[0, 2, 2, 10, 12], [1, 0, 0, 15, 15], [0, 5, 7, 9, 9]], np.float32
    )
    trans = (rng.randn(3, 2, ps, ps) * 1.0).astype(np.float32)
    return x, rois, trans, output_dim, g, ps


def test_matches_oracle_no_trans(pool_inputs):
    x, rois, trans, output_dim, g, ps = pool_inputs
    got = np.asarray(dcn_v2_pooling(
        jnp.asarray(x), jnp.asarray(rois), None, 1.0, ps, output_dim,
        True, group_size=g,
    ))
    want = np_psroi(x, rois, None, 1.0, ps, output_dim, True, g=g)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_matches_oracle_with_trans(pool_inputs):
    x, rois, trans, output_dim, g, ps = pool_inputs
    got = np.asarray(dcn_v2_pooling(
        jnp.asarray(x), jnp.asarray(rois), jnp.asarray(trans), 1.0, ps,
        output_dim, False, group_size=g, trans_std=0.1,
    ))
    want = np_psroi(x, rois, trans, 1.0, ps, output_dim, False, g=g,
                    trans_std=0.1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_zero_offset_pooling_deterministic(rng):
    """Constant-valued channels pool to the constant (the reference's
    check_pooling_zero_offset property)."""
    output_dim, g, ps = 2, 1, 3
    x = np.zeros((1, 12, 12, output_dim), np.float32)
    x[..., 0] = 3.5
    x[..., 1] = -1.25
    rois = np.array([[0, 1, 1, 9, 9]], np.float32)
    out = np.asarray(dcn_v2_pooling(
        jnp.asarray(x), jnp.asarray(rois), None, 1.0, ps, output_dim, True,
    ))
    np.testing.assert_allclose(out[..., 0], 3.5, rtol=1e-5)
    np.testing.assert_allclose(out[..., 1], -1.25, rtol=1e-5)


def test_gradients(pool_inputs):
    x, rois, trans, output_dim, g, ps = pool_inputs

    def f(x, trans):
        return dcn_v2_pooling(
            jnp.asarray(x), jnp.asarray(rois), trans, 1.0, ps, output_dim,
            False, group_size=g, trans_std=0.1,
        ).sum()

    gx, gt = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(trans))
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gt)).all()
    assert float(jnp.abs(gx).sum()) > 0


def test_dcn_pooling_module(pool_inputs, rng):
    x, rois, trans, output_dim, g, ps = pool_inputs
    module = DCNPooling(spatial_scale=1.0, pooled_size=ps,
                        output_dim=output_dim, no_trans=False, group_size=g,
                        trans_std=0.1)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x),
                            jnp.asarray(rois))
    out = module.apply(variables, jnp.asarray(x), jnp.asarray(rois))
    assert out.shape == (3, ps, ps, output_dim)
    # zero-initialized offset head => sigmoid(0)=0.5 modulation of the
    # no-trans pooling (the reference's example_mdpooling starting point)
    base = dcn_v2_pooling(jnp.asarray(x), jnp.asarray(rois), None, 1.0, ps,
                          output_dim, True, group_size=g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base) * 0.5,
                               rtol=1e-4, atol=1e-5)
