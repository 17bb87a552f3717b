"""Decode parity tests against an independent numpy oracle.

The oracle re-derives the reference semantics (backends/decode.py:6-76) in
plain numpy: 3x3 peak suppression, per-class-then-global top-k, gather of
reg/wh at the selected indices, and box assembly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centernet_uda_tpu.ops.decode import decode_detections, nms_peaks, top_k_peaks


def np_nms(heat, kernel=3):
    """numpy oracle of peak suppression (NCHW-free: operates on (B,H,W,C))."""
    b, h, w, c = heat.shape
    pad = (kernel - 1) // 2
    padded = np.pad(
        heat, ((0, 0), (pad, pad), (pad, pad), (0, 0)), constant_values=-np.inf
    )
    out = np.zeros_like(heat)
    for i in range(h):
        for j in range(w):
            window = padded[:, i : i + kernel, j : j + kernel, :]
            hmax = window.max(axis=(1, 2))
            out[:, i, j, :] = np.where(hmax == heat[:, i, j, :], heat[:, i, j, :], 0.0)
    return out


def np_topk(scores, k):
    """numpy oracle of the two-stage top-k (backends/decode.py:16-32)."""
    b, h, w, c = scores.shape
    per_class = scores.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    # top-k per class, descending (stable order irrelevant for distinct vals)
    idx = np.argsort(-per_class, axis=-1)[:, :, :k]
    topk_scores = np.take_along_axis(per_class, idx, axis=-1)
    ys = (idx // w).astype(np.float32)
    xs = (idx % w).astype(np.float32)

    flat_scores = topk_scores.reshape(b, c * k)
    gidx = np.argsort(-flat_scores, axis=-1)[:, :k]
    score = np.take_along_axis(flat_scores, gidx, axis=-1)
    cls = gidx // k
    inds = np.take_along_axis(idx.reshape(b, c * k), gidx, axis=-1)
    ys = np.take_along_axis(ys.reshape(b, c * k), gidx, axis=-1)
    xs = np.take_along_axis(xs.reshape(b, c * k), gidx, axis=-1)
    return score, inds, cls, ys, xs


@pytest.fixture
def heads(rng):
    b, h, w, c = 2, 16, 24, 5
    # distinct values so top-k order is unambiguous between implementations
    hm = rng.permutation(b * h * w * c).astype(np.float32).reshape(b, h, w, c)
    hm /= hm.size
    wh = rng.randn(b, h, w, 2).astype(np.float32)
    reg = rng.rand(b, h, w, 2).astype(np.float32)
    return hm, wh, reg


def test_nms_matches_oracle(heads):
    hm, _, _ = heads
    got = np.asarray(nms_peaks(jnp.asarray(hm)))
    want = np_nms(hm)
    np.testing.assert_allclose(got, want, atol=0)


def test_nms_keeps_plateaus_like_reference(rng):
    # the reference equality trick keeps *all* pixels of a tied plateau
    hm = np.zeros((1, 8, 8, 1), np.float32)
    hm[0, 3, 3, 0] = hm[0, 3, 4, 0] = 0.7
    got = np.asarray(nms_peaks(jnp.asarray(hm)))
    assert got[0, 3, 3, 0] == 0.7 and got[0, 3, 4, 0] == 0.7


def test_topk_matches_oracle(heads):
    hm, _, _ = heads
    k = 7
    score, inds, cls, ys, xs = [np.asarray(x) for x in top_k_peaks(jnp.asarray(hm), k)]
    score_o, inds_o, cls_o, ys_o, xs_o = np_topk(hm, k)
    np.testing.assert_allclose(score, score_o, rtol=1e-6)
    np.testing.assert_array_equal(inds, inds_o)
    np.testing.assert_array_equal(cls, cls_o)
    np.testing.assert_array_equal(ys, ys_o)
    np.testing.assert_array_equal(xs, xs_o)


def test_decode_boxes(heads):
    hm, wh, reg = heads
    k = 5
    dets = np.asarray(
        decode_detections(jnp.asarray(hm), jnp.asarray(wh), jnp.asarray(reg), k=k)
    )
    assert dets.shape == (2, k, 6)

    score_o, inds_o, cls_o, ys_o, xs_o = np_topk(np_nms(hm), k)
    b, h, w, _ = wh.shape
    wh_flat = wh.reshape(b, h * w, 2)
    reg_flat = reg.reshape(b, h * w, 2)
    for bi in range(b):
        for ki in range(k):
            ind = inds_o[bi, ki]
            cx = xs_o[bi, ki] + reg_flat[bi, ind, 0]
            cy = ys_o[bi, ki] + reg_flat[bi, ind, 1]
            ww, hh = wh_flat[bi, ind]
            np.testing.assert_allclose(
                dets[bi, ki],
                [cx - ww / 2, cy - hh / 2, cx + ww / 2, cy + hh / 2,
                 score_o[bi, ki], cls_o[bi, ki]],
                rtol=1e-5, atol=1e-5,
            )


def test_decode_rotated_angle_range(heads):
    hm, _, reg = heads
    wh3 = np.random.RandomState(1).randn(2, 16, 24, 3).astype(np.float32)
    dets = np.asarray(
        decode_detections(jnp.asarray(hm), jnp.asarray(wh3), jnp.asarray(reg),
                          k=4, rotated=True)
    )
    assert dets.shape == (2, 4, 7)
    angles = dets[..., 4]
    assert np.all(angles >= -180.0) and np.all(angles <= 180.0)


def test_decode_keypoints(heads):
    hm, wh, reg = heads
    kps = np.random.RandomState(2).randn(2, 16, 24, 6).astype(np.float32)
    dets, kp = decode_detections(
        jnp.asarray(hm), jnp.asarray(wh), jnp.asarray(reg), kps=jnp.asarray(kps), k=4
    )
    kp = np.asarray(kp)
    assert kp.shape == (2, 4, 3, 2)
    # keypoints are center-relative offsets shifted by decoded centers
    dets = np.asarray(dets)
    cx = (dets[..., 0] + dets[..., 2]) / 2
    b, h, w, _ = kps.shape
    kps_flat = kps.reshape(b, h * w, 3, 2)
    score_o, inds_o, _, _, _ = np_topk(np_nms(hm), 4)
    for bi in range(2):
        for ki in range(4):
            np.testing.assert_allclose(
                kp[bi, ki, :, 0], kps_flat[bi, inds_o[bi, ki], :, 0] + cx[bi, ki],
                rtol=1e-5, atol=1e-5,
            )


def test_decode_jits():
    f = jax.jit(lambda hm, wh, reg: decode_detections(hm, wh, reg, k=10,
                                                      apply_sigmoid=True))
    hm = jnp.zeros((1, 32, 32, 3))
    out = f(hm, jnp.ones((1, 32, 32, 2)), jnp.zeros((1, 32, 32, 2)))
    assert out.shape == (1, 10, 6)
