"""Native C++ target encoder: bit-level parity with the Python path."""

import numpy as np
import pytest

from centernet_uda_tpu import native
from centernet_uda_tpu.data.coco import Dataset
from centernet_uda_tpu.ops.gaussian import draw_gaussian, gaussian_radius
from tests.util_fixtures import make_tiny_coco

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native encoder"
)


def test_gaussian_radius_matches():
    lib = native.load()
    for h, w in [(10, 10), (3, 37), (120, 44)]:
        got = lib.gaussian_radius(float(h), float(w), 0.7)
        want = gaussian_radius((h, w))
        assert got == pytest.approx(want, rel=1e-12)


def test_draw_gaussian_matches(rng):
    import ctypes

    lib = native.load()
    for _ in range(5):
        h, w = 32, 40
        cx, cy = int(rng.randint(0, w)), int(rng.randint(0, h))
        r = int(rng.randint(0, 7))
        want = np.zeros((h, w), np.float32)
        draw_gaussian(want, (cx, cy), r)
        got = np.zeros((h, w), np.float32)
        lib.draw_gaussian(
            got.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h, w, cx, cy, r,
        )
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_encode_targets_matches_python(rng):
    boxes = np.array(
        [[2.1, 3.4, 10.8, 12.2], [0.0, 0.0, 15.9, 8.3], [5, 5, 5, 9]],
        np.float32,
    )  # third box has zero width -> skipped
    classes = np.array([0, 2, 1], np.int32)
    areas = np.array([100.0, -1.0, 50.0], np.float32)

    t = native.encode_targets(boxes, classes, areas, 16, 16, 3, 8)
    assert t is not None

    # python oracle (the dataset's loop semantics)
    hm = np.zeros((16, 16, 3), np.float32)
    for k in range(3):
        b = boxes[k].copy()
        b[[0, 2]] = np.clip(b[[0, 2]], 0, 15)
        b[[1, 3]] = np.clip(b[[1, 3]], 0, 15)
        h, w = b[3] - b[1], b[2] - b[0]
        if h <= 0 or w <= 0:
            continue
        radius = max(0, int(gaussian_radius((np.ceil(h), np.ceil(w)))))
        ct = np.array([(b[0] + b[2]) / 2, (b[1] + b[3]) / 2], np.float32)
        ct_int = ct.astype(np.int32)
        draw_gaussian(hm[:, :, classes[k]], ct_int, radius)

    np.testing.assert_allclose(t["hm"], hm, atol=1e-6)
    assert t["reg_mask"][0] == 1 and t["reg_mask"][1] == 1
    assert t["reg_mask"][2] == 0  # degenerate box skipped
    np.testing.assert_allclose(t["wh"][0], [10.8 - 2.1, 12.2 - 3.4], rtol=1e-5)
    assert t["ind"][0] == int((3.4 + 12.2) / 2) * 16 + int((2.1 + 10.8) / 2)
    assert t["gt_areas"][0] == 100.0
    # area derived from the *clipped* box when the annotation has none
    # (the reference clips before computing w*h, datasets/coco.py:199-233)
    np.testing.assert_allclose(t["gt_areas"][1], 15.0 * 8.3, rtol=1e-4)


def test_dataset_native_matches_python(tmp_path):
    img_dir, anno = make_tiny_coco(tmp_path, num_images=3, size=(64, 64),
                                   num_classes=3)
    kw = dict(
        image_folder=str(img_dir), annotation_file=str(anno),
        input_size=(64, 64), num_classes=3, max_detections=10, seed=0,
    )
    ds_native = Dataset(use_native_encoder=True, **kw)
    ds_python = Dataset(use_native_encoder=False, **kw)
    for i in range(3):
        a, b = ds_native[i], ds_python[i]
        assert set(a) == set(b)
        for key in a:
            np.testing.assert_allclose(
                np.asarray(a[key], np.float64), np.asarray(b[key], np.float64),
                atol=1e-6, err_msg=f"sample {i} key {key}",
            )


def test_normalize_image_matches(rng):
    img = rng.randint(0, 255, (16, 20, 3), np.uint8)
    mean = (0.40789654, 0.44719302, 0.47026115)
    std = (0.28863828, 0.27408164, 0.27809835)
    got = native.normalize_image(img, mean, std)
    want = (img.astype(np.float32) / 255.0 - np.array(mean, np.float32)) \
        / np.array(std, np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)
