"""Coverage for the smaller subsystems: merger, visualizer, meters,
checkpoint partial-load, dense-reg helpers."""

import numpy as np
import pytest

from tests.util_fixtures import make_tiny_coco


def test_coco_merger(tmp_path):
    d1 = make_tiny_coco(tmp_path / "a", num_images=3, size=(32, 32),
                        num_classes=2, seed=1)
    d2 = make_tiny_coco(tmp_path / "b", num_images=2, size=(32, 32),
                        num_classes=2, seed=2)

    from centernet_uda_tpu.data.coco_merger import Dataset

    merged = Dataset(
        datasets=[
            {"name": "coco", "params": {"image_folder": str(d1[0]),
                                        "annotation_file": str(d1[1])}},
            {"name": "coco", "params": {"image_folder": str(d2[0]),
                                        "annotation_file": str(d2[1])}},
        ],
        input_size=(32, 32), num_classes=2, max_detections=6, seed=0,
    )
    assert len(merged) == 5
    # indices dispatch across children with correct offsets
    for i in range(5):
        s = merged[i]
        assert s["input"].shape == (32, 32, 3)
    assert merged.classes  # exposed for the evaluator


def test_visualizer_draws():
    from centernet_uda_tpu.utils.visualize import Visualizer

    viz = Visualizer(classes={0: {"name": "a"}, 1: {"name": "b"}})
    img = np.zeros((64, 64, 3), np.float32)
    canvas = viz.visualize_detections(
        img,
        pred_boxes=np.array([[4, 4, 20, 20]], np.float32),
        pred_classes=np.array([0]),
        pred_scores=np.array([0.9], np.float32),
        gt_boxes=np.array([[5, 5, 21, 21]], np.float32),
        gt_classes=np.array([1]),
    )
    assert canvas.shape == (64, 64 * 2 + 4, 3)
    assert canvas.dtype == np.uint8
    assert canvas.max() > 0  # something was drawn


def test_visualizer_rotated_and_kps():
    from centernet_uda_tpu.utils.visualize import Visualizer

    viz = Visualizer(num_classes=3)
    img = np.zeros((64, 64, 3), np.float32)
    canvas = viz.visualize_detections(
        img,
        pred_boxes=np.array([[32, 32, 10, 20, 30.0]], np.float32),
        pred_classes=np.array([2]),
        pred_scores=np.array([0.9], np.float32),
        gt_boxes=np.array([[30, 30, 10, 20, -10.0]], np.float32),
        gt_classes=np.array([1]),
        rotated=True,
        pred_kps=np.array([[[32, 32], [40, 40]]], np.float32),
    )
    assert canvas.max() > 0


def test_average_meter():
    from centernet_uda_tpu.utils.meters import AverageMeter

    m = AverageMeter("loss")
    m.update(2.0, n=2)
    m.update(4.0, n=2)
    assert m.avg == pytest.approx(3.0)
    assert m.count == 4
    m.reset()
    assert m.avg == 0.0


def test_checkpoint_partial_load(tmp_path):
    """Shape-mismatched params keep fresh values (utils/helper.py:103-110)."""
    import jax
    import jax.numpy as jnp

    from centernet_uda_tpu.uda.state import TrainState
    from centernet_uda_tpu.utils import checkpoint as ckpt

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params={"a": jnp.ones((4,)), "b": jnp.ones((2, 2))},
        batch_stats={},
        opt_state=None,
    )
    ckpt.save_checkpoint(tmp_path / "m.ckpt", state, epoch=3)

    # new model where 'b' changed shape and 'c' is new
    state2 = TrainState(
        step=jnp.zeros((), jnp.int32),
        params={"a": jnp.zeros((4,)), "b": jnp.zeros((3, 3)),
                "c": jnp.full((2,), 7.0)},
        batch_stats={},
        opt_state=None,
    )
    restored, epoch = ckpt.load_checkpoint(tmp_path / "m.ckpt", state2,
                                           resume=True)
    assert epoch == 3
    np.testing.assert_allclose(np.asarray(restored.params["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(restored.params["b"]), 0.0)  # skip
    np.testing.assert_allclose(np.asarray(restored.params["c"]), 7.0)  # keep

    # missing file: warning + no change (utils/helper.py:85-88)
    none_state, epoch0 = ckpt.load_checkpoint(tmp_path / "nope.ckpt", state2)
    assert none_state is None and epoch0 == 0


def test_draw_dense_reg_and_msra():
    from centernet_uda_tpu.ops.gaussian import draw_dense_reg, draw_msra_gaussian

    hm = np.zeros((16, 16), np.float32)
    reg = np.zeros((2, 16, 16), np.float32)
    draw_dense_reg(reg, hm, (8, 8), value=[3.0, 4.0], radius=2,
                   is_offset=False)
    assert reg[0].max() == pytest.approx(3.0)
    assert reg[1].max() == pytest.approx(4.0)

    hm2 = np.zeros((16, 16), np.float32)
    draw_msra_gaussian(hm2, (8, 8), sigma=2.0)
    assert hm2.max() == pytest.approx(1.0, abs=1e-3)
    assert hm2[8, 8] > hm2[8, 12]
