"""Dataset + target-encoding tests on a synthetic tiny COCO split."""

import numpy as np
import pytest

from centernet_uda_tpu.data.coco import Dataset
from centernet_uda_tpu.data.loader import DataLoader, collate
from tests.util_fixtures import make_tiny_coco


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny_coco")
    return make_tiny_coco(root, num_images=4, size=(64, 64), num_classes=3)


def make_dataset(tiny_coco, **kw):
    img_dir, anno = tiny_coco
    defaults = dict(
        image_folder=str(img_dir),
        annotation_file=str(anno),
        input_size=(64, 64),
        num_classes=3,
        max_detections=10,
        down_ratio=4,
        seed=0,
    )
    defaults.update(kw)
    return Dataset(**defaults)


def test_sample_shapes(tiny_coco):
    ds = make_dataset(tiny_coco)
    assert len(ds) == 4
    s = ds[0]
    assert s["input"].shape == (64, 64, 3)
    assert s["input"].dtype == np.float32
    assert s["hm"].shape == (16, 16, 3)
    assert s["wh"].shape == (10, 2)
    assert s["reg"].shape == (10, 2)
    assert s["ind"].shape == (10,)
    assert s["reg_mask"].shape == (10,)
    assert s["gt_dets"].shape == (10, 6)
    assert s["gt_areas"].shape == (10,)


def test_heatmap_peaks_at_centers(tiny_coco):
    ds = make_dataset(tiny_coco)
    s = ds[0]
    n_obj = int(s["reg_mask"].sum())
    assert n_obj >= 1
    # every valid object has hm == 1 at its center index
    flat_max = s["hm"].reshape(-1, 3).max(axis=1)
    for k in range(n_obj):
        assert flat_max[s["ind"][k]] == 1.0
    # reg is a sub-pixel remainder
    assert np.all(s["reg"][:n_obj] >= 0) and np.all(s["reg"][:n_obj] < 1)


def test_ind_consistent_with_gt(tiny_coco):
    ds = make_dataset(tiny_coco)
    s = ds[1]
    n_obj = int(s["reg_mask"].sum())
    w = 16
    for k in range(n_obj):
        cx = (s["gt_dets"][k, 0] + s["gt_dets"][k, 2]) / 2
        cy = (s["gt_dets"][k, 1] + s["gt_dets"][k, 3]) / 2
        assert s["ind"][k] == int(cy) * w + int(cx)


def test_augmentation_pipeline(tiny_coco):
    augmentation = [
        {"Sometimes": {"p": 1.0, "then_list": [
            {"Affine": {"translate_percent": [-0.1, 0.1], "scale": [0.9, 1.1]}},
            {"AddToBrightness": {"add": [-20, 20]}},
        ]}},
        {"Fliplr": {"p": 0.5}},
    ]
    ds = make_dataset(tiny_coco, augmentation=augmentation)
    s = ds[0]
    assert s["input"].shape == (64, 64, 3)
    assert np.isfinite(s["input"]).all()
    assert s["hm"].max() <= 1.0


def test_rotated_dataset(tmp_path):
    img_dir, anno = make_tiny_coco(
        tmp_path, num_images=2, size=(64, 64), num_classes=2, rotated=True
    )
    ds = Dataset(
        image_folder=str(img_dir),
        annotation_file=str(anno),
        input_size=(64, 64),
        num_classes=2,
        max_detections=8,
        rotated_boxes=True,
        seed=0,
    )
    s = ds[0]
    assert s["wh"].shape == (8, 3)
    assert s["gt_dets"].shape == (8, 7)
    n_obj = int(s["reg_mask"].sum())
    assert n_obj >= 1
    # canonical angle range
    angles = s["wh"][:n_obj, 2]
    assert np.all(angles >= -90) and np.all(angles < 90)
    # w < h canonical form
    assert np.all(s["wh"][:n_obj, 0] <= s["wh"][:n_obj, 1])


def test_target_domain_input(tiny_coco, tmp_path):
    img_dir, anno = tiny_coco
    ds = make_dataset(
        tiny_coco, target_domain_glob=str(img_dir / "*.png")
    )
    s = ds[0]
    assert "target_domain_input" in s
    assert s["target_domain_input"].shape == (64, 64, 3)


def test_loader_batches(tiny_coco):
    ds = make_dataset(tiny_coco)
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["input"].shape == (2, 64, 64, 3)
    assert batches[0]["hm"].shape == (2, 16, 16, 3)


def test_loader_process_workers(tiny_coco):
    """Forked worker-process mode yields the same batches as threads."""
    ds = make_dataset(tiny_coco)
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                        seed=5, worker_mode="process")
    ref = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=5)
    got = list(loader)
    want = list(ref)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a["input"], b["input"])
        np.testing.assert_array_equal(a["hm"], b["hm"])


def test_loader_drop_last(tiny_coco):
    ds = make_dataset(tiny_coco)
    loader = DataLoader(ds, batch_size=3, drop_last=True)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["input"].shape[0] == 3


def test_loader_multihost_sharding(tiny_coco):
    """Disjoint, equal-size shards with identical shuffles across hosts."""
    ds = make_dataset(tiny_coco)
    loaders = [
        DataLoader(ds, batch_size=1, shuffle=True, seed=7,
                   shard_id=i, num_shards=2)
        for i in range(2)
    ]
    idx_sets = []
    for loader in loaders:
        ids = [int(b["id"][0]) for b in loader]
        idx_sets.append(set(ids))
        assert len(ids) == 2  # 4 samples / 2 shards
    assert idx_sets[0].isdisjoint(idx_sets[1])
    assert idx_sets[0] | idx_sets[1] == {1, 2, 3, 4}


def test_loader_pad_last(tiny_coco):
    """pad_last pads the final batch to batch_size by repeating samples and
    records the real count in _num_real; every sample is still covered once
    (eval-set integrity, ref train.py:168-194 evaluates the full split)."""
    ds = make_dataset(tiny_coco)
    loader = DataLoader(ds, batch_size=3, pad_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["input"].shape[0] == 3
    assert "_num_real" not in batches[0]
    last = batches[1]
    assert last["input"].shape[0] == 3  # padded to the full batch
    assert int(last["_num_real"]) == 1
    # padded rows are repeats of the real rows
    np.testing.assert_array_equal(last["input"][1], last["input"][0])
    ids = [int(i) for b in batches for i in b["id"][: int(
        b.get("_num_real", b["id"].shape[0]))]]
    assert sorted(ids) == [1, 2, 3, 4]


def test_loader_pad_last_with_workers(tiny_coco):
    ds = make_dataset(tiny_coco)
    loader = DataLoader(ds, batch_size=3, pad_last=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert int(batches[1]["_num_real"]) == 1
    assert batches[1]["input"].shape[0] == 3


def test_loader_sharded_pad_last_full_split(tmp_path):
    """Multi-host eval must cover the FULL split: with pad_last, shards are
    strided so every sample reaches the evaluator exactly once even when
    num_shards does not divide the dataset size (the reference evaluates
    every sample, evaluation/coco.py:84-121)."""
    root = make_tiny_coco(tmp_path, num_images=10, size=(64, 64),
                          num_classes=3)
    ds = make_dataset(root)
    seen, counts = [], []
    for i in range(3):
        loader = DataLoader(ds, batch_size=4, pad_last=True,
                            shard_id=i, num_shards=3)
        batches = list(loader)
        counts.append(len(batches))
        assert len(batches) == len(loader)
        for b in batches:
            assert b["input"].shape[0] == 4  # always mesh-divisible
            n_real = int(b.get("_num_real", b["id"].shape[0]))
            seen.extend(int(x) for x in b["id"][:n_real])
    # every shard emits the same number of batches (collective lockstep)
    assert len(set(counts)) == 1
    # every sample exactly once across shards
    assert sorted(seen) == list(range(1, 11))


def test_loader_sharded_pad_last_lockstep_tail(tmp_path):
    """A shard whose samples fill fewer batches than the longest shard emits
    fully padded batches (_num_real == 0) so every host runs the same number
    of steps."""
    root = make_tiny_coco(tmp_path, num_images=9, size=(64, 64),
                          num_classes=3)
    ds = make_dataset(root)
    # shards of 5 and 4 samples at batch 4 -> 2 batches each
    per_shard = []
    seen = []
    for i in range(2):
        loader = DataLoader(ds, batch_size=4, pad_last=True,
                            shard_id=i, num_shards=2)
        batches = list(loader)
        per_shard.append(batches)
        for b in batches:
            n_real = int(b.get("_num_real", b["id"].shape[0]))
            seen.extend(int(x) for x in b["id"][:n_real])
    assert len(per_shard[0]) == 2 and len(per_shard[1]) == 2
    # shard 1 has 4 real samples -> its 2nd batch is pure padding
    assert int(per_shard[1][1]["_num_real"]) == 0
    assert sorted(seen) == list(range(1, 10))
