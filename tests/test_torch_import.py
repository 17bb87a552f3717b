"""Torch .pth import shim tests.

Builds a synthetic torch state dict by inverse-mapping our flax tree
(covering every leaf), saves it with torch.save, imports it, and checks
every leaf round-trips through the orientation transforms exactly. The
transforms themselves are validated against torch functional ops in
test_dla.py (conv-transpose) and below (conv OIHW->HWIO).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from centernet_uda_tpu import models  # noqa: E402
from centernet_uda_tpu.utils import torch_import as ti  # noqa: E402


def _torch_shape(transform, flax_shape):
    if transform is ti._ID:
        return tuple(flax_shape)
    if transform is ti.conv_kernel:
        kh, kw, cin, cout = flax_shape
        return (cout, cin, kh, kw)
    if transform is ti.conv_transpose_kernel:
        kh, kw, cin, cout = flax_shape
        return (cin, cout, kh, kw)
    if transform is ti.conv_transpose_kernel_grouped:
        kh, kw, one, o = flax_shape
        return (o, one, kh, kw)
    raise AssertionError(f"unknown transform {transform}")


def _build_synthetic_sd(variables, path_to_torch):
    rng = np.random.RandomState(0)
    sd = {}
    unmapped = []
    for collection in ("params", "batch_stats"):
        flat = ti._flatten(variables.get(collection, {}))
        for path, value in flat.items():
            spec = path_to_torch(collection, path)
            if spec is None:
                unmapped.append((collection,) + path)
                continue
            tkey, transform = spec
            tshape = _torch_shape(transform, value.shape)
            sd[tkey] = rng.randn(*tshape).astype(np.float32)
    return sd, unmapped


@pytest.mark.parametrize(
    "backend_name,params,mapper",
    [
        ("dla", {"num_classes": 3}, ti._dla_path_to_torch),
        ("resnet", {"num_layers": 18, "num_classes": 3, "pretrained": False},
         ti._resnet_path_to_torch),
    ],
)
def test_full_roundtrip(tmp_path, backend_name, params, mapper):
    backend = models.build(backend_name, **params)
    variables = backend.init(jax.random.PRNGKey(0), (64, 64))

    sd_np, unmapped = _build_synthetic_sd(variables, mapper)
    # every flax leaf must be reachable from a torch key
    assert unmapped == [], f"unmapped flax leaves: {unmapped[:8]}"

    # save as a reference-style checkpoint {epoch, state_dict} with
    # DataParallel 'module.' prefixes (utils/helper.py:96-100)
    path = tmp_path / "weights.pth"
    torch.save(
        {
            "epoch": 7,
            "state_dict": {
                "module." + k: torch.from_numpy(v) for k, v in sd_np.items()
            },
        },
        path,
    )

    imported = ti.import_state_dict(str(path), variables, backend.name)

    for collection in ("params", "batch_stats"):
        flat_new = ti._flatten(imported[collection])
        for p, value in flat_new.items():
            tkey, transform = mapper(collection, p)
            want = np.asarray(transform(sd_np[tkey]))
            np.testing.assert_array_equal(
                np.asarray(value), want,
                err_msg=f"{collection}/{'/'.join(p)} <- {tkey}",
            )

    # the imported model must still run
    out = backend.module.apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    assert out["hm"].shape == (1, 16, 16, 3)


def test_conv_kernel_orientation(rng):
    """OIHW->HWIO transform gives identical conv results as torch."""
    x = rng.randn(1, 6, 6, 3).astype(np.float32)
    wt = rng.randn(5, 3, 3, 3).astype(np.float32)  # torch OIHW
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(wt),
        padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x), ti.conv_kernel(wt),
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_shape_mismatch_skipped(tmp_path):
    """Wrong-shape torch tensors keep the fresh value (helper.py:103-110)."""
    backend = models.build("resnet", num_layers=18, num_classes=3,
                           pretrained=False)
    variables = backend.init(jax.random.PRNGKey(0), (64, 64))
    fresh_head = np.asarray(variables["params"]["heads"]["hm_out"]["kernel"])

    sd = {"hm.2.weight": torch.zeros(9, 64, 1, 1)}  # 9 classes vs ours 3
    path = tmp_path / "w.pth"
    torch.save({"state_dict": sd}, path)
    imported = ti.import_state_dict(str(path), variables, "resnet18")
    np.testing.assert_array_equal(
        np.asarray(imported["params"]["heads"]["hm_out"]["kernel"]), fresh_head
    )


# ---------------------------------------------------------------------------
# mobilenetv2 / efficientnet full-model shims
# ---------------------------------------------------------------------------


def _mnv2_mapper(use_dcn):
    def mapper(collection, path):
        return ti._mobilenetv2_path_to_torch(collection, path,
                                             use_dcn=use_dcn)
    return mapper


def _effnet_mapper(use_upsample):
    def mapper(collection, path):
        return ti._efficientnet_path_to_torch(collection, path,
                                              use_upsample=use_upsample)
    return mapper


@pytest.mark.parametrize(
    "backend_name,params,mapper",
    [
        ("mobilenetv2", {"num_classes": 3}, _mnv2_mapper(False)),
        ("mobilenetv2",
         {"num_classes": 3, "use_dcn": True, "use_skip": True},
         _mnv2_mapper(True)),
        ("efficientnet",
         {"num_classes": 3, "variant": "b0", "use_skip": True},
         _effnet_mapper(False)),
        ("efficientnet",
         {"num_classes": 3, "variant": "b1", "use_upsample": True},
         _effnet_mapper(True)),
    ],
)
def test_full_roundtrip_mnv2_effnet(tmp_path, backend_name, params, mapper):
    backend = models.build(backend_name, **params)
    variables = backend.init(jax.random.PRNGKey(0), (64, 64))

    sd_np, unmapped = _build_synthetic_sd(variables, mapper)
    assert unmapped == [], f"unmapped flax leaves: {unmapped[:8]}"

    path = tmp_path / "weights.pth"
    torch.save(
        {"state_dict": {
            "module." + k: torch.from_numpy(v) for k, v in sd_np.items()
        }},
        path,
    )
    imported = ti.import_state_dict(str(path), variables, backend.name)

    for collection in ("params", "batch_stats"):
        flat_new = ti._flatten(imported[collection])
        for p, value in flat_new.items():
            tkey, transform = mapper(collection, p)
            want = np.asarray(transform(sd_np[tkey]))
            np.testing.assert_array_equal(
                np.asarray(value), want,
                err_msg=f"{collection}/{'/'.join(p)} <- {tkey}",
            )

    out = backend.module.apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    assert out["hm"].shape == (1, 16, 16, 3)


# ---------------------------------------------------------------------------
# backbone (trunk-only ImageNet) pretrained import — all four backends
# ---------------------------------------------------------------------------

_TRUNK_CASES = [
    ("resnet", {"num_layers": 18, "num_classes": 3, "pretrained": False},
     ti._resnet_trunk_path_to_torch),
    ("resnet", {"num_layers": 50, "num_classes": 3, "pretrained": False},
     ti._resnet_trunk_path_to_torch),
    ("dla", {"num_classes": 3}, ti._dla_trunk_path_to_torch),
    ("mobilenetv2", {"num_classes": 3}, ti._mobilenetv2_trunk_path_to_torch),
    ("efficientnet", {"num_classes": 3, "variant": "b0"},
     ti._efficientnet_trunk_path_to_torch),
]


@pytest.mark.parametrize("backend_name,params,mapper", _TRUNK_CASES)
def test_trunk_roundtrip(tmp_path, backend_name, params, mapper):
    """Backend-level ``pretrained`` trunk weights restore every base/ leaf
    and leave neck/head leaves untouched."""
    backend = models.build(backend_name, **params)
    variables = backend.init(jax.random.PRNGKey(0), (64, 64))

    sd_np, unmapped = _build_synthetic_sd(variables, mapper)
    # everything unmapped must be outside the trunk
    trunk_unmapped = [p for p in unmapped if p[1] == "base"]
    assert trunk_unmapped == [], f"unmapped trunk leaves: {trunk_unmapped[:8]}"

    path = tmp_path / "trunk.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd_np.items()}, path)

    imported = ti.import_trunk(str(path), variables, backend.name)

    for collection in ("params", "batch_stats"):
        flat_old = ti._flatten(variables[collection])
        flat_new = ti._flatten(imported[collection])
        for p, value in flat_new.items():
            spec = mapper(collection, p)
            if spec is None:
                np.testing.assert_array_equal(
                    np.asarray(value), np.asarray(flat_old[p]),
                    err_msg=f"non-trunk leaf {p} was modified",
                )
            else:
                tkey, transform = spec
                want = np.asarray(transform(sd_np[tkey]))
                np.testing.assert_array_equal(
                    np.asarray(value), want,
                    err_msg=f"{collection}/{'/'.join(p)} <- {tkey}",
                )


def test_backbone_pretrained_path_missing_raises():
    backend = models.build("resnet", num_layers=18, num_classes=3,
                           pretrained="/nonexistent/weights.pth")
    with pytest.raises(FileNotFoundError, match="not found"):
        ti.load_backbone_pretrained(
            backend, backend.init(jax.random.PRNGKey(0), (64, 64))
        )


def test_backbone_pretrained_true_empty_cache_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("TORCH_HOME", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="no cached"):
        ti.resolve_pretrained_path("resnet18", True)


def test_backbone_pretrained_true_resolves_from_hub_cache(
        tmp_path, monkeypatch):
    cache = tmp_path / "hub" / "checkpoints"
    cache.mkdir(parents=True)
    f = cache / "resnet18-f37072fd.pth"
    f.write_bytes(b"x")
    monkeypatch.setenv("TORCH_HOME", str(tmp_path))
    assert ti.resolve_pretrained_path("resnet18", True) == str(f)
    ef = cache / "efficientnet-b0-355c32eb.pth"
    ef.write_bytes(b"x")
    assert ti.resolve_pretrained_path("efficientnet-b0", True) == str(ef)


def test_init_done_consumes_backend_pretrained(tmp_path):
    """Model.init_done must route extra['pretrained'] through the trunk
    import (the reference applies trunk weights at build time)."""
    from centernet_uda_tpu import uda as uda_registry
    from centernet_uda_tpu import losses as loss_registry
    from centernet_uda_tpu.config import Config

    backend = models.build("resnet", num_layers=18, num_classes=3,
                           pretrained=False)
    variables = backend.init(jax.random.PRNGKey(0), (64, 64))
    sd_np, _ = _build_synthetic_sd(variables,
                                   ti._resnet_trunk_path_to_torch)
    path = tmp_path / "trunk.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd_np.items()}, path)

    trainer = uda_registry.Model()
    trainer.backend = models.build("resnet", num_layers=18, num_classes=3,
                                   pretrained=str(path))
    trainer.centernet_loss = loss_registry.build(
        "centernet.DetectionLoss", hm_weight=1.0, wh_weight=0.1,
        off_weight=1.0)
    trainer.cfg = Config({
        "seed": 0, "max_detections": 10,
        "datasets": {"training": {"params": {"input_size": [64, 64]}}},
    })
    trainer.init_done()

    got = np.asarray(trainer.state.params["base"]["conv1"]["kernel"])
    want = np.asarray(ti.conv_kernel(sd_np["conv1.weight"]))
    np.testing.assert_array_equal(got, want)
