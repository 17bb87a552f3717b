"""Config composition tests: defaults + experiment overlay + CLI overrides."""

import pytest
import yaml

from centernet_uda_tpu.config import Config, compose, parse_overrides


def test_attribute_access():
    cfg = Config({"a": {"b": {"c": 1}}, "lst": [1, 2, {"x": 3}]})
    assert cfg.a.b.c == 1
    assert cfg.lst[2].x == 3
    assert "a" in cfg
    assert cfg.get("missing", 7) == 7


def test_merge_replaces_lists():
    base = Config({"aug": [1, 2, 3], "m": {"x": 1, "y": 2}})
    out = base.merge({"aug": [9], "m": {"y": 5}})
    assert out.aug == [9]
    assert out.m.x == 1 and out.m.y == 5


def test_dotted_set_get():
    cfg = Config({})
    cfg.set_dotted("a.b.c", 42)
    assert cfg.a.b.c == 42
    assert cfg.get_dotted("a.b.c") == 42
    assert cfg.get_dotted("a.z", "dflt") == "dflt"


def test_parse_overrides_yaml_values():
    ov = dict(parse_overrides(["x=1", "y=true", "z=[1,2]", "s=hello", "n=null"]))
    assert ov["x"] == 1 and ov["y"] is True and ov["z"] == [1, 2]
    assert ov["s"] == "hello" and ov["n"] is None


def test_compose_with_experiment(tmp_path):
    (tmp_path / "experiment").mkdir()
    (tmp_path / "defaults.yaml").write_text(
        yaml.safe_dump({
            "experiment": "default",
            "model": {"backend": {"name": "dla", "params": {"num_classes": 6}}},
            "batch_size": 16,
        })
    )
    (tmp_path / "experiment" / "exp1.yaml").write_text(
        yaml.safe_dump({
            "model": {"backend": {"name": "resnet",
                                  "params": {"num_layers": 18}}},
        })
    )
    cfg = compose(
        ["experiment=exp1", "batch_size=4", "model.backend.params.num_classes=3"],
        config_dir=str(tmp_path),
    )
    assert cfg.experiment == "exp1"
    assert cfg.model.backend.name == "resnet"
    # overlay merged over defaults
    assert cfg.model.backend.params.num_layers == 18
    # CLI override wins
    assert cfg.model.backend.params.num_classes == 3
    assert cfg.batch_size == 4


def test_repo_defaults_parse():
    cfg = compose(["experiment=baseline_resnet18"], config_dir="configs")
    assert cfg.model.backend.name == "resnet"
    assert cfg.model.backend.loss.name == "centernet.DetectionLoss"
    assert cfg.save_best_metric.name == "validation/total_loss"
