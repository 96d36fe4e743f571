import json

import pytest

from npvp_tpu.core.config import Config, apply_overrides, from_dict, load_config


def test_defaults_validate():
    cfg = Config()
    cfg.validate()


def test_from_dict_and_overrides():
    cfg = from_dict({"Dataset": {"name": "KTH", "num_past_frames": 10,
                                 "num_future_frames": 10},
                     "Predictor": {"max_T": 20, "stochastic": True}})
    assert cfg.Dataset.name == "KTH"
    assert cfg.Predictor.stochastic is True
    cfg.validate()

    apply_overrides(cfg, ["Predictor.transformer_layers=2",
                          "AE.out_layer=Sigmoid",
                          "Dataset.batch_size=4"])
    assert cfg.Predictor.transformer_layers == 2
    assert cfg.AE.out_layer == "Sigmoid"
    assert cfg.Dataset.batch_size == 4

    # ckpt retention knob: bounded by default (long supervised runs on a
    # bounded filesystem), None restores the reference keep-every-epoch
    assert cfg.Predictor.ckpt_max_keep == 10
    apply_overrides(cfg, ["Predictor.ckpt_max_keep=null"])
    assert cfg.Predictor.ckpt_max_keep is None


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        from_dict({"Predictor": {"not_a_key": 1}})
    with pytest.raises(KeyError):
        from_dict({"NotAGroup": {}})


def test_validation_errors():
    cfg = from_dict({"Dataset": {"num_past_frames": 10,
                                 "num_future_frames": 10},
                     "Predictor": {"max_T": 15}})
    with pytest.raises(ValueError):
        cfg.validate()

    cfg = Config()
    cfg.AE.out_layer = "Softmax"
    with pytest.raises(ValueError):
        cfg.validate()

    # rand-context split bounds must fit the clip: shrinking max_T without
    # adjusting min_lo/max_lo used to fail as an opaque shape error deep in
    # event_coding instead of a config error (found by a smoke drive)
    cfg = Config()
    cfg.Dataset.num_past_frames = 2
    cfg.Dataset.num_future_frames = 2
    cfg.Predictor.max_T = 4
    cfg.Predictor.rand_context = True
    cfg.Predictor.min_lo = 5
    cfg.Predictor.max_lo = 10
    with pytest.raises(ValueError, match="rand_context needs"):
        cfg.validate()
    cfg.Predictor.min_lo, cfg.Predictor.max_lo = 1, 3
    cfg.validate()


def test_load_json_roundtrip(tmp_path):
    cfg = Config()
    cfg.Dataset.name = "BAIR"
    cfg.Dataset.img_channels = 3
    cfg.Dataset.num_past_frames = 2
    cfg.Dataset.num_future_frames = 13
    cfg.Predictor.max_T = 15
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg.to_dict(), default=str))
    loaded = load_config(path)
    assert loaded.Dataset.name == "BAIR"
    assert loaded.Dataset.img_channels == 3


def test_load_yaml_with_override(tmp_path):
    path = tmp_path / "cfg.yaml"
    path.write_text(
        "Dataset:\n  name: KTH\n  num_past_frames: 10\n"
        "  num_future_frames: 10\nPredictor:\n  max_T: 20\n")
    cfg = load_config(path, overrides=["Predictor.stochastic=true"])
    assert cfg.Predictor.stochastic is True
