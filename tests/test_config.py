"""Config system tests: presets, derived fields, reference pickle import."""
import os

import pytest

from neural_marionette_tpu.config import (MarionetteConfig, adjust_config,
                                          derive_training_id,
                                          load_reference_pickle)


def test_adjust_config_aist():
    cfg = adjust_config(MarionetteConfig(dataset="aist"))
    assert cfg.grid_size == 64 and cfg.nkeypoints == 24
    assert cfg.Ttot == 10 and cfg.Tcond == 3 and cfg.sample_rate == 2
    assert cfg.lrate == 4e-4
    assert cfg.firstdecay == 60 and cfg.seconddecay == 140
    assert cfg.nepoch == 200 and cfg.is_eval == 1


def test_adjust_config_pretrained_mode():
    cfg = adjust_config(MarionetteConfig(dataset="aist", pretrained_mode=1))
    assert cfg.Ttot == 20 and cfg.Tcond == 5
    assert cfg.firstdecay == int(1e10)  # decays disabled


def test_adjust_config_dfaust():
    cfg = adjust_config(MarionetteConfig(dataset="dfaust"))
    assert cfg.nepoch == 2000 and cfg.sample_rate == 5
    assert cfg.firstdecay == 600 and cfg.seconddecay == 1400


def test_adjust_config_invalid():
    with pytest.raises(ValueError):
        adjust_config(MarionetteConfig(dataset="nope"))


def test_derive_training_id():
    cfg = derive_training_id(adjust_config(MarionetteConfig(dataset="aist")))
    assert "disc_training/aist" in cfg.training_id
    cfg1 = derive_training_id(adjust_config(
        MarionetteConfig(dataset="aist", pretrained_mode=1)))
    assert "dyna_training" in cfg1.training_id
    assert cfg1.detector_end == 0 and cfg1.learner_start == 0
    with pytest.raises(ValueError):
        derive_training_id(MarionetteConfig(pretrained_mode=2))


def test_json_roundtrip(tmp_path):
    cfg = adjust_config(MarionetteConfig(dataset="aist", exp_name="x"))
    p = str(tmp_path / "opt.json")
    cfg.save_json(p)
    back = MarionetteConfig.from_json(p)
    assert back == cfg


@pytest.mark.skipif(
    not os.path.exists("/root/reference/pretrained/aist/opt.pickle"),
    reason="reference pickle unavailable")
def test_load_reference_pickle():
    cfg = load_reference_pickle("/root/reference/pretrained/aist/opt.pickle")
    # the shipped checkpoint's hyperparameters (SURVEY.md)
    assert cfg.dataset == "aist" and cfg.grid_size == 64
    assert cfg.nkeypoints == 24 and cfg.Ttot == 20 and cfg.Tcond == 5
    assert cfg.nlatent_kypt == 128 and cfg.nhidden_kypt == 512
    assert cfg.const_intensity == 3 and cfg.affinity_ver == 3
    assert cfg.nneighbor == 2 and cfg.transition_type == "dl"
    assert cfg.pretrained_mode == 1 and cfg.nbatch == 16
