"""Config system tests (reference behavior: tfcompat/hparam.py parse DSL,
train.py:1052-1058 layering)."""
import json

import pytest

from wavenet_vocoder_tpu.config import (
    Config,
    is_mulaw,
    is_mulaw_quantize,
    is_raw,
    is_scalar_input,
    load_config,
    parse_values,
)


def test_defaults_mirror_reference():
    cfg = Config()
    assert cfg.name == "wavenet_vocoder"
    assert cfg.input_type == "raw"
    assert cfg.quantize_channels == 65536
    assert cfg.sample_rate == 22050
    assert cfg.hop_size == 256
    assert cfg.out_channels == 30
    assert cfg.layers == 24 and cfg.stacks == 4
    assert cfg.residual_channels == 128
    assert cfg.gate_channels == 256
    assert cfg.cin_channels == 80 and cfg.cin_pad == 2
    assert cfg.upsample_scales == (4, 4, 4, 4)
    assert cfg.ema_decay == 0.9999


def test_parse_dsl():
    vals = parse_values('layers=2,dropout=0.5,input_type=mulaw,'
                        'upsample_params={"upsample_scales": [2, 2]},'
                        'frame_shift_ms=None,pin_memory=false')
    assert vals["layers"] == 2
    assert vals["dropout"] == 0.5
    assert vals["input_type"] == "mulaw"
    assert vals["upsample_params"] == {"upsample_scales": [2, 2]}
    assert vals["frame_shift_ms"] is None
    assert vals["pin_memory"] is False


def test_override_layering(tmp_path):
    preset = tmp_path / "preset.json"
    preset.write_text(json.dumps({"layers": 12, "batch_size": 4}))
    cfg = load_config(str(preset), "batch_size=2,stacks=3")
    assert cfg.layers == 12       # from preset
    assert cfg.batch_size == 2    # CLI override wins
    assert cfg.stacks == 3


def test_unknown_key_rejected():
    with pytest.raises(ValueError):
        Config().parse("not_a_key=1")


def test_type_checking():
    with pytest.raises(ValueError):
        Config().parse("layers=1.5")
    # int accepts integral float
    assert Config().parse("layers=2").layers == 2
    # dict override merges
    cfg = Config().parse('upsample_params={"upsample_scales": [2, 2]}')
    assert cfg.upsample_scales == (2, 2)


def test_wrong_name_rejected(tmp_path):
    preset = tmp_path / "p.json"
    preset.write_text(json.dumps({"name": "bogus"}))
    with pytest.raises(ValueError):
        load_config(str(preset))


def test_input_type_predicates():
    # (reference: wavenet_vocoder/util.py:5-25)
    assert is_mulaw_quantize("mulaw-quantize")
    assert not is_mulaw_quantize("mulaw")
    assert is_mulaw("mulaw") and not is_mulaw("raw")
    assert is_raw("raw")
    assert is_scalar_input("raw") and is_scalar_input("mulaw")
    assert not is_scalar_input("mulaw-quantize")
    with pytest.raises(ValueError):
        is_raw("bogus")


def test_json_roundtrip():
    cfg = Config(layers=8, stacks=2)
    cfg2 = Config().parse_json(cfg.to_json())
    assert cfg2.layers == 8 and cfg2.stacks == 2
