"""Config-system tests: preset/override merging and the multi-file
precedence contract (reference train.py:63-65 merges the main cfg then the
data cfg, with configs/data/base.py:1-4 documenting that the LAST merge
wins)."""
import json

import pytest

from loftr_tpu import get_config
from loftr_tpu.config import get_config_from_files, load_config_file


def test_nested_override_merge():
    cfg = get_config("indoor_ds", {"loftr": {"match_coarse": {"thr": 0.5}}})
    assert cfg.loftr.match_coarse.thr == 0.5
    # untouched siblings keep preset values
    assert cfg.loftr.match_coarse.border_rm == get_config(
        "indoor_ds").loftr.match_coarse.border_rm


def test_load_config_file_yaml_and_json(tmp_path):
    y = tmp_path / "a.yaml"
    y.write_text("loftr:\n  match_coarse:\n    thr: 0.3\n")
    j = tmp_path / "b.json"
    j.write_text(json.dumps({"loftr": {"match_coarse": {"thr": 0.4}}}))
    assert load_config_file(str(y))["loftr"]["match_coarse"]["thr"] == 0.3
    assert load_config_file(str(j))["loftr"]["match_coarse"]["thr"] == 0.4
    bad = tmp_path / "c.txt"
    bad.write_text("x")
    with pytest.raises(ValueError):
        load_config_file(str(bad))


def test_file_merge_last_wins(tmp_path):
    main = tmp_path / "main.yaml"  # the reference's "main cfg"
    main.write_text(
        "preset: indoor_ot\nloftr:\n  match_coarse:\n    thr: 0.3\n"
        "  coarse:\n    nhead: 4\n")
    data = tmp_path / "data.yaml"  # the reference's "data cfg" — wins
    data.write_text("loftr:\n  match_coarse:\n    thr: 0.45\n")
    cfg = get_config_from_files(str(main), str(data))
    assert cfg.loftr.match_coarse.match_type == "sinkhorn"  # preset from file
    assert cfg.loftr.match_coarse.thr == 0.45     # later file wins
    assert cfg.loftr.coarse.nhead == 4            # earlier file's other keys


def test_cli_preset_and_overrides_win(tmp_path):
    f = tmp_path / "f.yaml"
    f.write_text("preset: indoor_ot\nloftr:\n  match_coarse:\n    thr: 0.3\n")
    # explicit preset beats the file's
    cfg = get_config_from_files(str(f), preset="indoor_ds")
    assert cfg.loftr.match_coarse.match_type == "dual_softmax"
    # explicit overrides beat files
    cfg = get_config_from_files(
        str(f), overrides={"loftr": {"match_coarse": {"thr": 0.9}}})
    assert cfg.loftr.match_coarse.thr == 0.9


def test_fallback_preset(tmp_path):
    f = tmp_path / "f.yaml"
    f.write_text("loftr:\n  match_coarse:\n    thr: 0.3\n")
    cfg = get_config_from_files(str(f), fallback="indoor_ot")
    assert cfg.loftr.match_coarse.match_type == "sinkhorn"
    assert cfg.loftr.match_coarse.thr == 0.3


def test_buggy_pos_enc_presets():
    """configs/loftr/indoor/buggy_pos_enc/*: TEMP_BUG_FIX=False presets for
    pre-fix released checkpoints."""
    cfg = get_config("indoor_ds_buggy_pos_enc")
    assert cfg.loftr.coarse.temp_bug_fix is False
    assert cfg.loftr.match_coarse.match_type == "dual_softmax"
    cfg = get_config("indoor_ot_buggy_pos_enc")
    assert cfg.loftr.coarse.temp_bug_fix is False
    assert cfg.loftr.match_coarse.match_type == "sinkhorn"
    # base presets keep the fix on
    assert get_config("indoor_ds").loftr.coarse.temp_bug_fix is True


def test_fused_kernels_are_default():
    """The shipped inference path is the fused Pallas one (VERDICT r2 #2)."""
    cfg = get_config("indoor_ds")
    assert cfg.loftr.match_coarse.use_pallas is True
    assert cfg.loftr.fine.use_pallas is True
    assert cfg.loftr.coarse.use_pallas is True


def test_turbo_preset():
    """indoor_ds_turbo: ledger-trimmed speed preset (round-5; NOT
    checkpoint-compatible — accuracy-guarded by tools/turbo_ab.py)."""
    cfg = get_config("indoor_ds_turbo")
    # transformer geometry unchanged from the flagship
    base = get_config("indoor_ds")
    assert cfg.loftr.coarse.d_model == base.loftr.coarse.d_model == 256
    assert cfg.loftr.fine.d_model == base.loftr.fine.d_model == 128
    # the trims: lane-aligned middle stage + halved fine capacity
    assert cfg.loftr.backbone.block_dims == (128, 128, 256)
    assert cfg.loftr.match_coarse.max_matches == 512
    # inherited from indoor_ds (dense spvs, dual-softmax)
    assert cfg.loftr.match_coarse.sparse_spvs is False
    assert cfg.loftr.match_coarse.match_type == "dual_softmax"
    # every block_dim is a multiple of the 128 MXU lane width, so the
    # 196->256 inference channel-pad must be a structural no-op
    from loftr_tpu.utils.channel_pad import pad_config
    assert pad_config(cfg).loftr.backbone.block_dims == (128, 128, 256)
