"""Every shipped config preset must parse and construct its model configs
(the recipe-script surface of the reference, wav2vec_s_scripts/train/)."""

from pathlib import Path

import pytest

CONFIGS = sorted(Path(__file__).resolve().parent.parent.glob("configs/*.yaml"))


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.name)
def test_config_preset_parses(path, tmp_path):
    from wav2vec_s_tpu.train.config import load_config
    from wav2vec_s_tpu.models import Wav2Vec2Config
    from wav2vec_s_tpu.models.caat import CaatConfig
    from wav2vec_s_tpu.train.optim import build_optimizer

    text = path.read_text().replace("???", "/tmp/placeholder")
    p = tmp_path / path.name
    p.write_text(text)
    cfg = load_config(str(p))
    assert cfg.run.task in ("pretrain", "caat", "s2s", "ctc")

    # every model/caat key must be a real dataclass field
    Wav2Vec2Config(
        context_type=cfg.context.context_type,
        main_context=cfg.context.main_context,
        right_context=cfg.context.right_context, **cfg.model)
    if cfg.run.task not in ("pretrain", "ctc"):
        CaatConfig(vocab_size=16, **cfg.caat)
    # optimizer + schedule construct (tri_stage phase ratios etc.)
    build_optimizer(cfg.optim)
