"""Full-model torch checkpoint import: exact fairseq key names -> our tree.

Builds a synthetic state dict with the reference's parameter names/shapes
(fairseq/fairseq/models/wav2vec/wav2vec2.py module structure) for a tiny
config, imports it, checks tree-structure equality against a fresh init, and
runs a forward pass through the imported params.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from wav2vec_s_tpu.checkpoint.torch_import import (
    import_wav2vec2_params, assert_tree_shapes_match)
from wav2vec_s_tpu.models import Wav2Vec2Model
from tests.test_wav2vec2_model import TINY, _rngs


def fairseq_style_state_dict(cfg, encoder_type="blockwise", seed=0):
    """Key names as the reference's Wav2Vec2Model.state_dict() emits them."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    C = cfg.conv_feature_layers
    in_d = 1
    for i, (dim, k, s) in enumerate(C):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = t(dim, in_d, k)
        if cfg.extractor_mode == "layer_norm" and i < cfg.layer_norm_num:
            sd[f"feature_extractor.conv_layers.{i}.2.1.weight"] = t(dim)
            sd[f"feature_extractor.conv_layers.{i}.2.1.bias"] = t(dim)
        elif cfg.extractor_mode == "default" and i == 0:
            sd[f"feature_extractor.conv_layers.{i}.2.weight"] = t(dim)
            sd[f"feature_extractor.conv_layers.{i}.2.bias"] = t(dim)
        in_d = dim

    D = cfg.encoder_embed_dim
    embed = C[-1][0]
    sd["layer_norm.weight"] = t(embed)
    sd["layer_norm.bias"] = t(embed)
    if embed != D:
        sd["post_extract_proj.weight"] = t(D, embed)
        sd["post_extract_proj.bias"] = t(D)
    sd["mask_emb"] = t(D)

    if encoder_type == "full":
        k = cfg.conv_pos
        sd["encoder.pos_conv.0.bias"] = t(D)
        sd["encoder.pos_conv.0.weight_g"] = t(1, 1, k)
        sd["encoder.pos_conv.0.weight_v"] = t(D, D // cfg.conv_pos_groups, k)
    sd["encoder.layer_norm.weight"] = t(D)
    sd["encoder.layer_norm.bias"] = t(D)
    for i in range(cfg.encoder_layers):
        base = f"encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{base}.self_attn.{proj}.weight"] = t(D, D)
            sd[f"{base}.self_attn.{proj}.bias"] = t(D)
        sd[f"{base}.self_attn_layer_norm.weight"] = t(D)
        sd[f"{base}.self_attn_layer_norm.bias"] = t(D)
        sd[f"{base}.fc1.weight"] = t(cfg.encoder_ffn_embed_dim, D)
        sd[f"{base}.fc1.bias"] = t(cfg.encoder_ffn_embed_dim)
        sd[f"{base}.fc2.weight"] = t(D, cfg.encoder_ffn_embed_dim)
        sd[f"{base}.fc2.bias"] = t(D)
        sd[f"{base}.final_layer_norm.weight"] = t(D)
        sd[f"{base}.final_layer_norm.bias"] = t(D)

    F, G, V = cfg.final_dim, cfg.latent_groups, cfg.latent_vars
    sd["quantizer.vars"] = t(1, G * V, F // G)
    sd["quantizer.weight_proj.weight"] = t(G * V, embed)
    sd["quantizer.weight_proj.bias"] = t(G * V)
    sd["project_q.weight"] = t(F, F)
    sd["project_q.bias"] = t(F)
    sd["final_proj.weight"] = t(F, D)
    sd["final_proj.bias"] = t(F)
    return sd


def test_import_matches_init_tree_and_runs():
    sd = fairseq_style_state_dict(TINY)
    imported = import_wav2vec2_params(sd, TINY, encoder_type="blockwise")

    model = Wav2Vec2Model(TINY, encoder_type="blockwise")
    src = jnp.zeros((1, 1600))
    mask_pos = jnp.zeros((1, 2), jnp.int32)
    init_params = model.init(_rngs(), src, mask_pos, 0,
                             train=False)["params"]
    assert_tree_shapes_match(imported, init_params)

    # forward with imported params runs and is finite
    feats, _ = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, imported)},
        jax.random.normal(jax.random.PRNGKey(0), (1, 1600)),
        method=Wav2Vec2Model.extract_features)
    assert np.isfinite(np.asarray(feats)).all()


def test_import_full_encoder_with_weight_norm():
    import dataclasses
    cfg = dataclasses.replace(TINY, pos_type="conv", conv_pos=8,
                              conv_pos_groups=2)
    sd = fairseq_style_state_dict(cfg, encoder_type="full")
    imported = import_wav2vec2_params(sd, cfg, encoder_type="full")
    model = Wav2Vec2Model(cfg, encoder_type="full")
    src = jnp.zeros((1, 1600))
    mask_pos = jnp.zeros((1, 2), jnp.int32)
    init_params = model.init(_rngs(), src, mask_pos, 0,
                             train=False)["params"]
    assert_tree_shapes_match(imported, init_params)


def test_import_via_torch_save_roundtrip(tmp_path):
    from wav2vec_s_tpu.checkpoint import load_torch_checkpoint

    sd = fairseq_style_state_dict(TINY)
    torch.save({"model": sd, "args": None, "cfg": {"model": {}}},
               tmp_path / "ckpt.pt")
    state = load_torch_checkpoint(tmp_path / "ckpt.pt")
    imported = import_wav2vec2_params(state["model"], TINY)
    assert "feature_extractor" in imported and "encoder" in imported


def test_export_inverts_import_exactly():
    """export(import(sd)) reproduces every reference tensor bit-for-bit
    (weight-normed pos-conv compared in folded form)."""
    import dataclasses

    from wav2vec_s_tpu.checkpoint.torch_export import export_wav2vec2_params

    cfg = dataclasses.replace(TINY, pos_type="conv", conv_pos=8,
                              conv_pos_groups=2)
    sd = fairseq_style_state_dict(cfg, encoder_type="full")
    exported = export_wav2vec2_params(
        import_wav2vec2_params(sd, cfg, encoder_type="full"))

    def fold(g, v):
        n = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        return g * v / np.maximum(n, 1e-12)

    want_keys = set(sd)
    got_keys = set(exported)
    assert want_keys == got_keys, (want_keys - got_keys,
                                   got_keys - want_keys)
    for k in sd:
        if k.endswith("weight_g") or k.endswith("weight_v"):
            continue
        np.testing.assert_allclose(exported[k], sd[k].numpy(), atol=1e-6,
                                   err_msg=k)
    np.testing.assert_allclose(
        fold(exported["encoder.pos_conv.0.weight_g"],
             exported["encoder.pos_conv.0.weight_v"]),
        fold(sd["encoder.pos_conv.0.weight_g"].numpy(),
             sd["encoder.pos_conv.0.weight_v"].numpy()), atol=1e-6)


def test_convert_cli_export_end_to_end(tmp_path, capsys):
    """orbax checkpoint -> reference-named .pt via the converter CLI."""
    from wav2vec_s_tpu.checkpoint.orbax_io import CheckpointManager

    sd = fairseq_style_state_dict(TINY)
    params = import_wav2vec2_params(sd, TINY, encoder_type="blockwise")
    CheckpointManager(tmp_path / "ours", keep_last=0).save(
        0, {"params": params})

    from wav2vec_s_tpu.checkpoint import convert_cli
    convert_cli.main(["--export-from", str(tmp_path / "ours"),
                      "--out", str(tmp_path / "export.pt")])
    state = torch.load(tmp_path / "export.pt", weights_only=False)
    assert set(state["model"]) == set(sd)
    np.testing.assert_allclose(
        state["model"]["final_proj.weight"].numpy(),
        sd["final_proj.weight"].numpy(), atol=1e-6)


def test_convert_cli_end_to_end(tmp_path, capsys):
    """torch .pt -> orbax checkpoint via the converter CLI."""
    sd = fairseq_style_state_dict(TINY)
    torch.save({"model": sd, "args": None, "cfg": {"model": {
        "encoder_layers": TINY.encoder_layers,
        "encoder_embed_dim": TINY.encoder_embed_dim,
        "encoder_ffn_embed_dim": TINY.encoder_ffn_embed_dim,
        "encoder_attention_heads": TINY.encoder_attention_heads,
        "extractor_mode": TINY.extractor_mode,
        "final_dim": TINY.final_dim,
        "latent_vars": TINY.latent_vars,
        "latent_groups": TINY.latent_groups,
    }}}, tmp_path / "ref.pt")

    from wav2vec_s_tpu.checkpoint import convert_cli
    convert_cli.main([
        "--pt", str(tmp_path / "ref.pt"), "--out", str(tmp_path / "out"),
        "conv_feature_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2))",
        "n_negatives=4",
    ])
    from wav2vec_s_tpu.checkpoint.orbax_io import CheckpointManager
    mgr = CheckpointManager(tmp_path / "out", keep_last=0)
    state, meta = mgr.restore()
    assert "params" in state
    assert meta["extra"]["source"].endswith("ref.pt")
    # restored tree matches the torch tensor values
    w = np.asarray(state["params"]["encoder"]["layers"]["layer_0"]
                   ["self_attn"]["q_proj"]["kernel"])
    want = sd["encoder.layers.0.self_attn.q_proj.weight"].numpy().T
    np.testing.assert_allclose(w, want, atol=1e-6)
