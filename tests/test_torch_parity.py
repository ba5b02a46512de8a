"""Module-level numerical parity vs torch primitives.

These tests build tiny torch oracles out of ``torch.nn`` primitives arranged
exactly like the reference architecture, then import their weights through
``checkpoint.torch_import`` helpers and check our flax modules reproduce the
outputs.  This pins the conventions (weight transposes, norm epsilon, exact
GELU, attention scaling, weight-norm folding, SamePad trim) that published-
checkpoint parity rests on.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from wav2vec_s_tpu.checkpoint.torch_import import (
    _linear, _conv1d, _norm, _weight_normed_conv1d)
from wav2vec_s_tpu.models.modules import (
    MultiheadSelfAttention, TransformerEncoderLayer, fp32_layer_norm)
from wav2vec_s_tpu.models.wav2vec2 import ConvPositionalEmbedding
import flax.linen as nn

ATOL = 1e-5


def np32(t):
    return t.detach().numpy().astype(np.float32)


def test_linear_parity():
    lin = torch.nn.Linear(6, 4)
    x = torch.randn(2, 3, 6)
    want = np32(lin(x))
    p = _linear({"l.weight": lin.weight, "l.bias": lin.bias}, "l")
    got = np.asarray(nn.Dense(4).apply({"params": p}, jnp.asarray(np32(x))))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_conv1d_parity():
    conv = torch.nn.Conv1d(3, 5, kernel_size=4, stride=2, bias=False)
    x = torch.randn(2, 3, 20)
    want = np32(conv(x)).transpose(0, 2, 1)  # [B, T, C]
    p = _conv1d({"c.weight": conv.weight}, "c")
    mod = nn.Conv(5, (4,), strides=(2,), padding="VALID", use_bias=False)
    got = np.asarray(mod.apply({"params": p},
                               jnp.asarray(np32(x)).transpose(0, 2, 1)))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_layer_norm_parity():
    ln = torch.nn.LayerNorm(8)
    with torch.no_grad():
        ln.weight.mul_(1.3).add_(0.1)
        ln.bias.add_(0.2)
    x = torch.randn(2, 5, 8)
    want = np32(ln(x))
    p = _norm({"n.weight": ln.weight, "n.bias": ln.bias}, "n")
    got = np.asarray(fp32_layer_norm(jnp.asarray(np32(x)),
                                     jnp.asarray(p["scale"]),
                                     jnp.asarray(p["bias"])))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_group_norm_per_channel_parity():
    # wav2vec2 conv block 0: GroupNorm(C, C) == per-channel norm over time
    C = 6
    gn = torch.nn.GroupNorm(C, C)
    with torch.no_grad():
        gn.weight.mul_(0.7).add_(0.3)
    x = torch.randn(2, C, 11)
    want = np32(gn(x)).transpose(0, 2, 1)
    from wav2vec_s_tpu.models.modules import Fp32GroupNorm
    p = _norm({"g.weight": gn.weight, "g.bias": gn.bias}, "g")
    got = np.asarray(Fp32GroupNorm(C, C).apply(
        {"params": p}, jnp.asarray(np32(x)).transpose(0, 2, 1)))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_gelu_is_exact_not_tanh():
    x = torch.randn(100)
    want = np32(torch.nn.functional.gelu(x))
    got = np.asarray(jax.nn.gelu(jnp.asarray(np32(x)), approximate=False))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pos_conv_weight_norm_samepad_parity():
    # reference: weight_norm(Conv1d(D, D, k, pad=k//2, groups=g), dim=2)
    # + SamePad(k) + GELU (wav2vec2.py:791-804)
    D, k, g = 8, 6, 2
    conv = torch.nn.Conv1d(D, D, k, padding=k // 2, groups=g)
    conv = torch.nn.utils.weight_norm(conv, name="weight", dim=2)
    x = torch.randn(1, D, 12)
    h = conv(x)
    h = h[:, :, :-1]  # SamePad trim (even kernel)
    want = np32(torch.nn.functional.gelu(h)).transpose(0, 2, 1)

    sd = {"pc.weight_g": conv.weight_g, "pc.weight_v": conv.weight_v,
          "pc.bias": conv.bias}
    p = {"conv": _weight_normed_conv1d(sd, "pc")}
    mod = ConvPositionalEmbedding(D, kernel=k, groups=g)
    got = np.asarray(mod.apply({"params": p},
                               jnp.asarray(np32(x)).transpose(0, 2, 1)))
    np.testing.assert_allclose(got, want, atol=ATOL)


def _torch_mha(q_l, k_l, v_l, o_l, x, H, bias=None):
    """Reference-style MHA (fairseq multihead_attention.py math, eval mode)."""
    B, T, D = x.shape
    Dh = D // H
    q = q_l(x) * Dh ** -0.5
    k, v = k_l(x), v_l(x)

    def split(t):
        return t.view(B, T, H, Dh).transpose(1, 2)  # [B, H, T, Dh]

    att = split(q) @ split(k).transpose(-1, -2)
    if bias is not None:
        att = att + bias
    att = torch.softmax(att, dim=-1)
    out = (att @ split(v)).transpose(1, 2).reshape(B, T, D)
    return o_l(out)


def test_multihead_attention_parity():
    D, H = 8, 2
    ls = {n: torch.nn.Linear(D, D) for n in ("q", "k", "v", "o")}
    x = torch.randn(2, 5, D)
    bias = torch.randn(1, 1, 5, 5) * 2
    want = np32(_torch_mha(ls["q"], ls["k"], ls["v"], ls["o"], x, H, bias))

    sd = {}
    for n, mod in ls.items():
        sd[f"a.{n}.weight"] = mod.weight
        sd[f"a.{n}.bias"] = mod.bias
    p = {"q_proj": _linear(sd, "a.q"), "k_proj": _linear(sd, "a.k"),
         "v_proj": _linear(sd, "a.v"), "out_proj": _linear(sd, "a.o")}
    got = np.asarray(MultiheadSelfAttention(D, H).apply(
        {"params": p}, jnp.asarray(np32(x)), jnp.asarray(np32(bias))))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_post_ln_encoder_layer_parity():
    """Full post-LN transformer layer vs a torch composition
    (wav2vec2.py:955-978 order: attn -> +res -> LN -> ffn -> +res -> LN)."""
    D, H, F = 8, 2, 16
    ls = {n: torch.nn.Linear(D, D) for n in ("q", "k", "v", "o")}
    fc1, fc2 = torch.nn.Linear(D, F), torch.nn.Linear(F, D)
    ln1, ln2 = torch.nn.LayerNorm(D), torch.nn.LayerNorm(D)
    with torch.no_grad():
        for m in (ln1, ln2):
            m.weight.mul_(1.1).add_(0.05)
    x = torch.randn(2, 5, D)

    h = _torch_mha(ls["q"], ls["k"], ls["v"], ls["o"], x, H)
    x1 = ln1(x + h)
    h = fc2(torch.nn.functional.gelu(fc1(x1)))
    want = np32(ln2(x1 + h))

    sd = {}
    for n, mod in ls.items():
        sd[f"l.self_attn.{n}_proj.weight"] = mod.weight
        sd[f"l.self_attn.{n}_proj.bias"] = mod.bias
    p = {
        "self_attn": {f"{n}_proj": _linear(sd, f"l.self_attn.{n}_proj")
                      for n in ("q", "k", "v", "out") if f"l.self_attn.{n}_proj.weight" in sd},
    }
    p["self_attn"]["out_proj"] = _linear(
        {"o.weight": ls["o"].weight, "o.bias": ls["o"].bias}, "o")
    p["self_attn_layer_norm"] = _norm(
        {"n.weight": ln1.weight, "n.bias": ln1.bias}, "n")
    p["final_layer_norm"] = _norm(
        {"n.weight": ln2.weight, "n.bias": ln2.bias}, "n")
    p["fc1"] = _linear({"f.weight": fc1.weight, "f.bias": fc1.bias}, "f")
    p["fc2"] = _linear({"f.weight": fc2.weight, "f.bias": fc2.bias}, "f")

    layer = TransformerEncoderLayer(embed_dim=D, ffn_dim=F, num_heads=H,
                                    dropout=0.0, attention_dropout=0.0,
                                    layer_norm_first=False)
    got = np.asarray(layer.apply({"params": p}, jnp.asarray(np32(x))))
    np.testing.assert_allclose(got, want, atol=ATOL)
