"""Monotonic multihead attention (MMA) simultaneous-translation baseline.

Twin of rain's MMA baseline (rain/models/mma_model.py:57 + mma_agent.py),
following "Monotonic Multihead Attention" (Ma et al., 2020, MILk-style
infinite lookback):

- every cross-attention head carries a *monotonic energy*; during training
  the expected alignment ``alpha`` is computed in closed form from the
  stepwise selection probabilities ``p = sigmoid(energy + noise)`` with the
  parallel cumprod recursion, and soft attention ``beta`` looks back over
  frames up to the aligned position;
- at inference each head advances its read pointer while ``p < 0.5``
  (hard monotonic decisions), giving the READ/WRITE policy.

TPU notes: the alpha recursion is a cumulative product over source frames —
computed with ``jnp.cumprod`` per target step under ``lax.scan`` over the
target axis (static shapes, no data-dependent control flow).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from wav2vec_s_tpu.models.caat.config import CaatConfig
from wav2vec_s_tpu.models.modules import LayerNorm
from wav2vec_s_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model
from wav2vec_s_tpu.ops.block_mask import MASK_VALUE
from wav2vec_s_tpu.utils.positional import sinusoidal_table, PADDING_IDX


def expected_alignment(p: jnp.ndarray, src_pad: jnp.ndarray) -> jnp.ndarray:
    """Closed-form expected monotonic alignment.

    p: [B, H, U, S] stepwise selection probabilities; returns alpha with the
    recursion  alpha_u(s) = p(s) * sum_{k<=s} alpha_{u-1}(k)
    * prod_{j=k..s-1}(1 - p(j))  computed via the standard
    cumprod/cumsum trick per target step.
    """
    B, H, U, S = p.shape
    eps = 1e-6
    p = jnp.clip(p, eps, 1 - eps)
    p = jnp.where(src_pad[:, None, None, :], eps, p)
    one_minus = 1.0 - p
    cumprod = jnp.clip(jnp.cumprod(one_minus, axis=-1), eps, 1.0)

    init = jnp.zeros((B, H, S)).at[:, :, 0].set(1.0)  # alpha_{-1} = onehot(0)

    def step(alpha_prev, xs):
        p_u, cp_u = xs                       # [B, H, S]
        # shifted exclusive cumprod: prod_{j<s}(1-p_u(j))
        excl = jnp.concatenate(
            [jnp.ones_like(cp_u[..., :1]), cp_u[..., :-1]], axis=-1)
        inner = jnp.cumsum(alpha_prev / jnp.maximum(excl, eps), axis=-1)
        alpha = p_u * excl * inner
        return alpha, alpha

    xs = (jnp.moveaxis(p, 2, 0), jnp.moveaxis(cumprod, 2, 0))
    _, alphas = jax.lax.scan(step, init, xs)
    return jnp.moveaxis(alphas, 0, 2)        # [B, H, U, S]


def hard_pointers(p_sel: jnp.ndarray, visible: jnp.ndarray,
                  is_end: jnp.ndarray):
    """Hard monotonic READ/WRITE pointer walk (inference).

    Twin of the fairseq monotonic-attention inference the reference agent
    drives (rain/simul/mma_agent.py:57-75 via ``outputs.action``): per
    target step each head advances its read pointer while p < 0.5,
    starting from the previous step's pointer.  A head that runs past the
    ``visible`` frames without stopping is *stuck* (action = READ) unless
    the stream has ended (then it attends up to the last visible frame).

    p_sel: [B, H, U, S] deterministic selection probs; visible: [B];
    is_end: [B].  Returns (ptrs [B, H, U] int32, stuck [B, H, U] bool).
    """
    B, H, U, S = p_sel.shape
    iota_s = jnp.arange(S)[None, None, :]
    vis = visible[:, None, None]

    def step(ptr_prev, p_u):                        # ptr_prev [B, H]
        can = (p_u >= 0.5) & (iota_s >= ptr_prev[..., None]) & (iota_s < vis)
        has = can.any(-1)
        first = jnp.argmax(can, -1).astype(jnp.int32)
        fallback = jnp.maximum(visible[:, None] - 1, 0).astype(jnp.int32)
        ptr = jnp.where(has, first, fallback)
        stuck = ~has & ~is_end[:, None]
        return ptr, (ptr, stuck)

    ptr0 = jnp.zeros((B, H), jnp.int32)
    _, (ptrs, stucks) = jax.lax.scan(step, ptr0, jnp.moveaxis(p_sel, 2, 0))
    return jnp.moveaxis(ptrs, 0, 2), jnp.moveaxis(stucks, 0, 2)


class MonotonicCrossAttention(nn.Module):
    """One decoder cross-attention with monotonic heads + infinite lookback.

    ``hard=True`` switches from the training-time expected alignment to
    hard monotonic inference: pointers from ``hard_pointers`` and soft
    lookback attention over frames s <= pointer (MILk inference); the
    second return value is then ``(ptrs, stuck)`` instead of ``alpha``.
    """

    embed_dim: int
    num_heads: int
    energy_bias_init: float = -2.0
    noise_std: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc, src_pad, train: bool = False,
                 hard: bool = False, visible=None, is_end=None):
        D, H = self.embed_dim, self.num_heads
        Dh = D // H
        B, U, _ = x.shape
        S = enc.shape[1]
        dense = lambda n: nn.Dense(D, dtype=self.dtype, name=n)

        def split(t, L):
            return t.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)

        q = split(dense("q_proj")(x), U)
        k = split(dense("k_proj")(enc), S)
        v = split(dense("v_proj")(enc), S)

        # monotonic energies (separate projections, scaled + learned bias)
        mq = split(dense("mono_q_proj")(x), U)
        mk = split(dense("mono_k_proj")(enc), S)
        bias = self.param("energy_bias",
                          nn.initializers.constant(self.energy_bias_init),
                          (), jnp.float32)
        energy = (jnp.einsum("bhud,bhsd->bhus", mq, mk,
                             preferred_element_type=jnp.float32)
                  * (Dh ** -0.5) + bias)
        if train:
            energy = energy + self.noise_std * jax.random.normal(
                self.make_rng("mono_noise"), energy.shape)
        p_sel = jax.nn.sigmoid(energy)

        soft = (jnp.einsum("bhud,bhsd->bhus", q, k,
                           preferred_element_type=jnp.float32)
                * (Dh ** -0.5))
        soft = jnp.where(src_pad[:, None, None, :], MASK_VALUE, soft)

        if hard:
            ptrs, stuck = hard_pointers(p_sel, visible, is_end)
            allowed = ((jnp.arange(S)[None, None, None, :]
                        <= ptrs[..., None])
                       & (jnp.arange(S)[None, None, None, :]
                          < visible[:, None, None, None]))
            # guard: keep frame 0 attendable so softmax stays defined
            allowed = allowed.at[..., 0].set(
                allowed[..., 0] | ~allowed.any(-1))
            hsoft = jnp.where(allowed, soft, MASK_VALUE)
            beta = jax.nn.softmax(hsoft, axis=-1)
            out = jnp.einsum("bhus,bhsd->bhud", beta.astype(v.dtype), v)
            out = out.transpose(0, 2, 1, 3).reshape(B, U, D)
            return dense("out_proj")(out), (ptrs, stuck)

        alpha = expected_alignment(p_sel, src_pad)            # [B,H,U,S]
        # infinite-lookback soft attention: frame s may be attended by step u
        # with weight ~ softmax(energy) over positions <= aligned position;
        # expectation over alpha gives beta.
        # beta(s) = sum_{t >= s} alpha(t) softmax_{<=t}(soft)(s)
        exp_soft = jnp.exp(soft - soft.max(-1, keepdims=True))
        cum = jnp.cumsum(exp_soft, axis=-1)
        ratio = alpha / jnp.maximum(cum, 1e-10)
        # reverse cumsum over s
        rev = jnp.flip(jnp.cumsum(jnp.flip(ratio, -1), -1), -1)
        beta = exp_soft * rev
        beta = beta / jnp.maximum(beta.sum(-1, keepdims=True), 1e-10)
        out = jnp.einsum("bhus,bhsd->bhud", beta.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, U, D)
        return dense("out_proj")(out), alpha


class MMADecoderLayer(nn.Module):
    cfg: CaatConfig

    @nn.compact
    def __call__(self, x, enc, src_pad, self_bias, train=False,
                 hard=False, visible=None, is_end=None):
        from wav2vec_s_tpu.models.modules import MultiheadSelfAttention

        c = self.cfg
        D = c.decoder_embed_dim
        ln_s = LayerNorm(D, name="self_attn_layer_norm")
        ln_c = LayerNorm(D, name="encoder_attn_layer_norm")
        ln_f = LayerNorm(D, name="final_layer_norm")

        h = MultiheadSelfAttention(D, c.decoder_attention_heads,
                                   dtype=c.compute_dtype, name="self_attn")(
            ln_s(x), self_bias, True)
        x = x + h
        h, alpha = MonotonicCrossAttention(
            D, c.decoder_attention_heads, dtype=c.compute_dtype,
            name="encoder_attn")(ln_c(x), enc, src_pad, train,
                                 hard=hard, visible=visible, is_end=is_end)
        x = x + h
        h = nn.Dense(c.decoder_ffn_embed_dim, dtype=c.compute_dtype,
                     name="fc1")(ln_f(x))
        h = nn.Dense(D, dtype=c.compute_dtype, name="fc2")(jax.nn.relu(h))
        return x + h, alpha


class MMAModel(nn.Module):
    """wav2vec encoder + monotonic-attention decoder (simul-MT/ST
    baseline)."""

    w2v_cfg: Wav2Vec2Config
    cfg: CaatConfig

    def setup(self):
        self.encoder = Wav2Vec2Model(self.w2v_cfg, encoder_type="blockwise")
        c = self.cfg
        self.embed_tokens = self.param(
            "embed_tokens",
            nn.initializers.normal(stddev=c.decoder_embed_dim ** -0.5),
            (c.vocab_size, c.decoder_embed_dim), jnp.float32)
        self.layers = [MMADecoderLayer(c, name=f"layer_{i}")
                       for i in range(c.decoder_layers)]
        self.final_ln = LayerNorm(c.decoder_embed_dim)

    def encode(self, source, padding_mask=None, main_context=None,
               right_context=None, train=False):
        return self.encoder.extract_features(
            source, padding_mask, main_context, right_context, train)

    def _embed_prev(self, prev_tokens):
        c = self.cfg
        D = c.decoder_embed_dim
        U = prev_tokens.shape[1]
        x = self.embed_tokens.astype(c.compute_dtype)[prev_tokens] * D ** 0.5
        pad_mask = prev_tokens == c.pad
        nonpad = ~pad_mask
        positions = (jnp.cumsum(nonpad.astype(jnp.int32), 1) * nonpad
                     + PADDING_IDX)
        x = x + sinusoidal_table(U + PADDING_IDX + 2, D)[positions].astype(
            x.dtype)
        causal = jnp.triu(jnp.full((U, U), MASK_VALUE, jnp.float32), k=1)
        self_bias = (causal[None, None]
                     + jnp.where(pad_mask, MASK_VALUE, 0.0)[:, None, None, :])
        return x, self_bias

    def __call__(self, source, prev_tokens, padding_mask=None, train=False):
        """-> (logits [B, U, V], alphas [L, B, H, U, S])."""
        enc, enc_pad = self.encoder.extract_features(
            source, padding_mask, train=train)
        if enc_pad is None:
            enc_pad = jnp.zeros(enc.shape[:2], bool)

        x, self_bias = self._embed_prev(prev_tokens)
        alphas = []
        for layer in self.layers:
            x, a = layer(x, enc, enc_pad, self_bias, train)
            alphas.append(a)
        x = self.final_ln(x)
        logits = jnp.einsum("bud,vd->buv", x.astype(jnp.float32),
                            self.embed_tokens.astype(jnp.float32))
        return logits, jnp.stack(alphas)

    def hard_decode_step(self, prev_tokens, token_lens, enc, enc_pad,
                         visible, is_end):
        """Streaming inference scoring with hard monotonic attention.

        The reference runs the fairseq monotonic decoder incrementally and
        reads ``outputs.action`` (rain/simul/mma_agent.py:57-75); here the
        decoder is recomputed over the padded prefix at static shapes and
        the action falls out of the pointer walk (stuck heads => READ).
        Pointer recompute is consistent across calls: a head's first
        p >= 0.5 crossing does not change as more source is revealed.

        Args:
          prev_tokens: [B, U_pad] right-padded prefixes (eos/bos first).
          token_lens:  [B] true prefix lengths.
          enc:         [B, S, D] encoder states; enc_pad: [B, S] pad mask.
          visible:     [B] number of revealed frames; is_end: [B].
        Returns (logits [B, V] at the last position, need_more [B]).
        """
        x, self_bias = self._embed_prev(prev_tokens)
        B = prev_tokens.shape[0]
        bi = jnp.arange(B)
        need_more = jnp.zeros(B, bool)
        for layer in self.layers:
            x, (ptrs, stuck) = layer(x, enc, enc_pad, self_bias,
                                     train=False, hard=True, visible=visible,
                                     is_end=is_end)
            # only the decision at the last (current) position matters
            stuck_last = jnp.take_along_axis(
                stuck, (token_lens - 1)[:, None, None], axis=2)[..., 0]
            need_more |= stuck_last.any(-1)
        x = self.final_ln(x)
        h_last = x[bi, token_lens - 1]
        logits = jnp.einsum("bd,vd->bv", h_last.astype(jnp.float32),
                            self.embed_tokens.astype(jnp.float32))
        return logits, need_more


def latency_loss(alphas: jnp.ndarray, src_lens, tgt_pad) -> jnp.ndarray:
    """Differentiable average-lagging regularizer over expected alignment
    positions (the weighted-average latency term of MMA training)."""
    L, B, H, U, S = alphas.shape
    pos = jnp.arange(S, dtype=jnp.float32)
    g = jnp.einsum("lbhus,s->lbhu", alphas, pos)      # expected read position
    g = g.mean(axis=(0, 2))                           # [B, U]
    tgt_lens = jnp.sum(~tgt_pad, axis=1)
    gamma = tgt_lens / jnp.maximum(src_lens, 1)
    oracle = jnp.arange(U)[None, :] / jnp.maximum(gamma, 1e-6)[:, None]
    lag = jnp.where(tgt_pad, 0.0, jnp.maximum(g - oracle, 0.0))
    return jnp.sum(lag) / jnp.maximum(jnp.sum(tgt_lens), 1)
