"""wav2vec 2.0 / wav2vec-S models (flax).

Re-provides the capability of the reference's ``Wav2Vec2Model``
(fairseq/fairseq/models/wav2vec/wav2vec2.py:186-698) and the streaming
``Wav2VecSModel`` + ``BlockwiseTransformerEncoder``
(fairseq/fairseq/models/wav2vec/wav2vec_S.py:314-440): conv feature extractor
-> span masking -> (full-context | block-wise) transformer encoder ->
Gumbel-VQ targets -> InfoNCE logits.

TPU-first redesign notes
------------------------
- [B, T, D] layout throughout, static shapes everywhere.  Masked-position
  gathers use a per-batch ``mask_positions [B, M]`` int32 tensor (equal mask
  count per row, which the host-side span sampler guarantees) instead of
  boolean fancy indexing.
- Negative sampling runs in-jit with jax PRNG (reference samples on host with
  torch RNG, wav2vec2.py:471-527).
- The block-wise context (mc, rc) is a static python pair per call; sampled-
  context training draws from a small bucket set so each pair compiles once
  (reference resamples per batch from randint, wav2vec_S.py:392-395).
- Gumbel temperature and layer-drop randomness are traced values — no
  recompilation over training.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from wav2vec_s_tpu.models.feature_extractor import (
    ConvFeatureExtractor, DEFAULT_CONV_LAYERS, conv_output_length)
from wav2vec_s_tpu.models.modules import (
    LayerNorm, TransformerEncoderLayer, grad_multiply)
from wav2vec_s_tpu.models.quantizer import GumbelVectorQuantizer
from wav2vec_s_tpu.ops import (
    block_layout, append_right_context, strip_right_context,
    extend_padding_mask, block_attn_bias)
from wav2vec_s_tpu.ops.block_mask import MASK_VALUE
from wav2vec_s_tpu.utils.positional import sinusoidal_positions_from_padding


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    # conv front-end
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_LAYERS
    extractor_mode: str = "layer_norm"     # "default" | "layer_norm"
    conv_bias: bool = False
    feature_grad_mult: float = 0.1
    # encoder
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    layer_norm_first: bool = False
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    encoder_layerdrop: float = 0.05
    dropout_input: float = 0.1
    dropout_features: float = 0.1
    # positions
    pos_type: str = "sin"                  # "sin" (wav2vec-S) | "conv" (wav2vec2)
    conv_pos: int = 128
    conv_pos_groups: int = 16
    # streaming context (wav2vec-S)
    main_context: int = 16
    right_context: int = 8
    context_type: str = "constant"         # "constant" | "sampling"
    # quantizer / contrastive head
    quantize_targets: bool = True
    final_dim: int = 256
    latent_vars: int = 320
    latent_groups: int = 2
    latent_temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)
    logit_temp: float = 0.1
    n_negatives: int = 100
    cross_sample_negatives: int = 0
    # masking
    mask_prob: float = 0.65
    mask_length: int = 10
    # misc
    normalize: bool = False                # instance-normalize raw waveform
    required_seq_len_multiple: int = 2
    attention_impl: str = "dense"          # "dense" | "flash" (Pallas,
                                           # inference path only)
    remat_extractor: bool = False          # recompute the conv front-end
                                           # in the backward instead of
                                           # saving its wide activations
                                           # ([B, S/5, 512] x2 per block)
    # context parallelism: name of a mesh axis to shard the encoder's TIME
    # dimension over (requires an ambient mesh via ``jax.set_mesh``; GSPMD
    # inserts the K/V all-gathers).  The reference has no sequence/context
    # parallelism at all (SURVEY §2.7 stretch goal).  None = off.
    seq_axis: Optional[str] = None
    dtype: str = "float32"

    @property
    def layer_norm_num(self) -> int:
        # fork quirk (wav2vec2.py:317): LN only in conv block 0 for 12-layer
        # models, in all 7 blocks for 24-layer models.
        return 1 if self.encoder_layers == 12 else 7

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


def wav2vec2_base_config(**kw) -> Wav2Vec2Config:
    return Wav2Vec2Config(pos_type="conv", extractor_mode="default", **kw)


def wav2vec_s_base_config(**kw) -> Wav2Vec2Config:
    """wav2vec-S Base (examples/wav2vec/config/pretraining/
    wav2vec-S_base_librispeech.yaml)."""
    return Wav2Vec2Config(**kw)


def wav2vec_s_large_config(**kw) -> Wav2Vec2Config:
    kw.setdefault("encoder_layers", 24)
    kw.setdefault("encoder_embed_dim", 1024)
    kw.setdefault("encoder_ffn_embed_dim", 4096)
    kw.setdefault("encoder_attention_heads", 16)
    kw.setdefault("layer_norm_first", True)
    kw.setdefault("normalize", True)
    kw.setdefault("final_dim", 768)
    return Wav2Vec2Config(**kw)


class ConvPositionalEmbedding(nn.Module):
    """wav2vec 2.0 conv positional embedding (wav2vec2.py:791-804).

    Grouped conv k=conv_pos, SamePad trim for even kernels, GELU.  The torch
    weight-norm parametrization is folded into a plain kernel at import time.
    """

    dim: int
    kernel: int = 128
    groups: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        h = nn.Conv(self.dim, (self.kernel,), padding=[(pad, pad)],
                    feature_group_count=self.groups, dtype=self.dtype,
                    name="conv")(x)
        if self.kernel % 2 == 0:
            h = h[:, :-1]  # SamePad (fairseq/fairseq/modules/same_pad.py:10)
        return jax.nn.gelu(h, approximate=False)


class EncoderLayers(nn.Module):
    """Shared transformer stack with layer-drop."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, bias=None, train: bool = False):
        c = self.cfg
        for i in range(c.encoder_layers):
            layer = TransformerEncoderLayer(
                embed_dim=c.encoder_embed_dim,
                ffn_dim=c.encoder_ffn_embed_dim,
                num_heads=c.encoder_attention_heads,
                dropout=c.dropout,
                attention_dropout=c.attention_dropout,
                activation_dropout=c.activation_dropout,
                layer_norm_first=c.layer_norm_first,
                dtype=c.compute_dtype,
                name=f"layer_{i}")
            y = layer(x, bias, deterministic=not train)
            if train and c.encoder_layerdrop > 0.0:
                keep = jax.random.bernoulli(
                    self.make_rng("layerdrop"), 1.0 - c.encoder_layerdrop)
                x = jnp.where(keep, y, x)
            else:
                x = y
        return x


def _dropout(mod: nn.Module, x, rate: float, train: bool):
    if rate == 0.0 or not train:
        return x
    from wav2vec_s_tpu.ops.dropout import hw_dropout
    return hw_dropout(x, rate, mod.make_rng("dropout"))


class TransformerEncoder(nn.Module):
    """Full-context encoder with conv positional embedding
    (wav2vec2.py:784-871)."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, padding_mask=None, train: bool = False):
        c = self.cfg
        if padding_mask is not None:
            x = x * (~padding_mask)[:, :, None].astype(x.dtype)
        x = x + ConvPositionalEmbedding(
            c.encoder_embed_dim, c.conv_pos, c.conv_pos_groups,
            dtype=c.compute_dtype, name="pos_conv")(x)
        if not c.layer_norm_first:
            x = LayerNorm(c.encoder_embed_dim, name="layer_norm")(x)
        x = _dropout(self, x, c.dropout, train)
        bias = None
        if padding_mask is not None:
            bias = jnp.where(padding_mask, MASK_VALUE, 0.0)[:, None, None, :]
        x = EncoderLayers(c, name="layers")(x, bias, train)
        if c.layer_norm_first:
            x = LayerNorm(c.encoder_embed_dim, name="layer_norm")(x)
        return x


class BlockwiseTransformerEncoder(nn.Module):
    """wav2vec-S training-time block-wise encoder (wav2vec_S.py:355-440).

    Sinusoidal absolute positions; appends right-context look-ahead copies,
    runs the stack under the block attention bias, strips the copies.
    (mc, rc) are static per call.
    """

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, padding_mask=None, main_context: int = None,
                 right_context: int = None, train: bool = False):
        c = self.cfg
        mc = main_context if main_context is not None else c.main_context
        rc = right_context if right_context is not None else c.right_context
        B, T, D = x.shape

        if padding_mask is not None:
            x = x * (~padding_mask)[:, :, None].astype(x.dtype)
            pm = padding_mask
        else:
            pm = jnp.zeros((B, T), dtype=bool)

        x = x + sinusoidal_positions_from_padding(pm, D, dtype=x.dtype)
        if not c.layer_norm_first:
            x = LayerNorm(c.encoder_embed_dim, name="layer_norm")(x)

        # pad to required_seq_len_multiple (static)
        pad_len = (-T) % c.required_seq_len_multiple
        if pad_len:
            x = jnp.pad(x, ((0, 0), (0, pad_len), (0, 0)))
            pm = jnp.pad(pm, ((0, 0), (0, pad_len)), constant_values=True)
        x = _dropout(self, x, c.dropout, train)

        layout = block_layout(T + pad_len, mc, rc)
        if c.seq_axis is not None:
            # pin the rc-copy gather + concat to the seq sharding on BOTH
            # sides: without the input-side constraint GSPMD resolved the
            # concatenate at a stale batch sharding and fell back to an
            # involuntary full rematerialization (replicate-then-shard)
            x = jax.lax.with_sharding_constraint(
                x, jax.sharding.PartitionSpec(None, c.seq_axis, None))
        x = append_right_context(x, layout)
        # flash path: inference and training (custom_vjp backward kernel;
        # attention dropout runs in-kernel via the TPU hardware PRNG) —
        # except under context parallelism: GSPMD cannot partition a
        # pallas_call's time axis, so CP always takes the XLA dense path
        # (the partitioner turns the QK^T einsum into an all-gather of K/V
        # over ``seq`` + local-query attention).
        use_flash = c.attention_impl == "flash" and c.seq_axis is None
        if c.seq_axis is not None:
            x = jax.lax.with_sharding_constraint(
                x, jax.sharding.PartitionSpec(None, c.seq_axis, None))
        if use_flash:
            from wav2vec_s_tpu.models.modules import FlashSpec
            from wav2vec_s_tpu.ops.pallas_attention import TILE
            # pad to the kernel's 128-row tiling ONCE outside the layer
            # stack — per-layer jnp.pad of every q/k/v operand (and slice
            # of every output) was ~1.3 GB/step of pure copies at
            # pre-train shapes; padded rows are masked keys and their
            # outputs are stripped below
            total = layout.total_len
            flash_pad = (-total) % TILE
            epm = extend_padding_mask(pm, layout)
            if flash_pad:
                x = jnp.pad(x, ((0, 0), (0, flash_pad), (0, 0)))
                epm = jnp.pad(epm, ((0, 0), (0, flash_pad)),
                              constant_values=True)
            bias = FlashSpec(epm, T + pad_len, mc, rc)
        else:
            bias = block_attn_bias(layout, pm, dtype=jnp.float32)
        x = EncoderLayers(c, name="layers")(x, bias, train)
        if use_flash and flash_pad:
            x = x[:, :total]
        x = strip_right_context(x, layout)
        if c.layer_norm_first:
            # the single `layer_norm` param is applied post-stack in pre-LN
            # models, pre-stack in post-LN models (wav2vec2.py:846-871)
            x = LayerNorm(c.encoder_embed_dim, name="layer_norm")(x)
        if pad_len:
            x = x[:, :T]
        return x


def downsample_padding_mask(padding_mask: jnp.ndarray, t_out: int) -> jnp.ndarray:
    """[B, T_samples] -> [B, T_frames]; a frame is pad iff *all* its samples
    are pad (reference wav2vec2.py:572-577)."""
    B, T = padding_mask.shape
    extra = T % t_out
    if extra:
        padding_mask = padding_mask[:, :-extra]
    return padding_mask.reshape(B, t_out, -1).all(axis=-1)


class Wav2Vec2Model(nn.Module):
    """Pre-training model (contrastive + VQ).  ``encoder_type`` selects the
    full-context (wav2vec 2.0) or block-wise (wav2vec-S) encoder."""

    cfg: Wav2Vec2Config
    encoder_type: str = "blockwise"        # "full" | "blockwise"

    def setup(self):
        c = self.cfg
        extractor_cls = (nn.remat(ConvFeatureExtractor)
                         if c.remat_extractor else ConvFeatureExtractor)
        self.feature_extractor = extractor_cls(
            conv_layers=c.conv_feature_layers, mode=c.extractor_mode,
            layer_norm_num=c.layer_norm_num, conv_bias=c.conv_bias,
            dtype=c.compute_dtype)
        self.layer_norm = LayerNorm(c.conv_feature_layers[-1][0])
        embed = c.conv_feature_layers[-1][0]
        if embed != c.encoder_embed_dim:
            self.post_extract_proj = nn.Dense(
                c.encoder_embed_dim, dtype=c.compute_dtype)
        else:
            self.post_extract_proj = None
        if self.encoder_type == "full":
            self.encoder = TransformerEncoder(c)
        else:
            self.encoder = BlockwiseTransformerEncoder(c)
        if c.quantize_targets:
            self.quantizer = GumbelVectorQuantizer(
                input_dim=embed, num_vars=c.latent_vars, groups=c.latent_groups,
                vq_dim=c.final_dim, dtype=c.compute_dtype)
            self.project_q = nn.Dense(c.final_dim, dtype=c.compute_dtype)
        else:
            self.quantizer = None
            self.project_q = nn.Dense(c.final_dim, dtype=c.compute_dtype)
        self.final_proj = nn.Dense(c.final_dim, dtype=c.compute_dtype)
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(scale=1.0),
            (c.encoder_embed_dim,), jnp.float32)

    def forward_features(self, source):
        c = self.cfg
        feats = self.feature_extractor(source)
        if c.feature_grad_mult != 1.0:
            if c.feature_grad_mult > 0:
                feats = grad_multiply(feats, c.feature_grad_mult)
            else:
                feats = jax.lax.stop_gradient(feats)
        return feats

    def _encode(self, x, padding_mask, main_context, right_context, train):
        if self.encoder_type == "full":
            return self.encoder(x, padding_mask, train=train)
        return self.encoder(x, padding_mask, main_context, right_context,
                            train=train)

    def extract_features(self, source, padding_mask=None,
                         main_context: int = None, right_context: int = None,
                         train: bool = False):
        """Downstream feature path (no masking / quantization)."""
        feats = self.forward_features(source)
        feats = self.layer_norm(feats)
        if padding_mask is not None:
            padding_mask = downsample_padding_mask(padding_mask, feats.shape[1])
        if self.post_extract_proj is not None:
            feats = self.post_extract_proj(feats)
        x = self._encode(feats, padding_mask, main_context, right_context, train)
        return x, padding_mask

    def __call__(self, source, mask_positions, num_updates,
                 padding_mask=None, main_context: int = None,
                 right_context: int = None, train: bool = True):
        """Pre-training forward.

        Args:
          source: [B, T_samples] waveform.
          mask_positions: [B, M] int32 — masked frame indices (host-sampled
            span mask, equal count per row).
          num_updates: scalar — drives the gumbel temperature anneal.
        Returns dict with InfoNCE ``logits [B, M, 1+N]`` (positive first) and
        diagnostics.
        """
        c = self.cfg
        feats = self.forward_features(source)
        features_pen = jnp.mean(jnp.square(feats.astype(jnp.float32)))
        feats = self.layer_norm(feats)
        unmasked = feats
        if padding_mask is not None:
            padding_mask = downsample_padding_mask(padding_mask, feats.shape[1])
        if self.post_extract_proj is not None:
            feats = self.post_extract_proj(feats)
        feats = _dropout(self, feats, c.dropout_input, train)
        unmasked = _dropout(self, unmasked, c.dropout_features, train)

        B, T, D = feats.shape
        M = mask_positions.shape[1]
        # scatter mask embedding at masked positions.  (A one-hot-einsum
        # formulation of this blend + the two row extractions below was
        # measured SLOWER than the gathers at Base pre-train dims —
        # unlike the contrastive head's index selection, these contract
        # over the full T axis; kept as gathers.)
        mask_bool = jnp.zeros((B, T), dtype=bool)
        mask_bool = jax.vmap(lambda m, p: m.at[p].set(True))(
            mask_bool, mask_positions)
        x = jnp.where(mask_bool[:, :, None],
                      self.mask_emb.astype(feats.dtype)[None, None, :], feats)

        x = self._encode(x, padding_mask, main_context, right_context, train)

        # gather masked positions: [B, M, D]
        take = jax.vmap(lambda t, p: t[p])
        y = take(unmasked, mask_positions)
        x_masked = take(x, mask_positions)

        if self.quantizer is not None:
            tmax, tmin, tdecay = c.latent_temp
            temp = jnp.maximum(
                tmax * tdecay ** jnp.asarray(num_updates, jnp.float32), tmin)
            q = self.quantizer(y, temp, train=train)
            y_q = self.project_q(q["x"])
            codes = q["sel_codes"]
        else:
            q = {"prob_perplexity": None, "code_perplexity": None,
                 "num_vars": 0, "temp": 0.0}
            y_q = self.project_q(y)
            codes = None

        preds = self.final_proj(x_masked)
        if codes is not None:
            logits = self._contrastive_logits_matmul(preds, y_q, codes)
        else:
            negs = self._sample_negatives(y_q)
            logits = self._compute_logits(preds, y_q, negs)

        return {
            "logits": logits,                       # [B, M, 1+N]
            "mask_positions": mask_positions,
            "padding_mask": padding_mask,
            "features_pen": features_pen,
            "prob_perplexity": q["prob_perplexity"],
            "code_perplexity": q["code_perplexity"],
            "num_vars": q["num_vars"],
            "temp": q["temp"],
        }

    def _negative_indices(self, B, M):
        """Uniform same-utterance distractor indices != own position
        (wav2vec2.py:471-527's sampling distribution, drawn in-jit)."""
        key = self.make_rng("negatives")
        idxs = jax.random.randint(key, (B, M, self.cfg.n_negatives),
                                  0, M - 1)
        own = jnp.arange(M)[None, :, None]
        return idxs + (idxs >= own)

    def _contrastive_logits_matmul(self, x, y_q, codes):
        """InfoNCE cosine logits via one pairwise matmul (quantized targets).

        The reference (wav2vec2.py:471-542) materializes the gathered
        negatives [B, M, N, D] and compares vectors elementwise; on TPU
        that is ~300 MB of HBM traffic per step plus a scatter-add in the
        backward.  Since cos(x_m, y_n) factorizes over normalized rows,
        computing the full pairwise table [B, M, M] as an MXU matmul and
        *gathering N scalars per row* is both cheaper and
        backward-friendly (the gather's VJP scatters into [B, M, M] f32,
        not [B, M, N, D]).  The neg_is_pos vector-equality mask reduces to
        integer code comparison: quantized rows are equal iff their
        selected codebook entries are equal.

        x (preds), y_q: [B, M, D]; codes: [B, M, G] int -> [B, M, 1+N].
        """
        c = self.cfg
        B, M, D = y_q.shape
        idxs = self._negative_indices(B, M)                       # [B, M, N]
        x32 = x.astype(jnp.float32)
        y32 = y_q.astype(jnp.float32)
        # torch cosine_similarity clamps the denominator at eps=1e-8
        xn = x32 / jnp.maximum(
            jnp.linalg.norm(x32, axis=-1, keepdims=True), 1e-8)
        yn = y32 / jnp.maximum(
            jnp.linalg.norm(y32, axis=-1, keepdims=True), 1e-8)
        cos_all = jnp.einsum("bmd,bnd->bmn", xn, yn)              # [B, M, M]
        pos = jnp.einsum("bmd,bmd->bm", xn, yn)                   # diagonal
        # ONE-HOT MATMUL selection instead of gather/scatter: TPU
        # gather of B*M*N (~230k) random indices and its backward
        # scatter-add into [B, M, M] each ran ~2 ms/step (serialized
        # index processing, profiled as the step's top copy ops); the
        # same selection as a one-hot einsum is MXU work at trivial
        # FLOPs, and its backward (d cos_all = onehot^T d_neg) is the
        # same matmul transposed.  precision=HIGHEST keeps it EXACT:
        # one operand is exact 0/1, the f32 pass-splitting reconstructs
        # cos_all's f32 values bit-for-bit.
        N = idxs.shape[-1]
        onehot = (idxs[..., None] ==
                  jnp.arange(M)[None, None, None, :])             # [B,M,N,M]
        neg = jnp.einsum("bmnk,bmk->bmn", onehot.astype(jnp.float32),
                         cos_all, precision=jax.lax.Precision.HIGHEST)
        # codes row-select with the same one-hot (ints exact in f32)
        codes_n = jnp.einsum(
            "bmnk,bkg->bmng", onehot.astype(jnp.float32),
            codes.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST).astype(codes.dtype)
        neg_is_pos = jnp.all(codes_n == codes[:, :, None, :], axis=-1)
        neg = jnp.where(neg_is_pos, -jnp.inf, neg / c.logit_temp)
        return jnp.concatenate([pos[:, :, None] / c.logit_temp, neg],
                               axis=-1)

    def _sample_negatives(self, y):
        """Uniform same-utterance distractors (wav2vec2.py:471-527).

        y: [B, M, D] -> negs [B, M, N, D]; index != own position.
        """
        B, M, D = y.shape
        idxs = self._negative_indices(B, M)
        return jax.vmap(lambda yb, ib: yb[ib])(y, idxs)

    def _compute_logits(self, x, pos, negs):
        """Cosine-similarity InfoNCE logits (wav2vec2.py:529-542).

        x, pos: [B, M, D]; negs: [B, M, N, D] -> [B, M, 1+N], positive first.
        """
        c = self.cfg
        targets = jnp.concatenate([pos[:, :, None, :], negs], axis=2)
        x32 = x.astype(jnp.float32)[:, :, None, :]
        t32 = targets.astype(jnp.float32)
        cos = jnp.sum(x32 * t32, axis=-1) / (
            jnp.linalg.norm(x32, axis=-1) * jnp.linalg.norm(t32, axis=-1)
            + 1e-8)
        logits = cos / c.logit_temp
        # mask out negatives identical to the positive
        neg_is_pos = jnp.all(negs == pos[:, :, None, :], axis=-1)  # [B, M, N]
        logits = logits.at[:, :, 1:].set(
            jnp.where(neg_is_pos, -jnp.inf, logits[:, :, 1:]))
        return logits
