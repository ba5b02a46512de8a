"""Waveform conv front-end: 7 strided Conv1d blocks, 320x downsampling.

Behavioral twin of ``ConvFeatureExtractionModel``
(fairseq/fairseq/models/wav2vec/wav2vec2.py:702-781) including the fork's
``layer_norm_num`` quirk (layer-norm only in the first N conv blocks,
wav2vec2.py:317,766: N=1 for 12-layer/base, N=7 for 24-layer/large configs).

TPU-first: feature-last [B, T, C] layout so every conv lowers to an MXU
matmul after im2col; VALID padding (torch default padding=0); norms in fp32.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from wav2vec_s_tpu.models.modules import Fp32GroupNorm, LayerNorm

# (dim, kernel, stride) per block — `conv_feature_layers` default
DEFAULT_CONV_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
    (512, 3, 2), (512, 2, 2), (512, 2, 2),
)


def conv_output_length(t: int, layers=DEFAULT_CONV_LAYERS) -> int:
    for _, k, s in layers:
        t = (t - k) // s + 1
    return t


def conv_receptive_stride(layers=DEFAULT_CONV_LAYERS) -> tuple[int, int]:
    """(receptive_field, hop) in samples — (400, 320) for the default stack."""
    rf, hop = 1, 1
    for _, k, s in layers:
        rf = rf + (k - 1) * hop
        hop *= s
    return rf, hop


class _Im2ColConv(nn.Module):
    """Conv1d lowered as unfold + matmul — for shallow contractions.

    XLA's conv lowering on TPU is catastrophically MXU-starved when
    ``in_channels * kernel`` is tiny (the wav2vec front-end's first block:
    in=1, k=10 — profiled at ~45% of the whole one-shot encode).  Unfolding
    the waveform into patches and hitting one [B*T, k] x [k, C] matmul is
    the same math an order of magnitude faster.  Param names/shapes match
    ``nn.Conv`` exactly ("kernel" [k, in, out], optional "bias"), so
    checkpoints are interchangeable.
    """

    features: int
    kernel: int
    stride: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:   # [B, T, C]
        C = x.shape[-1]
        w = self.param("kernel", nn.initializers.he_normal(),
                       (self.kernel, C, self.features), jnp.float32)
        p = jax.lax.conv_general_dilated_patches(
            x, (self.kernel,), (self.stride,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))     # [B, T', C*k]
        # patches order their feature dim input-channel-major: [C, k]
        y = jnp.einsum(
            "btp,pf->btf", p.astype(self.dtype),
            w.transpose(1, 0, 2).reshape(C * self.kernel, self.features)
            .astype(self.dtype))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class _StridedConv(nn.Module):
    """Strided Conv1d as ceil(k/s) reshaped matmuls — for deep channels.

    XLA's TPU conv lowering on the [B, T, 512] k=3/s=2 middle blocks
    splits the time axis into spatial chunks and burns more time in
    data-movement fusions than in the MXU (profiled ~20 ms/step of the
    pre-train forward+backward against a ~2 ms flop bound).  A strided
    conv is exactly a sum of matmuls over stride-groups: reshaping
    [B, T, C] -> [B, T/s, s*C] makes group r of the kernel a single
    [B, T', min(s,k-rs)*C] x [.., F] contraction — pure MXU, no patch
    materialization (the reshape is layout-free).  Param names/shapes
    match ``nn.Conv`` ("kernel" [k, in, out], optional "bias"), so
    checkpoints are interchangeable.
    """

    features: int
    kernel: int
    stride: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:   # [B, T, C]
        B, T, C = x.shape
        k, s, F = self.kernel, self.stride, self.features
        w = self.param("kernel", nn.initializers.he_normal(),
                       (k, C, F), jnp.float32)
        t_out = (T - k) // s + 1
        y = None
        for r in range((k + s - 1) // s):
            width = min(k - r * s, s)
            xs = x[:, r * s:]
            pad = (-xs.shape[1]) % s
            if pad:
                xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
            xr = xs.reshape(B, -1, s * C)[:, :t_out, :width * C]
            wr = w[r * s:r * s + width].reshape(width * C, F)
            part = jnp.einsum("btc,cf->btf", xr.astype(self.dtype),
                              wr.astype(self.dtype))
            y = part if y is None else y + part
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (F,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class ConvFeatureExtractor(nn.Module):
    conv_layers: Sequence[Tuple[int, int, int]] = DEFAULT_CONV_LAYERS
    mode: str = "default"          # "default" (group-norm block 0) | "layer_norm"
    layer_norm_num: int = 1        # fork quirk: LN only in first N blocks
    conv_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, source: jnp.ndarray) -> jnp.ndarray:
        """source: [B, T_samples] raw waveform -> [B, T_frames, C]."""
        assert self.mode in ("default", "layer_norm")
        x = source[:, :, None].astype(self.dtype)  # [B, T, 1]
        for i, (dim, k, stride) in enumerate(self.conv_layers):
            if x.shape[-1] * k <= 64:
                x = _Im2ColConv(
                    features=dim, kernel=k, stride=stride,
                    use_bias=self.conv_bias, dtype=self.dtype,
                    name=f"conv_{i}")(x)
            else:
                # NOTE: a strided-matmul decomposition (_StridedConv) was
                # measured at parity with XLA's conv lowering here (the
                # [T, C] -> [T/s, sC] reshape is a physical relayout under
                # TPU tiled layouts, costing what the conv lowering's own
                # data movement costs); kept for in-kernel use by the
                # fused front-end, XLA path stays nn.Conv
                x = nn.Conv(
                    features=dim, kernel_size=(k,), strides=(stride,),
                    padding="VALID", use_bias=self.conv_bias,
                    kernel_init=nn.initializers.he_normal(),
                    dtype=self.dtype, name=f"conv_{i}")(x)
            if self.mode == "layer_norm" and i < self.layer_norm_num:
                x = LayerNorm(dim, name=f"ln_{i}")(x)
            elif self.mode == "default" and i == 0:
                x = Fp32GroupNorm(dim, dim, name=f"gn_{i}")(x)
            x = jax.nn.gelu(x, approximate=False)
        return x
