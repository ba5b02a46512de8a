"""Incremental cached encoder == full blockwise re-encode (the key parity
property for the O(T) streaming path)."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_wav2vec2_model import TINY, _rngs
from wav2vec_s_tpu.models import Wav2Vec2Model
from wav2vec_s_tpu.stream.incremental import IncrementalBlockwiseEncoder


import pytest

pytestmark = pytest.mark.slow   # heavyweight e2e/equality leg


def test_incremental_matches_full_encode():
    mc, rc = TINY.main_context, TINY.right_context   # 4, 2
    model = Wav2Vec2Model(TINY, encoder_type="blockwise")
    N, K = 2, 5                                       # streams, chunks
    from wav2vec_s_tpu.models.feature_extractor import conv_receptive_stride
    rf, hop = conv_receptive_stride(TINY.conv_feature_layers)
    total_frames = K * mc + rc
    n_samples = (total_frames - 1) * hop + rf
    audio = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (N, n_samples)), np.float32)

    variables = model.init(_rngs(), jnp.asarray(audio),
                           jnp.zeros((N, 2), jnp.int32), 0, train=False)
    full, _ = model.apply(variables, jnp.asarray(audio),
                          method=Wav2Vec2Model.extract_features,
                          main_context=mc, right_context=rc)
    full = np.asarray(full)

    enc = IncrementalBlockwiseEncoder(TINY, variables["params"], N, t_cap=64)
    state = enc.init()
    W = enc.window
    for k in range(K):
        start = k * mc * hop
        win = audio[:, start:start + W]
        if win.shape[1] < W:
            win = np.pad(win, ((0, 0), (0, W - win.shape[1])))
        state = enc.step(state, win)
    t = int(state.t_main)
    assert t == K * mc
    got = np.asarray(state.out_cache)[:t].transpose(1, 0, 2)
    np.testing.assert_allclose(got, full[:, :t], atol=2e-4, rtol=2e-4)


def test_flush_commits_lookahead():
    mc, rc = TINY.main_context, TINY.right_context
    model = Wav2Vec2Model(TINY, encoder_type="blockwise")
    N, K = 1, 3
    from wav2vec_s_tpu.models.feature_extractor import conv_receptive_stride
    rf, hop = conv_receptive_stride(TINY.conv_feature_layers)
    total_frames = K * mc + rc
    n_samples = (total_frames - 1) * hop + rf
    audio = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (N, n_samples)), np.float32)
    variables = model.init(_rngs(), jnp.asarray(audio),
                           jnp.zeros((N, 2), jnp.int32), 0, train=False)
    full, _ = model.apply(variables, jnp.asarray(audio),
                          method=Wav2Vec2Model.extract_features,
                          main_context=mc, right_context=rc)
    full = np.asarray(full)

    enc = IncrementalBlockwiseEncoder(TINY, variables["params"], N, t_cap=64)
    state = enc.init()
    W = enc.window
    for k in range(K):
        start = k * mc * hop
        win = audio[:, start:start + W]
        if win.shape[1] < W:
            win = np.pad(win, ((0, 0), (0, W - win.shape[1])))
        state = enc.step(state, win, flush=(k == K - 1))
    t = int(state.t_main)
    assert t == K * mc + rc
    got = np.asarray(state.out_cache)[:t].transpose(1, 0, 2)
    np.testing.assert_allclose(got, full[:, :t], atol=2e-4, rtol=2e-4)


def test_multiblock_chunks_match_full_encode():
    """blocks_per_step > 1 (DECISION_STEP) must still equal the full
    blockwise encode."""
    mc, rc = TINY.main_context, TINY.right_context
    model = Wav2Vec2Model(TINY, encoder_type="blockwise")
    from wav2vec_s_tpu.models.feature_extractor import conv_receptive_stride
    rf, hop = conv_receptive_stride(TINY.conv_feature_layers)
    N, B_s, K = 2, 2, 3                         # 3 chunks of 2 blocks
    total_frames = K * B_s * mc + rc
    n_samples = (total_frames - 1) * hop + rf
    audio = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (N, n_samples)), np.float32)
    variables = model.init(_rngs(), jnp.asarray(audio),
                           jnp.zeros((N, 2), jnp.int32), 0, train=False)
    full, _ = model.apply(variables, jnp.asarray(audio),
                          method=Wav2Vec2Model.extract_features,
                          main_context=mc, right_context=rc)
    full = np.asarray(full)

    enc = IncrementalBlockwiseEncoder(TINY, variables["params"], N,
                                      t_cap=64, blocks_per_step=B_s)
    state = enc.init()
    W = enc.window
    for k in range(K):
        start = k * enc.n_main * hop
        win = audio[:, start:start + W]
        if win.shape[1] < W:
            win = np.pad(win, ((0, 0), (0, W - win.shape[1])))
        state = enc.step(state, win, flush=(k == K - 1))
    t = int(state.t_main)
    assert t == K * B_s * mc + rc
    got = np.asarray(state.out_cache)[:t].transpose(1, 0, 2)
    np.testing.assert_allclose(got, full[:, :t], atol=2e-4, rtol=2e-4)


def test_pre_ln_incremental_matches_full_encode():
    """The large-config (pre-LN) layer ordering through the incremental
    path."""
    import dataclasses
    cfg = dataclasses.replace(TINY, layer_norm_first=True)
    mc, rc = cfg.main_context, cfg.right_context
    model = Wav2Vec2Model(cfg, encoder_type="blockwise")
    from wav2vec_s_tpu.models.feature_extractor import conv_receptive_stride
    rf, hop = conv_receptive_stride(cfg.conv_feature_layers)
    N, K = 1, 4
    n_samples = (K * mc + rc - 1) * hop + rf
    audio = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (N, n_samples)), np.float32)
    variables = model.init(_rngs(), jnp.asarray(audio),
                           jnp.zeros((N, 2), jnp.int32), 0, train=False)
    full, _ = model.apply(variables, jnp.asarray(audio),
                          method=Wav2Vec2Model.extract_features,
                          main_context=mc, right_context=rc)
    full = np.asarray(full)

    enc = IncrementalBlockwiseEncoder(cfg, variables["params"], N, t_cap=64)
    state = enc.init()
    W = enc.window
    for k in range(K):
        start = k * mc * hop
        win = audio[:, start:start + W]
        if win.shape[1] < W:
            win = np.pad(win, ((0, 0), (0, W - win.shape[1])))
        state = enc.step(state, win, flush=(k == K - 1))
    t = int(state.t_main)
    got = np.asarray(state.out_cache)[:t].transpose(1, 0, 2)
    np.testing.assert_allclose(got, full[:, :t], atol=2e-4, rtol=2e-4)


def test_fused_chunk_attention_matches_xla_path():
    """The Pallas chunk-attention kernel (interpret mode) must reproduce
    the XLA einsum+softmax path of the incremental encoder exactly."""
    from tests.test_caat import W2V_TINY, _rngs  # noqa: F401
    from wav2vec_s_tpu.models.wav2vec2 import Wav2Vec2Model
    from wav2vec_s_tpu.stream.incremental import IncrementalBlockwiseEncoder
    import dataclasses as _dc
    import jax
    import jax.numpy as jnp

    cfg = _dc.replace(W2V_TINY, extractor_mode="layer_norm")
    model = Wav2Vec2Model(cfg, encoder_type="blockwise")
    src = jax.random.normal(jax.random.PRNGKey(0), (2, 2400))
    variables = model.init(_rngs(), src, jnp.zeros((2, 2), jnp.int32), 0,
                           train=False)
    params = variables["params"]

    rng = np.random.default_rng(0)
    N = 2
    enc_x = IncrementalBlockwiseEncoder(cfg, params, N, t_cap=64,
                                        fused_attention=False)
    enc_p = IncrementalBlockwiseEncoder(cfg, params, N, t_cap=64,
                                        fused_attention=True)
    audio = (rng.standard_normal((N, 2400)) * 0.1).astype(np.float32)

    sx = enc_x.init()
    sp = enc_p.init()
    for k in range(3):
        start = k * enc_x.n_main * enc_x.hop
        win = audio[:, start:start + enc_x.window]
        sx = enc_x.step(sx, win)
        sp = enc_p.step(sp, win)
    t = int(sx.t_main)
    np.testing.assert_allclose(
        np.asarray(sp.out_cache)[:t], np.asarray(sx.out_cache)[:t],
        atol=2e-2, rtol=2e-2)
    # tight check in float32 space on the committed frames
    d = np.abs(np.asarray(sp.out_cache)[:t].astype(np.float32)
               - np.asarray(sx.out_cache)[:t].astype(np.float32))
    assert d.mean() < 2e-3
