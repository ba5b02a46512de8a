"""Incremental cached encoder == full blockwise re-encode (the key parity
property for the O(T) streaming path)."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_wav2vec2_model import TINY, _rngs
from wav2vec_s_tpu.models import Wav2Vec2Model
from wav2vec_s_tpu.stream.incremental import IncrementalBlockwiseEncoder


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
    got = np.asarray(state.out_cache)[:, :t]
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
    got = np.asarray(state.out_cache)[:, :t]
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
    got = np.asarray(state.out_cache)[:, :t]
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
    got = np.asarray(state.out_cache)[:, :t]
    np.testing.assert_allclose(got, full[:, :t], atol=2e-4, rtol=2e-4)
