"""The jit-compiled train step: fwd/bwd, grad accumulation, clip, update.

Replaces the reference Trainer hot loop (fairseq/fairseq/trainer.py:632-811):
``update_freq`` accumulation with ``no_sync`` becomes a ``lax.scan`` over
microbatches *inside* jit; the bucketed all-reduce + ``multiply_grads(world /
sample_size)`` + ``clip_grad_norm`` + cross-rank ``_check_grad_norms`` become
a single global mean (XLA inserts the collectives from the mesh sharding —
grad consistency across replicas is guaranteed by SPMD, not checked after the
fact); fp16 loss-scaling + NaN re-runs become a bf16 skip-on-nonfinite
update.

The whole step is one XLA program: donated state, no host sync except the
scalar metrics fetch.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

LossFn = Callable[..., tuple]   # (params, batch, rng, step) -> (loss_sum, sample_size, logs)


def ravel_padded(tree, multiple: int = 64):
    """``ravel_pytree`` padded to a multiple (ZeRO-1 divisibility over the
    data axis; the pad tail carries zero grads so the update is a no-op
    there).  Returns (flat [P], unravel)."""
    from jax.flatten_util import ravel_pytree

    flat, unravel = ravel_pytree(tree)
    pad = (-flat.size) % multiple
    if pad:
        size = flat.size
        return jnp.pad(flat, (0, pad)), lambda v: unravel(v[:size])
    return flat, unravel


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, optimizer, flat_optimizer: bool = False):
        """``flat_optimizer``: hold optimizer state over ONE raveled
        parameter vector instead of the param tree — the whole
        clip/adam/decay/schedule chain runs as ~10 large fusions instead
        of 3-4 tiny ones per leaf.  Must match
        ``make_train_step(flat_optimizer=)``.

        MEASURED NEGATIVE at base dims on one v5e chip (off by default):
        the per-leaf launch overhead it removes (~13 ms/step of scalar
        fusions) is outweighed by the ravel/unravel traffic it adds
        (4 extra full passes over 730 MB of f32 params/grads plus a
        layout-changing reshape, ~+20 ms/step; CAAT fine-tune 11.5 ->
        9.6 updates/s).  Kept as an option for sharded-optimizer
        experiments: the flat vector ZeRO-shards exactly (padded to a
        multiple of 64) where per-leaf sharding replicates odd leaves.
        """
        if flat_optimizer:
            opt_state = optimizer.init(ravel_padded(params)[0])
        else:
            opt_state = optimizer.init(params)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=opt_state)


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


#: rematerialization / offload policies for the whole loss forward.
#: "dots": save only matmul outputs with no batch dims (weights-shaped) —
#: the classic remat trade, activations recomputed in backward.
#: "offload_dots": additionally park those saveables in pinned host memory
#: (HBM -> host offload; the fairseq analogue is fairscale FSDP's
#: cpu_offload, distributed/fully_sharded_data_parallel.py).
REMAT_POLICIES = {
    "dots": lambda: jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    "nothing": lambda: jax.checkpoint_policies.nothing_saveable,
    "offload_dots": lambda: jax.checkpoint_policies
        .offload_dot_with_no_batch_dims("device", "pinned_host"),
}


def make_train_step(loss_fn: LossFn, optimizer: optax.GradientTransformation,
                    accum_steps: int = 1, skip_nonfinite: bool = True,
                    grad_mask: Optional[Callable] = None,
                    remat_policy: str = "none",
                    flat_optimizer: bool = False):
    """Build the jitted update.

    ``loss_fn(params, microbatch, rng, step)`` must return a *summed* loss,
    its sample count, and a dict of summed metric scalars — fairseq criterion
    contract (wav2vec_criterion.py:44-160); grads are normalized by the
    total sample count across all microbatches and devices, matching
    ``multiply_grads(world_size / sample_size)`` (trainer.py:757-767).

    ``grad_mask(params_tree_like, step)`` optionally zeroes gradients (freeze
    schedules: ``freeze_finetune_updates`` / ``freeze_w2v2_enc``).
    """

    if remat_policy != "none":
        loss_fn = jax.checkpoint(loss_fn,
                                 policy=REMAT_POLICIES[remat_policy]())

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def one_micro(params, mb, rng, step):
        (loss, (n, logs)), grads = grad_fn(params, mb, rng, step)
        return grads, loss, jnp.asarray(n, jnp.float32), logs

    def train_step(state: TrainState, batch, rng):
        step = state.step

        if accum_steps == 1:
            grads, loss, n, logs = one_micro(state.params, batch, rng, step)
        else:
            def body(carry, mb):
                acc_g, acc_loss, acc_n, acc_logs, i = carry
                r = jax.random.fold_in(rng, i)
                g, l, n, logs = one_micro(state.params, mb, r, step)
                return (tree_add(acc_g, g), acc_loss + l, acc_n + n,
                        tree_add(acc_logs, logs), i + 1), None

            zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            g0, l0, n0, logs0 = one_micro(
                state.params, jax.tree_util.tree_map(lambda x: x[0], batch),
                jax.random.fold_in(rng, 0), step)
            rest = jax.tree_util.tree_map(lambda x: x[1:], batch)
            (grads, loss, n, logs, _), _ = jax.lax.scan(
                body, (g0, l0, n0, logs0, jnp.ones((), jnp.int32)), rest)

        # normalize summed grads by global sample count
        denom = jnp.maximum(n, 1.0)
        if grad_mask is not None:
            grads = grad_mask(grads, step)

        if flat_optimizer:
            # one raveled vector through the whole optimizer chain: the
            # per-leaf tree maps (normalize, norm, clip, adam, decay, lr,
            # apply, skip) collapse from ~1500 tiny fusions to ~10 large
            # ones (the launch overhead was ~30% of the fine-tune step)
            flat_g, _ = ravel_padded(grads)
            flat_p, unravel = ravel_padded(state.params)
            flat_g = flat_g / denom
            gnorm = jnp.linalg.norm(flat_g)
            updates, new_opt = optimizer.update(flat_g, state.opt_state,
                                                flat_p)
            flat_new = flat_p + updates
            if skip_nonfinite:
                ok = jnp.isfinite(gnorm)
                flat_new = jnp.where(ok, flat_new, flat_p)
                new_opt = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(ok, new, old), new_opt,
                    state.opt_state)
                logs = dict(logs, skipped=(~ok).astype(jnp.float32))
            new_params = unravel(flat_new)
        else:
            grads = jax.tree_util.tree_map(lambda g: g / denom, grads)
            gnorm = optax.global_norm(grads)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)

            if skip_nonfinite:
                ok = jnp.isfinite(gnorm)
                new_params = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(ok, new, old), new_params,
                    state.params)
                new_opt = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(ok, new, old), new_opt,
                    state.opt_state)
                logs = dict(logs, skipped=(~ok).astype(jnp.float32))

        logs = dict(logs, loss_total=loss, sample_size=n, grad_norm=gnorm)
        new_state = state.replace(step=step + 1, params=new_params,
                                  opt_state=new_opt)
        return new_state, logs

    return train_step


def jit_train_step(train_step, mesh=None, donate: bool = True):
    """jit with donated state; with a mesh, annotate batch as data-sharded."""
    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    return jax.jit(train_step, **kwargs)
