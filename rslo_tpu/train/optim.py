"""Optimizer + LR schedule construction (optax).

Replaces the reference's fastai OptimWrapper + OneCycle stack
(/root/reference/rslo/torchplus/train/fastai_optim.py,
learning_schedules_fastai.py, optimizer_builder.py): AdamW with decoupled
weight decay (``fixed_weight_decay``), OneCycle cosine lr/momentum
schedule, global-norm gradient clipping, optional per-submodule lr
multipliers (the layer-group analog).
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import optax

from ..config.schema import OptimizerCfg, TrainCfg


def onecycle_lr(cfg: OptimizerCfg, total_steps: int) -> optax.Schedule:
    """OneCycle: cosine warmup from lr_max/div to lr_max over pct_start,
    then cosine anneal to ~0 (matching the fastai schedule the reference
    uses, learning_schedules_fastai.py:79-130)."""
    lr_max = cfg.lr_max
    lr_start = lr_max / cfg.onecycle_div_factor
    warm = max(int(total_steps * cfg.onecycle_pct_start), 1)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm_f = jnp.float32(warm)
        # cosine ramp up
        up = lr_start + (lr_max - lr_start) * 0.5 * (
            1 - jnp.cos(math.pi * jnp.minimum(step, warm_f) / warm_f))
        # cosine anneal down
        t = jnp.clip((step - warm_f) / max(total_steps - warm, 1), 0.0, 1.0)
        down = lr_max * 0.5 * (1 + jnp.cos(math.pi * t)) + 1e-8
        return jnp.where(step < warm_f, up, down)

    return sched


def onecycle_momentum(cfg: OptimizerCfg, total_steps: int) -> optax.Schedule:
    m0, m1 = cfg.onecycle_moms
    warm = max(int(total_steps * cfg.onecycle_pct_start), 1)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm_f = jnp.float32(warm)
        up = m0 + (m1 - m0) * 0.5 * (
            1 - jnp.cos(math.pi * jnp.minimum(step, warm_f) / warm_f))
        t = jnp.clip((step - warm_f) / max(total_steps - warm, 1), 0.0, 1.0)
        down = m1 + (m0 - m1) * 0.5 * (1 - jnp.cos(math.pi * t))
        return jnp.where(step < warm_f, up, down)

    return sched


def exponential_decay_warmup(lr_init: float, decay_steps: int,
                             decay_rate: float, warmup_steps: int = 0,
                             staircase: bool = True) -> optax.Schedule:
    """Exponential decay with linear warmup (the reference's
    ExponentialDecayWarmup, learning_schedules_fastai.py:132-176)."""
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        p = step / decay_steps
        if staircase:
            p = jnp.floor(p)
        lr = lr_init * (decay_rate ** p)
        if warmup_steps > 0:
            w = jnp.clip(step / warmup_steps, 0.0, 1.0)
            lr = lr * w
        return lr
    return sched


def manual_stepping(boundaries, rates) -> optax.Schedule:
    """Piecewise-constant lr (ManualStepping)."""
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.float32(rates[0])
        for b, r in zip(boundaries, rates[1:]):
            lr = jnp.where(step >= b, jnp.float32(r), lr)
        return lr
    return sched


def build_optimizer(cfg: OptimizerCfg, train_cfg: TrainCfg
                    ) -> optax.GradientTransformation:
    lr = onecycle_lr(cfg, train_cfg.steps)
    mom = onecycle_momentum(cfg, train_cfg.steps)

    def decay_mask(params):
        # The reference's fixed_weight_decay decays layer weights only
        # (fastai OptimWrapper splits BN/bias into no-wd groups,
        # fastai_optim.py:14-117).  Decaying the learned loss
        # log-variance alphas or norm scale/bias would bias them toward
        # 0 every step — mask them out: only 'kernel' leaves decay.
        def is_kernel(path, _):
            last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            return last == "kernel"
        return jax.tree_util.tree_map_with_path(is_kernel, params)

    def adamw_core(learning_rate, b1):
        return optax.chain(
            optax.scale_by_adam(b1=b1, b2=0.99),
            optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask),
            optax.scale(-1.0 * learning_rate),
        )

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.inject_hyperparams(adamw_core)(learning_rate=lr, b1=mom),
    )
    if cfg.group_lr_mult:
        mults = dict(cfg.group_lr_mult)

        def label_fn(params):
            def label(path, _):
                top = path[0].key if hasattr(path[0], "key") else str(path[0])
                for name in mults:
                    if name in top:
                        return name
                return "default"
            return jax.tree_util.tree_map_with_path(label, params)

        transforms = {"default": optax.identity()}
        for name, m in mults.items():
            transforms[name] = optax.scale(m)
        tx = optax.chain(tx, optax.multi_transform(transforms, label_fn))
    return tx
