"""Optimizer zoo (pretrain_src/optim/*: AdamW, RAdam, Lookahead/RangerLars;
map_nav_src agent_base.py:122-138: rms/adam/adamW/sgd) mapped onto optax, plus
the linear warmup+decay schedule (pretrain_src/optim/sched.py:18-29)."""

from __future__ import annotations

import jax
import optax

from gridmm_tpu.config import TrainConfig


def decay_mask(params):
    """True where weight decay applies. The reference excludes biases and
    LayerNorm weights from decay (pretrain_src/optim/misc.py:12-37,
    no_decay=['bias', 'LayerNorm.weight']); our LayerNorm params live under an
    `ln` submodule as scale/bias."""

    def decay(path, _leaf):
        p = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                     for k in path)
        return not (p.endswith("bias") or p.endswith("scale") or "/ln/" in p)

    return jax.tree_util.tree_map_with_path(decay, params)


def warmup_linear_schedule(lr: float, warmup_steps: int,
                           total_steps: int) -> optax.Schedule:
    """LR ramps 0->lr over warmup then decays linearly to 0
    (sched.py: warmup_linear)."""
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps),
         optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1))],
        [warmup_steps])


def build_optimizer(name: str, cfg: TrainConfig,
                    schedule=None) -> optax.GradientTransformation:
    lr = schedule if schedule is not None else cfg.lr
    b1, b2 = cfg.betas
    opts = {
        "adamw": lambda: optax.adamw(lr, b1=b1, b2=b2,
                                     weight_decay=cfg.weight_decay,
                                     mask=decay_mask),
        "adam": lambda: optax.adam(lr, b1=b1, b2=b2),
        "rms": lambda: optax.rmsprop(lr),
        "sgd": lambda: optax.sgd(lr),
        "radam": lambda: optax.radam(lr, b1=b1, b2=b2),
        # RangerLars = RAdam + layerwise trust ratio (LARS); the reference's
        # Lookahead wrapper needs fast/slow param pairs — omitted in favor of
        # the plain composition (optim/rangerlars.py)
        "rangerlars": lambda: optax.chain(
            optax.scale_by_radam(b1=b1, b2=b2),
            optax.scale_by_trust_ratio(),
            optax.scale_by_learning_rate(lr)),
    }
    if name not in opts:
        raise ValueError(f"unknown optimizer {name!r}")
    tx = opts[name]()
    return optax.chain(optax.clip_by_global_norm(cfg.grad_norm_clip), tx)
