"""Optimizer zoo (pretrain_src/optim/*: AdamW, RAdam, Lookahead/RangerLars;
map_nav_src agent_base.py:122-138: rms/adam/adamW/sgd) mapped onto optax, plus
the linear warmup+decay schedule (pretrain_src/optim/sched.py:18-29)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
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


class LookaheadState(NamedTuple):
    inner: optax.OptState
    slow: optax.Params
    step: jnp.ndarray


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """Lookahead (Zhang et al. 2019) as a plain GradientTransformation.

    Semantics of pretrain_src/optim/lookahead.py:29-52: every ``sync_period``
    fast steps, slow += alpha * (fast - slow) and fast is reset to slow.
    Unlike ``optax.lookahead`` this keeps the slow weights inside the
    optimizer STATE rather than restructuring params into fast/slow pairs,
    so it drops into any existing TrainState; the sync is a branchless
    ``jnp.where`` on the step counter (jit/TPU-friendly — no lax.cond over
    the whole tree)."""

    def init(params):
        return LookaheadState(
            inner=inner.init(params),
            slow=jax.tree_util.tree_map(jnp.asarray, params),
            step=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("lookahead requires params")
        fast_updates, inner_state = inner.update(updates, state.inner, params)
        step = state.step + 1
        sync = (step % sync_period == 0)

        def leaf(u, p, s):
            fast = p + u
            slow_new = s + slow_step_size * (fast - s)
            return (jnp.where(sync, (slow_new - p).astype(u.dtype), u),
                    jnp.where(sync, slow_new.astype(s.dtype), s))

        pairs = jax.tree_util.tree_map(leaf, fast_updates, params, state.slow)
        out_updates = jax.tree_util.tree_map(
            lambda t: t[0], pairs, is_leaf=lambda t: isinstance(t, tuple))
        slow = jax.tree_util.tree_map(
            lambda t: t[1], pairs, is_leaf=lambda t: isinstance(t, tuple))
        return out_updates, LookaheadState(inner_state, slow, step)

    return optax.GradientTransformation(init, update)


def build_optimizer(name: str, cfg: TrainConfig,
                    schedule=None) -> optax.GradientTransformation:
    lr = schedule if schedule is not None else cfg.lr
    b1, b2 = cfg.betas
    eps = getattr(cfg, "adam_eps", 1e-8)
    opts = {
        "adamw": lambda: optax.adamw(lr, b1=b1, b2=b2, eps=eps,
                                     weight_decay=cfg.weight_decay,
                                     mask=decay_mask),
        "adam": lambda: optax.adam(lr, b1=b1, b2=b2, eps=eps),
        "rms": lambda: optax.rmsprop(lr),
        "sgd": lambda: optax.sgd(lr),
        "radam": lambda: optax.radam(lr, b1=b1, b2=b2),
        # RangerLars = Lookahead(Ralamb) where Ralamb = RAdam + layerwise
        # trust ratio (optim/rangerlars.py:12-14, alpha=0.5 k=6); the slow
        # weights live in the optimizer state (see lookahead above)
        "rangerlars": lambda: lookahead(optax.chain(
            optax.scale_by_radam(b1=b1, b2=b2),
            optax.scale_by_trust_ratio(),
            optax.scale_by_learning_rate(lr))),
    }
    if name not in opts:
        raise ValueError(f"unknown optimizer {name!r}")
    tx = opts[name]()
    return optax.chain(optax.clip_by_global_norm(cfg.grad_norm_clip), tx)
