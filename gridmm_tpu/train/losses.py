"""Loss functions (teacher-forced imitation + pretraining proxy tasks).

Reference: cross-entropy with ignore_index=-100 over fused logits per step
(map_nav_src/r2r/agent.py:357-371, agent_base.py criterion), SAP multi-head CE
with stop-reweighting (pretrain_src/model/pretrain_cmt.py:273-289), MLM CE,
MRC KL-divergence on soft labels (pretrain_cmt.py:161-212).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_log_softmax(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """log_softmax tolerant of -inf entries (fully-masked slots -> -inf)."""
    mx = jnp.max(logits, axis=axis, keepdims=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    shifted = logits - mx
    sumexp = jnp.sum(jnp.where(jnp.isfinite(shifted), jnp.exp(shifted), 0.0),
                     axis=axis, keepdims=True)
    return shifted - jnp.log(jnp.maximum(sumexp, 1e-30))


def cross_entropy_ignore(
    logits: jnp.ndarray,   # (B, L) action logits (-inf at masked slots)
    targets: jnp.ndarray,  # (B,) int labels; ignore_id entries contribute 0
    ignore_id: int = -100,
    reduction: str = "sum",
) -> jnp.ndarray:
    """torch F.cross_entropy(ignore_index=) equivalent."""
    valid = targets != ignore_id
    safe_t = jnp.where(valid, targets, 0).astype(jnp.int32)
    logp = masked_log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(logp, safe_t[:, None], axis=1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)
    return nll


def mlm_loss(logits: jnp.ndarray, labels: jnp.ndarray, ignore_id: int = -1):
    """Masked-LM CE over (B, T, vocab) with labels==ignore_id skipped
    (pretrain_cmt.py forward_mlm)."""
    b, t, v = logits.shape
    return cross_entropy_ignore(
        logits.reshape(b * t, v), labels.reshape(b * t), ignore_id, "mean")


def mrc_kl_loss(pred_logits: jnp.ndarray, soft_targets: jnp.ndarray,
                mask: jnp.ndarray):
    """KL(target || log_softmax(pred)) over masked view tokens
    (pretrain_cmt.py:195-205 uses F.kl_div(log_softmax, soft_label))."""
    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    kl = jnp.sum(soft_targets * (jnp.log(jnp.maximum(soft_targets, 1e-12)) - logp),
                 axis=-1)
    kl = jnp.where(mask, kl, 0.0)
    return jnp.sum(kl) / jnp.maximum(jnp.sum(mask), 1)


def sap_loss(
    global_logits, local_logits, fused_logits, grid_logits,
    global_act, local_act,
):
    """Four-head single-action-prediction CE with stop-rate reweighting
    (pretrain_cmt.py:273-289): per-example CE; examples whose teacher action is
    [stop] (label 0) are divided by stop_rate = #stop / #non-stop; global/fused/
    grid heads use global labels, local uses local labels. Returns per-example
    summed losses (caller means over the batch, train_r2r.py:265)."""

    def ce(logits, labels):
        return cross_entropy_ignore(logits, labels, ignore_id=-100,
                                    reduction="none")

    g = ce(global_logits, global_act)
    l = ce(local_logits, local_act)
    f = ce(fused_logits, global_act)
    gr = ce(grid_logits, global_act)

    is_stop_g = global_act == 0
    is_stop_l = local_act == 0
    n_stop = jnp.sum(is_stop_g)
    n_go = jnp.sum(~is_stop_g)
    stop_rate = jnp.where(n_go > 0, n_stop / jnp.maximum(n_go, 1), 1.0)
    stop_rate = jnp.maximum(stop_rate, 1e-8)

    g = jnp.where(is_stop_g, g / stop_rate, g)
    f = jnp.where(is_stop_g, f / stop_rate, f)
    gr = jnp.where(is_stop_g, gr / stop_rate, gr)
    l = jnp.where(is_stop_l, l / stop_rate, l)
    return g + l + f + gr
