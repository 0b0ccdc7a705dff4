"""Continuous-batching serving engine for the interactive navigator.

Production serving of an interactive policy differs from a training rollout:
requests (episodes) arrive and finish at different times. The reference has
no serving runtime at all — its rollout keeps finished episodes in the batch
as dead rows until everyone stops (map_nav_src/r2r/agent.py:443-449 `ended`
bookkeeping), paying full device compute for them, and a new batch can only
start when the whole previous batch is done.

Here B slots ride ONE compiled step graph (static shapes, jitted once):

  * ``submit()`` queues a request (instruction token ids);
  * ``admit()`` packs queued requests into free slots: one language dispatch
    for the admission batch, a masked row-write into the resident (B, T, D)
    text buffer, and a zero-reset of the admitted slots' episode carry — all
    in a single donated jit;
  * ``step()`` takes per-slot StepInputs rows from the caller's env
    adapters, runs the fused navigation step once for all slots, and
    returns per-slot logits;
  * ``finish()`` frees a slot for the next admission.

Free slots run zero rows (fully masked; row-independent compute, so garbage
in a free row never contaminates an active one — the admission reset clears
the slot's carry before reuse). The engine can also run from an AOT serving
bundle (`from_bundle`), i.e. without the model code — see utils/export.py.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gridmm_tpu.train.step import NavCarry, StepInputs, init_carry


def serving_cfg(cfg):
    """Serving invariant: rows are INDEPENDENT — a free/garbage row never
    contaminates an active one, and a request's logits never depend on its
    batchmates. The reference's compaction-alias stray keys are batch-coupled
    (the stray count depends on the batch MAX occupied-cell count,
    ops/masking.compaction_stray_count), so training/eval keep them for
    checkpoint parity while serving runs the clean masked semantics."""
    import dataclasses

    if getattr(cfg.model, "compaction_stray_keys", False):
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, compaction_stray_keys=False))
    return cfg


def _row_select(new, old, write_mask):
    """Per-batch-row select: rows of `new` where write_mask else `old`."""

    def sel(n, o):
        m = write_mask.reshape((-1,) + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)

    return jax.tree_util.tree_map(sel, new, old)


class NavServingEngine:
    """Fixed-slot continuous batching over the navigator's step graph."""

    def __init__(self, cfg, params, batch: int,
                 lang_fn: Callable, step_fn: Callable,
                 donate_step: bool = True):
        """lang_fn(params, txt_ids, txt_mask) -> txt_embeds (B, T, D);
        step_fn(params, txt_embeds, txt_mask, carry, x) -> (carry, outputs).
        Use `create` / `from_bundle` instead of calling this directly."""
        cfg = serving_cfg(cfg)
        self.cfg = cfg
        self.params = params
        self.batch = batch
        t = cfg.shapes.max_txt_len

        def admit_fn(params, ids, mask, txt_buf, mask_buf, carry, write):
            new_txt = lang_fn(params, ids, mask)
            txt_buf = _row_select(new_txt, txt_buf, write)
            mask_buf = _row_select(mask, mask_buf, write)
            carry = _row_select(init_carry(cfg, batch), carry, write)
            return txt_buf, mask_buf, carry

        self._jit_admit = jax.jit(admit_fn, donate_argnums=(3, 4, 5))
        self._jit_step = jax.jit(
            step_fn, donate_argnums=(3,) if donate_step else ())

        d = cfg.model.hidden_size
        self._txt_buf = jnp.zeros((batch, t, d), jnp.float32)
        self._mask_buf = jnp.zeros((batch, t), bool)
        self._carry: NavCarry = init_carry(cfg, batch)
        from gridmm_tpu.utils.export import zero_step_inputs

        self._zero_row = jax.tree_util.tree_map(
            lambda a: np.asarray(a[:1]), zero_step_inputs(cfg, batch))
        self._queue: deque = deque()
        self._slot_req: List[Optional[object]] = [None] * batch
        self._req_slot: Dict[object, int] = {}

    # ------------------------------------------------------------ factories
    @classmethod
    def create(cls, model, cfg, params, batch: int) -> "NavServingEngine":
        from gridmm_tpu.train.step import nav_device_step

        cfg = serving_cfg(cfg)
        # the stray decision lives inside the flax module's own cfg — rebuild
        # the module on the serving config (same param tree, pure dataclass)
        model = type(model)(cfg.model)
        return cls(
            cfg, params, batch,
            lang_fn=lambda p, ids, mask: model.apply(
                p, "language", {"txt_ids": ids, "txt_mask": mask}),
            step_fn=lambda p, txt, mask, c, x: nav_device_step(
                model, cfg, p, txt, mask, c, x))

    @classmethod
    def from_bundle(cls, bundle_dir: str, cfg, params,
                    batch: int) -> "NavServingEngine":
        """Serve from AOT artifacts — no model code needed at runtime.

        `batch` must equal the bundle's exported batch; exported graphs have
        no donation, so the carry round-trips by value."""
        import os

        from gridmm_tpu.utils.export import load_exported

        lang = load_exported(os.path.join(bundle_dir, "language.jaxexport"))
        step = load_exported(os.path.join(bundle_dir, "nav_step.jaxexport"))
        return cls(cfg, params, batch, lang_fn=lang.call, step_fn=step.call,
                   donate_step=False)

    # ------------------------------------------------------------- requests
    def submit(self, req_id, txt_ids: np.ndarray,
               txt_mask: np.ndarray) -> None:
        """Queue an episode. txt_ids/txt_mask: (max_txt_len,) host arrays."""
        self._queue.append((req_id, np.asarray(txt_ids, np.int32),
                            np.asarray(txt_mask, bool)))

    def free_slots(self) -> List[int]:
        return [s for s, r in enumerate(self._slot_req) if r is None]

    def active(self) -> Dict[object, int]:
        return dict(self._req_slot)

    def admit(self) -> Dict[object, int]:
        """Admit queued requests into free slots. One device dispatch for
        any number of admissions; returns {req_id: slot} for the new ones."""
        free = self.free_slots()
        if not free or not self._queue:
            return {}
        t = self.cfg.shapes.max_txt_len
        ids = np.zeros((self.batch, t), np.int32)
        mask = np.zeros((self.batch, t), bool)
        write = np.zeros((self.batch,), bool)
        admitted: Dict[object, int] = {}
        for slot in free:
            if not self._queue:
                break
            req_id, rid, rmask = self._queue.popleft()
            ids[slot], mask[slot], write[slot] = rid, rmask, True
            self._slot_req[slot] = req_id
            self._req_slot[req_id] = slot
            admitted[req_id] = slot
        self._txt_buf, self._mask_buf, self._carry = self._jit_admit(
            self.params, ids, mask, self._txt_buf, self._mask_buf,
            self._carry, jnp.asarray(write))
        return admitted

    def finish(self, req_id) -> None:
        slot = self._req_slot.pop(req_id)
        self._slot_req[slot] = None

    # ----------------------------------------------------------------- step
    def step(self, rows: Dict[int, StepInputs]):
        """One fused navigation step for every slot.

        rows: {slot: single-row (b=1) StepInputs} for (a subset of) active
        slots; free/absent slots run the zero row. Returns the step outputs
        with leading dim B — index them by slot."""
        cols = []
        for f in StepInputs._fields:
            parts = [np.asarray(getattr(rows[s], f))
                     if s in rows else np.asarray(getattr(self._zero_row, f))
                     for s in range(self.batch)]
            cols.append(np.concatenate(parts, axis=0))
        x = StepInputs(*cols)
        self._carry, out = self._jit_step(
            self.params, self._txt_buf, self._mask_buf, self._carry, x)
        return out
