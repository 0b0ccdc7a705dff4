"""AsyncSaver: background checkpoint writes must be donation-safe,
sequential, and readable by the synchronous restore path."""

import os
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.utils.checkpoint import AsyncSaver, restore_checkpoint  # noqa: E402


def test_async_save_donation_safe_and_restorable(tmp_path):
    state = {"w": jnp.arange(1 << 18, dtype=jnp.float32),
             "b": jnp.ones((64,), jnp.float32)}
    orig = jax.tree_util.tree_map(np.asarray, state)
    bump = jax.jit(lambda s: jax.tree_util.tree_map(lambda x: x + 1.0, s),
                   donate_argnums=(0,))

    with AsyncSaver() as saver:
        saver.save(str(tmp_path / "ck1"), state)
        # donate the just-saved buffers immediately: the saver must have
        # host-copied inside save(), or ck1 would capture the +1 values
        state = bump(state)
        saver.save(str(tmp_path / "ck2"), state)
        state = bump(state)
        saver.wait()

        tmpl = jax.tree_util.tree_map(np.zeros_like, orig)
        r1 = restore_checkpoint(str(tmp_path / "ck1"), tmpl)
        np.testing.assert_array_equal(np.asarray(r1["w"]), orig["w"])
        r2 = restore_checkpoint(str(tmp_path / "ck2"), tmpl)
        np.testing.assert_array_equal(np.asarray(r2["w"]), orig["w"] + 1.0)


def test_async_saver_close_idempotent(tmp_path):
    saver = AsyncSaver()
    saver.wait()   # never used: no-ops
    saver.close()
    saver.save(str(tmp_path / "ck"), {"x": jnp.zeros((4,))})
    saver.close()
    saver.close()
    assert os.path.isdir(tmp_path / "ck")
