"""Pallas fused attention vs the XLA reference (interpret mode on CPU)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.ops.pallas.attention import fused_attention  # noqa: E402

RNG = np.random.default_rng(5)


def xla_attention(q, k, v):
    hd = q.shape[-1]
    s = jnp.einsum("bld,bmd->blm", q, k) / jnp.sqrt(jnp.float32(hd))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("blm,bmd->bld", p, v)


def test_fused_attention_matches_xla():
    for bh, l, hd in [(24, 50, 64), (8, 197, 64), (7, 33, 32)]:
        q = jnp.asarray(RNG.standard_normal((bh, l, hd)).astype(np.float32))
        k = jnp.asarray(RNG.standard_normal((bh, l, hd)).astype(np.float32))
        v = jnp.asarray(RNG.standard_normal((bh, l, hd)).astype(np.float32))
        want = xla_attention(q, k, v)
        got = fused_attention(q, k, v, heads_per_block=4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, err_msg=f"{(bh, l, hd)}")
