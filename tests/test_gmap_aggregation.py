"""Golden test: the pretrain gmap scatter-mean aggregation vs a numpy
transcription of the reference's per-item dict loops
(pretrain_src/model/vilmodel.py:578-612 _aggregate_gmap_features)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.models.pretrain import GridMMPretrain  # noqa: E402

RNG = np.random.default_rng(11)


def ref_aggregate(pano, token_mask, traj_vpids, traj_cand_vpids, gmap_vpids):
    """Reference semantics, one item: visited node <- masked token mean of its
    LAST visit step; unvisited <- mean over its candidate-token occurrences
    (candidate occurrences at steps of nodes that were ever visited do NOT
    count once the node itself is visited — dict precedence)."""
    s, v, d = pano.shape
    visited, unvisited = {}, {}
    for t in range(s):
        m = token_mask[t]
        visited[traj_vpids[t]] = (pano[t] * m[:, None]).sum(0) / max(m.sum(), 1)
        for j, cvp in enumerate(traj_cand_vpids[t]):
            if cvp is not None and cvp not in visited:
                unvisited.setdefault(cvp, []).append(pano[t, j])
    out = np.zeros((len(gmap_vpids), d), np.float32)
    for g, vp in enumerate(gmap_vpids):
        if vp is None:
            continue
        if vp in visited:
            out[g] = visited[vp]
        elif vp in unvisited:
            out[g] = np.mean(np.stack(unvisited[vp]), 0)
    return out


def test_scatter_mean_matches_reference_loops():
    s, v, d, g = 4, 6, 8, 8
    pano = RNG.standard_normal((s, v, d)).astype(np.float32)
    token_mask = RNG.random((s, v)) < 0.9
    token_mask[:, 0] = True

    # trajectory: visit n1 n2 n3 n1 (revisit!), candidates point at the next
    # nodes and two frontier nodes f1, f2
    traj_vpids = ["n1", "n2", "n3", "n1"]
    traj_cand_vpids = [
        ["n2", "f1", None, None, None, None],
        ["n3", "f1", "f2", None, None, None],
        ["n1", "f2", None, None, None, None],
        ["f1", "f2", None, None, None, None],
    ]
    gmap_vpids = [None, "n1", "n2", "n3", "f1", "f2", None, None]
    slot_of = {vp: i for i, vp in enumerate(gmap_vpids) if vp}

    want = ref_aggregate(pano, token_mask, traj_vpids, traj_cand_vpids,
                         gmap_vpids)

    # index maps the way data/pretrain_data.py builds them: visited tokens
    # route to the node's LAST visit step; candidate tokens of visited nodes
    # are dropped
    last_visit = {}
    for t, vp in enumerate(traj_vpids):
        last_visit[vp] = t
    visited_idx = np.full((s, v), -1, np.int32)
    cand_idx = np.full((s, v), -1, np.int32)
    for t, vp in enumerate(traj_vpids):
        if last_visit[vp] == t:
            visited_idx[t, :] = slot_of[vp]
        for j, cvp in enumerate(traj_cand_vpids[t]):
            if cvp is not None and cvp not in last_visit:
                cand_idx[t, j] = slot_of[cvp]

    got = GridMMPretrain._aggregate_gmap(
        jnp.asarray(pano)[None], jnp.asarray(token_mask)[None],
        jnp.asarray(visited_idx)[None], jnp.asarray(cand_idx)[None], g)
    got = np.asarray(got[0])

    # slot 0 is [stop] (zeros) in both
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_unvisited_mean_respects_token_mask():
    """Candidate occurrences at masked token positions must not contribute."""
    s, v, d, g = 2, 4, 4, 4
    pano = np.ones((s, v, d), np.float32)
    pano[1, 1] = 100.0  # would poison the mean if the mask is ignored
    token_mask = np.ones((s, v), bool)
    token_mask[1, 1] = False
    visited_idx = np.full((s, v), -1, np.int32)
    visited_idx[0, :] = 1
    visited_idx[1, :] = 2
    cand_idx = np.full((s, v), -1, np.int32)
    cand_idx[0, 2] = 3
    cand_idx[1, 1] = 3  # masked -> dropped
    got = np.asarray(GridMMPretrain._aggregate_gmap(
        jnp.asarray(pano)[None], jnp.asarray(token_mask)[None],
        jnp.asarray(visited_idx)[None], jnp.asarray(cand_idx)[None], g))[0]
    np.testing.assert_allclose(got[3], np.ones(d), atol=1e-6)