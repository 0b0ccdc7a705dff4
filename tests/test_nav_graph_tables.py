"""Lazy all-pairs shortest-path tables vs the pure-python Dijkstra sweep.

The matrix-backed DistanceTable/PathTable must read exactly like the eager
dict-of-dicts (the reference's networkx contract, map_nav_src/r2r/env.py:
465-481): same key sets, same distances, and equal-cost (possibly
differently tie-broken) paths with valid edges.
"""

import numpy as np
import pytest

from gridmm_tpu.env.nav_graph import NavGraph

scipy = pytest.importorskip("scipy")


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(3)
    g = NavGraph()
    n = 60
    pos = rng.uniform(0, 20, (n, 3))
    for i in range(n):
        g.add_node(f"vp{i:02d}", pos[i])
    from scipy.spatial import cKDTree

    tree = cKDTree(pos)
    for i in range(n):
        for j in tree.query(pos[i], k=5)[1][1:]:
            g.add_edge(f"vp{i:02d}", f"vp{j:02d}")
    return g


def _path_cost(g, path):
    return sum(g.adj[a][b] for a, b in zip(path, path[1:]))


def test_tables_match_python_sweep(graph):
    g = graph
    d_py = {vp: g.dijkstra(vp)[0] for vp in g.adj}
    p_py = g._all_pairs_paths_py()
    d = g.all_pairs_distances()
    p = g.all_pairs_paths()

    assert set(d) == set(d_py) and set(p) == set(p_py)
    for s in d_py:
        assert set(d[s]) == set(d_py[s])
        for t in d_py[s]:
            assert d[s][t] == pytest.approx(d_py[s][t], abs=1e-9)
            path = p[s][t]
            assert path[0] == s and path[-1] == t
            assert _path_cost(g, path) == pytest.approx(
                _path_cost(g, p_py[s][t]), abs=1e-9)


def test_table_mapping_protocol(graph):
    d = graph.all_pairs_distances()
    p = graph.all_pairs_paths()
    row = d["vp00"]
    assert row.get("vp01") is not None
    assert row.get("nope") is None and "nope" not in row
    assert len(row) == len(list(row))
    assert dict(row)["vp00"] == 0.0
    assert p["vp00"].get("nope") is None
    assert list(p["vp00"]["vp00"]) == ["vp00"]
    with pytest.raises(KeyError):
        row["nope"]


def test_disconnected_components():
    g = NavGraph()
    for k in ("a", "b", "c"):
        g.add_node(k, (0.0, 0.0, 0.0))
    g.add_edge("a", "b", 1.0)
    d, p = g.all_pairs_distances(), g.all_pairs_paths()
    assert "c" not in d["a"] and d["a"].get("c") is None
    assert p["a"].get("c") is None
    assert p["a"]["b"] == ["a", "b"]
    assert d["c"]["c"] == 0.0 and p["c"]["c"] == ["c"]
