"""Navigation-graph loading and all-pairs shortest paths.

Honors the MP3D connectivity JSON contract (map_nav_src/utils/data.py:78-103:
per-scan `{scan}_connectivity.json` with `included`, `unobstructed`, `pose`
fields; node position at pose[3], pose[7], pose[11]). Shortest paths use a
dependency-free Dijkstra (the reference uses networkx,
map_nav_src/r2r/env.py:465-481)."""

from __future__ import annotations

import heapq
import json
import math
import os
from typing import Dict, List, Tuple

import numpy as np


class NavGraph:
    """Undirected weighted graph of a scan's viewpoints."""

    def __init__(self):
        self.positions: Dict[str, np.ndarray] = {}
        self.adj: Dict[str, Dict[str, float]] = {}

    def add_node(self, vp: str, position) -> None:
        self.positions[vp] = np.asarray(position, np.float64)
        self.adj.setdefault(vp, {})

    def add_edge(self, a: str, b: str, w: float | None = None) -> None:
        if w is None:
            w = float(np.linalg.norm(self.positions[a] - self.positions[b]))
        self.adj.setdefault(a, {})[b] = w
        self.adj.setdefault(b, {})[a] = w

    def neighbors(self, vp: str) -> Dict[str, float]:
        return self.adj.get(vp, {})

    def dijkstra(self, src: str) -> Tuple[Dict[str, float], Dict[str, str]]:
        dist = {src: 0.0}
        prev: Dict[str, str] = {}
        heap = [(0.0, src)]
        while heap:
            d, u = heapq.heappop(heap)
            if d > dist.get(u, math.inf):
                continue
            for v, w in self.adj.get(u, {}).items():
                nd = d + w
                if nd < dist.get(v, math.inf):
                    dist[v] = nd
                    prev[v] = u
                    heapq.heappush(heap, (nd, v))
        return dist, prev

    def all_pairs_distances(self) -> Dict[str, Dict[str, float]]:
        return {vp: self.dijkstra(vp)[0] for vp in self.adj}

    def all_pairs_paths(self) -> Dict[str, Dict[str, List[str]]]:
        out: Dict[str, Dict[str, List[str]]] = {}
        for src in self.adj:
            dist, prev = self.dijkstra(src)
            paths: Dict[str, List[str]] = {}
            for dst in dist:
                path = [dst]
                while path[-1] != src:
                    path.append(prev[path[-1]])
                paths[dst] = path[::-1]
            out[src] = paths
        return out


def load_nav_graph(connectivity_dir: str, scan: str) -> NavGraph:
    """Parse `{scan}_connectivity.json` (utils/data.py:78-103 contract)."""
    g = NavGraph()
    path = os.path.join(connectivity_dir, f"{scan}_connectivity.json")
    with open(path) as f:
        data = json.load(f)
    for item in data:
        if item["included"]:
            g.add_node(item["image_id"],
                       (item["pose"][3], item["pose"][7], item["pose"][11]))
    for i, item in enumerate(data):
        if not item["included"]:
            continue
        for j, conn in enumerate(item["unobstructed"]):
            if conn and data[j]["included"]:
                g.add_edge(item["image_id"], data[j]["image_id"])
    return g


def load_nav_graphs(connectivity_dir: str, scans) -> Dict[str, NavGraph]:
    return {scan: load_nav_graph(connectivity_dir, scan) for scan in scans}
