"""Offline preprocessing: panorama CLIP features, depth patches, viewpoint info.

Covers the reference's preprocess stage (get_map_feature.py:61-194 CLIP view
features, get_depth.py:42-159 depth maps, get_viewpoint_info.py:56-79 world
positions). The reference shards work across multiprocess workers each owning a
GPU + simulator, funneling results through an mp.Queue into an HDF5 writer; on
TPU one process drives the chip with a double-buffered host->device pipeline:
a background thread renders/loads panoramas while the previous batch encodes.

The renderer is pluggable: MatterSim when installed (same 36-view sweep,
keeping the 12 horizon views ix 12..24 — get_map_feature.py:106-127), or any
callable yielding (scan, viewpoint, images(12,H,W,3), depth(12,128,128)).
"""

from __future__ import annotations

import json
import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gridmm_tpu.models.clip_vit import (ClipVisionTransformer,
                                        ClipVisionConfig, clip_b32,
                                        normalize_images)

PanoRecord = Tuple[str, str, np.ndarray, np.ndarray]  # scan, vp, rgb, depth


def load_viewpoint_ids(connectivity_dir: str):
    """scans.txt + per-scan connectivity -> [(scan, viewpoint)]
    (preprocess/utils.py:5-14 contract)."""
    import os

    out = []
    with open(os.path.join(connectivity_dir, "scans.txt")) as f:
        scans = [x.strip() for x in f if x.strip()]
    for scan in scans:
        with open(os.path.join(connectivity_dir,
                               f"{scan}_connectivity.json")) as f:
            for item in json.load(f):
                if item["included"]:
                    out.append((scan, item["image_id"]))
    return out


def synthetic_renderer(viewpoints: Iterable[Tuple[str, str]],
                       resolution: int = 224,
                       seed: int = 0) -> Iterator[PanoRecord]:
    """Deterministic stand-in for MatterSim rendering (tests/benchmarks)."""
    import hashlib

    for scan, vp in viewpoints:
        h = int.from_bytes(
            hashlib.sha256(f"{scan}_{vp}".encode()).digest()[:8], "little")
        rng = np.random.default_rng(h ^ seed)
        rgb = rng.integers(0, 256, (12, resolution, resolution, 3),
                           dtype=np.uint8)
        depth = rng.integers(500, 20000, (12, 128, 128)).astype(np.uint16)
        yield scan, vp, rgb, depth


def mattersim_renderer(viewpoints, connectivity_dir: str,
                       scan_data_dir: Optional[str] = None,
                       resolution: int = 224) -> Iterator[PanoRecord]:
    """Real MatterSim sweep (get_map_feature.py:94-127, get_depth.py:42-88):
    36 discretized views, horizon slice ix 12..24 kept."""
    import math

    import MatterSim  # external C++ simulator

    sim = MatterSim.Simulator()
    if scan_data_dir:
        sim.setDatasetPath(scan_data_dir)
    sim.setNavGraphPath(connectivity_dir)
    sim.setRenderingEnabled(True)
    sim.setDepthEnabled(True)
    sim.setDiscretizedViewingAngles(True)
    sim.setCameraResolution(resolution, resolution)
    sim.setCameraVFOV(math.radians(60))
    sim.setBatchSize(1)
    sim.initialize()

    for scan, vp in viewpoints:
        rgbs, depths = [], []
        for ix in range(36):
            if ix == 0:
                sim.newEpisode([scan], [vp], [0], [math.radians(-30)])
            elif ix % 12 == 0:
                sim.makeAction([0], [1.0], [1.0])
            else:
                sim.makeAction([0], [1.0], [0])
            state = sim.getState()[0]
            if 12 <= ix < 24:
                rgbs.append(np.array(state.rgb, copy=True)[..., ::-1])  # BGR->RGB
                depths.append(np.array(state.depth, copy=True)[..., 0])
        yield scan, vp, np.stack(rgbs), np.stack(depths).astype(np.uint16)


class ClipFeatureExtractor:
    """Batched, double-buffered panorama encoder."""

    def __init__(self, cfg: Optional[ClipVisionConfig] = None, params=None,
                 batch_panos: int = 8):
        self.cfg = cfg or clip_b32()
        self.model = ClipVisionTransformer(self.cfg)
        self.batch_panos = batch_panos
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, self.cfg.input_resolution,
                           self.cfg.input_resolution, 3)))
        self.params = params
        self._encode = jax.jit(self._encode_impl)

    def _encode_impl(self, params, images_u8):
        x = normalize_images(images_u8)
        return self.model.apply(params, x)  # (B*12, tokens, width)

    def run(self, records: Iterator[PanoRecord],
            sink: Callable[[str, str, np.ndarray, np.ndarray], None],
            prefetch: int = 2) -> int:
        """Encode panoramas, overlapping host rendering with device compute.

        sink(scan, vp, clip_tokens(12, T, W), depth(12, H, H)) is called for
        every viewpoint. Returns number of panoramas processed."""
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        DONE = object()

        def producer():
            batch = []
            for rec in records:
                batch.append(rec)
                if len(batch) == self.batch_panos:
                    q.put(batch)
                    batch = []
            if batch:
                q.put(batch)
            q.put(DONE)

        threading.Thread(target=producer, daemon=True).start()

        count = 0
        pending = None  # (batch_meta, device_future, depths)
        while True:
            item = q.get()
            if item is DONE:
                break
            metas = [(s, v) for s, v, _, _ in item]
            rgb = np.concatenate([r for _, _, r, _ in item])  # (B*12,H,W,3)
            depths = [d for _, _, _, d in item]
            fut = self._encode(self.params, jnp.asarray(rgb))
            if pending is not None:
                self._drain(pending, sink)
                count += len(pending[0])
            pending = (metas, fut, depths)
        if pending is not None:
            self._drain(pending, sink)
            count += len(pending[0])
        return count

    @staticmethod
    def _drain(pending, sink):
        metas, fut, depths = pending
        tokens = np.asarray(fut)
        t, w = tokens.shape[-2:]
        tokens = tokens.reshape(len(metas), 12, t, w)
        for (scan, vp), tok, dep in zip(metas, tokens, depths):
            sink(scan, vp, tok, dep)


class Hdf5Sink:
    """Writes the reference's artifact contracts: clip grid features
    ({scan}_{vp}: (12, tokens, width) f16) and depth ((12, H, H) u16).

    Note the reference stores 36-view depth; consumers only read rows 12..24
    (env.py:281-289), which is exactly what we store."""

    def __init__(self, clip_path: str, depth_path: str):
        import h5py

        self.fc = h5py.File(clip_path, "w")
        self.fd = h5py.File(depth_path, "w")

    def __call__(self, scan, vp, tokens, depth):
        key = f"{scan}_{vp}"
        self.fc.create_dataset(key, data=tokens.astype(np.float16))
        self.fd.create_dataset(key, data=depth.astype(np.uint16))

    def close(self):
        self.fc.close()
        self.fd.close()


def extract_viewpoint_info(graphs) -> Dict[str, Dict[str, float]]:
    """viewpoint_info.json content (get_viewpoint_info.py:56-72)."""
    out = {}
    for scan, g in graphs.items():
        for vp, pos in g.positions.items():
            out[f"{scan}_{vp}"] = {"x": float(pos[0]), "y": float(pos[1]),
                                   "z": float(pos[2])}
    return out
