"""Capture and summarize a device profile of the serving pipeline.

The tunnel-attached dev chip DOES produce device traces via jax.profiler
(CLAUDE.md); what it lacks is a UI. This script runs the bench pipeline under
jax.profiler.trace and prints a per-category device-time breakdown parsed
straight from the xplane proto — the tool behind the perf verdicts recorded
in PARITY.md.

  python scripts/profile_summary.py            # capture + summarize
  python scripts/profile_summary.py --trace t/ # summarize an existing trace
"""

from __future__ import annotations

import argparse
import glob
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def capture(trace_dir: str, iters: int = 10) -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gridmm_tpu.models.clip_vit import (ClipVisionTransformer, clip_b32,
                                            normalize_images)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (192, 224, 224, 3),
                                      dtype=np.int64).astype(np.uint8))
    on_tpu = jax.default_backend() in ("tpu", "axon")
    ccfg = (dataclasses.replace(clip_b32(), int8_matmuls=True,
                                attn_scores_f32=False) if on_tpu
            else dataclasses.replace(clip_b32(), layers=2,
                                     compute_dtype="float32"))
    model = ClipVisionTransformer(ccfg)
    params = model.init(jax.random.PRNGKey(0), normalize_images(images[:1]))

    @jax.jit
    def f(params, images, s):
        toks = model.apply(params, normalize_images(images) + s * 0)
        return jnp.float32(toks.mean())

    s = f(params, images, jnp.float32(0))
    float(s)  # scalar fetch = real sync through the tunnel
    s = f(params, images, s)
    float(s)
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            s = f(params, images, s)
        float(s)
    Path(trace_dir, "capture_iters.txt").write_text(str(iters))


def summarize(trace_dir: str, iters: int = 10, top: int = 15) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "GPU" not in plane.name:
            continue
        evmeta = {m: plane.event_metadata[m].name
                  for m in plane.event_metadata}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            cat = defaultdict(float)
            cnt = defaultdict(int)
            ops = defaultdict(float)
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, "?")
                ms = ev.duration_ps / 1e9
                base = re.sub(r"[.\d]+$", "", name.split(" = ")[0].lstrip("%"))
                rhs = name.split(" = ")[-1]
                if "s8[" in rhs and "fusion" in base:
                    key = "int8-matmul-fusion"
                elif "convolution" in rhs or "dot(" in rhs:
                    key = "matmul"
                elif "copy" in base:
                    key = "copy (layout)"
                elif any(k in base for k in ("transpose", "reshape",
                                             "bitcast")):
                    key = "reshape/transpose"
                elif "reduce" in rhs or "reduce" in base:
                    key = "reduce (LN/softmax stats)"
                else:
                    key = base if "fusion" in base else "other"
                cat[key] += ms
                cnt[key] += 1
                ops[name.split(" = ")[0]] += ms
            total = sum(cat.values())
            print(f"== {plane.name}: {total / iters:.2f} ms/iter device time")
            for k, ms in sorted(cat.items(), key=lambda kv: -kv[1]):
                print(f"  {ms / iters:7.3f} ms/iter x{cnt[k] // iters:5d}  {k}")
            print(f"-- top {top} individual ops:")
            for k, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {ms / iters:7.3f} ms/iter  {k}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trace", default="/tmp/gridmm_profile",
                   help="trace dir (reused if it already has a trace and "
                        "--capture is not forced)")
    p.add_argument("--capture", action="store_true",
                   help="always re-capture even if a trace exists")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    have = glob.glob(f"{args.trace}/**/*.xplane.pb", recursive=True)
    iters = args.iters
    if args.capture or not have:
        capture(args.trace, iters)
    else:
        # reused trace: divide by the iter count it was captured with
        meta = Path(args.trace, "capture_iters.txt")
        if meta.exists():
            iters = int(meta.read_text())
    summarize(args.trace, iters)
