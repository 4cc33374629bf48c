"""Device-trace profiling of the RAW fast pipeline: per-HLO-op and
per-source-line device time from a real jax.profiler trace.

Methodology (see BENCH_NOTES.md "Current numbers" round-3 deltas):
capture a 3-rep trace of the jitted pipeline, dump the optimized HLO to
map op names -> python source lines, parse the xplane proto from
tensorflow's bundled decoder, and aggregate the "XLA Ops" line.
Async-copy lines overlap compute, so only the XLA Ops line is summed.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_pipeline.py
"""

from __future__ import annotations

import collections
import glob
import re
import shutil


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    import sys

    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models import (
        handheld_superres,
        handheld_superres_raw,
    )

    rgb = "rgb" in sys.argv[1:]
    burst = load_burst("city")
    cfg = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )
    if rgb:
        raw = jnp.asarray(np.stack(burst))
        fn = jax.jit(lambda b: handheld_superres(b, cfg))
    else:
        raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))
        fn = jax.jit(lambda b: handheld_superres_raw(b, cfg))
    compiled = fn.lower(raw).compile()
    hlo = compiled.as_text()

    out = fn(raw)
    float(jnp.sum(out))  # warm + fence

    shutil.rmtree("/tmp/jax_trace", ignore_errors=True)
    with jax.profiler.trace("/tmp/jax_trace"):
        for i in range(3):
            float(jnp.sum(fn(raw * (1.0 + 1e-5 * i))))

    # op name -> source file:line from the optimized HLO metadata
    src = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", line)
        if not m:
            continue
        fm = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
        src[m.group(1)] = (
            (fm.group(1).split("/")[-1] + ":" + fm.group(2)) if fm else "(nometa)"
        )

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    p = sorted(glob.glob("/tmp/jax_trace/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(p, "rb").read())
    plane = [pl for pl in xs.planes if "TPU" in pl.name][0]
    md = plane.event_metadata
    tot = collections.Counter()
    cnt = collections.Counter()
    opkind = collections.Counter()
    byop = collections.Counter()
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = md[ev.metadata_id].name
            m = re.match(r"%?([\w.\-]+) = ", name)
            key = m.group(1) if m else name
            s = src.get(key, "UNMATCHED")
            us = ev.duration_ps / 1e6
            k2 = re.search(r"} (\w[\w\-]*)\(", name)
            kind = k2.group(1) if k2 else key.rsplit(".", 1)[0]
            tot[s] += us
            cnt[s] += 1
            opkind[kind] += us
            byop[key] += us
    print("== device time by source line (us/burst, 3-rep avg) ==")
    for s, us in tot.most_common(30):
        print(f"{us / 3:9.1f} us  x{cnt[s] // 3:<4d} {s}")
    print("total XLA-Ops us/burst:", round(sum(tot.values()) / 3, 1))
    print("== by op kind (us/burst) ==")
    for k, us in opkind.most_common(12):
        print(f"{us / 3:9.1f} us  {k}")
    print("== top individual ops (us/burst) ==")
    for k, us in byop.most_common(15):
        print(f"{us / 3:9.1f} us  {k}  [{src.get(k, '?')}]")


if __name__ == "__main__":
    main()
