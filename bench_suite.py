#!/usr/bin/env python
"""Full BASELINE-config benchmark suite (SURVEY.md §7 stage 10).

Runs the five driver configs (BASELINE.md) on the available hardware and
prints one JSON object per config: wall time, MP/s, and the CIELuv MSE of
the delivered mapping. ``bench.py`` stays the single-line headline bench;
this suite is the broad table.

Usage: python bench_suite.py [--quick] [--trace DIR]
  --quick      shrink images 4x
  --trace DIR  capture one jax.profiler trace per config under DIR/<name>
               (SURVEY.md section 5; open with tensorboard or xprof)
"""

import json
import sys
import time

import numpy as np

TRACE_DIR = None


def synth_image(w, h, seed=0):
    """uint8 sRGB test image (the wire-native 8-bit format, like bench.py);
    tiled texture + full-size gradient so large sizes synthesize fast."""
    from bench import synth_image_u8

    return synth_image_u8(w, h, seed=seed, tile=min(1000, w, h))


def mse_luv(colors, palette, pmap, cap=1 << 22):
    """Diagnostic CIELuv MSE on a seeded <= 4 MP subsample.

    The full (N, 3) interleaved transform would ship ~1.2 GB each way
    through the tunnel at 100 MP (and use the lane-padded array form the
    colorspace module documents as the slow path) for a number whose
    sampling error at 4 MP is < 0.1% — the subsample keeps the suite's
    wire cost flat across configs (r5 review)."""
    from patolette_tpu.ops import colorspace as cs

    if len(colors) > cap:
        idx = np.random.default_rng(0).integers(0, len(colors), size=cap)
        colors, pmap = colors[idx], pmap[idx]
    colors = colors.astype(np.float32) / 255.0
    a = np.asarray(cs.srgb_to_cieluv(colors))
    b = np.asarray(cs.srgb_to_cieluv(np.clip(palette, 0, 1)))[pmap]
    return float(((a - b) ** 2).sum(-1).mean())


def run_config(name, w, h, palette, reps=4, **kw):
    # best-of-4 default: tunnel wall times swing +-20-40% (r5 measured a
    # 1.8x outlier window on the wire-heavy dither config at reps=2)
    import patolette_tpu as pt

    colors = synth_image(w, h)

    def once():
        ok, pal, pmap, msg = pt.quantize(w, h, colors, palette, **kw)
        assert ok, msg
        return pal, pmap

    from patolette_tpu.models import pipeline

    t0 = time.perf_counter()
    pal, pmap = once()  # warm-up/compile
    warmup = time.perf_counter() - t0
    times, laps = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        pal, pmap = once()
        times.append(time.perf_counter() - t0)
        laps.append(dict(pipeline.LAST_STAGE_TIMES))
    best = min(times)
    stages = laps[times.index(best)]

    # One extra diagnostic pass with sync-staged laps: async laps bill
    # device work to the next host sync, so without this the committed
    # artifact misattributes stage time (VERDICT r3 weak #5). The sync pass
    # is NOT the headline wall (the per-stage pulls break async
    # pipelining); sync_lap_sum ~~ sync_wall by construction.
    prev = pipeline.set_sync_stages(True)
    try:
        # twice, keep the faster: the first sync pass may compile the
        # per-shape 1-element pull programs (observed: a 66 s "sample-in"
        # that was really a remote compile)
        sync_wall, stages_sync = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            once()
            wall = time.perf_counter() - t0
            if sync_wall is None or wall < sync_wall:
                sync_wall = wall
                stages_sync = dict(pipeline.LAST_STAGE_TIMES)
    finally:
        pipeline.set_sync_stages(prev)

    if TRACE_DIR:
        # one profiler trace per config (best-effort: the axon tunnel may
        # not surface device events; host/dispatch timelines still help)
        import jax

        try:
            with jax.profiler.trace(f"{TRACE_DIR}/{name}"):
                once()
        except Exception as e:  # pragma: no cover
            print(f"# trace capture failed for {name}: {e}", flush=True)

    rec = {
        "config": name,
        "pixels": w * h,
        "palette": palette,
        "wall_s": round(best, 3),
        "mp_per_s": round(w * h / 1e6 / best, 3),
        "mse_luv": round(mse_luv(colors, pal, pmap), 3)
        if pmap is not None
        else None,
        "warmup_s": round(warmup, 1),
        "stages_ms_async": stages,
        "stages_ms_sync": stages_sync,
        "sync_wall_s": round(sync_wall, 3),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    global TRACE_DIR
    quick = "--quick" in sys.argv
    if "--trace" in sys.argv:
        i = sys.argv.index("--trace")
        if i + 1 >= len(sys.argv) or sys.argv[i + 1].startswith("-"):
            sys.exit("--trace requires a directory operand")
        TRACE_DIR = sys.argv[i + 1]
    s = 4 if quick else 1

    # Config 1: 512x512 -> 256 colors, CIELuv, no dither, no KMeans
    run_config(
        "1_512_cieluv_plain", 512 // s, 512 // s, 256,
        dither=False, tile_size=0, kmeans_niter=0, color_space=1,
    )
    # Config 2: 4K -> 256 colors, ICtCp + saliency
    run_config(
        "2_4k_ictcp_saliency", 3840 // s, 2160 // s, 256,
        dither=False, tile_size=512, kmeans_niter=0, color_space=2,
    )
    # Config 3: 4K + 25-iter KMeans
    run_config(
        "3_4k_kmeans25", 3840 // s, 2160 // s, 256,
        dither=False, tile_size=0, kmeans_niter=25, color_space=2,
    )
    # Config 4: 4K + error-diffusion dither
    run_config(
        "4_4k_dither", 3840 // s, 2160 // s, 256,
        dither=True, tile_size=0, kmeans_niter=25, color_space=2,
    )
    # Config 5: 100 MP (single-chip here; the sharded path is exercised on
    # the virtual mesh in tests/test_quantize_mesh.py and dryrun_multichip)
    run_config(
        "5_100mp_kmeans", 10000 // s, 10000 // s, 256, reps=2,
        dither=False, tile_size=0, kmeans_niter=25, color_space=2,
    )


if __name__ == "__main__":
    main()
