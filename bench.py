#!/usr/bin/env python
"""Benchmark: the BASELINE north-star config on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config (BASELINE.md headline): 256-color quantization of a 100 MP image
WITH 25-iteration weighted-KMeans refinement, ICtCp working space. The
driver north star is < 1 s on one v5p host (~4 chips) => 25 MP/s/chip.

The image enters as uint8 sRGB (the native format of real 8-bit images)
and the palette map returns as int32. The wire cost is independent of the
image size (ops/lut.py): only the palette-stage subsamples go up, and the
map comes back as one 16.7 MB 24-bit LUT resolved on the host by the
threaded native pack+gather — the ~45 MB/s axon tunnel no longer caps
throughput at 4 bytes/pixel (round 1: 9.7 MP/s against that ~11 MP/s
ceiling).
"""

import json
import time

import numpy as np

BASELINE_MPS_PER_CHIP = 25.0

WIDTH, HEIGHT = 10000, 10000
PALETTE = 256
KMEANS_ITERS = 25
# best-of-5: wall times through the axon tunnel swing +-20-40% run to run
# (each warm rep costs ~0.4 s; a wider min is cheap and far less noisy)
REPEATS = 5


def synth_image_u8(w, h, seed=0, tile=1000):
    """100 MP of f64 transcendentals takes ~20 min on this 2-vCPU host, so
    the texture is synthesized on a small tile and tiled up, with a cheap
    full-size vertical gradient + noise so the image is not k-colorable."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:tile, 0:tile].astype(np.float32)
    pat = np.stack(
        [
            0.5 + 0.45 * np.sin(xx / 97.0) * np.cos(yy / 131.0),
            0.5 + 0.45 * np.cos(xx / 177.0 + yy / 211.0),
            0.5 + 0.05 * rng.standard_normal((tile, tile)).astype(np.float32),
        ],
        axis=-1,
    )
    reps_y, reps_x = -(-h // tile), -(-w // tile)
    img = np.tile(pat, (reps_y, reps_x, 1))[:h, :w]
    img[:, :, 2] += np.linspace(-0.45, 0.45, h, dtype=np.float32)[:, None]
    img = np.clip(img, 0, 1, out=img).reshape(-1, 3)
    return np.round(img * 255.0).astype(np.uint8)


def main():
    import patolette_tpu as pt
    from patolette_tpu.models import pipeline
    from patolette_tpu import native

    colors = synth_image_u8(WIDTH, HEIGHT)

    # First-call latency attribution (VERDICT r2 weak #8): count persistent
    # jit-cache entries written during warm-up. 0 new entries = pure cache
    # hit (warmup_s is then device execute + cache deserialization); > 0 =
    # that many programs were compiled from scratch this run.
    import os

    import jax as _jax

    cache_dir = _jax.config.jax_compilation_cache_dir

    def _cache_entries():
        try:
            return len(os.listdir(cache_dir)) if cache_dir else -1
        except OSError:
            return -1

    cache_before = _cache_entries()

    def run():
        ok, pal, pmap, msg = pt.quantize(
            WIDTH, HEIGHT, colors, PALETTE,
            dither=False, tile_size=0, kmeans_niter=KMEANS_ITERS,
            color_space=pt.ColorSpace_ICtCp,
        )
        assert ok, msg
        return pal, pmap

    t0 = time.perf_counter()
    run()  # warm-up / compile (persistent-cache hit => seconds, miss => min)
    warmup_s = time.perf_counter() - t0
    # -1 = unknown (no persistent cache dir configured); the count also
    # assumes no concurrent process writes the shared cache directory.
    cache_misses = (
        -1 if cache_before < 0 else max(0, _cache_entries() - cache_before)
    )

    times, laps = [], []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
        laps.append(dict(pipeline.LAST_STAGE_TIMES))

    best = min(times)
    stage_laps = laps[times.index(best)]
    mps = (WIDTH * HEIGHT) / 1e6 / best
    print(json.dumps({
        "metric": "megapixels_per_sec_per_chip_256color_100mp_kmeans25",
        "value": round(mps, 3),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / BASELINE_MPS_PER_CHIP, 3),
        # diagnostics: attribute any regression from the artifact alone
        "wall_s": round(best, 3),
        "warmup_s": round(warmup_s, 1),
        # programs compiled from scratch during warm-up (0 = pure
        # persistent-cache hit; explains a slow warmup_s from the artifact)
        "jit_cache_misses": cache_misses,
        "stages_ms": stage_laps,
        "native_lut": native.available(),
    }))


if __name__ == "__main__":
    main()
