#!/usr/bin/env python
"""Benchmark: 4K image -> 256-color palette + map (full pipeline) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric (BASELINE.md): megapixels/sec/chip at a 256-color palette.
The reference publishes no machine-readable numbers (chart images only); the
driver-supplied north star is 256-color quantization of a 100 MP image with
KMeans refinement in < 1 s on one v5p host (~4 chips) => 25 MP/s/chip is the
per-chip baseline this reports against.
"""

import json
import time

import numpy as np

BASELINE_MPS_PER_CHIP = 25.0

WIDTH, HEIGHT = 3840, 2160
PALETTE = 256
KMEANS_ITERS = 25
REPEATS = 3


def synth_image(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            0.5 + 0.45 * np.sin(xx / 97.0) * np.cos(yy / 131.0),
            0.5 + 0.45 * np.cos(xx / 177.0 + yy / 211.0),
            np.clip(yy / h + 0.05 * rng.standard_normal((h, w)), 0, 1),
        ],
        axis=-1,
    )
    return np.clip(img, 0, 1).reshape(-1, 3).astype(np.float32)


def main():
    import patolette_tpu as pt

    colors = synth_image(WIDTH, HEIGHT)

    def run():
        ok, pal, pmap, msg = pt.quantize(
            WIDTH, HEIGHT, colors, PALETTE,
            dither=False, tile_size=0, kmeans_niter=KMEANS_ITERS,
            color_space=pt.ColorSpace_ICtCp,
        )
        assert ok, msg
        return pal, pmap

    run()  # warm-up / compile
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)

    best = min(times)
    mps = (WIDTH * HEIGHT) / 1e6 / best
    print(json.dumps({
        "metric": "megapixels_per_sec_per_chip_256color_4k_kmeans25",
        "value": round(mps, 3),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / BASELINE_MPS_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
