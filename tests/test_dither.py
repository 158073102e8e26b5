"""Hilbert curve + Riemersma dither tests."""

import numpy as np
import jax.numpy as jnp

from patolette_tpu.ops import hilbert
from patolette_tpu.models import dither as D
from patolette_tpu.ops import colorspace as cs


class TestHilbert:
    def test_order(self):
        assert hilbert.curve_order(512, 512) == 9
        assert hilbert.curve_order(513, 100) == 10
        assert hilbert.curve_order(1, 1) == 1

    def test_permutation_is_bijection(self):
        perm = np.asarray(hilbert.pixel_visit_order(13, 7))
        assert sorted(perm) == list(range(13 * 7))

    def test_curve_is_connected(self):
        """Consecutive curve positions are 4-neighbors on the full grid."""
        order = 4
        side = 1 << order
        idx = jnp.arange(side * side, dtype=jnp.uint32)
        x = idx % side
        y = idx // side
        d = np.asarray(hilbert.xy_to_d(x, y, order))
        pos = np.empty(side * side, np.int64)
        pos[d] = np.arange(side * side)
        xs, ys = pos % side, pos // side
        steps = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
        np.testing.assert_array_equal(steps, 1)

    def test_locality(self):
        """Hilbert order visits each image quadrant contiguously-ish:
        average index distance between 4-neighbors stays tiny."""
        perm = np.asarray(hilbert.pixel_visit_order(64, 64))
        visit_rank = np.empty(64 * 64)
        visit_rank[perm] = np.arange(64 * 64)
        r = visit_rank.reshape(64, 64)
        dx = np.abs(np.diff(r, axis=1)).mean()
        assert dx < 200  # row-major would give ~1 but long jumps; random ~1365

    def test_order16_exact_u32(self):
        """Order 16 (sides in (32768, 65536] — the reference's 40000px cap
        lands here) is exact in uint32: d <= 4^16 - 1 = 2^32 - 1. Checked
        against the native u64 oracle at the extreme corner coordinates."""
        from patolette_tpu import native

        order = 16
        rng = np.random.default_rng(0)
        x = rng.integers(0, 40000, 4096).astype(np.uint32)
        y = rng.integers(0, 40000, 4096).astype(np.uint32)
        # force the max-d corner region into the sample
        x[:8] = np.arange(65528, 65536, dtype=np.uint32)
        y[:8] = 0
        d32 = np.asarray(
            hilbert.xy_to_d(jnp.asarray(x), jnp.asarray(y), order)
        ).astype(np.uint64)
        if native.available():
            d64 = native.hilbert_d(x, y, order)
            np.testing.assert_array_equal(d32, d64)
        assert d32.max() > np.uint64(1) << np.uint64(31)  # u32 range used

    def test_order16_visit_order_is_bijection(self):
        """40000-wide strip (curve order 16) end to end: the permutation
        covers every pixel exactly once (reference admits 40000x40000,
        patolette.c:92; this was a NotImplementedError in round 2)."""
        w, h = 40000, 2
        perm = np.asarray(hilbert.pixel_visit_order(w, h))
        assert perm.shape == (w * h,)
        seen = np.zeros(w * h, bool)
        seen[perm] = True
        assert seen.all()

    def test_order16_dither_end_to_end(self):
        """Dither a 40000-wide strip through the public pipeline path."""
        rng = np.random.default_rng(3)
        w, h = 40000, 2
        img = rng.uniform(0, 1, (w * h, 3)).astype(np.float32)
        pal = rng.uniform(0, 1, (8, 3)).astype(np.float32)
        pmap = np.asarray(D._dither_stream(
            jnp.asarray(img), jnp.asarray(pal), jnp.ones(8, bool),
            w, h, 4096,
        ))
        assert pmap.shape == (w * h,)
        assert pmap.min() >= 0 and pmap.max() < 8


class TestDither:
    def _palette(self):
        g = np.linspace(0, 1, 9)
        return np.stack([g, g, g], -1).astype(np.float32)

    def test_exact_colors_pass_through(self):
        """Pixels exactly equal to palette colors map to themselves."""
        pal = self._palette()
        rng = np.random.default_rng(0)
        idx = rng.integers(0, len(pal), 256)
        img = pal[idx]
        pmap = np.asarray(D._dither_stream(
            jnp.asarray(img), jnp.asarray(pal),
            jnp.ones(len(pal), bool), 16, 16, 0,
        ))
        np.testing.assert_array_equal(pmap, idx)

    def test_grey_average_preserved(self):
        """Dithering a flat mid-grey with a black/white palette must produce
        a mix whose average approximates the grey (error diffusion)."""
        pal = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
        img = np.full((4096, 3), 0.4, np.float32)
        pmap = np.asarray(D._dither_stream(
            jnp.asarray(img), jnp.asarray(pal), jnp.ones(2, bool),
            64, 64, 0,
        ))
        frac_white = pmap.mean()
        assert 0.25 < frac_white < 0.55
        # plain NN would give all-black (0.4 < 0.5 in weighted space)

    def test_segmented_close_to_serial(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (4096, 3)).astype(np.float32)
        pal = rng.uniform(0, 1, (16, 3)).astype(np.float32)
        valid = jnp.ones(16, bool)
        serial = np.asarray(D._dither_stream(
            jnp.asarray(img), jnp.asarray(pal), valid, 64, 64, 0))
        seg = np.asarray(D._dither_stream(
            jnp.asarray(img), jnp.asarray(pal), valid, 64, 64, 512))
        # identical except near the 8 segment seams
        agree = (serial == seg).mean()
        assert agree > 0.9

    def test_invalid_palette_slots_never_chosen(self):
        rng = np.random.default_rng(2)
        img = rng.uniform(0, 1, (1024, 3)).astype(np.float32)
        pal = np.vstack([self._palette(), [[0.5, 0.5, 0.5]]]).astype(np.float32)
        valid = jnp.asarray(np.array([True] * 9 + [False]))
        pmap = np.asarray(D._dither_stream(
            jnp.asarray(img), jnp.asarray(pal), valid, 32, 32, 256))
        assert 9 not in np.unique(pmap)

    def test_queue_weights(self):
        w = np.asarray(D._queue_weights(jnp.float32))
        assert len(w) == 16
        np.testing.assert_allclose(w[-1] / w[0], 16.0, rtol=1e-5)


class TestPackedFeed:
    """riemersma_dither_packed_u8: single-gather u8 feed vs the planar
    path. For sRGB working space the conversion chain is identical, so
    outputs match exactly; for ICtCp only the f32 path differs (direct
    sRGB->Rec2020 vs the working-space round trip), so agreement is
    near-total and quality is unchanged."""

    def _setup(self, seed=3, side=48, k=16):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (side * side, 3), dtype=np.uint8)
        pal = jnp.asarray(rng.uniform(0, 1, (k, 3)).astype(np.float32))
        valid = jnp.ones((k,), bool)
        return img, pal, valid, side

    def _planar(self, img, pal, valid, side, csp):
        from patolette_tpu.ops import wire
        from patolette_tpu.models.pipeline import _to_working

        xw = _to_working(wire.put_planar_image(img), csp)
        return np.asarray(D.riemersma_dither_planar(
            xw, pal, valid, side, side, csp, segment=256))

    def _packed(self, img, pal, valid, side, csp):
        from patolette_tpu.ops import wire

        xp8 = wire.put_planar_raw(img)
        return np.asarray(D.riemersma_dither_packed_u8(
            xp8, pal, valid, side, side, csp, segment=256))

    def test_srgb_exact(self):
        img, pal, valid, side = self._setup()
        a = self._planar(img, pal, valid, side, 0)
        b = self._packed(img, pal, valid, side, 0)
        np.testing.assert_array_equal(a, b)

    def test_ictcp_agreement_and_quality(self):
        img, pal, valid, side = self._setup(seed=5)
        pal_work = cs.srgb_to_working(pal, 2)
        a = self._planar(img, pal_work, valid, side, 2)
        b = self._packed(img, pal_work, valid, side, 2)
        assert (a == b).mean() > 0.97
        imgf = img.astype(np.float64) / 255.0
        pal_np = np.asarray(pal, np.float64)
        ea = np.mean((pal_np[a] - imgf) ** 2)
        eb = np.mean((pal_np[b] - imgf) ** 2)
        assert abs(ea - eb) < 0.05 * max(ea, eb) + 1e-6
