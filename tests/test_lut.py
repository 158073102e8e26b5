"""24-bit LUT palette mapping (ops/lut.py) and the sample+LUT fast path.

The LUT path must be *bit-identical* to the direct per-pixel NN map
(reference semantics: exact NN, lowest index wins — nearest.c:150-209):
same distance formula, same working->ICtCp staging (quirk Q4,
patolette.c:140).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from patolette_tpu.ops import colorspace as cs
from patolette_tpu.ops import lut as LUT
from patolette_tpu.ops.assign import assign_planar
from patolette_tpu.models import pipeline


def _rand_palette(rng, p, dtype=np.float32):
    return jnp.asarray(rng.uniform(0.05, 0.95, size=(p, 3)), dtype=dtype)


@pytest.mark.parametrize("color_space", [0, 1, 2])  # sRGB, CIELuv, ICtCp
def test_lut_matches_direct_assign(color_space):
    rng = np.random.default_rng(7)
    p = 8
    pal_srgb = _rand_palette(rng, p)
    pal_work = cs.srgb_to_working(pal_srgb, color_space)
    valid = jnp.asarray([True] * (p - 1) + [False])

    lut = np.asarray(
        LUT.build_lut_device(pal_work, valid, color_space, jnp.uint8)
    )
    assert lut.shape == (1 << 24,)

    pix = rng.integers(0, 256, size=(4096, 3), dtype=np.uint8)
    codes = (
        (pix[:, 0].astype(np.int64) << 16)
        | (pix[:, 1].astype(np.int64) << 8)
        | pix[:, 2].astype(np.int64)
    )
    via_lut = lut[codes]

    chans = tuple(
        jnp.asarray(pix[:, k], jnp.float32) * (1.0 / 255.0) for k in range(3)
    )
    xw = cs.srgb_to_working(chans, color_space)
    xi = cs.working_to_ictcp(xw, color_space)
    pi = cs.working_to_ictcp(pal_work, color_space)
    direct = np.asarray(assign_planar(xi, pi, valid=valid))

    np.testing.assert_array_equal(via_lut, direct)


def test_rle_pull_roundtrip():
    """pull_lut's RLE wire format is lossless, incl. the multi-chunk path."""
    rng = np.random.default_rng(13)
    # ~1M runs -> exercises the chunked (> _RLE_STEP runs) pull
    runs = 1_000_000
    pos = np.sort(
        rng.choice(LUT.LUT_SIZE - 1, size=runs - 1, replace=False) + 1
    )
    vals = rng.integers(0, 256, size=runs).astype(np.uint8)
    # forbid equal adjacent values (they'd merge into one run on device)
    same = np.flatnonzero(vals[1:] == vals[:-1])
    vals[same + 1] = ((vals[same + 1].astype(np.int32) + 1) % 256).astype(
        np.uint8
    )
    host = np.repeat(vals, np.diff(np.concatenate([[0], pos, [LUT.LUT_SIZE]])))
    dev = jnp.asarray(host)
    np.testing.assert_array_equal(LUT.pull_lut(dev), host)

    # tiny-run table: single-chunk path
    host2 = np.zeros(LUT.LUT_SIZE, np.uint8)
    host2[12345:] = 7
    host2[LUT.LUT_SIZE - 3:] = 250
    np.testing.assert_array_equal(LUT.pull_lut(jnp.asarray(host2)), host2)


def test_rle_pull_overflow_falls_back():
    """A table with more runs than MAX_RUNS falls back to the full pull."""
    host = np.arange(LUT.LUT_SIZE, dtype=np.int64) % 2
    host = host.astype(np.uint8)  # 16.7M runs >> MAX_RUNS
    np.testing.assert_array_equal(LUT.pull_lut(jnp.asarray(host)), host)


def test_grid_cache_reuse():
    """Repeated builds in one space reuse the cached grid; switching spaces
    evicts (single-entry cache: each grid is 201 MB)."""
    LUT.clear_grid_cache()
    g1 = LUT.grid_ictcp(2)
    assert LUT.grid_ictcp(2) is g1
    LUT.grid_ictcp(1)
    assert 2 not in LUT._GRID_CACHE
    LUT.clear_grid_cache()


def test_lut_dtype_widths():
    assert LUT.lut_dtype(256) == jnp.uint8
    assert LUT.lut_dtype(257) == jnp.uint16
    assert LUT.lut_dtype(70000) == jnp.int32


def test_native_lut_map_matches_numpy():
    from patolette_tpu import native

    if not native.available():
        pytest.fail(f"native library unavailable: {native.build_error()}")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(100_000, 3), dtype=np.uint8)
    # force extreme codes into the stream: 0xFFFFFF exercises the AVX-512
    # gather's table-tail window (the 4-byte read past the last u8/u16 code)
    img[:64] = 255
    img[64:128] = 0
    for dt in (np.uint8, np.uint16, np.int32):
        lut = rng.integers(0, 200, size=(1 << 24,)).astype(dt)
        out = native.lut_map_u8(img, lut)
        codes = (
            (img[:, 0].astype(np.int64) << 16)
            | (img[:, 1].astype(np.int64) << 8)
            | img[:, 2]
        )
        np.testing.assert_array_equal(out, lut[codes])
        assert out.dtype == np.int32  # widen fused into the native gather


def test_lut_map_host_dtype_contract():
    """Both lut_map_host paths (native + numpy fallback) return int32."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(1000, 3), dtype=np.uint8)
    lut = rng.integers(0, 9, size=(1 << 24,)).astype(np.uint8)

    out = LUT.lut_map_host(img, lut)
    assert out.dtype == np.int32

    import patolette_tpu.native as native
    import unittest.mock as mock

    with mock.patch.object(native, "lut_map_u8", lambda *a, **k: None):
        out_np = LUT.lut_map_host(img, lut)
    assert out_np.dtype == np.int32
    np.testing.assert_array_equal(out, out_np)


def test_fast_path_matches_full_path(monkeypatch):
    """With no sampling in play (n below every cap), the sample+LUT paths
    must produce the same palette and palette map as the full-upload
    path — the LUT is a wire format, not an approximation.

    The staged sample path (PATOLETTE_NO_FUSED_LUT) shares the full path's
    host f64 DP, so that comparison is exact; the fused single-program
    variant runs the device f32 DP, so it gets the same tolerance as the
    one-shot path (identical up to f32 DP ties)."""
    rng = np.random.default_rng(11)
    w = h = 64
    img = rng.integers(0, 256, size=(w * h, 3), dtype=np.uint8)

    kw = dict(dither=False, tile_size=0, kmeans_niter=4)
    p = 17

    monkeypatch.setenv("PATOLETTE_NO_ONE_SHOT", "1")
    ok, pal_full, map_full, _ = pipeline.quantize(w, h, img, p, **kw)
    assert ok

    monkeypatch.setattr(pipeline, "LUT_MIN_PIXELS", 0)
    monkeypatch.setenv("PATOLETTE_NO_FUSED_LUT", "1")
    ok, pal_fast, map_fast, _ = pipeline.quantize(w, h, img, p, **kw)
    assert ok
    np.testing.assert_allclose(pal_fast, pal_full, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(map_fast, map_full)
    assert map_fast.dtype == np.int32

    monkeypatch.delenv("PATOLETTE_NO_FUSED_LUT")
    ok, pal_fused, map_fused, _ = pipeline.quantize(w, h, img, p, **kw)
    assert ok
    np.testing.assert_allclose(pal_fused, pal_full, rtol=0, atol=2e-3)
    assert (map_fused == map_full).mean() > 0.999
    assert map_fused.dtype == np.int32


def test_image_fused_lut_matches_staged_saliency(monkeypatch):
    """The full-image fused LUT path (saliency on device + palette + LUT
    in ONE program) agrees with the staged full-upload path up to f32 DP
    ties (same saliency weights, same subsample draws are device-side in
    both — the staged path uses the host f64 DP)."""
    rng = np.random.default_rng(17)
    w, h = 96, 64
    img = rng.integers(0, 256, size=(w * h, 3), dtype=np.uint8)
    # lq_max_samples=0: with sampling on, the staged path draws host-side
    # and the fused program draws device-side (different RNG streams) —
    # full-data runs make the comparison about the pipeline itself
    kw = dict(dither=False, tile_size=256, kmeans_niter=2,
              lq_max_samples=0)

    monkeypatch.setenv("PATOLETTE_NO_FUSED_LUT", "1")
    monkeypatch.setenv("PATOLETTE_NO_ONE_SHOT", "1")
    ok, pal_full, map_full, _ = pipeline.quantize(w, h, img, 32, **kw)
    assert ok

    monkeypatch.delenv("PATOLETTE_NO_FUSED_LUT")
    monkeypatch.setenv("PATOLETTE_FUSED_IMAGE_LUT", "1")  # opt-in path
    monkeypatch.setattr(pipeline, "LUT_MIN_PIXELS", 0)
    ok, pal_fused, map_fused, _ = pipeline.quantize(w, h, img, 32, **kw)
    assert ok
    assert map_fused.dtype == np.int32
    np.testing.assert_allclose(pal_fused, pal_full, rtol=0, atol=2e-3)
    assert (map_fused == map_full).mean() > 0.995


def test_fast_path_sampled_with_weights(monkeypatch):
    """Sampled fast path (n above the LQ cap) with explicit weights:
    runs end to end, palette is usable, map covers only valid slots."""
    monkeypatch.setattr(pipeline, "LUT_MIN_PIXELS", 0)
    rng = np.random.default_rng(5)
    w, h = 100, 90
    img = rng.integers(0, 256, size=(w * h, 3), dtype=np.uint8)
    weights = 1.0 + rng.random(w * h)
    ok, pal, pmap, msg = pipeline.quantize(
        w, h, img, 16, dither=False, tile_size=0, kmeans_niter=2,
        weights=weights, lq_max_samples=1024,
    )
    assert ok, msg
    live = np.flatnonzero(pal[:, 0] >= 0)
    assert len(live) > 1
    assert np.isin(np.unique(pmap), live).all()
    # quality sanity: mapped image is closer than a 1-color image
    recon = pal[pmap]
    mse = np.mean((recon - img / 255.0) ** 2)
    assert mse < np.var(img / 255.0)


def test_fast_path_palette_only_float_input(monkeypatch):
    monkeypatch.setattr(pipeline, "LUT_MIN_PIXELS", 0)
    rng = np.random.default_rng(9)
    w = h = 50
    img = rng.random((w * h, 3))
    ok, pal, pmap, msg = pipeline.quantize(
        w, h, img, 8, palette_only=True, dither=False, tile_size=0,
        kmeans_niter=2, lq_max_samples=1000,
    )
    assert ok, msg
    assert pmap is None
    assert pal.shape == (8, 3)


class TestRleV2:
    """Delta-u16 RLE v2 (the default fused-path wire format)."""

    def _encode_header(self, host):
        enc = np.asarray(LUT._rle_encode_u8_v2(jnp.asarray(host)))
        count = int(enc[0]) | (int(enc[1]) << 16)
        return enc, count, bool(enc[2])

    def test_roundtrip_typical(self):
        rng = np.random.default_rng(23)
        runs = 300_000
        pos = np.sort(
            rng.choice(LUT.LUT_SIZE - 1, size=runs - 1, replace=False) + 1
        )
        vals = rng.integers(0, 256, size=runs).astype(np.uint8)
        same = np.flatnonzero(vals[1:] == vals[:-1])
        vals[same + 1] = ((vals[same + 1].astype(np.int32) + 1) % 256).astype(
            np.uint8
        )
        host = np.repeat(
            vals, np.diff(np.concatenate([[0], pos, [LUT.LUT_SIZE]]))
        )
        # edge: a single-element run with value 255 at the very last
        # position (its packed word equals the sort sentinel bit-for-bit)
        host[-1] = 255 if host[-2] != 255 else 254

        enc, count, overflow = self._encode_header(host)
        assert not overflow
        out = LUT.pull_encoded_v2(jnp.asarray(enc))
        np.testing.assert_array_equal(out, host)

    def test_roundtrip_multiwindow(self):
        # a boundary every 12 positions: ~1.4M runs (> _V2_STEP words, so
        # the pull takes the multi-window path) but only ~11 per block
        host = ((np.arange(LUT.LUT_SIZE) // 12) % 251).astype(np.uint8)
        enc, count, overflow = self._encode_header(host)
        assert not overflow and count > LUT._V2_STEP
        out = LUT.pull_encoded_v2(jnp.asarray(enc))
        np.testing.assert_array_equal(out, host)

    def test_block_overflow_flags_and_falls_back(self):
        # one block with alternating values -> 64 boundaries > _V2_COLS
        host = np.zeros(LUT.LUT_SIZE, np.uint8)
        host[4096:4096 + 128] = (np.arange(128) % 2).astype(np.uint8) + 3
        enc, count, overflow = self._encode_header(host)
        assert overflow
        assert LUT.pull_encoded_v2(jnp.asarray(enc)) is None
        # pull_lut still exact via the v1 fallback
        np.testing.assert_array_equal(LUT.pull_lut(jnp.asarray(host)), host)

    def test_native_decode_matches_numpy(self):
        from patolette_tpu import native

        if not native.available():
            pytest.fail(f"native library unavailable: {native.build_error()}")
        host = ((np.arange(LUT.LUT_SIZE) // 777) % 199).astype(np.uint8)
        enc, count, overflow = self._encode_header(host)
        assert not overflow
        words = enc[3:3 + count]
        nat = native.rle_decode_u8_v2(words)
        assert nat.shape == (LUT.LUT_SIZE + native.LUT_PAD,)
        assert (nat[LUT.LUT_SIZE:] == 0).all()
        pos = np.cumsum((words >> 8).astype(np.int64))
        vals = (words & 0xFF).astype(np.uint8)
        expect = np.repeat(vals, np.diff(np.append(pos, LUT.LUT_SIZE)))
        np.testing.assert_array_equal(nat[:LUT.LUT_SIZE], expect)
        np.testing.assert_array_equal(nat[:LUT.LUT_SIZE], host)


class TestRleU16V2:
    """u32-word RLE v2 for uint16 tables (large-palette wire)."""

    def test_roundtrip(self):
        rng = np.random.default_rng(31)
        runs = 400_000
        pos = np.sort(
            rng.choice(LUT.LUT_SIZE - 1, size=runs - 1, replace=False) + 1
        )
        vals = rng.integers(0, 4096, size=runs).astype(np.uint16)
        same = np.flatnonzero(vals[1:] == vals[:-1])
        vals[same + 1] = ((vals[same + 1].astype(np.int32) + 1)
                          % 4096).astype(np.uint16)
        host = np.repeat(
            vals, np.diff(np.concatenate([[0], pos, [LUT.LUT_SIZE]]))
        )
        enc = LUT._rle_encode_u16_v2(jnp.asarray(host))
        words = LUT.pull_words_u16_v2(enc)
        assert words is not None
        out = LUT._rle_decode_u16_v2(words)
        np.testing.assert_array_equal(out, host)
        # numpy fallback decode agrees with the native one
        import patolette_tpu.native as native
        import unittest.mock as mock

        with mock.patch.object(native, "rle_decode_u16_v2",
                               lambda *a, **k: None):
            out_np = LUT._rle_decode_u16_v2(np.asarray(words))
        np.testing.assert_array_equal(out_np, host)

    def test_pull_lut_u16_route(self):
        host = ((np.arange(LUT.LUT_SIZE) // 600) % 1024).astype(np.uint16)
        np.testing.assert_array_equal(LUT.pull_lut(jnp.asarray(host)), host)

    def test_overflow_falls_back_raw(self):
        host = np.zeros(LUT.LUT_SIZE, np.uint16)
        host[2048:2048 + 128] = (np.arange(128) % 2 + 7).astype(np.uint16)
        enc = LUT._rle_encode_u16_v2(jnp.asarray(host))
        assert LUT.pull_words_u16_v2(enc) is None
        np.testing.assert_array_equal(LUT.pull_lut(jnp.asarray(host)), host)
