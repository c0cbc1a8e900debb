"""Preprocessing ops: scipy/numpy ground-truth parity + pipeline fusion.

The reference has no preprocessing stage (transform = resize/scale only,
reference data_module.py:17-33); these ops are beyond-reference capability,
so the ground truth is scipy.ndimage / literal numpy math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage

from latice_tpu.data.preprocess import (
    PreprocessConfig,
    parse_preprocess_spec,
    bin_patterns,
    equalize_histogram,
    estimate_static_background,
    fix_hot_pixels,
    gaussian_blur,
    make_preprocess_fn,
    normalize_patterns,
    remove_dynamic_background,
    remove_static_background,
)


@pytest.fixture(scope="module")
def stack():
    rng = np.random.default_rng(7)
    return rng.uniform(0.1, 0.9, size=(3, 32, 32)).astype(np.float32)


class TestGaussianBlur:
    @pytest.mark.parametrize("sigma", [0.8, 1.5, 4.0])
    def test_scipy_parity(self, stack, sigma):
        ours = np.asarray(gaussian_blur(stack, sigma))
        ref = np.stack(
            [
                scipy.ndimage.gaussian_filter(
                    p.astype(np.float64), sigma, mode="reflect", truncate=4.0
                )
                for p in stack
            ]
        )
        np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_channel_axis_preserved(self, stack):
        out = gaussian_blur(stack[..., None], 1.0)
        assert out.shape == stack.shape + (1,)
        np.testing.assert_allclose(
            np.asarray(out)[..., 0], np.asarray(gaussian_blur(stack, 1.0)),
            atol=1e-7,
        )


class TestStaticBackground:
    def test_divide_recovers_flat_field(self, stack):
        # Multiplicative detector response: correcting with the exact
        # response recovers the clean pattern up to the global scale.
        rng = np.random.default_rng(1)
        resp = rng.uniform(0.5, 1.5, size=(32, 32)).astype(np.float32)
        raw = stack * resp
        corrected = np.asarray(remove_static_background(raw, resp, "divide"))
        np.testing.assert_allclose(corrected, stack * resp.mean(), rtol=1e-4)

    def test_subtract_removes_offset(self, stack):
        off = np.linspace(0, 1, 32 * 32, dtype=np.float32).reshape(32, 32)
        raw = stack + off
        corrected = np.asarray(remove_static_background(raw, off, "subtract"))
        np.testing.assert_allclose(corrected, stack + off.mean(), atol=1e-5)

    def test_bad_mode(self, stack):
        with pytest.raises(ValueError, match="mode"):
            remove_static_background(stack, stack[0], "add")


class TestDynamicBackground:
    def test_flattens_ramp(self):
        # Smooth ramp x band texture: after divide-correction, the mean
        # intensity of the dim corner matches the bright corner.
        h = w = 64
        yy, xx = np.mgrid[0:h, 0:w]
        ramp = (0.3 + 0.7 * xx / w).astype(np.float32)
        bands = (1.0 + 0.1 * np.sin(yy / 2.0)).astype(np.float32)
        raw = (ramp * bands)[None]
        flat = np.asarray(remove_dynamic_background(raw, sigma=8.0))[0]
        # Interior windows: the outermost ~sigma columns keep a few percent
        # of edge bias from the reflect-padded blur, like any blur-based
        # background estimate.
        left, right = flat[:, 8:24].mean(), flat[:, 40:56].mean()
        raw_ratio = raw[0][:, 40:56].mean() / raw[0][:, 8:24].mean()  # ~1.7
        assert abs(right / left - 1.0) < 0.05 < raw_ratio - 1.0

    def test_default_sigma_is_h_over_8(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(size=(2, 40, 40)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(remove_dynamic_background(x)),
            np.asarray(remove_dynamic_background(x, sigma=5.0)),
            atol=1e-7,
        )


class TestHotPixels:
    def test_spikes_repaired_clean_untouched(self, stack):
        raw = stack.copy()
        raw[0, 5, 7] = 50.0   # hot
        raw[1, 20, 3] = -40.0  # dead
        fixed = np.asarray(fix_hot_pixels(raw, threshold=5.0))
        # Spikes land on the neighbourhood median (well inside [0.1, 0.9]).
        assert 0.0 < fixed[0, 5, 7] < 1.0
        assert 0.0 < fixed[1, 20, 3] < 1.0
        # Everything that wasn't a spike is bit-untouched.
        mask = np.ones_like(raw, bool)
        mask[0, 5, 7] = mask[1, 20, 3] = False
        np.testing.assert_array_equal(fixed[mask], raw[mask])

    def test_edge_pixels_supported(self, stack):
        raw = stack.copy()
        raw[2, 0, 0] = 99.0
        fixed = np.asarray(fix_hot_pixels(raw, threshold=5.0))
        assert fixed[2, 0, 0] < 1.0


class TestNormalize:
    def test_minmax_unit_range(self, stack):
        y = np.asarray(normalize_patterns(stack * 7 + 3, "minmax"))
        for p in y:
            assert p.min() == pytest.approx(0.0, abs=1e-6)
            assert p.max() == pytest.approx(1.0, abs=1e-4)

    def test_zscore_moments(self, stack):
        y = np.asarray(normalize_patterns(stack, "zscore"))
        for p in y:
            assert p.mean() == pytest.approx(0.0, abs=1e-5)
            assert p.std() == pytest.approx(1.0, abs=1e-3)

    def test_clip_sigma_tames_outlier(self, stack):
        raw = stack.copy()
        raw[0, 0, 0] = 1000.0
        plain = np.asarray(normalize_patterns(raw, "minmax"))
        robust = np.asarray(normalize_patterns(raw, "minmax", clip_sigma=3.0))
        # Without clipping the outlier compresses everything toward 0.
        assert np.median(plain[0]) < 0.01
        assert np.median(robust[0]) > 0.2

    def test_bad_method(self, stack):
        with pytest.raises(ValueError, match="method"):
            normalize_patterns(stack, "sigmoid")


class TestEqualize:
    def test_output_is_uniform_cdf(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, 24, 24)).astype(np.float32) ** 3
        y = np.asarray(equalize_histogram(x))
        p = 24 * 24
        for row in y.reshape(2, -1):
            np.testing.assert_allclose(
                np.sort(row), np.arange(1, p + 1) / p, atol=1e-6
            )

    def test_ties_map_equal_and_order_preserved(self):
        x = np.asarray([[[0.1, 0.5], [0.5, 0.9]]], np.float32)
        y = np.asarray(equalize_histogram(x))[0]
        assert y[0, 1] == y[1, 0]
        assert y[0, 0] < y[0, 1] < y[1, 1]


class TestBinning:
    def test_matches_numpy_pooling(self, stack):
        y = np.asarray(bin_patterns(stack, 4))
        ref = stack.reshape(3, 8, 4, 8, 4).mean(axis=(2, 4))
        np.testing.assert_allclose(y, ref, atol=1e-6)

    def test_indivisible_raises(self, stack):
        with pytest.raises(ValueError, match="divisible"):
            bin_patterns(stack, 5)


class TestStaticBackgroundEstimate:
    def test_chunked_equals_full(self, stack):
        full = estimate_static_background(stack)
        chunked = estimate_static_background(iter([stack[:1], stack[1:]]))
        np.testing.assert_allclose(full, stack.mean(axis=0), atol=1e-6)
        np.testing.assert_allclose(chunked, full, atol=1e-7)

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="no patterns"):
            estimate_static_background(iter([]))


class TestMakePreprocessFn:
    def test_default_is_identity(self, stack):
        fn = make_preprocess_fn(PreprocessConfig())
        np.testing.assert_array_equal(np.asarray(fn(jnp.asarray(stack))), stack)

    def test_auto_minmax_after_background(self, stack):
        bg = stack.mean(axis=0)
        fn = make_preprocess_fn(PreprocessConfig(static_background=bg))
        y = np.asarray(jax.jit(fn)(jnp.asarray(stack)))
        assert y.min() >= -1e-6 and y.max() <= 1.0 + 1e-5

    def test_full_recipe_jits_once(self, stack):
        cfg = PreprocessConfig(
            hot_pixel_threshold=6.0,
            static_background=stack.mean(axis=0),
            dynamic_sigma="auto",
            clip_sigma=4.0,
            bin_factor=2,
        )
        fn = jax.jit(make_preprocess_fn(cfg))
        y = fn(jnp.asarray(stack[..., None]))
        assert y.shape == (3, 16, 16, 1)
        assert np.isfinite(np.asarray(y)).all()

    def test_clip_runs_before_equalize(self):
        """clip_sigma is its own stage ahead of equalization: after clipping,
        a huge spike ties with the clip bound and shares the top rank;
        without the clip it strictly exceeds every other pixel."""
        rng = np.random.default_rng(3)
        x = rng.uniform(0.2, 0.8, size=(1, 16, 16)).astype(np.float32)
        x[0, 3, 3] = 500.0
        x[0, 8, 8] = 400.0
        clipped = make_preprocess_fn(
            PreprocessConfig(clip_sigma=2.0, equalize=True)
        )(jnp.asarray(x))
        plain = make_preprocess_fn(PreprocessConfig(equalize=True))(
            jnp.asarray(x)
        )
        assert np.asarray(clipped)[0, 3, 3] == np.asarray(clipped)[0, 8, 8]
        assert np.asarray(plain)[0, 3, 3] > np.asarray(plain)[0, 8, 8]

    def test_config_validation(self):
        with pytest.raises(ValueError, match="static_mode"):
            make_preprocess_fn(PreprocessConfig(static_mode="mul"))
        with pytest.raises(ValueError, match="normalize"):
            make_preprocess_fn(PreprocessConfig(normalize="bad"))


class TestSpecParser:
    def test_full_spec(self, stack, tmp_path):
        bg = stack.mean(axis=0)
        path = tmp_path / "bg.npy"
        np.save(path, bg)
        cfg = parse_preprocess_spec(
            f"hotpixels=5, static={path}, static-mode=subtract, "
            "dynamic=auto, equalize, clip=4, bin=2"
        )
        assert cfg.hot_pixel_threshold == 5.0
        np.testing.assert_array_equal(cfg.static_background, bg)
        assert cfg.static_mode == "subtract"
        assert cfg.dynamic_sigma == "auto"
        assert cfg.equalize and cfg.clip_sigma == 4.0 and cfg.bin_factor == 2

    def test_numeric_dynamic_sigma(self):
        assert parse_preprocess_spec("dynamic=12.5").dynamic_sigma == 12.5

    def test_empty_spec_is_identity(self):
        assert parse_preprocess_spec("") == PreprocessConfig()

    def test_unknown_key(self):
        with pytest.raises(ValueError, match="unknown preprocess key"):
            parse_preprocess_spec("sharpen=3")

    def test_bad_value(self):
        with pytest.raises(ValueError, match="bad value"):
            parse_preprocess_spec("hotpixels=hot")

    def test_bad_mode_caught_at_parse_time(self):
        with pytest.raises(ValueError, match="static_mode"):
            parse_preprocess_spec("static-mode=mul")

    def test_static_auto_placeholder(self):
        cfg = parse_preprocess_spec("static=auto")
        assert cfg.static_background == "auto"
        # Compiling an unresolved placeholder is an error with guidance.
        with pytest.raises(ValueError, match="estimate_static_background"):
            make_preprocess_fn(cfg)


class TestPipelineFusion:
    """IndexPipeline(preprocess=...) == manual preprocess + plain pipeline."""

    @pytest.fixture(scope="class")
    def tiny(self):
        from latice_tpu.models import VariationalAutoEncoderRawData

        rng = np.random.default_rng(11)
        model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=8)
        params = model.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, 128, 128, 1)),
            jax.random.key(1),
        )["params"]
        patterns = rng.uniform(size=(6, 128, 128)).astype(np.float32)
        vecs = rng.normal(size=(30, 8)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        angles = rng.uniform([0, 20, 0], [340, 140, 340], size=(30, 3))
        return model, params, patterns, vecs, angles

    def test_fused_equals_manual(self, tiny):
        from latice_tpu.index import IndexPipeline

        model, params, patterns, vecs, angles = tiny
        cfg = PreprocessConfig(dynamic_sigma=16.0, clip_sigma=4.0)
        kw = dict(top_n=5, min_required_matches=3, batch_size=6)
        fused = IndexPipeline(
            model, params, vecs, angles, preprocess=cfg, **kw
        )
        plain = IndexPipeline(model, params, vecs, angles, **kw)
        manual = np.asarray(
            jax.jit(make_preprocess_fn(cfg))(jnp.asarray(patterns[..., None]))
        )
        a, b = fused(patterns), plain(manual)
        np.testing.assert_array_equal(a.indices, b.indices)
        np.testing.assert_allclose(a.scores, b.scores, atol=1e-5)

    def test_uint8_path_preprocesses_after_scaling(self, tiny):
        from latice_tpu.index import IndexPipeline

        model, params, patterns, vecs, angles = tiny
        cfg = PreprocessConfig(normalize="minmax")
        kw = dict(top_n=5, min_required_matches=3, batch_size=6)
        pipe = IndexPipeline(model, params, vecs, angles, preprocess=cfg, **kw)
        u8 = (patterns * 255).astype(np.uint8)
        a = pipe(u8)
        b = pipe(u8.astype(np.float32) / 255.0)
        np.testing.assert_array_equal(a.indices, b.indices)

    def test_bad_preprocess_type(self, tiny):
        from latice_tpu.index import IndexPipeline

        model, params, _, vecs, angles = tiny
        with pytest.raises(TypeError, match="PreprocessConfig"):
            IndexPipeline(model, params, vecs, angles, preprocess="minmax")
