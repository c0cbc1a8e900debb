"""Model tests: shapes, dtypes, torch-parity of the normalization, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latice_tpu.models import (
    InstanceNorm,
    VariationalAutoEncoderRawData,
)


@pytest.fixture(scope="module")
def small_vae_and_params():
    """inplanes=4 keeps CPU test compiles fast; architecture shape is identical."""
    model = VariationalAutoEncoderRawData(inplanes=4, latent_dim=16)
    x = jnp.zeros((2, 128, 128, 1), dtype=jnp.float32)
    params = model.init(
        {"params": jax.random.key(0)}, x, jax.random.key(1)
    )["params"]
    return model, params


class TestInstanceNorm:
    def test_matches_torch_instance_norm2d(self):
        """Parity with torch.nn.InstanceNorm2d defaults (latice/model.py:96)."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.normal(size=(3, 8, 16, 16)).astype(np.float32) * 5 + 2  # NCHW

        want = torch.nn.InstanceNorm2d(8)(torch.from_numpy(x)).numpy()

        x_nhwc = jnp.asarray(np.moveaxis(x, 1, -1))
        got = InstanceNorm().apply({}, x_nhwc)
        got_nchw = np.moveaxis(np.asarray(got), -1, 1)
        np.testing.assert_allclose(got_nchw, want, atol=1e-5)

    def test_float32_stats_under_bf16(self):
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 4, 4, 3)), dtype=jnp.bfloat16
        )
        y = InstanceNorm(dtype=jnp.bfloat16).apply({}, x)
        assert y.dtype == jnp.bfloat16
        assert np.all(np.isfinite(np.asarray(y, dtype=np.float32)))


class TestVAEForward:
    def test_output_shapes(self, small_vae_and_params):
        model, params = small_vae_and_params
        x = jnp.asarray(
            np.random.default_rng(2).uniform(size=(2, 128, 128, 1)), jnp.float32
        )
        z, x_hat, mu, std = model.apply(
            {"params": params}, x, jax.random.key(3)
        )
        assert z.shape == (2, 16)
        assert mu.shape == (2, 16)
        assert std.shape == (2, 16)
        assert x_hat.shape == (2, 128, 128, 1)
        assert np.all(np.asarray(std) > 0)

    def test_encoder_spatial_reduction(self, small_vae_and_params):
        """128 -> 4 over 5 pool stages; bottleneck = 4*inplanes*16 (model.py:127)."""
        model, params = small_vae_and_params
        x = jnp.zeros((1, 128, 128, 1), jnp.float32)
        h = model.apply({"params": params}, x, method=lambda m, x: m.encoder(x))
        assert h.shape == (1, 4, 4, 16)  # 4*inplanes=16 for inplanes=4

    def test_encode_is_deterministic(self, small_vae_and_params):
        """Indexing uses mu — must not depend on the sampling key (dp_indexer.py:136)."""
        model, params = small_vae_and_params
        x = jnp.asarray(
            np.random.default_rng(4).uniform(size=(2, 128, 128, 1)), jnp.float32
        )
        mu1, lv1 = model.apply({"params": params}, x, method="encode")
        mu2, lv2 = model.apply({"params": params}, x, method="encode")
        np.testing.assert_array_equal(np.asarray(mu1), np.asarray(mu2))
        np.testing.assert_array_equal(np.asarray(lv1), np.asarray(lv2))

    def test_reparameterize_statistics(self, small_vae_and_params):
        model, params = small_vae_and_params
        mu = jnp.ones((4096, 16)) * 2.0
        logvar = jnp.zeros((4096, 16))  # std=1
        z = model.apply(
            {"params": params},
            jax.random.key(5),
            mu,
            logvar,
            method="reparameterize",
        )
        assert abs(float(z.mean()) - 2.0) < 0.02
        assert abs(float(z.std()) - 1.0) < 0.02

    def test_different_keys_different_samples(self, small_vae_and_params):
        model, params = small_vae_and_params
        x = jnp.asarray(
            np.random.default_rng(6).uniform(size=(1, 128, 128, 1)), jnp.float32
        )
        z1, *_ = model.apply({"params": params}, x, jax.random.key(1))
        z2, *_ = model.apply({"params": params}, x, jax.random.key(2))
        assert not np.allclose(np.asarray(z1), np.asarray(z2))

    def test_bf16_mixed_precision(self):
        """bf16 compute path: finite outputs, float32 latent heads."""
        model = VariationalAutoEncoderRawData(
            inplanes=4, latent_dim=16, dtype=jnp.bfloat16
        )
        x = jnp.asarray(
            np.random.default_rng(7).uniform(size=(2, 128, 128, 1)), jnp.float32
        )
        params = model.init({"params": jax.random.key(0)}, x, jax.random.key(1))[
            "params"
        ]
        z, x_hat, mu, std = model.apply({"params": params}, x, jax.random.key(2))
        assert mu.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(x_hat, dtype=np.float32)))
        # params stay f32
        leaf = jax.tree_util.tree_leaves(params)[0]
        assert leaf.dtype == jnp.float32

    def test_default_architecture_param_shapes(self):
        """Full-size channel plan matches model.py:109-150 for inplanes=32."""
        model = VariationalAutoEncoderRawData(inplanes=32, latent_dim=16)
        x = jnp.zeros((1, 128, 128, 1), jnp.float32)
        params = model.init({"params": jax.random.key(0)}, x, jax.random.key(1))[
            "params"
        ]
        enc = params["encoder"]
        assert enc["stage0_block0"]["conv"]["kernel"].shape == (3, 3, 1, 32)
        assert enc["stage1_block0"]["conv"]["kernel"].shape == (3, 3, 32, 64)
        assert enc["stage2_block0"]["conv"]["kernel"].shape == (3, 3, 64, 128)
        assert enc["stage4_block1"]["conv"]["kernel"].shape == (3, 3, 128, 128)
        assert params["mu"]["kernel"].shape == (2048, 16)
        assert params["logvar"]["kernel"].shape == (2048, 16)
        assert params["linear2"]["kernel"].shape == (16, 2048)
        dec = params["decoder"]
        assert dec["stage2_block1"]["conv"]["kernel"].shape == (3, 3, 128, 64)
        assert dec["logit_conv"]["kernel"].shape == (3, 3, 32, 1)


class TestScaledVariants:
    def test_deeper_stack_6_stages(self):
        """n_stages=6 on 256x256 inputs: deeper conv stack (BASELINE config 5)."""
        import jax, jax.numpy as jnp

        model = VariationalAutoEncoderRawData(
            inplanes=2, latent_dim=32, n_stages=6, bottleneck_hw=4
        )
        x = jnp.zeros((1, 256, 256, 1), jnp.float32)
        params = model.init({"params": jax.random.key(0)}, x, jax.random.key(1))[
            "params"
        ]
        z, x_hat, mu, std = model.apply({"params": params}, x, jax.random.key(2))
        assert mu.shape == (1, 32)
        assert x_hat.shape == (1, 256, 256, 1)
        assert "stage5_block0" in params["encoder"]

    def test_deeper_stack_128_input(self):
        """n_stages=6 on 128x128 -> 2x2 bottleneck."""
        import jax, jax.numpy as jnp

        model = VariationalAutoEncoderRawData(
            inplanes=2, latent_dim=8, n_stages=6, bottleneck_hw=2
        )
        x = jnp.zeros((1, 128, 128, 1), jnp.float32)
        params = model.init({"params": jax.random.key(0)}, x, jax.random.key(1))[
            "params"
        ]
        z, x_hat, mu, std = model.apply({"params": params}, x, jax.random.key(2))
        assert x_hat.shape == (1, 128, 128, 1)
        assert params["linear2"]["kernel"].shape == (8, 2 * 2 * 8)
