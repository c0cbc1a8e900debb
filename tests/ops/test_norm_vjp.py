"""Analytic-VJP InstanceNorm+LeakyReLU (plain XLA): value + gradient parity.

The op is the model's default norm path (vae._norm_act); its forward must
match the unfused composition to f32 roundoff (the one-pass variance of
ops/lane_stats.py computes E[x^2]-E[x]^2 where jnp.var re-reads for
E[(x-mean)^2] — bitwise equality holds at bf16 output precision) and its
closed-form backward must match autodiff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latice_tpu.ops.norm_vjp import instance_norm_leaky_relu_xla


def _rng(seed: int = 0) -> np.random.Generator:
    """Per-test generator: inputs must not depend on test execution order
    (a shared module RNG made marginal-tolerance tests order-flaky)."""
    return np.random.default_rng(seed)


def reference_impl(x, eps=1e-5, slope=0.02):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return jnp.where(y >= 0, y, slope * y)


class TestNormVjpXla:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_forward_matches_reference(self, dtype):
        rng = _rng(10)
        x = jnp.asarray(rng.normal(size=(4, 16, 16, 8)) * 3 + 1, dtype)
        got = jax.jit(instance_norm_leaky_relu_xla)(x)
        want = jax.jit(reference_impl)(x)
        assert got.dtype == want.dtype
        if dtype == jnp.bfloat16:
            # f32-roundoff reorder differences vanish at bf16 precision.
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        else:
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=5e-6
            )

    def test_one_pass_moments_match_plain(self):
        """spatial_moments == plain mean/E[x^2], and the one-pass variance
        matches jnp.var to f32 roundoff at realistic activation scales."""
        from latice_tpu.ops.lane_stats import spatial_moments

        rng = _rng(11)
        for c in (8, 32, 64, 128):
            x = jnp.asarray(
                rng.normal(size=(3, 16, 8, c)) * 2 + 0.5, jnp.float32
            )
            mean, ex2 = jax.jit(spatial_moments)(x)
            np.testing.assert_allclose(
                np.asarray(mean),
                np.asarray(jnp.mean(x, axis=(1, 2), keepdims=True)),
                atol=2e-6, err_msg=f"C={c}",
            )
            var = np.maximum(np.asarray(ex2 - mean * mean), 0.0)
            np.testing.assert_allclose(
                var,
                np.asarray(jnp.var(x, axis=(1, 2), keepdims=True)),
                atol=2e-5, err_msg=f"C={c}",
            )

    def test_gradient_matches_autodiff_f32(self):
        rng = _rng(12)
        x = jnp.asarray(rng.normal(size=(3, 8, 8, 4)), jnp.float32)
        g_got = jax.jit(
            jax.grad(lambda x: instance_norm_leaky_relu_xla(x).sum())
        )(x)
        g_want = jax.jit(jax.grad(lambda x: reference_impl(x).sum()))(x)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), atol=1e-5
        )

    def test_gradient_weighted_cotangent(self):
        """Non-uniform upstream gradient (the real training case)."""
        rng = _rng(13)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
        g_got = jax.jit(
            jax.grad(lambda x: (instance_norm_leaky_relu_xla(x) * w).sum())
        )(x)
        g_want = jax.jit(jax.grad(lambda x: (reference_impl(x) * w).sum()))(x)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), atol=1e-5
        )

    def test_model_default_path_uses_it(self, monkeypatch):
        """The model's train step under the default env produces the same
        loss as the autodiff path (trajectory-level pin)."""
        from latice_tpu.models import VariationalAutoEncoderRawData
        from latice_tpu.train import VAELoss, create_train_state, make_train_step

        rng = _rng(14)
        x = jnp.asarray(rng.uniform(size=(4, 128, 128, 1)), jnp.float32)
        key = jax.random.key(0)
        losses = {}
        for env in ("0", "1"):
            monkeypatch.setenv("LATICE_TPU_NORM_VJP", env)
            m = VariationalAutoEncoderRawData(inplanes=2, latent_dim=8)
            params = m.init({"params": jax.random.key(1)}, x[:1], key)["params"]
            state = create_train_state(m, params, learning_rate=1e-3)
            step = make_train_step(VAELoss(5e-6), donate=False)
            for _ in range(3):
                state, metrics = step(state, x, key)
            losses[env] = float(metrics["loss"])
        # Routing/integration pin, not a numerics pin (those are the per-op
        # tests above at 1e-5): the two paths differ by f32 roundoff that
        # three Adam steps amplify to ~3e-5 rel; a wrong VJP would diverge
        # at O(1).
        assert losses["0"] == pytest.approx(losses["1"], rel=1e-3)


class TestRematModes:
    @pytest.mark.parametrize("remat", ["block", "stage"])
    def test_outputs_and_grads_match_none(self, remat):
        from latice_tpu.models import VariationalAutoEncoderRawData
        from latice_tpu.train import VAELoss

        rng = _rng(15)
        x = jnp.asarray(rng.uniform(size=(2, 128, 128, 1)), jnp.float32)
        key = jax.random.key(0)
        lf = VAELoss(5e-6)
        outs, grads = {}, {}
        m0 = VariationalAutoEncoderRawData(inplanes=2, latent_dim=8)
        params = m0.init({"params": jax.random.key(1)}, x[:1], key)["params"]
        for mode in ["none", remat]:
            m = VariationalAutoEncoderRawData(inplanes=2, latent_dim=8, remat=mode)
            # identical param trees: remat must not change parameter names
            tree = m.init({"params": jax.random.key(1)}, x[:1], key)["params"]
            assert jax.tree_util.tree_structure(tree) == jax.tree_util.tree_structure(params)

            def loss(p, m=m):
                z, xh, mu, std = m.apply({"params": p}, x, key)
                return lf(z, xh, mu, std, x)["loss"]

            outs[mode] = float(jax.jit(loss)(params))
            grads[mode] = np.asarray(
                jax.tree_util.tree_leaves(jax.jit(jax.grad(loss))(params))[0]
            )
        assert outs[remat] == pytest.approx(outs["none"], rel=1e-6)
        np.testing.assert_allclose(grads[remat], grads["none"], atol=1e-6)
