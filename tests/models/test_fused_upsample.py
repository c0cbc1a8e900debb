"""Fused upsample+ConvTranspose decoder path: value/grad/checkpoint parity.

The fused path replaces every `_upsample_nearest_2x` + ConvTranspose3x3
pair with one lhs-dilated conv over a composed 4x4 kernel
(models.vae._FusedUpsampleConvTranspose) — same parameters, same math,
no materialized 4x-size intermediate.
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from latice_tpu.models import VariationalAutoEncoderRawData
from latice_tpu.models.vae import Decoder

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def decoder_setup():
    x = jnp.asarray(RNG.normal(size=(2, 4, 4, 8)).astype(np.float32))
    dec = Decoder(inplanes=2, fuse_upsample=False)  # the reference path
    params = dec.init(jax.random.key(0), x)["params"]
    return x, dec, params


class TestFusedUpsample:
    def test_values_match_unfused(self, decoder_setup):
        x, dec, params = decoder_setup
        y_plain = dec.apply({"params": params}, x)
        y_fused = Decoder(inplanes=2, fuse_upsample=True).apply(
            {"params": params}, x
        )
        np.testing.assert_allclose(
            np.asarray(y_plain), np.asarray(y_fused), atol=5e-5
        )

    def test_param_tree_identical(self, decoder_setup):
        """Fused inits produce the same tree — checkpoints interchange."""
        x, _, params = decoder_setup
        pf = Decoder(inplanes=2, fuse_upsample=True).init(
            jax.random.key(0), x
        )["params"]
        assert jtu.tree_structure(params) == jtu.tree_structure(pf)
        assert jtu.tree_all(
            jtu.tree_map(lambda a, b: jnp.allclose(a, b), params, pf)
        )

    def test_gradients_match_unfused(self, decoder_setup):
        x, dec, params = decoder_setup

        def loss(p, module):
            return (module.apply({"params": p}, x) ** 2).mean()

        g_plain = jax.grad(loss)(params, dec)
        g_fused = jax.grad(loss)(params, Decoder(inplanes=2, fuse_upsample=True))
        flat_p, _ = jtu.tree_flatten(g_plain)
        flat_f, _ = jtu.tree_flatten(g_fused)
        for a, b in zip(flat_p, flat_f):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5
            )

    def test_env_toggle_on_full_model(self, monkeypatch):
        """The fused path is default-on; LATICE_TPU_FUSED_UPSAMPLE=0
        restores the materialized-upsample path with matching outputs."""
        model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=8)
        x = jnp.asarray(RNG.uniform(size=(2, 128, 128, 1)).astype(np.float32))
        params = model.init(
            {"params": jax.random.key(0)}, x, jax.random.key(1)
        )["params"]
        z = jnp.asarray(RNG.normal(size=(2, 8)).astype(np.float32))
        monkeypatch.setenv("LATICE_TPU_FUSED_UPSAMPLE", "0")
        y0 = model.apply({"params": params}, z, method="decode")
        monkeypatch.setenv("LATICE_TPU_FUSED_UPSAMPLE", "1")
        y1 = model.apply({"params": params}, z, method="decode")
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=5e-5)
