"""Numerical parity: torch reference checkpoint -> flax params.

Builds the reference architecture in torch (compactly, from the SURVEY spec of
latice/model.py:109-150), converts its random-init state dict, and checks that
encode / decode outputs agree within the 1e-4 north-star tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

from latice_tpu.models import VariationalAutoEncoderRawData
from latice_tpu.models.torch_import import torch_state_dict_to_flax

RNG = np.random.default_rng(0)


def build_reference_torch_model(inplanes: int = 8, latent_dim: int = 16):
    """The reference VAE graph (latice/model.py:83-150), built compactly."""
    p = inplanes

    def block(i, o):
        return nn.Sequential(nn.Conv2d(i, o, 3, 1, 1), nn.InstanceNorm2d(o), nn.LeakyReLU(0.02))

    def tblock(i, o):
        return nn.Sequential(
            nn.ConvTranspose2d(i, o, 3, 1, 1), nn.InstanceNorm2d(o), nn.LeakyReLU(0.02)
        )

    up = nn.UpsamplingNearest2d(scale_factor=2)
    pool = nn.MaxPool2d(2, 2)

    enc_channels = [(1, p), (p, p), (p, 2 * p), (2 * p, 2 * p), (2 * p, 4 * p),
                    (4 * p, 4 * p), (4 * p, 4 * p), (4 * p, 4 * p), (4 * p, 4 * p), (4 * p, 4 * p)]
    enc_layers = []
    for j, (ci, co) in enumerate(enc_channels):
        enc_layers.append(block(ci, co))
        if j % 2 == 1:
            enc_layers.append(pool)

    dec_channels = [(4 * p, 4 * p), (4 * p, 4 * p), (4 * p, 4 * p), (4 * p, 4 * p),
                    (4 * p, 4 * p), (4 * p, 2 * p), (2 * p, 2 * p), (2 * p, p), (p, p)]
    dec_layers = []
    for j, (ci, co) in enumerate(dec_channels):
        if j % 2 == 0:
            dec_layers.append(up)
        dec_layers.append(tblock(ci, co))
    dec_layers.append(nn.Conv2d(p, 1, 3, 1, 1))

    model = nn.Module()
    model.encoder = nn.Sequential(*enc_layers)
    model.mu = nn.Sequential(nn.Linear(p * 4 * 4 * 4, latent_dim))
    model.logvar = nn.Sequential(nn.Linear(p * 4 * 4 * 4, latent_dim))
    model.linear2 = nn.Sequential(nn.Linear(latent_dim, p * 4 * 4 * 4))
    model.decoder = nn.Sequential(*dec_layers)
    return model


@pytest.fixture(scope="module")
def models():
    inplanes, latent = 8, 16
    tmodel = build_reference_torch_model(inplanes, latent)
    tmodel.eval()
    params = torch_state_dict_to_flax(tmodel.state_dict(), inplanes, latent)
    fmodel = VariationalAutoEncoderRawData(inplanes=inplanes, latent_dim=latent)
    return tmodel, fmodel, params, inplanes


class TestTorchImportParity:
    def test_encode_parity(self, models):
        tmodel, fmodel, params, _ = models
        x = RNG.uniform(size=(2, 128, 128, 1)).astype(np.float32)
        with torch.no_grad():
            h = tmodel.encoder(torch.from_numpy(np.moveaxis(x, -1, 1)))
            t_mu = tmodel.mu(h.flatten(1, -1)).numpy()
            t_logvar = tmodel.logvar(h.flatten(1, -1)).numpy()
        f_mu, f_logvar = fmodel.apply({"params": params}, jnp.asarray(x), method="encode")
        np.testing.assert_allclose(np.asarray(f_mu), t_mu, atol=1e-4)
        np.testing.assert_allclose(np.asarray(f_logvar), t_logvar, atol=1e-4)

    def test_decode_parity(self, models):
        tmodel, fmodel, params, inplanes = models
        z = RNG.normal(size=(2, 16)).astype(np.float32)
        with torch.no_grad():
            h = tmodel.linear2(torch.from_numpy(z))
            t_xhat = tmodel.decoder(h.view(2, 4 * inplanes, 4, 4)).numpy()
        f_xhat = fmodel.apply({"params": params}, jnp.asarray(z), method="decode")
        f_nchw = np.moveaxis(np.asarray(f_xhat), -1, 1)
        np.testing.assert_allclose(f_nchw, t_xhat, atol=2e-4)

    def test_encoder_feature_map_parity(self, models):
        """Intermediate check: the raw 4x4 feature maps must agree too."""
        tmodel, fmodel, params, _ = models
        x = RNG.uniform(size=(1, 128, 128, 1)).astype(np.float32)
        with torch.no_grad():
            t_h = tmodel.encoder(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
        f_h = fmodel.apply(
            {"params": params}, jnp.asarray(x), method=lambda m, x: m.encoder(x)
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(f_h), -1, 1), t_h, atol=1e-4
        )

    def test_lightning_prefix_stripped(self, models):
        tmodel, _, _, _ = models
        sd = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
        params = torch_state_dict_to_flax(sd, 8, 16)
        assert "encoder" in params and "logit_conv" in params["decoder"]
