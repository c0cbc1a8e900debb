"""Spherical-harmonic machinery (sim.sht): scipy ground truth, quadrature
exactness, Wigner-d identities, and the rotation theorem that pins the
entire convention stack the spherical indexer relies on."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.sim.sht import (
    dense_index,
    gauss_legendre_ring_grid,
    legendre_table,
    sph_coeffs_dense,
    sph_matrix_dense,
    wigner_d_table,
)


def _scipy_sph_harm(m, ell, theta_polar, phi_azimuth):
    import scipy.special as sp

    if hasattr(sp, "sph_harm_y"):  # scipy >= 1.15 signature
        return sp.sph_harm_y(ell, m, theta_polar, phi_azimuth)
    return sp.sph_harm(m, ell, phi_azimuth, theta_polar)


def _rand_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def _rand_real_coeffs(bandwidth, seed=1):
    """Hermitian-symmetric dense coefficients of a random REAL function."""
    rng = np.random.default_rng(seed)
    c0 = bandwidth - 1
    coef = np.zeros((bandwidth, 2 * bandwidth - 1), np.complex128)
    for ell in range(bandwidth):
        coef[ell, c0] = rng.normal()
        for m in range(1, ell + 1):
            v = rng.normal() + 1j * rng.normal()
            coef[ell, c0 + m] = v
            coef[ell, c0 - m] = (-1) ** m * np.conj(v)
    return coef


def _synthesize(coef, dirs):
    """f(d) = sum_lm coef_lm Y_lm(d) for dense coefficients (real f)."""
    bandwidth = coef.shape[0]
    yr, yi = sph_matrix_dense(bandwidth, dirs)  # conj(Y) = yr + i*yi
    y = yr - 1j * yi  # Y itself
    return (y @ coef.reshape(-1)).real


class TestLegendreAndY:
    def test_against_scipy(self):
        d = _rand_dirs(40)
        theta = np.arccos(d[:, 2])
        phi = np.arctan2(d[:, 1], d[:, 0])
        bandwidth = 12
        p = legendre_table(bandwidth, d[:, 2])
        for ell in (0, 1, 3, 7, 11):
            for m in range(0, ell + 1):
                mine = p[ell, m] * np.exp(1j * m * phi)
                ref = _scipy_sph_harm(m, ell, theta, phi)
                np.testing.assert_allclose(mine, ref, atol=1e-12)

    def test_orthonormality_by_quadrature(self):
        bandwidth = 10
        dirs, w = gauss_legendre_ring_grid(bandwidth)
        yr, yi = sph_matrix_dense(bandwidth, dirs, w)
        conj_y = yr + 1j * yi  # rows: points, cols: (l, m) dense
        yr0, yi0 = sph_matrix_dense(bandwidth, dirs)
        y_plain = yr0 - 1j * yi0
        gram = conj_y.T @ y_plain  # int conj(Y_a) Y_b
        c0 = bandwidth - 1
        m_dim = 2 * bandwidth - 1
        valid = np.zeros(bandwidth * m_dim, bool)
        for ell in range(bandwidth):
            valid[ell * m_dim + c0 - ell : ell * m_dim + c0 + ell + 1] = True
        sub = gram[np.ix_(valid, valid)]
        np.testing.assert_allclose(sub, np.eye(valid.sum()), atol=1e-10)

    def test_quadrature_analysis_roundtrip(self):
        bandwidth = 14
        coef = _rand_real_coeffs(bandwidth)
        dirs, w = gauss_legendre_ring_grid(bandwidth)
        f = _synthesize(coef, dirs)
        rec = sph_coeffs_dense(f, dirs, w, bandwidth)
        np.testing.assert_allclose(rec, coef, atol=1e-10)

    def test_dense_index_bounds(self):
        assert dense_index(3, -3, 8) == (3, 4)
        with pytest.raises(ValueError):
            dense_index(3, 4, 8)
        with pytest.raises(ValueError):
            dense_index(9, 0, 8)


class TestWignerD:
    def test_identity_at_zero(self):
        d = wigner_d_table(6, np.array([0.0]))[0]
        c0 = 5
        for ell in range(6):
            sl = slice(c0 - ell, c0 + ell + 1)
            np.testing.assert_allclose(
                d[ell][sl, sl], np.eye(2 * ell + 1), atol=1e-12
            )

    def test_l1_closed_form(self):
        beta = 0.7
        d = wigner_d_table(2, np.array([beta]))[0, 1]  # l=1 block, 3x3
        c, s = np.cos(beta), np.sin(beta)
        # Rows/cols ordered m = (-1, 0, +1) in the dense layout.
        expect = np.array(
            [
                [(1 + c) / 2, s / np.sqrt(2), (1 - c) / 2],
                [-s / np.sqrt(2), c, s / np.sqrt(2)],
                [(1 - c) / 2, -s / np.sqrt(2), (1 + c) / 2],
            ]
        )
        np.testing.assert_allclose(d, expect, atol=1e-12)

    def test_disk_cache_roundtrip(self, tmp_path):
        betas = np.array([0.3, 1.2, 2.4])
        fresh = wigner_d_table(7, betas, cache_dir=str(tmp_path))
        files = list(tmp_path.glob("wigner_L7_K3_*.npz"))
        assert len(files) == 1
        cached = wigner_d_table(7, betas, cache_dir=str(tmp_path))
        # Cache stores float32 (the precision the device tables use).
        np.testing.assert_allclose(cached, fresh, atol=1e-6)
        # A different beta grid must miss the cache, not alias it.
        other = wigner_d_table(7, betas + 0.01, cache_dir=str(tmp_path))
        assert not np.allclose(other, fresh)

    def test_orthogonal_and_composes(self):
        bandwidth = 9
        b1, b2 = 0.4, 0.9
        d = wigner_d_table(bandwidth, np.array([b1, b2, b1 + b2]))
        c0 = bandwidth - 1
        for ell in range(1, bandwidth):
            sl = slice(c0 - ell, c0 + ell + 1)
            a, b, ab = d[0, ell][sl, sl], d[1, ell][sl, sl], d[2, ell][sl, sl]
            np.testing.assert_allclose(a @ a.T, np.eye(len(a)), atol=1e-11)
            np.testing.assert_allclose(a @ b, ab, atol=1e-11)


class TestRotationTheorem:
    def test_coefficients_rotate_with_wigner_D(self):
        """[Λ(R)f]_lm = Σ_ν e^{−imα} d_mν(β) e^{−iνγ} f_lν for
        R = Rz(α)Ry(β)Rz(γ) and (Λ(R)f)(n) = f(R⁻¹n) — the convention
        contract the spherical indexer's correlation is built on."""
        bandwidth = 8
        coef = _rand_real_coeffs(bandwidth, seed=7)
        alpha, beta, gamma = 0.6, 1.1, -0.8
        rot = R.from_euler("ZYZ", [alpha, beta, gamma])
        d = wigner_d_table(bandwidth, np.array([beta]))[0]
        c0 = bandwidth - 1
        ms = np.arange(-c0, c0 + 1)
        phase_m = np.exp(-1j * ms * alpha)
        phase_n = np.exp(-1j * ms * gamma)
        rotated = np.einsum(
            "m,lmv,v,lv->lm", phase_m, d, phase_n, coef
        )
        dirs = _rand_dirs(50, seed=3)
        lhs = _synthesize(rotated, dirs)
        rhs = _synthesize(coef, rot.inv().apply(dirs))
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)
