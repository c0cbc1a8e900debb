"""Dynamical master patterns: scattering-factor/potential physics, the
two-beam closed form, point-group invariance, and the master integration."""

import math

import numpy as np
import pytest

from latice_tpu.sim import (
    AtomSite,
    CrystalStructure,
    channeling_intensities,
    cubic_structure,
    dynamical_beams,
    dynamical_master_pattern,
    electron_wavelength,
    hexagonal_structure,
    render_from_master,
)
from latice_tpu.sim import wurtzite_structure, zincblende_structure
from latice_tpu.sim.dynamical import (
    _BOHR_A,
    DynamicalBeams,
    fourier_potential,
    fourier_potential_complex,
    wentzel_form_factor,
)


class TestFormFactor:
    def test_forward_value(self):
        # f(0) = 2 Z R^2 / a0 for the Wentzel model (module docstring).
        z = 28
        r = 0.885 * _BOHR_A * z ** (-1 / 3)
        np.testing.assert_allclose(
            wentzel_form_factor(z)(np.zeros(1))[0],
            2 * z * r * r / _BOHR_A,
            rtol=1e-12,
        )

    def test_rutherford_limit(self):
        # Large-s tail: f -> Z / (8 pi^2 a0 s^2), screening-independent.
        s = np.asarray([25.0])
        for z in (13, 28, 74):
            np.testing.assert_allclose(
                wentzel_form_factor(z)(s)[0],
                z / (8 * math.pi**2 * _BOHR_A * s[0] ** 2),
                rtol=2e-3,
            )

    def test_monotone_decreasing(self):
        s = np.linspace(0.0, 3.0, 50)
        f = wentzel_form_factor(26)(s)
        assert np.all(np.diff(f) < 0)


class TestPotentials:
    def test_fcc_extinctions(self):
        ni = cubic_structure("fcc", "ni", 3.52).centered_sites()
        forbidden = fourier_potential(ni, [[1, 0, 0], [1, 1, 0], [2, 1, 0]], 20.0)
        np.testing.assert_allclose(forbidden, 0.0, atol=1e-12)
        allowed = fourier_potential(ni, [[1, 1, 1], [2, 0, 0]], 20.0)
        assert np.all(np.abs(allowed) > 1e-3)

    def test_symmetry_equivalents_equal(self):
        ni = cubic_structure("fcc", "ni", 3.52).centered_sites()
        fam = fourier_potential(
            ni, [[1, 1, 1], [-1, 1, 1], [1, -1, -1], [1, 1, -1]], 20.0
        )
        np.testing.assert_allclose(fam, fam[0], rtol=1e-12)

    def test_relativistic_scaling(self):
        ni = cubic_structure("fcc", "ni", 3.52).centered_sites()
        u20 = fourier_potential(ni, [[1, 1, 1]], 20.0)[0]
        u30 = fourier_potential(ni, [[1, 1, 1]], 30.0)[0]
        np.testing.assert_allclose(
            u30 / u20, (1 + 30 / 511) / (1 + 20 / 511), rtol=1e-12
        )

    def test_mean_inner_potential_positive_and_refraction(self):
        beams = dynamical_beams(cubic_structure(), n_beams=9, max_hkl=2)
        assert beams.u0 > 0
        assert beams.k_int > 1.0 / electron_wavelength(20.0)

    def test_hcp_centering_preserves_magnitude(self):
        # |U_g| must be origin-independent: the centered (real, cosine-sum)
        # value equals the |complex structure sum| at the raw origin.
        ti = hexagonal_structure()
        centered = ti.centered_sites()
        frac = np.array([s.frac for s in centered.sites])
        assert np.allclose(
            np.sort(frac % 1.0, axis=0),
            np.sort((-frac) % 1.0, axis=0),
            atol=1e-9,
        )
        for hkl in ([1, 0, 1], [0, 0, 2], [1, 0, 0], [1, 0, 3]):
            u_centered = fourier_potential(centered, [hkl], 20.0)[0]
            # independent complex evaluation at the raw origin
            g = np.asarray(hkl) @ ti.reciprocal_basis
            s = np.linalg.norm(g) / 2.0
            total = 0.0 + 0.0j
            for site in ti.sites:
                phase = 2 * np.pi * np.dot(hkl, site.frac)
                total += (
                    site.factor(np.asarray([s]))[0]
                    * np.exp(-site.debye_waller * s * s)
                    * np.exp(1j * phase)
                )
            u_raw = (1 + 20 / 511) / (np.pi * ti.volume) * abs(total)
            np.testing.assert_allclose(abs(u_centered), u_raw, rtol=1e-9)

    def test_non_centrosymmetric_has_no_inversion_center(self):
        # centered_sites still raises at its own API level (the fast real
        # path genuinely needs an inversion center) — dynamical_beams is
        # what falls back to the complex-Hermitian path for these.
        zincblende = CrystalStructure(
            5.65, 5.65, 5.65,
            sites=(
                AtomSite(31, (0, 0, 0)),
                AtomSite(33, (0.25, 0.25, 0.25)),
            ),
        )
        with pytest.raises(NotImplementedError, match="inversion"):
            zincblende.centered_sites()

    def test_zincblende_structure_factor_selection(self):
        # GaAs: F(200) ∝ f_Ga − f_As (small, near-Z neighbors), F(111) ∝
        # f_Ga − i·f_As (modulus √(f_Ga²+f_As²), large) — the classic
        # polar-crystal signature the complex sum must reproduce.
        gaas = zincblende_structure()
        u111 = fourier_potential_complex(gaas, [[1, 1, 1]], 20.0)[0]
        u200 = fourier_potential_complex(gaas, [[2, 0, 0]], 20.0)[0]
        assert abs(u111.imag) > 0.1 * abs(u111.real)
        assert abs(u200) < 0.3 * abs(u111)

    def test_hermitian_conjugate_pairs(self):
        # Real-space potential is real → U_{-g} = conj(U_g) exactly.
        gaas = zincblende_structure()
        hkl = np.asarray([[1, 1, 1], [2, 2, 0], [3, 1, 1], [1, 0, 3]])
        up = fourier_potential_complex(gaas, hkl, 20.0)
        um = fourier_potential_complex(gaas, -hkl, 20.0)
        np.testing.assert_allclose(um, up.conj(), rtol=1e-12)

    def test_real_potential_is_real_part(self):
        gan = wurtzite_structure()
        hkl = np.asarray([[1, 0, 1], [0, 0, 2], [1, 1, 0]])
        np.testing.assert_allclose(
            fourier_potential(gan, hkl, 20.0),
            fourier_potential_complex(gan, hkl, 20.0).real,
            rtol=1e-12,
        )


class TestBeamSelection:
    def test_transmitted_beam_first(self):
        beams = dynamical_beams(cubic_structure(), n_beams=15, max_hkl=2)
        assert np.all(beams.hkl[0] == 0)
        assert len(beams) <= 15

    def test_whole_families_and_point_group_closure(self):
        beams = dynamical_beams(cubic_structure(), n_beams=40, max_hkl=3)
        sel = {tuple(h) for h in beams.hkl.tolist()}
        # Cubic point-group closure in index space: signed permutations.
        import itertools

        for perm in itertools.permutations(range(3)):
            for signs in itertools.product((-1, 1), repeat=3):
                for h in beams.hkl:
                    img = tuple(int(signs[i] * h[perm[i]]) for i in range(3))
                    assert img in sel, (tuple(h), img)

    def test_coupling_symmetric_zero_diagonal(self):
        beams = dynamical_beams(cubic_structure(), n_beams=15, max_hkl=2)
        np.testing.assert_allclose(beams.coupling, beams.coupling.T)
        np.testing.assert_allclose(np.diag(beams.coupling), 0.0)
        # Backscatter moment matrix: unit diagonal, PSD.
        np.testing.assert_allclose(np.diag(beams.backscatter), 1.0, rtol=1e-6)
        evals = np.linalg.eigvalsh(beams.backscatter.astype(np.float64))
        assert evals.min() > -1e-6


class TestTwoBeamClosedForm:
    def test_matches_analytic(self):
        # Hand-built two-beam system: M = [[0, w], [w, s]]; the test-side
        # evaluation is an independent numpy derivation.
        a_lat, kv = 3.52, 20.0
        lam = electron_wavelength(kv)
        k = 1.0 / lam
        g = np.array([[0.0, 0.0, 0.0], [1 / a_lat, 1 / a_lat, 1 / a_lat]])
        w = 2.6e-3  # coupling U/(2k), 1/Angstrom
        b_off = 0.4
        beams = DynamicalBeams(
            hkl=np.array([[0, 0, 0], [1, 1, 1]], np.int32),
            g=g.astype(np.float32),
            coupling=np.array([[0, w], [w, 0]], np.float32),
            backscatter=np.array([[1, b_off], [b_off, 1]], np.float32),
            k_int=k,
            u0=0.05,
        )
        depth_nm, kappa = 40.0, 0.1
        q_scale = kappa * beams.u0 / (2 * k)
        z0 = depth_nm * 10.0
        gn = g[1] / np.linalg.norm(g[1])
        t = np.array([1.0, -1.0, 0.0]) / np.sqrt(2.0)
        thetas = np.linspace(-0.06, 0.06, 41)
        dirs = np.cos(thetas)[:, None] * t + np.sin(thetas)[:, None] * gn

        got = channeling_intensities(
            dirs, beams, depth_nm=depth_nm, absorption_ratio=kappa, chunk=41
        )

        want = np.empty_like(got)
        for i, d in enumerate(dirs):
            s = float(d @ g[1] - g[1] @ g[1] / (2 * k))
            m = np.array([[0.0, w], [w, s]])
            vals, vecs = np.linalg.eigh(m)
            del vals
            total = 0.0
            for j in range(2):
                v = vecs[:, j]
                alpha2 = v[0] ** 2
                sigma = 1.0 + 2.0 * b_off * v[0] * v[1]
                total += alpha2 * sigma / (1 + 2 * np.pi * q_scale * z0 * sigma)
            want[i] = total
        np.testing.assert_allclose(got, want, rtol=2e-4)

    def test_band_localized_contrast(self):
        # Contrast concentrates around the Kossel cones (|theta| within a
        # couple of Bragg angles); far outside the profile is flat.
        beams = dynamical_beams(cubic_structure(), n_beams=9, max_hkl=1)
        g111 = np.asarray([1, 1, 1]) / 3.52
        theta_b = math.asin(
            electron_wavelength(20.0) * np.linalg.norm(g111) / 2.0
        )
        gn = g111 / np.linalg.norm(g111)
        t = np.array([1.0, -1.0, 0.0]) / np.sqrt(2.0)
        near = np.linspace(-2 * theta_b, 2 * theta_b, 61)
        far = np.linspace(6 * theta_b, 9 * theta_b, 61)

        def profile(thetas):
            dirs = np.cos(thetas)[:, None] * t + np.sin(thetas)[:, None] * gn
            return channeling_intensities(dirs, beams, chunk=61)

        p_near, p_far = profile(near), profile(far)
        assert np.ptp(p_near) > 5.0 * np.ptp(p_far)


class TestPointGroupInvariance:
    def test_cubic_invariance(self):
        from scipy.spatial.transform import Rotation as R

        from latice_tpu.crystal import ROTATION_GROUPS

        beams = dynamical_beams(cubic_structure(), n_beams=27, max_hkl=2)
        rng = np.random.default_rng(7)
        d = rng.normal(size=(16, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        base = channeling_intensities(d, beams, chunk=16)
        quats = np.asarray(ROTATION_GROUPS["432"])  # scalar-first (w,x,y,z)
        mats = R.from_quat(np.roll(quats, -1, axis=1)).as_matrix()
        for rot in mats:
            got = channeling_intensities(d @ rot.T, beams, chunk=16)
            np.testing.assert_allclose(got, base, rtol=5e-3, atol=1e-6)


class TestHermitianPath:
    """Non-centrosymmetric structures: complex-Hermitian Bloch matrix
    solved through the 2N real embedding (sim/dynamical.py module
    docstring). Closes the EMEBSDmaster-role gap for polar/chiral phases
    (GaAs, GaN, quartz-class) flagged in round 3."""

    def test_beams_complex_hermitian_and_live(self):
        gaas = dynamical_beams(zincblende_structure(), n_beams=27, max_hkl=2)
        assert not gaas.is_centrosymmetric
        c = gaas.coupling + 1j * gaas.coupling_imag
        np.testing.assert_allclose(c, c.conj().T, atol=1e-7)
        np.testing.assert_allclose(np.diag(c), 0.0)
        assert np.abs(gaas.coupling_imag).max() > 1e-4  # genuinely complex
        b = gaas.backscatter + 1j * gaas.backscatter_imag
        np.testing.assert_allclose(b, b.conj().T, atol=1e-7)
        np.testing.assert_allclose(np.diag(b.real), 1.0, rtol=1e-6)
        evals = np.linalg.eigvalsh(b.astype(np.complex128))
        assert evals.min() > -1e-6  # PSD Hermitian moment matrix

    def test_centro_structures_keep_fast_path(self):
        beams = dynamical_beams(cubic_structure(), n_beams=15, max_hkl=2)
        assert beams.is_centrosymmetric
        assert beams.coupling_imag is None and beams.backscatter_imag is None

    def test_forced_embedding_matches_real_path(self):
        # Zero imaginary parts: the 2N embedding must reproduce the real
        # N-beam kernel exactly (both partners of each eigenpair carry the
        # same excitation/overlap; the 0.5 sum-over-2N equals the N-sum).
        import dataclasses

        beams = dynamical_beams(cubic_structure(), n_beams=15, max_hkl=2)
        rng = np.random.default_rng(3)
        d = rng.normal(size=(16, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        base = channeling_intensities(d, beams, chunk=16)
        zeros = np.zeros_like(beams.coupling)
        forced = dataclasses.replace(
            beams, coupling_imag=zeros, backscatter_imag=zeros
        )
        emb = channeling_intensities(d, forced, chunk=16)
        np.testing.assert_allclose(emb, base, rtol=2e-4, atol=1e-6)

    def test_two_beam_complex_closed_form(self):
        # Hand-built complex two-beam system checked against an
        # independent numpy complex-Hermitian derivation.
        a_lat, kv = 5.65, 20.0
        lam = electron_wavelength(kv)
        k = 1.0 / lam
        g = np.array([[0.0, 0.0, 0.0], [1 / a_lat, 1 / a_lat, 1 / a_lat]])
        w = 1.8e-3 + 1.1e-3j  # complex coupling U/(2k), 1/Angstrom
        b_off = 0.3 + 0.2j
        beams = DynamicalBeams(
            hkl=np.array([[0, 0, 0], [1, 1, 1]], np.int32),
            g=g.astype(np.float32),
            coupling=np.array([[0, w.real], [w.real, 0]], np.float32),
            backscatter=np.array(
                [[1, b_off.real], [b_off.real, 1]], np.float32
            ),
            k_int=k,
            u0=0.05,
            coupling_imag=np.array([[0, w.imag], [-w.imag, 0]], np.float32),
            backscatter_imag=np.array(
                [[0, b_off.imag], [-b_off.imag, 0]], np.float32
            ),
        )
        depth_nm, kappa = 40.0, 0.1
        q_scale = kappa * beams.u0 / (2 * k)
        z0 = depth_nm * 10.0
        gn = g[1] / np.linalg.norm(g[1])
        t = np.array([1.0, -1.0, 0.0]) / np.sqrt(2.0)
        thetas = np.linspace(-0.06, 0.06, 41)
        dirs = np.cos(thetas)[:, None] * t + np.sin(thetas)[:, None] * gn

        got = channeling_intensities(
            dirs, beams, depth_nm=depth_nm, absorption_ratio=kappa, chunk=41
        )

        bmat = np.array([[1.0, b_off], [np.conj(b_off), 1.0]])
        want = np.empty_like(got)
        for i, d in enumerate(dirs):
            s = float(d @ g[1] - g[1] @ g[1] / (2 * k))
            m = np.array([[0.0, w], [np.conj(w), s]])
            _, vecs = np.linalg.eigh(m)
            total = 0.0
            for j in range(2):
                v = vecs[:, j]
                alpha2 = abs(v[0]) ** 2
                sigma = float(np.real(v.conj() @ bmat @ v))
                total += alpha2 * sigma / (1 + 2 * np.pi * q_scale * z0 * sigma)
            want[i] = total
        np.testing.assert_allclose(got, want, rtol=3e-4)

    def test_zincblende_point_group_invariance(self):
        # F-43m's proper rotation subgroup is T ("23"); the master
        # intensity field must be invariant under all 12 rotations.
        from scipy.spatial.transform import Rotation as R

        from latice_tpu.crystal import ROTATION_GROUPS

        beams = dynamical_beams(zincblende_structure(), n_beams=27, max_hkl=2)
        rng = np.random.default_rng(11)
        d = rng.normal(size=(12, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        base = channeling_intensities(d, beams, chunk=12)
        quats = np.asarray(ROTATION_GROUPS["23"])  # scalar-first
        mats = R.from_quat(np.roll(quats, -1, axis=1)).as_matrix()
        for rot in mats:
            got = channeling_intensities(d @ rot.T, beams, chunk=12)
            np.testing.assert_allclose(got, base, rtol=5e-3, atol=1e-6)

    def test_wurtzite_sixfold_invariance(self):
        # P6₃mc: the 6₃ screw's point part acts on U_g as an origin-shift
        # gauge phase, so I(d) keeps full 6-fold symmetry about c.
        from scipy.spatial.transform import Rotation as R

        beams = dynamical_beams(wurtzite_structure(), n_beams=15, max_hkl=2)
        assert not beams.is_centrosymmetric
        rng = np.random.default_rng(5)
        d = rng.normal(size=(8, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        base = channeling_intensities(d, beams, chunk=8)
        rot = R.from_rotvec([0, 0, math.radians(60.0)]).as_matrix()
        got = channeling_intensities(d @ rot.T, beams, chunk=8)
        np.testing.assert_allclose(got, base, rtol=5e-3, atol=1e-6)


class TestMasterPattern:
    def test_shape_range_nonconstant(self):
        img = dynamical_master_pattern(
            cubic_structure(), size=33, n_beams=15, max_hkl=2, chunk=128
        )
        assert img.shape == (33, 33)
        assert np.all(np.isfinite(img))
        assert img.min() == 0.0 and img.max() == 1.0
        assert img.std() > 0.01

    def test_renders_through_master_lookup(self):
        img = dynamical_master_pattern(
            cubic_structure(), size=33, n_beams=15, max_hkl=2, chunk=128
        )
        from latice_tpu.sim import DetectorGeometry

        pats = render_from_master(
            img,
            np.asarray([[1.0, 0.0, 0.0, 0.0], [0.5, 0.5, 0.5, 0.5]]),
            DetectorGeometry(shape=(32, 32)),
        )
        assert pats.shape == (2, 32, 32)
        assert np.all(np.isfinite(pats))
        assert pats.std() > 0.01

    def test_hcp_master(self):
        img = dynamical_master_pattern(
            hexagonal_structure(), size=21, n_beams=13, max_hkl=2, chunk=128
        )
        assert np.all(np.isfinite(img))
        assert img.std() > 0.01

    def test_zincblende_master(self):
        # Non-centrosymmetric master end-to-end (GaAs via the Hermitian
        # embedding), consumable by render_from_master.
        img = dynamical_master_pattern(
            zincblende_structure(), size=21, n_beams=15, max_hkl=2, chunk=128
        )
        assert img.shape == (21, 21)
        assert np.all(np.isfinite(img))
        assert img.std() > 0.01
        from latice_tpu.sim import DetectorGeometry

        pats = render_from_master(
            img,
            np.asarray([[1.0, 0.0, 0.0, 0.0]]),
            DetectorGeometry(shape=(24, 24)),
        )
        assert np.all(np.isfinite(pats)) and pats.std() > 0.01


class TestMeshSharding:
    def test_mesh_master_bit_matches_single_device(self):
        """Direction chunks shard over the mesh (VERDICT r4 #7): every
        direction's Bloch eigh is independent, so the mesh result must
        be IDENTICAL to single-device."""
        import jax

        from latice_tpu.parallel import make_mesh
        from latice_tpu.sim import cubic_structure, dynamical_master_pattern

        s = cubic_structure("fcc", "ni", a=3.52)
        mesh = make_mesh(min(8, jax.local_device_count()))
        one = dynamical_master_pattern(s, size=17, n_beams=16, chunk=64)
        sharded = dynamical_master_pattern(
            s, size=17, n_beams=16, chunk=64, mesh=mesh
        )
        np.testing.assert_array_equal(sharded, one)

    def test_mesh_chunk_must_divide(self):
        import jax

        from latice_tpu.parallel import make_mesh
        from latice_tpu.sim import cubic_structure
        from latice_tpu.sim.dynamical import (
            channeling_intensities,
            dynamical_beams,
        )

        s = cubic_structure("fcc", "ni", a=3.52)
        beams = dynamical_beams(s, n_beams=16)
        mesh = make_mesh(min(8, jax.local_device_count()))
        with pytest.raises(ValueError, match="divide"):
            channeling_intensities(
                np.zeros((6, 3)) + [0, 0, 1.0], beams, chunk=6, mesh=mesh
            )
