"""GND density: rotation vectors, analytic curvature fields, masking."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.crystal import GndResult, gnd_density, lattice_curvature
from latice_tpu.crystal.gnd import _rotation_vector

import jax.numpy as jnp


def _grad_map(axis, c_deg_per_px, h=8, w=10, along="east", seed=0):
    """Orientation map with constant lattice curvature: the lattice rotates
    about sample axis ``axis`` by c_deg_per_px per pixel along one map
    direction. g(x) = g0 * R(axis, -theta(x)) (sample->crystal convention:
    the lattice rotation a->b in sample coords is then R(axis, c*dx))."""
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    g0 = R.random(random_state=np.random.default_rng(seed))
    pos = np.arange(w) if along == "east" else np.arange(h)
    euler = np.empty((h, w, 3))
    for i in range(h):
        for j in range(w):
            t = np.radians(c_deg_per_px) * (j if along == "east" else i)
            g = g0 * R.from_rotvec(-t * axis)
            euler[i, j] = g.as_euler("zxz", degrees=True)
    return euler


class TestRotationVector:
    def test_scipy_parity(self):
        rng = np.random.default_rng(0)
        rv = rng.normal(scale=0.02, size=(50, 3))  # ~1-3 deg rotations
        q = np.roll(R.from_rotvec(rv).as_quat(), 1, axis=-1)
        got = np.asarray(_rotation_vector(jnp.asarray(q, jnp.float64)))
        # jax runs f32 here (no x64): ~1e-8 abs floor on ~0.03-rad vectors.
        np.testing.assert_allclose(got, rv, atol=3e-8)

    def test_tiny_angle_stable(self):
        rv = np.asarray([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
        q = np.roll(R.from_rotvec(rv).as_quat(), 1, axis=-1)
        got = np.asarray(_rotation_vector(jnp.asarray(q, jnp.float64)))
        np.testing.assert_allclose(got, rv, atol=1e-15)

    def test_hemisphere_independent(self):
        rv = np.asarray([0.01, -0.02, 0.005])
        q = np.roll(R.from_rotvec(rv).as_quat(), 1)
        a = np.asarray(_rotation_vector(jnp.asarray(q)))
        b = np.asarray(_rotation_vector(jnp.asarray(-q)))
        np.testing.assert_allclose(a, b, atol=1e-7)


class TestLatticeCurvature:
    def test_uniform_map_zero_curvature(self):
        euler = np.tile([12.0, 34.0, 56.0], (5, 6, 1))
        k1, k2, valid = lattice_curvature(euler, step_um=1.0)
        assert valid[:-1, :-1].all()
        assert not valid[-1, :].any() and not valid[:, -1].any()
        # f32 quaternion storage floors curvature noise at ~0.5 rad/m per
        # 1-um step (~1e9 1/m^2 density) — far below real EBSD angular noise.
        np.testing.assert_allclose(k1[valid], 0.0, atol=1.0)  # rad/m
        np.testing.assert_allclose(k2[valid], 0.0, atol=1.0)

    @pytest.mark.parametrize("axis", [(0, 0, 1), (1, 2, 2)])
    def test_constant_gradient_east(self, axis):
        c = 0.05  # deg per pixel
        euler = _grad_map(axis, c, along="east")
        k1, k2, valid = lattice_curvature(euler, step_um=2.0)
        n = np.asarray(axis, float)
        n /= np.linalg.norm(n)
        expect = np.radians(c) / 2e-6 * n  # rad/m, along the axis
        got = k1[valid]
        np.testing.assert_allclose(
            got, np.broadcast_to(expect, got.shape), rtol=0.02, atol=20.0
        )
        np.testing.assert_allclose(k2[valid], 0.0, atol=20.0)

    def test_constant_gradient_south(self):
        c = 0.08
        euler = _grad_map((0, 1, 0), c, along="south")
        k1, k2, valid = lattice_curvature(euler, step_um=1.0)
        expect = np.radians(c) / 1e-6
        np.testing.assert_allclose(k2[valid][:, 1], expect, rtol=0.02)
        np.testing.assert_allclose(k1[valid], 0.0, atol=20.0)

    def test_errors(self):
        with pytest.raises(ValueError, match="Euler grid"):
            lattice_curvature(np.zeros((5, 3)))
        with pytest.raises(ValueError, match="at least 2x2"):
            lattice_curvature(np.zeros((1, 5, 3)))
        with pytest.raises(ValueError, match="step_um"):
            lattice_curvature(np.zeros((4, 4, 3)), step_um=0.0)


class TestGndDensity:
    def test_tilt_field_density(self):
        """Pure gradient along x1: rho = |d theta / dx| / b exactly (the
        textbook one-dimensional bound), independent of the rotation axis."""
        c, step, b = 0.05, 1.0, 0.25
        euler = _grad_map((1, 1, 1), c, along="east")
        res = gnd_density(euler, step_um=step, burgers_nm=b)
        expect = np.radians(c) / (step * 1e-6) / (b * 1e-9)
        got = res.density[res.valid]
        np.testing.assert_allclose(got, expect, rtol=0.02)

    def test_alpha_entries_001_axis(self):
        """Gradient about [001] along east: only kappa_31 is nonzero, which
        lands in alpha_13; alpha_33 = -kappa_11 = 0."""
        c = 0.05
        euler = _grad_map((0, 0, 1), c, along="east")
        res = gnd_density(euler, step_um=1.0, burgers_nm=0.25)
        a = res.alpha[res.valid]
        expect = np.radians(c) / 1e-6
        np.testing.assert_allclose(a[:, 1], expect, rtol=0.02)  # alpha_13
        for k in (0, 2, 3, 4):
            np.testing.assert_allclose(a[:, k], 0.0, atol=0.02 * expect)

    def test_symmetry_invariance(self):
        """Replacing orientations by crystal-symmetry equivalents leaves the
        density unchanged (the reduction picks the small rotation)."""
        euler = _grad_map((1, 0, 2), 0.06, along="east", seed=3)
        res0 = gnd_density(euler, step_um=1.0)
        # rotate the right half's orientations by a 90-deg cubic operator
        from latice_tpu.crystal.csl import _qmul_np
        from latice_tpu.crystal.symmetry import symmetry_quats

        sym = np.asarray(symmetry_quats("432"), np.float64)
        q = np.roll(
            R.from_euler("zxz", euler.reshape(-1, 3), degrees=True).as_quat(),
            1,
            axis=-1,
        )
        q2 = q.copy().reshape(euler.shape[:2] + (4,))
        q2[:, 5:] = _qmul_np(sym[7], q2[:, 5:].reshape(-1, 4)).reshape(
            q2[:, 5:].shape
        )
        euler2 = R.from_quat(
            np.roll(q2.reshape(-1, 4), -1, axis=-1)
        ).as_euler("zxz", degrees=True).reshape(euler.shape)
        res2 = gnd_density(euler2, step_um=1.0)
        np.testing.assert_allclose(
            res2.density[res2.valid], res0.density[res0.valid], rtol=0.05,
            atol=1e10,
        )

    def test_boundary_masked(self):
        euler = np.tile([10.0, 20.0, 30.0], (6, 8, 1))
        euler[:, 4:] = [80.0, 60.0, 40.0]
        res = gnd_density(euler, step_um=1.0, threshold_deg=5.0)
        assert not res.valid[:, 3].any()  # boundary column: east diff crosses
        assert res.valid[:-1, :3].all() and res.valid[:-1, 4:-1].all()
        assert np.isnan(res.density[0, 3])
        np.testing.assert_allclose(res.density[res.valid], 0.0, atol=1e10)

    def test_result_type_and_burgers_error(self):
        res = gnd_density(np.zeros((3, 3, 3)))
        assert isinstance(res, GndResult)
        with pytest.raises(ValueError, match="burgers_nm"):
            gnd_density(np.zeros((3, 3, 3)), burgers_nm=-1.0)
