"""Stage-0 megakernel parity vs the model's ConvBlock composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latice_tpu.models import ConvBlock
from latice_tpu.ops.stage0_fused import fused_stage0_apply, pack_weights, stage0_fused

RNG = np.random.default_rng(0)
C = 8  # small channel count for CPU interpret-mode speed (structure identical)


@pytest.fixture(scope="module")
def reference_blocks():
    """Two ConvBlocks + pool, exactly the encoder's stage 0."""
    import flax.linen as nn

    class Stage0(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ConvBlock(C, name="stage0_block0")(x)
            x = ConvBlock(C, name="stage0_block1")(x)
            return nn.max_pool(x, (2, 2), strides=(2, 2))

    model = Stage0()
    x = jnp.zeros((4, 32, 32, 1), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    return model, params


def run_fused(params, x, pack=4):
    w1 = np.asarray(params["stage0_block0"]["conv"]["kernel"])
    b1 = np.asarray(params["stage0_block0"]["conv"]["bias"])
    w2 = np.asarray(params["stage0_block1"]["conv"]["kernel"])
    b2 = np.asarray(params["stage0_block1"]["conv"]["bias"])
    packed = [jnp.asarray(a) for a in pack_weights(w1, b1, w2, b2, pack=pack)]
    return stage0_fused(jnp.asarray(x), *packed, interpret=True, pack=pack)


class TestStage0Fused:
    def test_matches_reference_blocks(self, reference_blocks):
        model, params = reference_blocks
        x = RNG.uniform(size=(4, 32, 32, 1)).astype(np.float32)
        want = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        got = np.asarray(run_fused(params, x), dtype=np.float32)
        assert got.shape == want.shape
        # bf16 staging bounds the agreement (~1e-2 relative).
        np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)

    def test_batch_eight_two_groups(self, reference_blocks):
        model, params = reference_blocks
        x = RNG.uniform(size=(8, 32, 32, 1)).astype(np.float32)
        want = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        got = np.asarray(run_fused(params, x), dtype=np.float32)
        np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)

    def test_images_independent(self, reference_blocks):
        """Lane packing must not leak between the 4 packed images."""
        _, params = reference_blocks
        x = RNG.uniform(size=(4, 32, 32, 1)).astype(np.float32)
        base = np.asarray(run_fused(params, x), dtype=np.float32)
        x2 = x.copy()
        x2[1] = RNG.uniform(size=(32, 32, 1))  # change only image 1
        out2 = np.asarray(run_fused(params, x2), dtype=np.float32)
        np.testing.assert_array_equal(base[0], out2[0])
        np.testing.assert_array_equal(base[2], out2[2])
        np.testing.assert_array_equal(base[3], out2[3])
        assert not np.array_equal(base[1], out2[1])

    @pytest.mark.parametrize("pack", [1, 2])
    def test_smaller_lane_packs(self, reference_blocks, pack):
        """pack=2 is the C=64 scaled layout; pack=1 the C=128 layout."""
        model, params = reference_blocks
        x = RNG.uniform(size=(4, 32, 32, 1)).astype(np.float32)
        want = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        got = np.asarray(run_fused(params, x, pack=pack), dtype=np.float32)
        np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)

    def test_rejects_bad_batch(self, reference_blocks):
        _, params = reference_blocks
        with pytest.raises(ValueError, match="divide"):
            run_fused(params, RNG.uniform(size=(6, 32, 32, 1)).astype(np.float32))

    def test_fused_apply_helper(self, reference_blocks):
        model, params = reference_blocks
        x = RNG.uniform(size=(4, 32, 32, 1)).astype(np.float32)
        got = np.asarray(
            fused_stage0_apply(params, jnp.asarray(x), interpret=True),
            dtype=np.float32,
        )
        want = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)
