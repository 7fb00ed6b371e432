"""ops/packed_conv.py: the 2x2-output-packed 3x3 conv must be the exact
same function as the plain conv (same terms, float-reduction-order
tolerance), and the HRNet wiring (TPU.HRNET_PACKED_MAX_CH) must keep the
parameter tree bit-identical so checkpoints/converters are unaffected."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_view_active_learning_tpu.ops.packed_conv import (
    pack_kernel_2x2,
    packed_conv3x3,
)


@pytest.mark.parametrize("c_in,c_out", [(32, 32), (3, 8), (64, 32)])
def test_packed_conv_matches_plain_conv(c_in, c_out):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 12, c_in)), jnp.float32)
    k = jnp.asarray(
        rng.standard_normal((3, 3, c_in, c_out)) * 0.1, jnp.float32
    )
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = packed_conv3x3(x, k)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pack_kernel_structure():
    k = jnp.arange(3 * 3 * 2 * 4, dtype=jnp.float32).reshape(3, 3, 2, 4)
    w4 = pack_kernel_2x2(k)
    assert w4.shape == (4, 4, 2, 16)
    # Sub-position (a, b) block equals the kernel shifted by (a, b).
    for a in (0, 1):
        for b in (0, 1):
            blk = (a * 2 + b) * 4
            sub = np.asarray(w4[:, :, :, blk : blk + 4])
            np.testing.assert_array_equal(sub[a : a + 3, b : b + 3], k)
            mask = np.ones((4, 4), bool)
            mask[a : a + 3, b : b + 3] = False
            assert (sub[mask] == 0).all()


def test_hrnet_packed_same_params_same_output():
    from multi_view_active_learning_tpu.models.hrnet import (
        PoseHighResolutionNet,
    )

    kwargs = dict(
        num_joints=3,
        stage2=(1, 2, "BASIC", (2, 2), (8, 16)),
        stage3=(1, 3, "BASIC", (2, 2, 2), (8, 16, 32)),
        stage4=(1, 4, "BASIC", (2, 2, 2, 2), (8, 16, 32, 64)),
    )
    plain = PoseHighResolutionNet(**kwargs)
    packed = PoseHighResolutionNet(packed_max_channels=16, **kwargs)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 64, 64, 3)),
        jnp.float32,
    )
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)
    # Identical parameter tree: packed declares the same [3,3,C,C] kernels.
    vp = packed.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(vp) == jax.tree_util.tree_structure(
        variables
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(vp), jax.tree_util.tree_leaves(variables)
    ):
        assert a.shape == b.shape and a.dtype == b.dtype

    out_plain = plain.apply(variables, x, train=False)
    out_packed = packed.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_packed), np.asarray(out_plain), rtol=1e-4, atol=1e-4
    )


def test_hrnet_packed_odd_spatial_falls_back():
    """Tiny inputs reach odd branch resolutions; packing must fall back to
    the plain conv there instead of asserting."""
    from multi_view_active_learning_tpu.models.hrnet import (
        PoseHighResolutionNet,
    )

    model = PoseHighResolutionNet(
        num_joints=2,
        stage2=(1, 2, "BASIC", (1, 1), (4, 8)),
        stage3=(1, 3, "BASIC", (1, 1, 1), (4, 8, 16)),
        stage4=(1, 4, "BASIC", (1, 1, 1, 1), (4, 8, 16, 32)),
        packed_max_channels=999,  # pack everything even-shaped
    )
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)  # branch 3 is 1x1
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 8, 8, 2)
