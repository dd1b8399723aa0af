"""Space-to-depth stem rewrite (asltpu.ops.stem_s2d): the transform must be
EXACT — values and gradients — vs the plain 7×7×7 stride-2 SAME conv, and
the I3D integration must keep the variable tree (checkpoint layout)
unchanged while producing identical logits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from asltpu.ops.stem_s2d import parity_pack, s2d_kernel7, stem_conv3d_s2d


def _ref_conv(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(x, w, (2, 2, 2), "SAME",
                                    dimension_numbers=dn)


@pytest.mark.parametrize("shape", [(2, 8, 16, 16, 3), (1, 4, 12, 20, 3),
                                   (1, 2, 8, 8, 5)])
def test_stem_s2d_exact_values(shape):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, shape, jnp.float32)
    w = jax.random.normal(kw, (7, 7, 7, shape[-1], 6), jnp.float32) * 0.1
    ref = _ref_conv(x, w)
    got = stem_conv3d_s2d(x, w)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_stem_s2d_exact_gradients():
    """The train path differentiates through the rewrite: d/dw and d/dx of
    the packed conv must match the plain conv's (pad/reshape/transpose are
    linear, so this holds exactly up to float assoc)."""
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (2, 4, 8, 8, 3), jnp.float32)
    w = jax.random.normal(kw, (7, 7, 7, 3, 4), jnp.float32) * 0.1

    def loss_ref(w, x):
        return jnp.sum(_ref_conv(x, w) ** 2)

    def loss_s2d(w, x):
        return jnp.sum(stem_conv3d_s2d(x, w) ** 2)

    gw_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(w, x)
    gw_got, gx_got = jax.grad(loss_s2d, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gw_got), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-3)


def test_parity_pack_roundtrip_order():
    """Channel packing order is [C, parity] with the NEW parity fastest —
    the order s2d_kernel7's reshape assumes."""
    x = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(1, 2, 4, 1, 3)
    y = parity_pack(x, 2)  # pack W axis (length 4 → 2, channels 3 → 6)
    assert y.shape == (1, 2, 2, 1, 6)
    # y[..., m, :, c*2+0] == x[..., 2m, :, c]; +1 → odd phase
    np.testing.assert_array_equal(np.asarray(y[0, 0, 0, 0]),
                                  np.asarray(x[0, 0, 0:2, 0]).T.reshape(-1))


def test_s2d_kernel_shape_and_zero_taps():
    w = jnp.ones((7, 7, 7, 3, 4), jnp.float32)
    wq = s2d_kernel7(w)
    assert wq.shape == (4, 4, 4, 24, 4)
    # Total mass preserved (zero-padded taps contribute nothing).
    assert float(jnp.sum(wq)) == pytest.approx(float(jnp.sum(w)))


def test_i3d_stem_integration_same_tree_and_logits():
    """The I3D stem now routes through the rewrite; the variable tree must
    be byte-identical in structure to the ConvBN layout (checkpoint/torch
    importer compatibility) and the fallback (odd dims) must agree with
    the packed path through the whole model."""
    from asltpu.models.i3d import I3D

    model = I3D(num_classes=7, remat=False, dtype=jnp.float32)
    # T=8: enough temporal extent to survive the pool pyramid (T=4 pools
    # to an empty axis and NaN-means in ANY I3D variant, packed or not).
    clip = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 32, 32, 3),
                             jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), clip)
    # Checkpoint layout: the stem kernel keeps its nn.Conv name and shape.
    k = variables["params"]["Conv3d_1a_7x7"]["unit"]["conv"]["kernel"]
    assert k.shape == (7, 7, 7, 3, 64)
    assert "bn" in variables["params"]["Conv3d_1a_7x7"]["unit"]
    # Even dims (packed path) vs odd-T fallback on the same weights: run
    # the SAME clip padded to compare stems directly is shape-dependent;
    # instead check the packed path is deterministic and finite, and that
    # an odd-H clip (fallback) still runs.
    out = model.apply(variables, clip, False)
    assert out.shape == (1, 7) and bool(jnp.isfinite(out).all())
    odd = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 30, 34, 3),
                            jnp.float32)
    out2 = model.apply(variables, odd, False)
    assert out2.shape == (1, 7) and bool(jnp.isfinite(out2).all())


def test_i3d_stem_packed_matches_fallback_conv():
    """Direct A/B of the two stem code paths on identical weights+input:
    the packed rewrite must equal the plain conv through _Conv7S2D."""
    from asltpu.models.i3d import _Conv7S2D

    m = _Conv7S2D(6, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 16, 16, 3),
                          jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    packed = m.apply(v, x)
    ref = _ref_conv(x, v["params"]["kernel"])
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
