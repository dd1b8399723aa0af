"""Fused MBConv kernel vs the flax InvertedResidual block (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asltpu.models.mobilenetv2 import InvertedResidual
from asltpu.ops.mbconv_pallas import fold_bn, fused_mbconv_s1


def _randomized_block_vars(rng_key, block, x):
    v = block.init(rng_key, x)
    # Randomize BN stats so folding bugs can't hide behind mean-0/var-1.
    key = jax.random.PRNGKey(99)
    stats = v["batch_stats"]
    def rand_stats(tree):
        out = {}
        for k, sub in tree.items():
            if k == "mean":
                out[k] = jax.random.normal(key, sub.shape) * 0.1
            elif k == "var":
                out[k] = jax.random.uniform(key, sub.shape) + 0.5
            else:
                out[k] = rand_stats(sub)
        return out
    return {"params": v["params"], "batch_stats": rand_stats(stats)}


def _folded_args(v):
    p, s = v["params"], v["batch_stats"]
    w1, b1 = fold_bn(
        p["expand"]["conv"]["kernel"][0, 0],  # [Cin, Ce]
        p["expand"]["bn"]["scale"], p["expand"]["bn"]["bias"],
        s["expand"]["bn"]["mean"], s["expand"]["bn"]["var"],
    )
    dw, b2 = fold_bn(
        p["depthwise"]["conv"]["kernel"][:, :, 0, :],  # [3, 3, Ce]
        p["depthwise"]["bn"]["scale"], p["depthwise"]["bn"]["bias"],
        s["depthwise"]["bn"]["mean"], s["depthwise"]["bn"]["var"],
    )
    w2, b3 = fold_bn(
        p["project"]["conv"]["kernel"][0, 0],  # [Ce, Cout]
        p["project"]["bn"]["scale"], p["project"]["bn"]["bias"],
        s["project"]["bn"]["mean"], s["project"]["bn"]["var"],
    )
    return w1, b1, dw, b2, w2, b3


@pytest.mark.parametrize("cin,cout,res", [(16, 16, True), (16, 24, False)])
def test_fused_mbconv_matches_flax(cin, cout, res):
    block = InvertedResidual(cout, stride=1, expand_ratio=6, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, cin), jnp.float32)
    v = _randomized_block_vars(jax.random.PRNGKey(1), block, x)
    want = np.asarray(block.apply(v, x, False))
    got = np.asarray(
        fused_mbconv_s1(x, *_folded_args(v), use_res=res, row_tile=8,
                        interpret=True)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)
