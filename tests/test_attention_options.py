"""Attention/FFN/flow option coverage: block_length banding, proximal bias,
proximal init, gelu FFN, no_jacobian invconv (reference option surface)."""

import numpy as np

import jax
import jax.numpy as jnp

from glow_tts_train_tpu.ops import attention, flows


def make_xm(b=2, t=12, c=8, seed=0):
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, (b, t, c), jnp.float32)
    mask = jnp.ones((b, t, 1), jnp.float32)
    return x, mask


def test_block_length_bands_attention():
    x, mask = make_xm()
    attn_mask = mask[:, :, 0][:, None, :] * mask[:, :, 0][:, :, None]
    params = attention.mha_init(jax.random.PRNGKey(1), 8, 8, 2, window_size=4)

    out_full = attention.mha_apply(
        params, x, x, attn_mask, n_heads=2, window_size=4
    )
    out_banded = attention.mha_apply(
        params, x, x, attn_mask, n_heads=2, window_size=4, block_length=2
    )
    assert not np.allclose(np.asarray(out_full), np.asarray(out_banded))

    # with a band wider than the sequence, banding is a no-op
    out_wide = attention.mha_apply(
        params, x, x, attn_mask, n_heads=2, window_size=4, block_length=100
    )
    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(out_wide), atol=1e-6
    )


def test_proximal_bias_changes_scores():
    x, mask = make_xm()
    attn_mask = mask[:, :, 0][:, None, :] * mask[:, :, 0][:, :, None]
    params = attention.mha_init(jax.random.PRNGKey(2), 8, 8, 2, window_size=None)
    out = attention.mha_apply(params, x, x, attn_mask, n_heads=2)
    out_prox = attention.mha_apply(
        params, x, x, attn_mask, n_heads=2, proximal_bias=True
    )
    assert not np.allclose(np.asarray(out), np.asarray(out_prox))


def test_proximal_init_copies_q_to_k():
    params = attention.mha_init(
        jax.random.PRNGKey(3), 8, 8, 2, window_size=None, proximal_init=True
    )
    np.testing.assert_array_equal(
        np.asarray(params["q"]["w"]), np.asarray(params["k"]["w"])
    )


def test_ffn_gelu_activation():
    x, mask = make_xm()
    params = attention.ffn_init(jax.random.PRNGKey(4), 8, 8, 16, 3)
    out_relu = attention.ffn_apply(params, x, mask)
    out_gelu = attention.ffn_apply(params, x, mask, activation="gelu")
    assert not np.allclose(np.asarray(out_relu), np.asarray(out_gelu))


def test_invconv_no_jacobian():
    params = flows.invconv_init(jax.random.PRNGKey(5), 4)
    x, mask = make_xm(c=8)
    _, logdet = flows.invconv_apply(params, x, mask, no_jacobian=True)
    np.testing.assert_array_equal(np.asarray(logdet), 0.0)


def test_sigmoid_scale_coupling_invertible():
    params = flows.coupling_init(jax.random.PRNGKey(6), 8, 16, 3, 2)
    # make the coupling non-trivial
    params["end"]["w"] = jax.random.normal(jax.random.PRNGKey(7), params["end"]["w"].shape) * 0.3
    x, mask = make_xm(c=8)
    z, logdet = flows.coupling_apply(
        params, x, mask, None, 16, 1, 2, sigmoid_scale=True, reverse=False
    )
    x_rec, _ = flows.coupling_apply(
        params, z, mask, None, 16, 1, 2, sigmoid_scale=True, reverse=True
    )
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)
    assert np.isfinite(np.asarray(logdet)).all()


def test_heads_share_false_per_head_embeddings():
    """Per-head rel-pos embeddings must align with heads, not sum over them."""
    x, mask = make_xm()
    attn_mask = mask[:, :, 0][:, None, :] * mask[:, :, 0][:, :, None]
    params = attention.mha_init(
        jax.random.PRNGKey(8), 8, 8, 2, window_size=4, heads_share=False
    )
    assert params["emb_rel_k"].shape[0] == 2
    out = attention.mha_apply(params, x, x, attn_mask, n_heads=2, window_size=4)
    assert np.isfinite(np.asarray(out)).all()

    # making head-1's rel-k embedding huge must change the output (it would
    # be washed into a head-sum under the old broken einsum too, so instead
    # check per-head isolation: zeroing head-0's table changes the result
    # differently than zeroing head-1's)
    p0 = dict(params); p0["emb_rel_k"] = params["emb_rel_k"].at[0].set(0.0)
    p1 = dict(params); p1["emb_rel_k"] = params["emb_rel_k"].at[1].set(0.0)
    out0 = attention.mha_apply(p0, x, x, attn_mask, n_heads=2, window_size=4)
    out1 = attention.mha_apply(p1, x, x, attn_mask, n_heads=2, window_size=4)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))
