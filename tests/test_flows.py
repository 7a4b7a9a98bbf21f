"""Flow bijector tests: inverse∘forward ≡ identity, and logdet vs an
autodiff Jacobian on tiny shapes (SURVEY.md §4 test plan)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glow_tts_train_tpu.ops import flows


def small_hyper(**kw):
    defaults = dict(
        in_channels=4,
        hidden_channels=8,
        kernel_size=3,
        dilation_rate=1,
        n_blocks=2,
        n_layers=2,
        p_dropout=0.0,
        n_split=4,
        n_sqz=2,
        sigmoid_scale=False,
        gin_channels=0,
    )
    defaults.update(kw)
    return flows.DecoderHyper(**defaults)


def make_inputs(rng, b, t, c, lengths=None):
    x = jax.random.normal(rng, (b, t, c), jnp.float32)
    if lengths is None:
        mask = jnp.ones((b, t, 1), jnp.float32)
    else:
        mask = (jnp.arange(t)[None, :, None] < jnp.asarray(lengths)[:, None, None]).astype(
            jnp.float32
        )
    return x * mask, mask


@pytest.mark.parametrize("lengths", [None, [8, 6, 4]])
def test_decoder_roundtrip(lengths):
    hp = small_hyper()
    rng = jax.random.PRNGKey(0)
    params = flows.decoder_init(rng, hp)
    x, mask = make_inputs(jax.random.PRNGKey(1), 3, 8, hp.in_channels, lengths)

    z, logdet = flows.decoder_fwd(params, x, mask, hp)
    x_rec, _ = flows.decoder_inv(params, z, mask, hp)

    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    assert logdet.shape == (3,)
    assert np.isfinite(np.asarray(logdet)).all()


def test_decoder_logdet_vs_jacobian():
    """logdet from the flow must equal slogdet of the full Jacobian."""
    hp = small_hyper(n_blocks=1)
    params = flows.decoder_init(jax.random.PRNGKey(2), hp)
    # perturb away from the identity-coupling init so logdet is non-trivial
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(20), len(leaves))
    leaves = [
        a + 0.2 * jax.random.normal(k, a.shape, a.dtype)
        for a, k in zip(leaves, keys)
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    b, t, c = 1, 4, hp.in_channels
    x, mask = make_inputs(jax.random.PRNGKey(3), b, t, c)

    def f(flat):
        y = flat.reshape(1, t, c)
        z, _ = flows.decoder_fwd(params, y, mask, hp)
        return z.reshape(-1)

    jac = jax.jacfwd(f)(x.reshape(-1))
    _, expected = np.linalg.slogdet(np.asarray(jac))
    _, logdet = flows.decoder_fwd(params, x, mask, hp)
    np.testing.assert_allclose(float(logdet[0]), expected, rtol=1e-3, atol=1e-3)


def test_actnorm_ddi_normalizes():
    x, mask = make_inputs(jax.random.PRNGKey(4), 4, 16, 6, lengths=[16, 12, 8, 5])
    x = x * 3.0 + 1.5
    an = flows.actnorm_ddi_stats(x, mask)
    z, _ = flows.actnorm_fwd(an, x, mask)
    zf = np.asarray(z)
    mf = np.asarray(mask)
    denom = mf.sum()
    mean = (zf * mf).sum(axis=(0, 1)) / denom
    var = (zf ** 2 * mf).sum(axis=(0, 1)) / denom - mean ** 2
    np.testing.assert_allclose(mean, 0.0, atol=1e-5)
    np.testing.assert_allclose(var, 1.0, atol=1e-4)


def test_squeeze_roundtrip_and_ordering():
    x, mask = make_inputs(jax.random.PRNGKey(5), 2, 10, 3, lengths=[10, 6])
    sq, sq_mask = flows.squeeze(x, mask, 2)
    assert sq.shape == (2, 5, 6)
    # channel block j holds time offset j (reference utils.py:140-141 ordering)
    xs = np.asarray(x)
    np.testing.assert_allclose(np.asarray(sq)[0, :, 3:], xs[0, 1::2, :], atol=0)
    np.testing.assert_allclose(np.asarray(sq)[0, :, :3], xs[0, 0::2, :], atol=0)
    un, un_mask = flows.unsqueeze(sq, sq_mask, 2)
    np.testing.assert_allclose(np.asarray(un), xs * np.asarray(un_mask), atol=0)


def test_invconv_logdet_and_inverse():
    params = flows.invconv_init(jax.random.PRNGKey(6), 4)
    w = np.asarray(params["weight"])
    assert np.linalg.det(w) > 0
    np.testing.assert_allclose(w @ w.T, np.eye(4), atol=1e-5)

    # perturb so the determinant is non-trivial (orthogonal init has logdet≈0)
    params = {
        "weight": params["weight"]
        + 0.3 * jax.random.normal(jax.random.PRNGKey(13), (4, 4))
    }
    w = np.asarray(params["weight"])
    x, mask = make_inputs(jax.random.PRNGKey(7), 2, 6, 8)
    z, logdet = flows.invconv_apply(params, x, mask, reverse=False)
    x_rec, _ = flows.invconv_apply(params, z, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    expected = np.linalg.slogdet(w)[1] * (8 / 4) * 6
    np.testing.assert_allclose(np.asarray(logdet), expected, rtol=1e-4, atol=1e-4)


def test_coupling_identity_at_init():
    """Zero-init end conv ⇒ coupling is the identity at init
    (attentions.py:102-106)."""
    params = flows.coupling_init(jax.random.PRNGKey(8), 8, 16, 3, 2)
    x, mask = make_inputs(jax.random.PRNGKey(9), 2, 6, 8)
    z, logdet = flows.coupling_apply(
        params, x, mask, None, 16, 1, 2, reverse=False
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(logdet), 0.0, atol=1e-6)


def test_gin_conditioning_changes_output():
    hp = small_hyper(gin_channels=4)
    params = flows.decoder_init(jax.random.PRNGKey(10), hp)
    # make coupling non-trivial: randomize the zero-init end conv
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jax.random.normal(jax.random.PRNGKey(11), a.shape, a.dtype)
        if a.dtype == jnp.float32
        else a,
        params,
    )
    x, mask = make_inputs(jax.random.PRNGKey(12), 2, 8, hp.in_channels)
    g1 = jnp.ones((2, 1, 4)) * 0.5
    g2 = -g1
    z1, _ = flows.decoder_fwd(params, x, mask, hp, g=g1)
    z2, _ = flows.decoder_fwd(params, x, mask, hp, g=g2)
    assert not np.allclose(np.asarray(z1), np.asarray(z2))
    # still invertible with conditioning
    x_rec, _ = flows.decoder_inv(params, z1, mask, hp, g=g1)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
