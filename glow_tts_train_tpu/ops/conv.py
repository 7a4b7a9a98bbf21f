"""1-D convolutions (channels-last) with torch-compatible initialization and
optional weight-norm parametrization.

Parity targets in the reference:
* torch ``nn.Conv1d`` default init (kaiming-uniform a=sqrt(5) == U(±1/sqrt(fan_in)))
  used throughout `layers.py` / `attentions.py` / `models.py`
* ``torch.nn.utils.weight_norm`` (dim=0, i.e. per-out-channel g over (in, k))
  used on WN convs (`layers.py:113,125,135`) and the coupling ``start`` conv
  (`attentions.py:100`).

Params are plain dicts (pytrees):
  plain conv:        {"w": [k, c_in, c_out], "b": [c_out]}
  weight-normed:     {"v": [k, c_in, c_out], "g": [c_out], "b": [c_out]}

Activations are ``[b, t, c]``; weights use 'HIO' so XLA maps the conv onto the
MXU as k shifted matmuls.
"""

import math
import typing

import jax
import jax.numpy as jnp

# "xla" (conv_general_dilated) or "shifted" (sum of shifted matmuls);
# benchmark-selected default, overridable for experiments.
_CONV_IMPL = "xla"


def set_conv_impl(impl: str) -> None:
    global _CONV_IMPL
    assert impl in ("xla", "shifted"), impl
    _CONV_IMPL = impl


def torch_conv_init(
    rng: jax.Array, kernel_size: int, c_in: int, c_out: int
) -> typing.Dict[str, jnp.ndarray]:
    """torch nn.Conv1d default init: U(±1/sqrt(fan_in)) for weight and bias."""
    k_w, k_b = jax.random.split(rng)
    fan_in = c_in * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(
        k_w, (kernel_size, c_in, c_out), minval=-bound, maxval=bound, dtype=jnp.float32
    )
    b = jax.random.uniform(
        k_b, (c_out,), minval=-bound, maxval=bound, dtype=jnp.float32
    )
    return {"w": w, "b": b}


def xavier_uniform_conv_init(
    rng: jax.Array, kernel_size: int, c_in: int, c_out: int
) -> typing.Dict[str, jnp.ndarray]:
    """Xavier-uniform weight (attentions.py:192-202) + torch-default bias."""
    k_w, k_b = jax.random.split(rng)
    fan_in = c_in * kernel_size
    fan_out = c_out * kernel_size
    bound_w = math.sqrt(6.0 / (fan_in + fan_out))
    w = jax.random.uniform(
        k_w,
        (kernel_size, c_in, c_out),
        minval=-bound_w,
        maxval=bound_w,
        dtype=jnp.float32,
    )
    bound_b = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(
        k_b, (c_out,), minval=-bound_b, maxval=bound_b, dtype=jnp.float32
    )
    return {"w": w, "b": b}


def zero_conv_init(
    kernel_size: int, c_in: int, c_out: int
) -> typing.Dict[str, jnp.ndarray]:
    """Zero-initialized conv (coupling ``end`` attentions.py:104-106, prenet
    ``proj`` layers.py:70-71)."""
    return {
        "w": jnp.zeros((kernel_size, c_in, c_out), jnp.float32),
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def weight_norm_init(
    rng: jax.Array, kernel_size: int, c_in: int, c_out: int
) -> typing.Dict[str, jnp.ndarray]:
    """Weight-normed conv params; g = ||v|| so the initial effective weight
    equals the torch-default init (matches torch.nn.utils.weight_norm)."""
    p = torch_conv_init(rng, kernel_size, c_in, c_out)
    v = p["w"]
    g = jnp.sqrt(jnp.sum(v * v, axis=(0, 1)))  # [c_out], norm over (k, c_in)
    return {"v": v, "g": g, "b": p["b"]}


def weight_norm_effective(params: typing.Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Effective weight w = g * v / ||v|| (computed in fp32)."""
    v = params["v"].astype(jnp.float32)
    g = params["g"].astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
    return v * (g[None, None, :] / jnp.maximum(norm, 1e-12))


def remove_weight_norm(params: typing.Dict[str, jnp.ndarray]) -> typing.Dict[str, jnp.ndarray]:
    """Fold weight norm into a plain conv (reference ``store_inverse`` /
    ``remove_weight_norm`` equivalent, layers.py:164-170)."""
    return {"w": weight_norm_effective(params), "b": params["b"]}


def conv1d(
    x: jnp.ndarray,
    params: typing.Dict[str, jnp.ndarray],
    dilation: int = 1,
    padding: typing.Optional[int] = None,
) -> jnp.ndarray:
    """Apply a 1-D conv to channels-last x [b, t, c_in] -> [b, t, c_out].

    ``padding=None`` means torch-style symmetric "same" padding
    ``(k*d - d)//2`` (the reference uses this everywhere).

    Implementation selectable via ``set_conv_impl`` ("xla" = NHC
    conv_general_dilated, "shifted" = sum of k time-shifted MXU matmuls) —
    the two differ only in fp summation order; the faster one varies by
    backend/shape and is picked empirically.
    """
    if "v" in params:
        w = weight_norm_effective(params)
    else:
        w = params["w"]
    k = w.shape[0]
    if padding is None:
        padding = (k * dilation - dilation) // 2
    w = w.astype(x.dtype)
    t = x.shape[1]

    if k == 1:
        # output stays in the compute dtype — fp32 intermediates here would
        # balloon HBM traffic (MXU still accumulates fp32 internally)
        out = jnp.einsum("btc,co->bto", x, w[0])
        return out + params["b"].astype(x.dtype)[None, None, :]

    if _CONV_IMPL == "shifted":
        xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
        out = None
        for tap in range(k):
            start = tap * dilation
            sl = xp[:, start : start + t]
            if sl.shape[1] < t:  # asymmetric edge (even k): zero-pad tail
                sl = jnp.pad(sl, ((0, 0), (0, t - sl.shape[1]), (0, 0)))
            y = jnp.einsum("btc,co->bto", sl, w[tap])
            out = y if out is None else out + y
        return out + params["b"].astype(x.dtype)[None, None, :]

    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out + params["b"].astype(x.dtype)[None, None, :]
