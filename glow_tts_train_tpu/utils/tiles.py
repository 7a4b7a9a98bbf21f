"""MXU tile-quantization model: the achievable-MFU ceiling per config.

The MXU is a 128x128 systolic array; a matmul [M,K]x[K,N] spends
ceil(K/128) x ceil(N/128) tile-passes regardless of how full the edge
tiles are.  MFU (analytic useful FLOPs / peak) therefore has a ceiling of

    useful_flops / tile_quantized_flops

before any scheduling, fusion, or bandwidth effect.  For the base config
the dominant WN matmuls contract over 192 channels — two K-tiles, the
second half empty — so their ceiling is 192/256 = 0.75; the large config
(256-wide) tiles exactly, which is why it reaches 0.92 measured while
base plateaus at ~0.71 (BASELINE.md round 4c).

This module mirrors utils/flops.py term-for-term with every contraction
(K) and output (N) dimension rounded up to the 128 lane width (M = b*t is
thousands of rows at bench shapes; its edge tile is negligible and left
unquantized).  Convolutions are counted two ways, bracketing the real
lowering:

* ``im2col``  — one matmul with K = k*c_in (XLA's TPU conv lowering):
  quantizes k*c_in once.  Optimistic for k>1.
* ``per_tap`` — k shifted matmuls with K = c_in each (the Pallas WN
  kernel's structure): quantizes c_in k times.  Pessimistic.

``mfu_ceiling`` returns both bounds; a measured MFU inside or near the
band means the gap to 1.0 is tile quantization — a property of the
model's channel widths, not recoverable by kernel engineering without
changing the model (or mapping two half-tiles of different ops onto one
pass, which neither XLA nor Mosaic does).
"""

import math

from .flops import model_flops, remat_recomputes_decoder

LANE = 128


def _q(n: int) -> int:
    """Round a contraction/output dim up to the MXU lane width."""
    return LANE * math.ceil(n / LANE)


def _conv_q(b, t, k, c_in, c_out, per_tap: bool) -> float:
    if per_tap:
        return 2.0 * b * t * k * _q(c_in) * _q(c_out)
    return 2.0 * b * t * _q(k * c_in) * _q(c_out)


def encoder_forward_q(hp, b, t_x, per_tap: bool) -> float:
    h = hp.h_enc
    total = 0.0
    if hp.prenet:
        total += 3 * _conv_q(b, t_x, 5, h, h, per_tap)
        total += _conv_q(b, t_x, 1, h, h, per_tap)
    d_head = h // hp.n_heads
    for _ in range(hp.n_layers_enc):
        total += 4 * _conv_q(b, t_x, 1, h, h, per_tap)
        # scores QK^T (contract d_head) and attn*V (output d_head): each
        # quantizes d_head; t_x >= 128 at bench shapes stays unquantized
        total += 2 * (2.0 * b * hp.n_heads * t_x * _q(t_x) * _q(d_head))
        if hp.window_size is not None:
            total += 2 * (2.0 * b * hp.n_heads * t_x * _q(t_x) * _q(d_head))
        total += _conv_q(b, t_x, hp.kernel_size, h, hp.filter_channels, per_tap)
        total += _conv_q(b, t_x, hp.kernel_size, hp.filter_channels, h, per_tap)
    total += _conv_q(b, t_x, 1, h, hp.out_channels, per_tap)
    if not hp.mean_only:
        total += _conv_q(b, t_x, 1, h, hp.out_channels, per_tap)
    dp_in = h + hp.gin_channels
    total += _conv_q(b, t_x, hp.kernel_size, dp_in, hp.filter_channels_dp, per_tap)
    total += _conv_q(
        b, t_x, hp.kernel_size, hp.filter_channels_dp, hp.filter_channels_dp,
        per_tap,
    )
    total += _conv_q(b, t_x, 1, hp.filter_channels_dp, 1, per_tap)
    return total


def decoder_forward_q(hp, b, t_y, per_tap: bool) -> float:
    t_c = t_y // hp.n_sqz
    c = hp.out_channels * hp.n_sqz
    h = hp.h_dec
    per_block = 0.0
    # invconv: grouped 1x1 over n_split channels — tiny [c/s, s]x[s, s]
    # matmuls; s=4 quantizes brutally but its useful flops are negligible
    per_block += 2.0 * b * t_c * c * _q(hp.n_split)
    per_block += _conv_q(b, t_c, 1, c // 2, h, per_tap)
    for _ in range(hp.n_block_layers):
        per_block += _conv_q(b, t_c, hp.kernel_size_dec, h, 2 * h, per_tap)
        per_block += _conv_q(b, t_c, 1, h, 2 * h, per_tap)
    per_block += _conv_q(b, t_c, 1, h, c, per_tap)
    if hp.gin_channels:
        per_block += _conv_q(
            b, 1, 1, hp.gin_channels, 2 * h * hp.n_block_layers, per_tap
        )
    return per_block * hp.n_blocks_dec


def alignment_q(hp, b, t_x, t_y) -> float:
    c = hp.out_channels
    return 4 * (2.0 * b * t_x * t_y * _q(c))


def training_flops_q(hp, b, t_x, t_y, per_tap: bool) -> float:
    fwd = (
        encoder_forward_q(hp, b, t_x, per_tap)
        + decoder_forward_q(hp, b, t_y, per_tap)
        + alignment_q(hp, b, t_x, t_y)
    )
    total = 3.0 * fwd
    if remat_recomputes_decoder(hp.remat):
        total += decoder_forward_q(hp, b, t_y, per_tap)
    return total


def mfu_ceiling(hp, b: int, t_x: int, t_y: int) -> dict:
    """{'ceiling_im2col', 'ceiling_per_tap'}: achievable-MFU band from
    tile quantization alone (1.0 = every matmul dim a multiple of 128).
    Useful flops follow the MFU convention (model_flops: no remat); the
    quantized denominator charges the recompute where the policy really
    runs one — so a rematting config's ceiling correctly drops."""
    useful = model_flops(hp, b=b, t_x=t_x, t_y=t_y)
    return {
        "ceiling_im2col": useful / training_flops_q(hp, b, t_x, t_y, False),
        "ceiling_per_tap": useful / training_flops_q(hp, b, t_x, t_y, True),
    }
