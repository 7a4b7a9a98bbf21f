"""HBM-traffic roofline model for the Glow-TTS train step (MFU accounting).

Companion to utils/flops.py (which counts MXU work): this module counts
**bytes moved through HBM** per train step so the measured step time can be
compared against ``max(flops / peak_flops, bytes / hbm_bandwidth)`` — the
roofline.  A step whose time sits near that bound is hardware-limited for
its model shape; a step far above it has framework/scheduling headroom.

Traffic model (assumptions, stated so the numbers are auditable):

* Activations are bf16 (2 B), params/optimizer fp32 (4 B), logdet/loss
  reductions fp32.
* Every conv/matmul reads its input activation once from HBM and writes its
  output once.  Elementwise chains between two matmul-ish ops are charged
  ONE extra read+write pass of their tensor (XLA fuses the chain into one
  kernel; the producer's write and consumer's read are already counted).
* Backward of a conv is charged 2x its forward traffic (dgrad: read
  grad_out + write grad_in; wgrad: read grad_out + read stored/recomputed
  input; weight-sized tensors are negligible next to activations).
* Rematerialized regions charge their forward traffic again during
  backward; stored residuals are charged one write (forward) + one read
  (backward).
* Weights are charged once per pass over the network (fwd, bwd, recompute)
  plus the optimizer's read/write passes — at ~29 M params this is small
  next to activation traffic but not negligible at b=32.

These choices undercount XLA's real spills/copies, so the model is a
LOWER bound on traffic — i.e. an UPPER bound on achievable speed, which is
exactly what a ceiling proof needs.
"""

import typing

from .flops import forward_flops, training_flops


def _act(b: int, t: int, c: int, bytes_per: int = 2) -> float:
    """Bytes of one [b, t, c] activation tensor."""
    return float(b) * t * c * bytes_per


def _conv_fwd(b: int, t: int, c_in: int, c_out: int) -> float:
    """Forward traffic of one conv: read input + write output."""
    return _act(b, t, c_in) + _act(b, t, c_out)


def decoder_fwd_traffic(hp, b: int, t_y: int) -> float:
    """Forward HBM bytes of the flow decoder (per §traffic model)."""
    t = t_y // hp.n_sqz
    c = hp.out_channels * hp.n_sqz
    h = hp.h_dec
    per_block = 0.0
    # actnorm (fused elementwise pass) + invconv matmul
    per_block += 2 * _act(b, t, c)  # actnorm read+write
    per_block += 2 * _act(b, t, c)  # invconv read+write
    # coupling: start conv (c/2 -> h)
    per_block += _conv_fwd(b, t, c // 2, h)
    if getattr(hp, "wn_impl", "xla") == "pallas":
        # fused kernel (ops/wn_pallas.py): the whole gated stack lives in
        # VMEM — HBM sees only read x + write skip (weights counted in
        # decoder_weight_bytes)
        per_block += 2 * _act(b, t, h)
    else:
        for _ in range(hp.n_block_layers):
            per_block += _conv_fwd(b, t, h, 2 * h)  # in_layer (k-wide)
            per_block += 2 * _act(b, t, 2 * h)  # dropout + gated read
            per_block += _act(b, t, h)  # gated write
            per_block += _conv_fwd(b, t, h, 2 * h)  # res_skip
            per_block += 3 * _act(b, t, h)  # x update read/write + skip accum
    per_block += _conv_fwd(b, t, h, c)  # end conv -> (m, logs)
    per_block += 3 * _act(b, t, c)  # affine z1 = m + exp(logs)*x1 + concat
    return per_block * hp.n_blocks_dec


def decoder_weight_bytes(hp) -> float:
    """fp32 bytes of the decoder's weights (per forward pass read)."""
    c = hp.out_channels * hp.n_sqz
    h = hp.h_dec
    per_block = hp.n_split * hp.n_split  # invconv
    per_block += 2 * c  # actnorm
    per_block += (c // 2) * h + h  # start
    per_block += hp.n_block_layers * (hp.kernel_size_dec * h * 2 * h + 2 * h)
    per_block += hp.n_block_layers * (h * 2 * h + 2 * h)  # res_skip
    per_block += h * c + c  # end
    return per_block * hp.n_blocks_dec * 4.0


def encoder_fwd_traffic(hp, b: int, t_x: int) -> float:
    h = hp.h_enc
    total = _act(b, t_x, h)  # embedding write
    if hp.prenet:
        total += 3 * (_conv_fwd(b, t_x, h, h) + 2 * _act(b, t_x, h))  # +LN
        total += _conv_fwd(b, t_x, h, h)
    for _ in range(hp.n_layers_enc):
        total += 4 * _conv_fwd(b, t_x, h, h)  # q,k,v,o projections
        # scores + softmax + weighted sum: [b, heads, t_x, t_x] bf16,
        # ~3 passes (write scores, softmax RW, read for attn·V)
        total += 3 * _act(b, hp.n_heads * t_x, t_x)
        total += 2 * 2 * _act(b, t_x, h)  # residual+LN, twice per layer
        total += _conv_fwd(b, t_x, h, hp.filter_channels)
        total += _conv_fwd(b, t_x, hp.filter_channels, h)
    # heads
    total += _conv_fwd(b, t_x, h, hp.out_channels)
    if not hp.mean_only:
        total += _conv_fwd(b, t_x, h, hp.out_channels)
    dp_in = h + hp.gin_channels
    total += _conv_fwd(b, t_x, dp_in, hp.filter_channels_dp)
    total += _conv_fwd(b, t_x, hp.filter_channels_dp, hp.filter_channels_dp)
    total += _conv_fwd(b, t_x, hp.filter_channels_dp, 1)
    return total


def alignment_traffic(hp, b: int, t_x: int, t_y: int) -> float:
    """logp 4-term matmul decomposition + MAS + stat expansion.

    The [b, t_x, t_y] tensors are fp32 (likelihoods/logdet accumulate in
    fp32): logp written once, read by MAS; MAS direction tensor written +
    read (forward scan out, backtrace in); path written, read twice by the
    z_m/z_logs expansion matmuls; expanded stats written.
    """
    cells = float(b) * t_x * t_y * 4
    logp = 2 * cells  # write + read
    mas = 3 * cells  # direction write+read, path write
    expand = 2 * cells + 2 * 2 * _act(b, t_y, hp.out_channels)
    return logp + mas + expand


def train_step_traffic(
    hp, b: int, t_x: int, t_y: int, n_params: int
) -> typing.Dict[str, float]:
    """Per-component HBM bytes for one train step (bf16 compute, full-block
    flow remat as configured by hp.remat, encoder residuals stored)."""
    t = t_y // hp.n_sqz
    c = hp.out_channels * hp.n_sqz

    dec_fwd = decoder_fwd_traffic(hp, b, t_y)
    enc_fwd = encoder_fwd_traffic(hp, b, t_x)
    align = alignment_traffic(hp, b, t_x, t_y)
    weights = decoder_weight_bytes(hp)

    # backward: 2x forward conv traffic (dgrad + wgrad) for both stacks
    dec_bwd = 2 * dec_fwd
    enc_bwd = 2 * enc_fwd

    components = {
        "fwd_decoder": dec_fwd,
        "fwd_encoder": enc_fwd,
        "alignment_mas": align,
        "bwd_decoder": dec_bwd,
        "bwd_encoder": enc_bwd,
        # encoder residuals: stored activations written in fwd are already
        # charged as the producers' writes; charge the backward RE-reads of
        # roughly one forward's worth of stored tensors
        "residual_reads_encoder": enc_fwd / 2,
        # optimizer: read params+grads+mu+nu, write params+mu+nu (fp32)
        "optimizer": 7.0 * n_params * 4.0,
        "grad_tensors": 2.0 * n_params * 4.0,  # grads written bwd, read opt
    }
    if hp.remat and hp.remat != "none":
        # full-block remat: backward recomputes each block's forward; the
        # stored residuals are the 13 block inputs (write fwd + read bwd)
        components["remat_recompute"] = dec_fwd
        components["residuals_decoder"] = 2 * (hp.n_blocks_dec + 1) * _act(b, t, c)
        if hp.remat == "xin":
            # saved in_layer outputs: write + read of [b, t, 2h] per layer
            # per block; the recompute skips the in_layer convs
            saved = (
                2
                * hp.n_blocks_dec
                * hp.n_block_layers
                * _act(b, t, 2 * hp.h_dec)
            )
            components["residuals_xin"] = saved
            components["remat_recompute"] -= (
                hp.n_blocks_dec
                * hp.n_block_layers
                * _conv_fwd(b, t, hp.h_dec, 2 * hp.h_dec)
            )
    else:
        # everything stored: backward re-reads one forward's worth
        components["residual_reads_decoder"] = dec_fwd / 2
    # weights: one read per network pass (fwd, bwd, recompute if any)
    n_passes = 3 if (hp.remat and hp.remat != "none") else 2
    components["weight_reads"] = n_passes * weights
    return components


# Peak specs by jax device_kind (bf16 FLOP/s, HBM bytes/s).
CHIP_SPECS = {
    "TPU v6": (918e12, 1640e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v5 lite": (197e12, 819e9),
    "TPU v4": (275e12, 1228e9),
}


def roofline_report(
    hp,
    b: int,
    t_x: int,
    t_y: int,
    n_params: int,
    measured_step_s: float,
    device_kind: str = "TPU v5 lite",
) -> typing.Dict[str, typing.Any]:
    """Compare a measured step time against the compute/bandwidth roofline.

    Returns the component byte breakdown plus:
    * t_mxu_s     — FLOPs / peak (all-MXU lower bound)
    * t_hbm_s     — bytes / bandwidth (all-HBM lower bound)
    * t_roofline_s — max of the two (perfect-overlap bound)
    * t_sum_s     — their sum (zero-overlap bound); a real step lands
      between t_roofline_s and t_sum_s
    * headroom    — measured / t_roofline_s (1.0 = at the ceiling)
    """
    peak_flops, hbm_bw = CHIP_SPECS.get(device_kind, CHIP_SPECS["TPU v5 lite"])
    comps = train_step_traffic(hp, b, t_x, t_y, n_params)
    total_bytes = sum(comps.values())
    flops = training_flops(hp, b=b, t_x=t_x, t_y=t_y)
    t_mxu = flops / peak_flops
    t_hbm = total_bytes / hbm_bw
    t_roof = max(t_mxu, t_hbm)
    return {
        "device_kind": device_kind,
        "flops_per_step": flops,
        "bytes_per_step": total_bytes,
        "bytes_breakdown": comps,
        "arithmetic_intensity_flops_per_byte": flops / total_bytes,
        "t_mxu_s": t_mxu,
        "t_hbm_s": t_hbm,
        "t_roofline_s": t_roof,
        "t_sum_s": t_mxu + t_hbm,
        "measured_step_s": measured_step_s,
        "headroom": measured_step_s / t_roof,
        "bound": "hbm" if t_hbm > t_mxu else "mxu",
    }
