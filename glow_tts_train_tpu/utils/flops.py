"""Analytic FLOP counts for the Glow-TTS graph (MFU accounting).

Counts multiply-accumulate-dominated ops (convs, matmuls, attention) as
2·MACs; elementwise work is ignored (it is bandwidth-, not FLOP-bound).
The structure mirrors the training forward graph (models/glow_tts.py
``forward_train``; reference models.py:310-395):

    encoder (prenet → rel-pos attention stack → heads)
    flow decoder (n_blocks × [actnorm, invconv, coupling(WN)])
    pairwise log-likelihood matmul decomposition + stat expansion

``training_flops`` applies the standard fwd+bwd accounting: backward does
~2× the forward matmul work (grads wrt inputs and wrt weights), and with
rematerialized flow blocks (hp.remat) the forward of the flow is computed
once more during backward.
"""

def _conv_flops(b: int, t: int, k: int, c_in: int, c_out: int) -> float:
    return 2.0 * b * t * k * c_in * c_out


def encoder_forward_flops(hp, b: int, t_x: int) -> float:
    h = hp.h_enc
    total = 0.0
    if hp.prenet:
        # 3 × (k=5 conv h→h) + 1×1 proj (models.py prenet; layers.py:31-80)
        total += 3 * _conv_flops(b, t_x, 5, h, h)
        total += _conv_flops(b, t_x, 1, h, h)
    d_head = h // hp.n_heads
    for _ in range(hp.n_layers_enc):
        # q,k,v,o projections
        total += 4 * _conv_flops(b, t_x, 1, h, h)
        # scores QK^T and attn·V — 2 each of [t_x,d]×[d,t_x] per head
        total += 2 * (2.0 * b * hp.n_heads * t_x * t_x * d_head)
        if hp.window_size is not None:
            # rel-pos: Q·rel_k and weights·rel_v (attentions.py:225-233)
            total += 2 * (2.0 * b * hp.n_heads * t_x * t_x * d_head)
        # conv FFN h→filter→h with kernel_size
        total += _conv_flops(b, t_x, hp.kernel_size, h, hp.filter_channels)
        total += _conv_flops(b, t_x, hp.kernel_size, hp.filter_channels, h)
    # heads: proj_m (+ proj_s), duration predictor (2 convs + proj)
    total += _conv_flops(b, t_x, 1, h, hp.out_channels)
    if not hp.mean_only:
        total += _conv_flops(b, t_x, 1, h, hp.out_channels)
    dp_in = h + hp.gin_channels
    total += _conv_flops(b, t_x, hp.kernel_size, dp_in, hp.filter_channels_dp)
    total += _conv_flops(
        b, t_x, hp.kernel_size, hp.filter_channels_dp, hp.filter_channels_dp
    )
    total += _conv_flops(b, t_x, 1, hp.filter_channels_dp, 1)
    return total


def decoder_forward_flops(hp, b: int, t_y: int) -> float:
    t_c = t_y // hp.n_sqz  # squeezed time axis
    c = hp.out_channels * hp.n_sqz  # squeezed channels
    h = hp.h_dec
    per_block = 0.0
    # invconv: grouped 1×1 over n_split channels (layers.py:238-272)
    per_block += 2.0 * b * t_c * c * hp.n_split
    # coupling (attentions.py:99-142): start 1×1 c/2→h, WN stack, end 1×1
    per_block += _conv_flops(b, t_c, 1, c // 2, h)
    for _ in range(hp.n_block_layers):
        per_block += _conv_flops(b, t_c, hp.kernel_size_dec, h, 2 * h)
        per_block += _conv_flops(b, t_c, 1, h, 2 * h)  # res+skip
    per_block += _conv_flops(b, t_c, 1, h, c)  # end (m, logs)
    if hp.gin_channels:
        # global conditioning is a PER-UTTERANCE vector: the cond conv runs
        # on g of time-length 1 and broadcasts over t (ops/flows.py:264-287,
        # g: [b, 1, gin] -> [b, 1, 2*h*L]).  Counting it per frame (t_c)
        # overcounted multispeaker by 17.5% vs XLA (caught by
        # tests/test_flops_xla.py::test_multispeaker_gin_rows_counted).
        per_block += _conv_flops(b, 1, 1, hp.gin_channels,
                                 2 * h * hp.n_block_layers)
    return per_block * hp.n_blocks_dec


def alignment_flops(hp, b: int, t_x: int, t_y: int) -> float:
    """logp 4-term matmul decomposition + z_m/z_logs expansion
    (models.py:362-392): four [t_x,c]×[c,t_y]-shaped products."""
    c = hp.out_channels
    return 4 * (2.0 * b * t_x * t_y * c)


def forward_flops(hp, b: int, t_x: int, t_y: int) -> float:
    return (
        encoder_forward_flops(hp, b, t_x)
        + decoder_forward_flops(hp, b, t_y)
        + alignment_flops(hp, b, t_x, t_y)
    )


def remat_recomputes_decoder(remat) -> bool:
    """Whether the given remat policy re-runs the flow-decoder matmuls in
    backward.  True/"full" recompute the block; "dots" stores every
    conv/matmul output (recomputes only elementwise glue — no MXU work);
    "xin" stores the k-wide in_layer conv outputs and recomputes the rest
    (counted as a full block recompute here: a small overcount);
    False/"none" store everything the custom VJP needs.

    HISTORY: this predicate replaces a bare ``if hp.remat:`` — the
    resolved policy on the TPU/Pallas path is the STRING "none", which is
    truthy, so every round-4 published MFU silently included a phantom
    decoder recompute (~29% numerator inflation on base; the "92% large
    MFU" was ~0.70 honest).  Pinned by tests/test_flops_xla.py.
    """
    return remat in (True, "full", "xin")


def training_flops(hp, b: int, t_x: int, t_y: int) -> float:
    """Hardware FLOPs one train step actually executes: forward + backward
    (≈2x forward matmul work) + the flow-forward recompute IF the remat
    policy really re-runs it (see remat_recomputes_decoder)."""
    fwd = forward_flops(hp, b, t_x, t_y)
    total = 3.0 * fwd
    if remat_recomputes_decoder(hp.remat):
        total += decoder_forward_flops(hp, b, t_y)
    return total


def model_flops(hp, b: int, t_x: int, t_y: int) -> float:
    """USEFUL model FLOPs per step — the MFU numerator (PaLM convention):
    forward + 2x-forward backward, never counting rematerialization (a
    recompute is overhead the implementation chose, not model work).
    ``training_flops`` is the HFU numerator (what the hardware executed);
    they coincide when no recompute runs."""
    return 3.0 * forward_flops(hp, b, t_x, t_y)
