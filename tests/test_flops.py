"""Sanity checks on the analytic FLOP accounting used for MFU (bench.py)."""

from glow_tts_train_tpu.config import ModelConfig, TrainingConfig
from glow_tts_train_tpu.models import hyper_from_config
from glow_tts_train_tpu.utils.flops import (
    alignment_flops,
    decoder_forward_flops,
    encoder_forward_flops,
    forward_flops,
    training_flops,
)


def base_hp():
    return hyper_from_config(TrainingConfig(model=ModelConfig(num_symbols=256)))


def test_flow_decoder_dominates_base_model():
    """At the bench shape the 12-block flow decoder carries ~85% of the
    FLOPs — the documented optimization target (VERDICT r1)."""
    hp = base_hp()
    enc = encoder_forward_flops(hp, 32, 128)
    dec = decoder_forward_flops(hp, 32, 640)
    assert dec > 5 * enc
    total = forward_flops(hp, 32, 128, 640)
    assert 0.8 < dec / total < 0.95


def test_flops_scale_linearly_in_batch_and_time():
    hp = base_hp()
    assert forward_flops(hp, 64, 128, 640) == 2 * forward_flops(hp, 32, 128, 640)
    assert decoder_forward_flops(hp, 32, 1280) == (
        2 * decoder_forward_flops(hp, 32, 640)
    )
    assert alignment_flops(hp, 32, 256, 640) == 2 * alignment_flops(hp, 32, 128, 640)


def test_training_flops_account_for_remat():
    hp = base_hp()
    assert hp.remat
    fwd = forward_flops(hp, 32, 128, 640)
    train = training_flops(hp, 32, 128, 640)
    # fwd + 2x fwd (backward) + flow recompute
    assert train > 3 * fwd
    no_remat = hp._replace(remat=False)
    assert training_flops(no_remat, 32, 128, 640) == 3 * fwd


def test_remat_none_string_counts_no_recompute():
    """The round-4 MFU inflation bug: the resolved TPU/Pallas policy is
    the STRING "none" (truthy!), and `if hp.remat:` charged a phantom
    decoder recompute — ~29% numerator inflation on the published base
    MFUs.  Policies that store residuals ("none", False, "dots") must
    count NO recompute; only True/"full"/"xin" re-run decoder matmuls."""
    hp = base_hp()
    fwd = forward_flops(hp, 32, 128, 640)
    for stored in ("none", False, "dots"):
        assert training_flops(hp._replace(remat=stored), 32, 128, 640) == 3 * fwd
    for recomputing in (True, "full", "xin"):
        assert training_flops(
            hp._replace(remat=recomputing), 32, 128, 640
        ) > 3 * fwd


def test_model_flops_is_remat_invariant():
    """MFU numerator (PaLM convention): 3x forward, regardless of the
    implementation's remat choice."""
    from glow_tts_train_tpu.utils.flops import model_flops

    hp = base_hp()
    fwd = forward_flops(hp, 32, 128, 640)
    for policy in (True, False, "full", "none", "dots", "xin"):
        assert model_flops(hp._replace(remat=policy), 32, 128, 640) == 3 * fwd


def test_tile_ceiling_bands():
    """Tile-quantization MFU ceilings (utils/tiles.py): the large config
    (256-wide channels) tiles the 128-lane MXU almost exactly; base
    (192-wide) pays a half-empty K-tile on its dominant matmuls."""
    from glow_tts_train_tpu.utils.tiles import mfu_ceiling

    base = hyper_from_config(
        TrainingConfig(model=ModelConfig(num_symbols=256))
    )._replace(remat=False)
    c = mfu_ceiling(base, b=256, t_x=128, t_y=640)
    assert 0.80 < c["ceiling_im2col"] < 0.92
    assert 0.65 < c["ceiling_per_tap"] < c["ceiling_im2col"]

    large = hyper_from_config(
        TrainingConfig(
            model=ModelConfig(
                num_symbols=256, hidden_channels=256,
                hidden_channels_enc=256, hidden_channels_dec=256,
                filter_channels=1024, n_blocks_dec=16,
            )
        )
    )._replace(remat=False)
    c_large = mfu_ceiling(large, b=128, t_x=128, t_y=640)
    assert c_large["ceiling_im2col"] > 0.95
    assert c_large["ceiling_per_tap"] > 0.95


def test_base_model_magnitude():
    """Glow-TTS base at b=32, 128x640 is ~0.5 TF forward (hand-derived);
    guard against unit slips (MACs vs FLOPs, squeeze factors)."""
    hp = base_hp()
    fwd = forward_flops(hp, 32, 128, 640)
    assert 3e11 < fwd < 8e11
