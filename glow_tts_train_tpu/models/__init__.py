"""Model graphs (Glow-TTS flow generator) and losses."""

from .glow_tts import (  # noqa: F401
    GlowTTSHyper,
    hyper_from_config,
    init_model,
    encoder_forward,
    forward_train,
    forward_gen,
    ddi_init,
    store_inverse,
)
from .losses import duration_loss, mle_loss  # noqa: F401
