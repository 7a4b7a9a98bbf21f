"""Small utilities matching the reference's public utils surface
(`/root/reference/glow_tts_train/utils.py`) where they are host-side helpers.

Device-side equivalents live in ops/: sequence_mask/generate_path
(ops/masks.py), squeeze/unsqueeze (ops/flows.py), the gated activation
(ops/gated.py), maximum_path (ops/mas.py), losses (models/losses.py);
clip_grad_value_ is the optax.clip stage of the optimizer plus the
grad_norm metric in the train step.
"""

from .text import intersperse, shift_1d  # noqa: F401
