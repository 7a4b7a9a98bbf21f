"""glow_tts_train_tpu — a TPU-native (JAX/XLA/Pallas) Glow-TTS training,
inference, and export framework.

Capability-parity rebuild of rhasspy/glow-tts-train (reference mounted at
/root/reference), re-designed TPU-first:

* pure-functional JAX model (param pytrees + pure apply fns)
* channels-last ``[batch, time, channels]`` layout so channels ride TPU lanes
* one jit-compiled train step with GSPMD batch sharding over a ``jax.sharding.Mesh``
* monotonic alignment search (MAS) fully on-device (no host round-trip)
* bf16 compute / fp32 params with fp32 logdet & loss accumulation
"""

__version__ = "0.3.0"
