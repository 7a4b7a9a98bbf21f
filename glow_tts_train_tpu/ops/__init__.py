"""Core TPU-native ops: masks, norms, convolutions, gated activations,
relative-position attention, flow bijectors, and monotonic alignment search.

Layout convention: activations are channels-last ``[batch, time, channels]``
(channels ride the 128-wide TPU lane dimension).  This differs from the
reference's ``[b, c, t]`` torch layout; semantics are identical.
"""
