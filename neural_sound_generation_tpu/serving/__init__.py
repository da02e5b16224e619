"""Serving infrastructure beyond the HTTP surface in cli/serve.py.

The reference has no serving layer at all (its realtime path is the
stubbed Leap listener, src/inference.py:68-156); this package holds the
TPU-first production-serving machinery: the WaveNet stream multiplexer
(N concurrent realtime streams through one fixed-shape batched program).
Cross-request micro-batching for /reconstruct lives in cli/serve.py
next to its HTTP wiring.
"""

from neural_sound_generation_tpu.serving.mux import (
    MuxOverloaded,
    WaveNetStreamMux,
)

__all__ = ["MuxOverloaded", "WaveNetStreamMux"]
