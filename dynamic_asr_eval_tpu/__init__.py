"""dynamic_asr_eval_tpu — TPU-native dynamic evaluation (test-time adaptation)
of long-context CTC / encoder-decoder speech recognizers.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of the
`robflynnyh/dynamic-asr-eval` reference stack (see SURVEY.md):

- jit-compiled long-context conformer-CTC encoder (``models.conformer``)
- fused, jittable log-mel featurization (``audio.features``)
- chunked adapt-and-stitch TTA engines whose per-recording SGD / pseudo-label
  updates run entirely on device as a ``lax.scan`` — no host round-trips
  (``tta``)
- on-device greedy CTC decoding and batched CTC prefix beam search with LM
  shallow fusion (``ops.ctc``, ``ops.beam_search``, ``lm``)
- MADGRAD/Adafactor optimizers, EMA pytrees, parameter-freezing masks
  (``optim``)
- jittable augmentations under explicit PRNG keys (``augment``)
- dataset adapters, evaluation-protocol drivers, WER scoring with the
  Whisper English text normalizer (``data``, ``evals``, ``text``)
- device-mesh parallelism utilities (``parallel``)
"""

__version__ = "0.1.0"
