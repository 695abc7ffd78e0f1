"""speechless_tpu — a TPU-native (JAX/XLA/Pallas) speech-recognition framework.

Re-provides the full capability surface of `juliuskunze/speechless` (wav2letter CTC training,
greedy/beam+LM decoding, corpus management, transfer learning, evaluation, recording) with a
TPU-first design: fused on-device feature extraction, Pallas CTC loss, static-shape
length-bucketed batching, and mesh-sharded (DP+TP) training. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
