"""speechless_tpu — a TPU-native (JAX/XLA/Pallas) speech-recognition framework.

Re-provides the full capability surface of `juliuskunze/speechless` (wav2letter CTC training,
greedy/beam+LM decoding, corpus management, transfer learning, evaluation, recording) with a
TPU-first design: fused on-device feature extraction, Pallas CTC loss, static-shape
length-bucketed batching, and mesh-sharded (DP+TP) training. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level API: importing speechless_tpu stays cheap (no jax import) until the
    # heavy surface is actually touched.
    if name == "Wav2Letter":
        from .system import Wav2Letter
        return Wav2Letter
    if name == "Configuration":
        from .configuration import Configuration
        return Configuration
    if name == "DataDirectories":
        from .configuration import DataDirectories
        return DataDirectories
    if name == "LoggedRun":
        from .configuration import LoggedRun
        return LoggedRun
    raise AttributeError("module 'speechless_tpu' has no attribute '{}'".format(name))


__all__ = ["Wav2Letter", "Configuration", "DataDirectories", "LoggedRun", "__version__"]
