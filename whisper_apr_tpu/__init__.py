"""whisper_apr_tpu — a TPU-native Whisper speech-recognition framework.

A from-scratch JAX/XLA/Pallas implementation with the same capabilities as
the reference whisper.apr engine (reference: src/lib.rs ``WhisperApr``):
audio front-end, conv-stem transformer encoder, KV-cached autoregressive
decoder, greedy/beam decoding, language detection, the `.apr` model
container, streaming, and quantization — redesigned TPU-first (SPMD meshes,
static shapes, on-device decode loops, Pallas kernels for the hot ops).
"""

__version__ = "0.1.0"

from .config import ComputeConfig, ModelConfig
from .engine import (
    BatchTranscriptionResult,
    TranscribeOptions,
    TranscriptionResult,
    WhisperApr,
)
from .errors import (
    AudioError,
    ConfigError,
    FormatError,
    InferenceError,
    ModelError,
    TokenizerError,
    WhisperError,
)

__all__ = [
    "WhisperApr", "TranscribeOptions", "TranscriptionResult",
    "BatchTranscriptionResult",
    "ModelConfig", "ComputeConfig",
    "WhisperError", "FormatError", "AudioError", "ModelError",
    "InferenceError", "TokenizerError", "ConfigError",
    "__version__",
]
