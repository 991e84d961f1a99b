"""ssi_tpu — TPU-native speech-integration framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
speech-integration stack (Llama 3.2 + discrete speech units): tokenizer/embedding
extension, CPT/SFT training with exact-resume HF-format checkpoints, deterministic
host data pipelines, batched generation, and WER evaluation.
"""

__version__ = "0.1.0"
