"""ssi_tpu — TPU-native speech-integration framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
speech-integration stack (Llama 3.2 + discrete speech units): tokenizer/embedding
extension, CPT/SFT training with exact-resume HF-format checkpoints, deterministic
host data pipelines, batched generation, and WER evaluation.
"""

__version__ = "0.1.0"


def _enable_persistent_compilation_cache() -> None:
    """Point JAX at an on-disk compilation cache before any program compiles.

    Cold TPU compiles of the 1B train/decode programs take minutes (5-10 via a
    remote-TPU tunnel); the persistent cache makes every subsequent process
    launch warm. Opt out with SSI_TPU_COMPILE_CACHE=0 or redirect with
    SSI_TPU_COMPILE_CACHE=/path. Import-time config is safe: it only sets the
    cache path (no backend initialization happens here), and an explicit
    jax.config.update later still wins.
    """
    import os

    val = os.environ.get("SSI_TPU_COMPILE_CACHE", "")
    if val == "0":
        return
    cache_dir = val or os.path.join(
        os.environ.get("SSI_TPU_HOME", os.path.expanduser("~/.cache/ssi_tpu")), "jax_cache"
    )
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:  # pragma: no cover - jax absent or too old for the knob
        pass


_enable_persistent_compilation_cache()
