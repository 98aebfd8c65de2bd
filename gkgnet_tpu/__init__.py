"""gkgnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-label Vision-GNN framework.

Re-designed from scratch with the capabilities of GKGNet (ECCV 2024,
"Group K-Nearest Neighbor based Graph Convolutional Network for Multi-Label
Image Recognition"; reference implementation jin-s13/GKGNet).

Layout conventions (TPU-first, unlike the reference's torch NCHW):
  * images / feature maps:  NHWC   (lane dim = channels, MXU/VPU friendly)
  * node sets:              (B, N, C)  channel-last
  * edge indices:           (B, N, k) int32 neighbor ids (centers implicit)
"""

__version__ = "0.1.0"


def _setup_compilation_cache():
    """Enable JAX's persistent compilation cache (idempotent, best-effort).

    The GKGNet forward at 576^2 takes minutes to compile through remote-TPU
    tunnels; a disk cache makes every tool/bench/test after the first run
    start in seconds. Opt out with GKGNET_NO_COMPILE_CACHE=1.
    """
    import os

    if os.environ.get("GKGNET_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "jax_comp_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is a pure optimization
        pass


_setup_compilation_cache()


def __getattr__(name):  # lazy: avoid importing flax for ops-only users
    if name == "GKGNet":
        from gkgnet_tpu.nn.gkgnet import GKGNet
        return GKGNet
    if name == "GKGNetClassifier":
        from gkgnet_tpu.nn.classifier import GKGNetClassifier
        return GKGNetClassifier
    raise AttributeError(name)
