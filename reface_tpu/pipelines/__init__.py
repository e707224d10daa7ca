from reface_tpu.pipelines.swap import FaceSwapper, SwapConfig, tiny_swap_config

__all__ = ["FaceSwapper", "SwapConfig", "tiny_swap_config"]
