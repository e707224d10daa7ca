from reface_tpu.pipelines.swap import (
    FaceSwapper,
    SwapConfig,
    SwapModules,
    tiny_swap_config,
)

__all__ = ["FaceSwapper", "SwapConfig", "SwapModules", "tiny_swap_config"]
