"""Model configurations (Python builders + gin-compat parsing)."""

from ddsp_piano_tpu.configs.registry import (  # noqa: F401
    available_configs,
    get_model,
    register,
)
