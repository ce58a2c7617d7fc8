from vipers.core.registry import (  # noqa: F401
    register_model,
    get_model_builder,
    build_model,
    list_models,
    ModelSpec,
)
from vipers.core.metrics import MetricsWriter, MeterSet  # noqa: F401
