from vipers.discovery.lost import lost, patch_scoring, detect_box, dino_seg  # noqa: F401
from vipers.discovery.components import (  # noqa: F401
    flood_fill_from_seed,
    label_components,
    largest_component_mask,
)
