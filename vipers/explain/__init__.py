from vipers.explain.metrics import pool_heatmap, evaluate_single  # noqa: F401
from vipers.explain.attribution import integrated_gradients, smoothgrad  # noqa: F401
from vipers.explain.gradcam import gradcam, guided_backprop_attr, guided_gradcam, vit_attention_heatmap  # noqa: F401
