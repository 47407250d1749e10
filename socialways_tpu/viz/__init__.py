from socialways_tpu.viz.heatmap import (
    default_toy_hinv,
    render_preds_dir,
    render_scene,
    to_image_frame,
)

__all__ = ["default_toy_hinv", "render_preds_dir", "render_scene",
           "to_image_frame"]
