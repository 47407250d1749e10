from socialways_tpu.viz.heatmap import (
    default_toy_hinv,
    render_preds_dir,
    render_scene,
    to_image_frame,
)
from socialways_tpu.viz.animation import ToyAnimation
from socialways_tpu.viz.video import (
    Display,
    FakeDisplay,
    parse_annotations,
    plot_prediction_metrics,
    to_pixels,
)

__all__ = ["default_toy_hinv", "render_preds_dir", "render_scene",
           "to_image_frame", "ToyAnimation", "Display", "FakeDisplay",
           "parse_annotations", "plot_prediction_metrics", "to_pixels"]
