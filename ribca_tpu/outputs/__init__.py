from ribca_tpu.outputs.colors import (
    color_legend,
    get_colors,
    number_to_rgb,
    rgb_to_hex,
)
from ribca_tpu.outputs.colorize import colorize_image, save_png
from ribca_tpu.outputs.export import export_annotations_csv

__all__ = [
    "get_colors",
    "rgb_to_hex",
    "number_to_rgb",
    "color_legend",
    "colorize_image",
    "save_png",
    "export_annotations_csv",
]
