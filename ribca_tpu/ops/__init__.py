from ribca_tpu.ops.gaussian import gaussian_blur, gaussian_kernel1d  # noqa: F401
from ribca_tpu.ops.normalize import normalize_image  # noqa: F401
from ribca_tpu.ops.extents import cell_extents, CellExtents  # noqa: F401
from ribca_tpu.ops.patches import (  # noqa: F401
    PanelGather,
    build_panel_gather,
    extract_patches,
    make_patch_extractor,
)
