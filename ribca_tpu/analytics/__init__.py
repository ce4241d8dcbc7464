from ribca_tpu.analytics.spatial import (
    neighborhood_analysis,
    neighborhood_matrix,
    tissue_region_partition,
)
from ribca_tpu.analytics.discover import find_extra_cell_types

__all__ = [
    "neighborhood_analysis",
    "neighborhood_matrix",
    "tissue_region_partition",
    "find_extra_cell_types",
]
