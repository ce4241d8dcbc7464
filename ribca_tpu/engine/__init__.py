from ribca_tpu.engine.voting import PanelProbs, merge_by_voting
from ribca_tpu.engine.ensemble import EnsembleRunner, prediction_panels

__all__ = [
    "PanelProbs",
    "merge_by_voting",
    "EnsembleRunner",
    "prediction_panels",
]
