from ribca_tpu.api.annotator import Annotator

__all__ = ["Annotator"]
