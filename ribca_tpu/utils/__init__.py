from ribca_tpu.utils.config import AnnotatorConfig  # noqa: F401
from ribca_tpu.utils.logging import Logger  # noqa: F401
