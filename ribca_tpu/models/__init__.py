from ribca_tpu.models.vit import (  # noqa: F401
    VisionTransformer,
    vit_tiny,
    vit_s,
    vit_m,
    vit_l,
    build_panel_model,
)
from ribca_tpu.models.mae import MaskedAutoencoderViT, build_imputer_model  # noqa: F401
from ribca_tpu.models.convert import (  # noqa: F401
    convert_vit_state_dict,
    convert_mae_state_dict,
    load_torch_checkpoint,
)
from ribca_tpu.models.store import load_params, save_params  # noqa: F401
