from waifu2x_tpu.models.srcnn import (  # noqa: F401
    LayerSpec,
    ModelSpec,
    WAIFU2X_7LAYER,
    init_params,
    validate_params,
)
from waifu2x_tpu.models.weights import (  # noqa: F401
    load_model_json,
    save_model_json,
    params_from_json_obj,
    params_to_json_obj,
)
