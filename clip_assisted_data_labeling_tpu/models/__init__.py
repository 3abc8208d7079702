from clip_assisted_data_labeling_tpu.models.vit import (
    VitConfig,
    MODEL_REGISTRY,
    init_vit_params,
    vit_encode_image,
)
from clip_assisted_data_labeling_tpu.models.encoders import CLIPImageEncoder, create_encoder
from clip_assisted_data_labeling_tpu.models.regressor import (
    RegressorMeta,
    SimpleFCRegressor,
)
