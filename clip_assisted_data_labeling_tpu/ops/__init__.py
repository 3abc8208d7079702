from clip_assisted_data_labeling_tpu.ops.crops import (
    crop_boxes,
    make_crop_params,
    fused_crop_resize_normalize,
)
from clip_assisted_data_labeling_tpu.ops.image_stats import (
    IMG_STAT_KEYS,
    image_stats_batch,
    image_stats_reference,
    make_stat_params,
)
