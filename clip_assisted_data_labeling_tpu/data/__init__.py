from clip_assisted_data_labeling_tpu.data.loader import (
    Batch,
    BatchedImageLoader,
    find_images,
)
