from clip_assisted_data_labeling_tpu.ui.backend import (
    HeadlessBackend,
    LabelBackend,
    OpenCVBackend,
)
from clip_assisted_data_labeling_tpu.ui.sorting import re_order_images
