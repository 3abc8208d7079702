from clip_assisted_data_labeling_tpu.store.sidecar import (
    assemble_features,
    has_model_key,
    read_sidecar,
    resolve_crop_key,
    write_sidecar,
)
from clip_assisted_data_labeling_tpu.store.database import LabelDatabase
from clip_assisted_data_labeling_tpu.store.columnar import EmbeddingStore
