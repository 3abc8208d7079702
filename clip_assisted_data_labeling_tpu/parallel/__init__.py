from clip_assisted_data_labeling_tpu.parallel.mesh import (
    get_mesh,
    device_count,
    shard_batch,
)
from clip_assisted_data_labeling_tpu.parallel.dedup_sharded import (
    find_duplicate_pairs_sharded,
)
from clip_assisted_data_labeling_tpu.parallel.embed_sharded import ShardedEmbedder
