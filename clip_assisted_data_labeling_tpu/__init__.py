"""clip_assisted_data_labeling_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
CLIP-assisted active-learning dataset labeling and filtering.

Re-designed from scratch for TPU hardware with the capabilities of the reference
toolkit aiXander/CLIP_assisted_data_labeling (see SURVEY.md): a 7-stage pipeline
(prep → embed → dedup → label → train → predict → subset) over a filesystem data
contract (uuid-keyed image + feature sidecars + one CSV label database per dataset).

Layer map (bottom-up):
  store/     on-disk data contract: sidecar features, CSV label DB, columnar store
  ops/       device compute: fused crop/resize/normalize, image stats, similarity
  models/    flax ViT CLIP image tower, encoder registry, FC regressor
  parallel/  jax.sharding mesh utilities, DP embedding, sharded dedup
  data/      host-side image decode/batch pipeline feeding the device
  pipeline/  the stage CLI entry points
  ui/        labeling loop behind a pluggable backend (OpenCV / headless)
  tools/     similarity search, dataset merge, misc utilities
"""

__version__ = "0.1.0"
