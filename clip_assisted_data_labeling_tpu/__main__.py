"""Package entry point: print the stage map."""
USAGE = """clip_assisted_data_labeling_tpu — TPU-native CLIP-assisted dataset labeling

Pipeline stages (python -m clip_assisted_data_labeling_tpu.pipeline.<stage>):
  prep            uuid-rename + normalize a raw image directory
  embed           4-crop CLIP embeddings + image stats (TPU, fused)
  dedup           all-pairs near-duplicate removal (mesh-sharded)
  label           interactive labeling UI (opencv or headless)
  train           FC regressor on (embedding -> label) pairs
  predict         score every image, update the CSV database
  loop            the active-learning cycle as one command:
                  label -> train -> predict -> re-sort, N laps
  subset          export a score-filtered subset
  predict_simple  standalone per-image scorer
  store           columnar-store management (rebuild from sidecars / info)

Tools (python -m clip_assisted_data_labeling_tpu.tools.<tool>):
  find_similar_imgs, svm_similarity, merge_datasets, move_subset_of_files,
  fix_img_dir, investigate_embedding, train_latent_regressor

Docs: README.md, PARITY.md (component map), BENCH_NOTES.md (measured numbers).
"""

if __name__ == "__main__":
    print(USAGE)
