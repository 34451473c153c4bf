# Default runtime (reference configs/_base_/default_runtime.py equivalent).
# Distribution is implicit: one host drives the jax.sharding data mesh;
# there is no dist backend knob (SURVEY.md §2c TPU plan).
log_interval = 50
max_keep_ckpts = 2
seed = 0
auto_scale_lr = True
base_batch_size = 16  # LR reference batch (reference auto_scale_lr)
# TensorBoard event files under <work_dir>/tb (reference
# TensorboardLoggerHook); degrades to JSONL-only without tensorboardX
tensorboard = True
