"""pmf_tpu — a TPU-native camera+LiDAR fusion segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ICEORY/PMF
(PMF, ICCV 2021 / EPMF, TPAMI 2024): perspective-projection multi-sensor
fusion for 3D LiDAR semantic segmentation.

Design stance (TPU-first, not a port):
  * All hot compute — perspective projection, z-buffer scatter, the
    two-stream fusion network, losses, KNN unprojection — runs inside
    ``jax.jit`` with static shapes; ragged point clouds are padded to
    fixed buckets with validity masks.
  * Data parallelism is expressed with ``jax.sharding`` over a Mesh;
    batch-norm statistics and metric reductions are global-batch
    semantics under jit, so cross-replica SyncBN comes for free
    (reference needed a custom thread-pipe SyncBN:
    pc_processor/layers/sync_bn.py).
  * NHWC layouts everywhere (TPU conv-native), bfloat16 compute with
    float32 accumulation on the MXU.

Subpackages mirror the reference's component inventory (SURVEY.md §2):
  data/     dataset adapters + projection pipelines (pc_processor/dataset)
  models/   SalsaNext / PMFNet / EPMFNet               (pc_processor/models)
  losses/   focal, Lovász, KL, dice, multi-task, ...   (pc_processor/loss)
  metrics/  IoU / accuracy evaluators                  (pc_processor/metrics)
  ops/      z-buffer scatter, KNN, Pallas kernels
  postproc/ KNN 2D→3D label lifting                    (pc_processor/postproc)
  parallel/ mesh + sharding utilities                  (pc_processor/utils/utils.py)
  train/    generic trainer, optimizers, schedules, checkpointing (tasks/*/trainer.py)
  config/   typed experiment configs                   (tasks/*/option.py)
"""

__version__ = "0.1.0"
