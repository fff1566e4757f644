"""dram_tpu — TPU-native (JAX/XLA/Pallas) weakly-supervised lesion segmentation.

A from-scratch rebuild of the capabilities of DIAGNijmegen/bodyct-dram
(Dense Regression Activation Maps, arXiv:2105.11748) designed for TPU:

- compute path: JAX / XLA / Pallas, channels-last NDHWC, bf16-friendly
- parallelism: jax.sharding Mesh + pjit/shard_map over ICI (data parallel
  training, halo-exchange spatial parallelism for whole-scan inference)
- the DGL graph-attention refinement of the reference is re-designed as
  masked stencil (windowed voxel) attention with no graph library
- preprocessing, pseudo-labeling, Otsu thresholding and heatmap stitching
  run on device instead of the reference's host round-trips

Subpackages:
  core    device ops (windowing, resize/resample, otsu, pooling), mesh layer
  data    MHA I/O, datasets, sampler, transforms, prepare_data
  models  3D U-Net (DC3D), stencil attention (PCM), attention model (DC3DATGeneric)
  losses  interval regression, bootstrap BCE, refinement, equivariance
  train   trainer / evaluator / checkpointing
  infer   full-scan inference engine
"""

__version__ = "0.1.0"
