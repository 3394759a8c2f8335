"""TPU-native dynamic driving-scene Gaussian-splatting framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
BigCiLeng/bilateral-driving (NeurIPS 2025, "Unifying Appearance Codes and
Bilateral Grids for Driving Scene Gaussian Splatting"): a differentiable
tile-based Gaussian rasterizer written as Pallas TPU kernels, multi-scale
bilateral-grid appearance transforms, an OmniRe-style scene graph (static
background, rigid vehicles, deformable objects, SMPL pedestrians), sky models,
camera-pose refinement, and a lidar-supervised trainer — all architected
TPU-first: static shapes, functional state pytrees, MXU-friendly compositing,
and `jax.sharding` SPMD parallelism instead of the reference's single-GPU CUDA
pipeline.

Layout (see SURVEY.md for the reference layer map this mirrors):
  core/      math primitives: quaternions, SE(3), spherical harmonics, Gaussian
             state pytrees with static capacity (reference: models/gaussians/basics.py)
  ops/       the compute path: projection, tile binning, Pallas tile rasterizer
             with custom VJP (reference: gsplat CUDA kernels), KNN, SSIM
  models/    scene-graph nodes, bilateral grids, sky, affine, camera-opt
             (reference: project/models/, project/bilateral/)
  train/     trainer, losses, density control, schedules, checkpointing
             (reference: project/models/trainers/)
  data/      scene dataset layer over the drivestudio on-disk format
             (reference: project/datasets/)
  parallel/  device mesh + shard_map sharding of tiles/Gaussians (new; the
             reference is strictly single-GPU)
  tools/     train/eval/render CLIs (reference: project/tools/)
"""

__version__ = "0.1.0"
