"""xmir_tpu: TPU-native medical image-retrieval framework.

A from-scratch JAX/XLA/Pallas rebuild of the X-MIR-derived retrieval stack in
CrispyChillies/Image-Retrieval---Thesis-2026 (see SURVEY.md). Layer map:

  data/      datasets, manifests, PK / multi-label samplers, jit preprocessing
  models/    Flax embedding backbones (DenseNet121, ResNet50, ConvNeXtV2(+SRA/PCAM),
             SwinV2, DINOv2/ViT, SigLIP (MedSigLIP), ConceptCLIP-style, ATHNet)
  losses/    pure-jnp metric-learning losses (triplet, SupCon, Jaccard variants,
             ASL, dual-branch, IT-Align, RC-Align, hashing)
  metrics/   retrieval / saliency / anomaly metrics, golden-matched to the reference
  ops/       Pallas TPU kernels (fused similarity + top-K, blur, resize)
  index/     ShardedGalleryIndex: the HBM-resident Milvus replacement
  parallel/  mesh + sharding helpers (dp x model), collectives
  train/     pjit train steps, optimizer groups, checkpointing, loops
  xai/       SBSM / SimAtt / SimCAM / attention rollout, insertion-deletion metrics
  cli/       reference-compatible entry points (train, test, saliency, ingest, query)
"""

__version__ = "0.1.0"
