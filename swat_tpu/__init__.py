"""swat_tpu — a TPU-native (JAX / Flax / Pallas / pjit) framework with the
capabilities of tian1327/SWAT (CVPR 2025): stage-wise retrieval-augmented
finetuning of CLIP for few-shot recognition.

Subpackages
-----------
core       mesh & sharding setup, PRNG discipline, precision policy
models     Flax CLIP towers (ViT + text transformer), OpenCLIP weight loader,
           classifier heads, BPE tokenizer
kernels    Pallas fused attention, on-device augmentation math, top-k helpers
data       split-file datasets, host decode pipeline, prompt/template registry,
           feature cache
train      method registry (18 training methods), losses, optimizer factories,
           stage orchestration (stage1 / stage2 / WiSE-FT / tau-norm)
eval       validate(), confusion matrices, per-class scores, OOD suite
retrieval  caption string-match indexer (C++), sharded embedding ranker,
           T2T/T2I/I2I/I2T samplers
cli        main.py-compatible command line
"""

__version__ = "0.1.0"
