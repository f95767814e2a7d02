"""Parallelism: device meshes and SPMD train/eval steps.

Replaces the reference's DDP/NCCL layer (`utils/engine/base_trainer.py:64-87`,
SURVEY.md §2.8) with jax.sharding: a ('dp', 'mp') mesh where dp shards scan
pairs (data parallel — the reference's only strategy) and mp is an intra-pair
model-parallel axis sharding the point dimension of the backbone (no
reference equivalent; TPU-native extension).
"""

from lcrnet_tpu.parallel.mesh import make_mesh, process_local_batch_slice, setup_distributed
from lcrnet_tpu.parallel.retrieval import sharded_causal_topk_search
