"""SPMD training step and optimization setup.

Replaces the reference engine's trainer internals
(`utils/engine/base_trainer.py:179-239`, `epoch_based_trainer.py:87-233`):
DDP wrap + NCCL allreduce become sharding annotations on a jitted step (XLA
inserts the gradient psum over the dp mesh axis); the NaN/Inf gradient guard
(`base_trainer.py:224-232`) becomes optax.apply_if_finite; gradient
accumulation (`base_trainer.py:213-216`) becomes optax.MultiSteps.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lcrnet_tpu.config import LCRNetConfig
from lcrnet_tpu.engine.adan import adan
from lcrnet_tpu.models.lcrnet import LCRNet
from lcrnet_tpu.models.losses import overall_loss
from lcrnet_tpu.pipeline import build_batch_pyramid


class PairBatch(NamedTuple):
    """A dp-shardable batch of registration pairs.

    points: (P, 2, N0, 3); masks: (P, 2, N0); transform: (P, 4, 4).
    """

    points: jnp.ndarray
    masks: jnp.ndarray
    transform: jnp.ndarray


def make_optimizer(cfg: LCRNetConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam + StepLR(decay_steps epochs, x lr_decay) for registration,
    Adan for loop detection (reference `trainval_mixed.py:34-37`,
    `trainval_loop_detection.py:37`)."""
    schedule = optax.exponential_decay(
        init_value=cfg.optim.lr,
        transition_steps=cfg.optim.lr_decay_steps * max(steps_per_epoch, 1),
        decay_rate=cfg.optim.lr_decay,
        staircase=True,
    )
    if cfg.optim.optimizer == "adan":
        tx = adan(schedule, weight_decay=cfg.optim.weight_decay)
    else:
        tx = optax.adamw(schedule, weight_decay=cfg.optim.weight_decay)
    tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    if cfg.optim.grad_acc_steps > 1:
        tx = optax.MultiSteps(tx, cfg.optim.grad_acc_steps)
    return tx


class TrainState(train_state.TrainState):
    """flax TrainState + optional Polyak (EMA) parameter average.

    When `ema_params` is set (see `create_train_state(ema_decay=...)`), every
    `apply_gradients` also folds the fresh params into the exponential moving
    average — evaluating with the average damps the late-training pose-error
    fluctuation seen on marginal pairs (ACCURACY_r03.md training dynamics:
    0.2–2.7° swings between snapshots).  `ema_params is None` is resolved at
    trace time, so the default path compiles to the exact same program as
    before.
    """

    ema_params: Optional[Any] = None
    ema_decay: float = dataclasses.field(metadata={"pytree_node": False}, default=0.0)

    def apply_gradients(self, *, grads, **kwargs):
        state = super().apply_gradients(grads=grads, **kwargs)
        if self.ema_params is not None:
            d = self.ema_decay
            ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, self.ema_params, state.params
            )
            state = state.replace(ema_params=ema)
        return state

    @property
    def eval_params(self):
        """Parameters to evaluate with: the EMA if tracked, else the raw."""
        return self.ema_params if self.ema_params is not None else self.params


def create_train_state(
    cfg: LCRNetConfig,
    params,
    steps_per_epoch: int = 1,
    trainable_subtrees: Optional[Tuple[str, ...]] = None,
    ema_decay: float = 0.0,
) -> TrainState:
    """Build the optimizer state.

    trainable_subtrees: if given, only the named top-level parameter subtrees
    receive updates — all others are hard-frozen (zeroed updates, so weight
    decay cannot drift them).  Used by the loop-detection frozen mode
    (reference offline/half training, `LCRNet_GlobalDescrition.py:25-110`,
    which only optimizes the NetVLAD head)."""
    model = LCRNet(cfg)
    tx = make_optimizer(cfg, steps_per_epoch)
    if trainable_subtrees is not None:
        keep = set(trainable_subtrees)
        freeze_mask = {"params": {k: k not in keep for k in params["params"]}}
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), freeze_mask))
    extra = {}
    if ema_decay > 0.0:
        # real copies: jnp.asarray would alias the param buffers, and the
        # donated train step must not see aliased inputs (NOTES.md trap)
        extra = {"ema_params": jax.tree.map(jnp.copy, params),
                 "ema_decay": ema_decay}
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx, **extra)


def make_train_step(cfg: LCRNetConfig, mesh: Optional[Mesh] = None,
                    return_grads: bool = False):
    """Build the jitted dp-sharded registration train step.

    Returns step(state, batch: PairBatch, rng) -> (state, metrics).  The pair
    axis of the batch is sharded over the mesh 'dp' axis; parameters are
    replicated; the gradient mean induces the cross-device psum.

    return_grads: include the raw gradient tree in the metrics dict
    (debug/test only — keeps a full parameter-sized tree alive).
    """
    model = LCRNet(cfg)

    def pair_loss(params, points, masks, transform, key):
        pyramid = build_batch_pyramid(points, masks, cfg)
        out = model.apply(
            params,
            pyramid,
            transform,
            training=True,
            with_fine_matching=False,
            rngs={"sampling": key},
        )
        losses = overall_loss(out, transform, cfg)
        return losses["loss"], losses

    def loss_fn(params, batch: PairBatch, rng):
        keys = jax.random.split(rng, batch.points.shape[0])
        losses, aux = jax.vmap(pair_loss, in_axes=(None, 0, 0, 0, 0))(
            params, batch.points, batch.masks, batch.transform, keys
        )
        return jnp.mean(losses), jax.tree.map(jnp.mean, aux)

    def step(state: TrainState, batch: PairBatch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        state = state.apply_gradients(grads=grads)
        aux = dict(aux)
        aux["grad_norm"] = optax.global_norm(grads)
        if return_grads:
            aux["grads"] = grads
        return state, aux

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    # dp shards pairs; mp (if >1) shards the point axis within each cloud —
    # the sequence-parallel analogue for point clouds (SURVEY.md §2.8)
    batch_sharding = PairBatch(
        points=NamedSharding(mesh, P("dp", None, "mp")),
        masks=NamedSharding(mesh, P("dp", None, "mp")),
        transform=NamedSharding(mesh, P("dp")),
    )
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(None, batch_sharding, replicated),
        donate_argnums=(0,),
    )


def make_train_step_mp(cfg: LCRNetConfig, mesh: Mesh, return_grads: bool = False):
    """Explicit ring-halo (dp, mp) train step via shard_map.

    Same optimization math as `make_train_step` (the equivalence is pinned in
    tests/test_halo.py), but the point axis is sharded with the halo exchange
    (parallel/halo.py) instead of XLA propagation — per-conv traffic is two
    ring ppermutes of the bottleneck channels rather than the ~908 MB/step of
    point-axis all-gathers the automatic path materializes at production
    shapes.

    Gradient correctness needs no per-subtree bookkeeping: the decoder exit
    all-gathers the fine features, and its AD transpose (psum_scatter) sums
    the identical upstream cotangents from all mp devices, scaling every
    sharded-stage gradient by exactly mp; replicated-stage gradients are
    bit-identical per device.  A uniform `pmean` over ("dp", "mp") therefore
    yields the exact full-batch gradient for both groups at once.

    mesh: ('dp', 'mp') Mesh.  Pairs shard over dp; each pair's points are
    replicated within its mp group (the pyramid is selection work, cheap to
    replicate) and the KPConv stages compute on point shards.
    """
    from jax.experimental.shard_map import shard_map

    model = LCRNet(cfg)

    def pair_loss(params, points, masks, transform, key):
        pyramid = build_batch_pyramid(points, masks, cfg)
        out = model.apply(
            params,
            pyramid,
            transform,
            training=True,
            with_fine_matching=False,
            rngs={"sampling": key},
            spmd_axis="mp",
        )
        losses = overall_loss(out, transform, cfg)
        return losses["loss"], losses

    def local_step(state: TrainState, batch: PairBatch, keys):
        # batch/keys hold this dp-shard's pairs; every mp peer sees the same
        # pairs and the same keys (replicated node-scale compute needs
        # identical sampling), matching the unsharded key-per-pair stream
        def loss_fn(params):
            losses, aux = jax.vmap(pair_loss, in_axes=(None, 0, 0, 0, 0))(
                params, batch.points, batch.masks, batch.transform, keys
            )
            return jnp.mean(losses), jax.tree.map(jnp.mean, aux)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, ("dp", "mp"))
        aux = jax.lax.pmean(aux, ("dp", "mp"))
        state = state.apply_gradients(grads=grads)
        aux = dict(aux)
        aux["grad_norm"] = optax.global_norm(grads)
        if return_grads:
            aux["grads"] = grads
        return state, aux

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(),
            PairBatch(points=P("dp"), masks=P("dp"), transform=P("dp")),
            P("dp"),
        ),
        out_specs=(P(), P()),
        check_rep=False,
    )

    def step(state: TrainState, batch: PairBatch, rng):
        keys = jax.random.split(rng, batch.points.shape[0])
        return sharded(state, batch, keys)

    return jax.jit(step, donate_argnums=(0,))


def make_train_multistep(cfg: LCRNetConfig, num_steps: int):
    """K sequential optimizer steps in ONE jitted program (lax.scan over a
    (K, ...) sample batch).

    Under the axon relay each program dispatch costs ~25-50 ms of host
    round-trip; a single-pair step is ~313 ms of device time but a live
    1-step-per-dispatch loop measures ~630 ms (key split + 3 transfers +
    step = 4+ dispatches).  Scanning K steps per dispatch amortizes all of
    it: measured 1.6 -> ~2.9 steps/s at K=8.  Identical optimization math
    to K calls of `make_train_step`'s step (the scan carries the exact same
    (params, opt_state) chain; the key is split inside).

    Returns step(state, batches: PairBatch with leading (K, B) axes, rng)
    -> (state, metrics averaged over the K steps).
    """
    model = LCRNet(cfg)

    def pair_loss(params, points, masks, transform, key):
        pyramid = build_batch_pyramid(points, masks, cfg)
        out = model.apply(
            params,
            pyramid,
            transform,
            training=True,
            with_fine_matching=False,
            rngs={"sampling": key},
        )
        losses = overall_loss(out, transform, cfg)
        return losses["loss"], losses

    def one_step(state: TrainState, x):
        batch, key = x
        def loss_fn(params):
            keys = jax.random.split(key, batch.points.shape[0])
            losses, aux = jax.vmap(pair_loss, in_axes=(None, 0, 0, 0, 0))(
                params, batch.points, batch.masks, batch.transform, keys
            )
            return jnp.mean(losses), jax.tree.map(jnp.mean, aux)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        aux = dict(aux)
        aux["grad_norm"] = optax.global_norm(grads)
        return state, aux

    def multistep(state: TrainState, batches: PairBatch, rng):
        keys = jax.random.split(rng, num_steps)
        state, metrics = jax.lax.scan(one_step, state, (batches, keys))
        return state, jax.tree.map(jnp.mean, metrics)

    return jax.jit(multistep, donate_argnums=(0,))


def make_eval_step(cfg: LCRNetConfig):
    """Jitted validation step: PairBatch -> mean PIR/IR/RRE/RTE/RR
    (reference `epoch_based_trainer.py:230-233` inference_epoch)."""
    from lcrnet_tpu.models.losses import evaluate_pair

    model = LCRNet(cfg)

    def pair_metrics(params, points, masks, transform):
        pyramid = build_batch_pyramid(points, masks, cfg)
        out = model.apply(params, pyramid, transform, training=False)
        return evaluate_pair(out, transform, cfg)

    @jax.jit
    def step(params, batch: PairBatch):
        metrics = jax.vmap(pair_metrics, in_axes=(None, 0, 0, 0))(
            params, batch.points, batch.masks, batch.transform
        )
        return jax.tree.map(jnp.mean, metrics)

    return step


def make_descriptor_train_step(cfg: LCRNetConfig, num_pos: int, num_neg: int,
                               mesh: Optional[Mesh] = None, frozen: bool = False):
    """Loop-detection (retrieval) train step: anchor/positive/negative tuples
    through the descriptor path + lazy triplet loss (reference
    `LCRNet_GlobalDescrition.py:25-110` online mode + `loss_ld.py:29-58`).

    frozen=True stops gradients at the encoder (the reference's offline/half
    modes); pair it with `create_train_state(..., trainable_subtrees=("netvlad",))`
    so the frozen parameters cannot drift under weight decay.

    Batch layout: points (B, 1+num_pos+num_neg, N0, 3), masks likewise.
    """
    from lcrnet_tpu.models.losses import triplet_loss

    model = LCRNet(cfg)
    group = 1 + num_pos + num_neg

    def tuple_loss(params, points, masks):
        flat_p = points.reshape((-1,) + points.shape[2:])
        flat_m = masks.reshape((-1,) + masks.shape[2:])
        pyramid = build_batch_pyramid(flat_p, flat_m, cfg)
        desc = model.apply(params, pyramid, frozen, method=LCRNet.describe)
        desc = desc.reshape(points.shape[0], group, -1)
        anc = desc[:, :1]
        pos = desc[:, 1 : 1 + num_pos]
        neg = desc[:, 1 + num_pos :]
        return triplet_loss(anc, pos, neg, cfg.loss.triplet_margin)

    def step(state: TrainState, points, masks):
        loss, grads = jax.value_and_grad(tuple_loss)(state.params, points, masks)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    return jax.jit(
        step,
        in_shardings=(
            None,
            NamedSharding(mesh, P("dp")),
            NamedSharding(mesh, P("dp")),
        ),
        donate_argnums=(0,),
    )


def _half_tuple_loss_fn(cfg: LCRNetConfig, num_pos: int, num_neg: int):
    from lcrnet_tpu.models.losses import triplet_loss

    model = LCRNet(cfg)

    def tuple_loss(params, points, masks, cache_feats, cache_masks, idx):
        pyramid = build_batch_pyramid(points, masks, cfg)
        # device-resident cache gather: (B, G') indices -> (B, G', C4, D).
        # The whole sequence's dumps live in HBM once (478 KITTI-scale
        # frames ~= 1.9 GB); per-step traffic is an on-device gather
        # instead of a 16 MB host->device transfer per tuple.
        cached_feats = cache_feats[idx]
        cached_masks = cache_masks[idx]
        desc = model.apply(params, pyramid, cached_feats, cached_masks,
                           method=LCRNet.describe_with_cache)
        anc = desc[:, :1]
        pos = desc[:, 1 : 1 + num_pos]
        neg = desc[:, 1 + num_pos :]
        return triplet_loss(anc, pos, neg, cfg.loss.triplet_margin)

    return tuple_loss


def make_descriptor_train_step_half(cfg: LCRNetConfig, num_pos: int, num_neg: int):
    """Cached-feature ('half') descriptor train step — the reference's
    throughput mode (`LCRNet_GlobalDescrition.py:78-86`, half-online collate
    `data.py:235-287`): the encoder forward runs on the ANCHOR only (no
    gradient, like the reference's torch.no_grad); positives and negatives
    are consumed as pre-extracted stage-4 feature dumps
    (`experiments/preextract_features.py`) held device-resident.  Only
    NetVLAD receives gradients — pair with `create_train_state(...,
    trainable_subtrees=("netvlad",))`.

    step(state, points (B, N0, 3), masks (B, N0),
         cache_feats (F, C4, 1024), cache_masks (F, C4),
         idx (B, num_pos+num_neg) int32 rows into the cache)
      -> (state, metrics)
    """
    tuple_loss = _half_tuple_loss_fn(cfg, num_pos, num_neg)

    def step(state: TrainState, points, masks, cache_feats, cache_masks, idx):
        loss, grads = jax.value_and_grad(tuple_loss)(
            state.params, points, masks, cache_feats, cache_masks, idx)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(step, donate_argnums=(0,))


def make_descriptor_train_multistep_half(cfg: LCRNetConfig, num_pos: int, num_neg: int):
    """K half-mode steps per dispatch (lax.scan): points/masks/idx carry a
    leading (K, ...) axis; the feature cache is passed ONCE (not scanned)."""
    tuple_loss = _half_tuple_loss_fn(cfg, num_pos, num_neg)

    def one_step(carry, x):
        state, cache_feats, cache_masks = carry
        points, masks, idx = x
        loss, grads = jax.value_and_grad(tuple_loss)(
            state.params, points, masks, cache_feats, cache_masks, idx)
        state = state.apply_gradients(grads=grads)
        return (state, cache_feats, cache_masks), {
            "loss": loss, "grad_norm": optax.global_norm(grads)}

    def multistep(state: TrainState, points, masks, cache_feats, cache_masks, idx):
        (state, _, _), metrics = jax.lax.scan(
            one_step, (state, cache_feats, cache_masks), (points, masks, idx))
        return state, jax.tree.map(jnp.mean, metrics)

    return jax.jit(multistep, donate_argnums=(0,))


def make_descriptor_train_multistep(cfg: LCRNetConfig, num_pos: int, num_neg: int,
                                    frozen: bool = False):
    """K descriptor train steps per dispatch (lax.scan) — the relay-latency
    amortization of `make_train_multistep` for the triplet path.

    step(state, points (K, B, G, N, 3), masks (K, B, G, N)) ->
    (state, metrics averaged over K)."""
    base = make_descriptor_train_step(cfg, num_pos, num_neg, frozen=frozen)

    def one_step(state, x):
        points, masks = x
        return base(state, points, masks)

    def multistep(state: TrainState, points, masks):
        state, metrics = jax.lax.scan(one_step, state, (points, masks))
        return state, jax.tree.map(jnp.mean, metrics)

    return jax.jit(multistep, donate_argnums=(0,))
