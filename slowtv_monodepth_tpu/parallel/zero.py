"""ZeRO-style training-state sharding over the data mesh.

The reference's only parallelism is replicated-everything DDP (SURVEY.md
§2.9: Lightning DDP, NCCL grad all-reduce). On a TPU mesh the SAME step
function can run with the optimizer state — and optionally the master
parameters — sharded over the `data` axis, purely by changing sharding
annotations: XLA's SPMD partitioner then reduce-scatters gradients into the
shards, runs the adamw moment/param update on 1/N of every buffer, and
all-gathers parameters where the forward needs them. No step-function or
optimizer changes; collectives ride ICI.

Stages (DeepSpeed numbering; both exact — the update math is unchanged):

- ``zero=1``: shard the optimizer state (adamw: two f32 moments + the f32
  master-param copies inside the wd-mask tree). Per-chip optimizer memory
  drops ~N×; params stay replicated, so the forward/backward is untouched.
- ``zero=3``: additionally shard the master params (FSDP-equivalent).
  Working copies are all-gathered per use and freed after; per-chip state
  memory approaches (params + opt) / N. Worth it for encoders whose state
  doesn't fit replicated (e.g. ConvNeXt-L / ViT-L DPT at large batch).

Each array leaf shards its largest mesh-divisible dimension; leaves with no
divisible dimension (scalars, tiny biases on big meshes) stay replicated —
the memory they'd save is below collective-latency noise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['zero_leaf_spec', 'state_shardings', 'shard_state']


def zero_leaf_spec(x, n: int, axis: str) -> P:
    """Spec sharding `x`'s largest `n`-divisible dim over `axis` (P() if none)."""
    shape = jnp.shape(x)
    best = None
    for d, s in enumerate(shape):
        if s % n == 0 and s > 0 and (best is None or s > shape[best]):
            best = d
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def state_shardings(mesh: Mesh, state, zero: int, axis: str = 'data'):
    """Per-leaf NamedSharding pytree for a `TrainState` under a ZeRO stage.

    :param state: `core.trainer.TrainState` (or any pytree with `.params` /
        `.opt_state` / `.aux` / `.step` attributes and `.replace`).
    :param zero: 0 = replicate everything (plain DDP), 1 = shard opt state,
        3 = shard opt state + params.
    """
    repl = NamedSharding(mesh, P())
    n = mesh.shape[axis]

    def shard(v):
        return NamedSharding(mesh, zero_leaf_spec(v, n, axis))

    def tree(t, sharded: bool):
        return jax.tree_util.tree_map(shard if sharded else (lambda _: repl), t)

    return state.replace(
        step=repl,
        params=tree(state.params, zero >= 3),
        aux=tree(state.aux, False),
        opt_state=tree(state.opt_state, zero >= 1),
        bad_step=None if state.bad_step is None else repl,
    )


def shard_state(mesh: Mesh, state, zero: int, axis: str = 'data'):
    """Place a `TrainState` onto the mesh under the given ZeRO stage.

    Must run BEFORE the first step so the jitted step compiles once, for the
    committed layout it will keep seeing (jit caches key on input shardings).
    """
    return jax.device_put(state, state_shardings(mesh, state, zero, axis))
