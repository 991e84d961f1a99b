"""Device mesh + sharding layout for SPMD training.

The reference scaffolds-but-never-initializes torch DDP (ref: SURVEY.md §2.4,
ssi/trainer.py:207,519). Here distribution is first-class and TPU-native: a 2-axis
``jax.sharding.Mesh`` ("dp", "tp"); gradients sync via the ``psum`` XLA inserts when
a jitted step consumes a dp-sharded batch with (possibly tp-sharded) params.

Layout rules (the "How to Scale Your Model" recipe — annotate, let XLA insert
collectives over ICI):

- batch ``[accum, B, S]``: ``P(None, "dp", None)`` — micro-batch axis is scanned,
  the per-device batch axis is data-parallel.
- params: replicated over "dp"; over "tp" the stacked layer weights shard on the
  head/ffn output axis for up-projections (wq/wk/wv/w_gate/w_up) and on the input
  axis for down-projections (wo/w_down) — the Megatron pairing, so each block needs
  a single all-reduce per sub-layer, inserted by XLA. The tied embedding shards
  over the vocab axis, which also distributes the fused cross-entropy's
  ``[tokens, vocab]`` logits.
- optimizer state shards exactly like its parameter.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

LOGGER = logging.getLogger(__name__)

__all__ = ["make_mesh", "param_specs", "param_shardings", "batch_sharding", "replicated", "shard_params"]


def make_mesh(dp: int | None = None, tp: int = 1, devices: list | None = None) -> Mesh:
    """Create a ("dp", "tp") mesh over the available devices.

    Args:
        dp: data-parallel size; ``None`` = all devices / tp.
        tp: tensor-parallel size (must divide the device count).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        if n % tp != 0:
            raise ValueError(f"Device count {n} not divisible by tp={tp}")
        dp = n // tp
    if dp * tp > n:
        raise ValueError(f"Requested dp*tp = {dp * tp} exceeds available devices ({n})")
    if dp * tp < n:
        LOGGER.warning(f"Mesh dp={dp} x tp={tp} uses {dp * tp} of {n} available devices; the rest stay idle.")
    device_grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(device_grid, axis_names=("dp", "tp"))


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree for the stacked Llama params (tp sharding rules)."""
    specs = {
        "embed": P("tp", None),  # vocab-sharded: distributes fused-CE logits too
        "final_norm": P(),
        "layers": {
            "attn_norm": P(),
            "mlp_norm": P(),
            "wq": P(None, None, "tp"),
            "wk": P(None, None, "tp"),
            "wv": P(None, None, "tp"),
            "wo": P(None, "tp", None),
            "w_gate": P(None, None, "tp"),
            "w_up": P(None, None, "tp"),
            "w_down": P(None, "tp", None),
        },
    }

    def pick(path, _leaf):
        node: Any = specs
        for p in path:
            node = node[p.key]
        return node

    return jax.tree_util.tree_map_with_path(pick, params)


def _divisible_spec(spec: P, shape: tuple[int, ...], mesh: Mesh) -> P:
    """Drop mesh axes that do not divide the corresponding array dimension.

    device_put of concrete arrays requires exact divisibility (unlike GSPMD inside
    jit, which pads). E.g. the extended vocab 133258 shards over tp=2 but not tp=4
    — fall back to replication for that dimension rather than fail.
    """
    out = []
    changed = False
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is not None and dim % mesh.shape[axis] != 0:
            LOGGER.warning(
                f"Array dim {dim} not divisible by mesh axis {axis!r}={mesh.shape[axis]}; replicating that dim."
            )
            out.append(None)
            changed = True
        else:
            out.append(axis)
    return P(*out) if changed else spec


def param_shardings(mesh: Mesh, params: Any) -> Any:
    return jax.tree.map(
        lambda spec, leaf: NamedSharding(mesh, _divisible_spec(spec, leaf.shape, mesh)),
        param_specs(params),
        params,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a (host) param pytree onto the mesh with the tp layout."""
    return jax.device_put(params, param_shardings(mesh, params))


def batch_sharding(mesh: Mesh, accum_axis: bool = True) -> NamedSharding:
    """Sharding for a collated batch: dp on the per-device batch axis."""
    spec = P(None, "dp", None) if accum_axis else P("dp", None)
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
