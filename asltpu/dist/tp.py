"""Tensor parallelism over the mesh's spare ``model`` axis.

SURVEY.md §2.4 scoped TP out of v1 ("not needed at these model sizes")
but required the mesh keep a spare ``model`` axis so it is addable
without re-plumbing callers. This module adds it for the one place the
capability contract has a TP-shaped workload — the 4-layer transformer
encoder head (config #3, ``BASELINE.json:8``) — as pure GSPMD sharding
annotations: Megatron-style param placements, XLA inserts the ICI
collectives. No hand-written collectives, no model rewrite; the SAME
flax modules run unmodified.

Placement rules (the classic column-then-row pairing, chosen so each
encoder block needs exactly ONE reduction on its attention path and one
on its MLP path, both lowered by GSPMD to ``psum`` over ICI):

  - attention q/k/v kernels ``[d, H, dh]`` — shard the HEAD axis
    (column-parallel: each model shard computes its own heads);
  - attention out kernel ``[H, dh, d]`` — shard the head axis
    (row-parallel: per-shard partial outputs, GSPMD all-reduces);
  - mlp1 kernel ``[d, ff]`` — shard ``ff`` (column-parallel), its bias
    with it; mlp2 kernel ``[ff, d]`` — shard ``ff`` (row-parallel),
    bias replicated;
  - everything else (layernorms, embeddings, backbone convs, the small
    classifier) — replicated.

The attention rules also match the fusion model's cross-attention blocks
(modules named ``*_attn`` — ``asltpu/models/fusion.py``), and the whole
scheme applies to TRAINING too: ``tp_variable_shardings`` on a full
TrainState shards the adamw moments with their params (path-matched), and
``asltpu.train.loop.make_train_step`` consumes that tree as in/out
shardings — gradients of sharded params stay sharded; GSPMD inserts the
backward-pass collectives.

Requires ``num_heads % model_parallel == 0`` and
``(d_model * mlp_ratio) % model_parallel == 0`` (true for the contract
head: 8 heads, ff 2048).

Numerical equivalence (TP logits == replicated logits at fp32 tolerance)
is asserted in ``tests/unit/test_tp.py`` on the virtual 8-device mesh and
exercised by ``__graft_entry__._dryrun_impl`` phase 5.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from asltpu.dist.mesh import MODEL_AXIS

# Path-segment rules: (segment that must appear in the param path,
# leaf name, rank) -> PartitionSpec. Checked in order; first match wins.
_ATTN_PROJ = ("query", "key", "value")


def _spec_for(path) -> P:
    """PartitionSpec for one param, from its flax path (tuple of str)."""
    segs = [getattr(k, "key", str(k)) for k in path]
    name = segs[-1] if segs else ""
    parents = segs[:-1]
    # Both attention rules gate on an attention-module parent (``attn`` in
    # the encoder blocks, ``*_attn`` in the fusion cross-attention) — a
    # bare submodule that happens to be named query/key/value/out outside
    # attention must stay replicated (its kernel rank wouldn't even match
    # the attention specs).
    in_attn = any(p == "attn" or p.endswith("_attn") for p in parents)
    if in_attn and any(p in _ATTN_PROJ for p in parents):
        # q/k/v: kernel [d, H, dh], bias [H, dh] — shard the head axis.
        if name == "kernel":
            return P(None, MODEL_AXIS, None)
        if name == "bias":
            return P(MODEL_AXIS, None)
    if in_attn and "out" in parents:
        # out: kernel [H, dh, d] — row-parallel over heads; bias replicated
        # (added once after the all-reduce).
        if name == "kernel":
            return P(MODEL_AXIS, None, None)
        return P()
    if "mlp1" in parents:
        # [d, ff] column-parallel; bias [ff] sharded with the output.
        return P(None, MODEL_AXIS) if name == "kernel" else P(MODEL_AXIS)
    if "mlp2" in parents:
        # [ff, d] row-parallel; bias replicated.
        return P(MODEL_AXIS, None) if name == "kernel" else P()
    return P()


def tp_variable_shardings(variables, mesh: Mesh):
    """NamedSharding pytree for ``variables``: transformer/cross-attention
    blocks get the Megatron placements above, everything else is
    replicated. Works on ANY pytree, matched by path segments:

      - a flax variables dict (``params`` + optionally ``batch_stats``);
      - a full :class:`asltpu.train.loop.TrainState` — the adamw moments
        mirror the param tree inside ``opt_state``, so each moment leaf
        path contains the same segments as its param and shards WITH it
        (scalars like ``count``/``step`` come out replicated);
      - trees without an attention/MLP structure (bilstm, the CNN
        backbones) come out fully replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, _spec_for(path)), variables
    )


def tp_shard_variables(variables, mesh: Mesh):
    """Place ``variables`` onto the mesh under the TP placements.

    Serial per-leaf placement — each ``device_put`` is blocked on before
    the next is issued, the same discipline as ``api.serial_device_put``:
    concurrent pytree transfers thrash this host's relay link (README
    env-limits §2), and ``device_put`` alone is async."""
    shardings = tp_variable_shardings(variables, mesh)

    def _put(x, s):
        placed = jax.device_put(x, s)
        jax.block_until_ready(placed)
        return placed

    return jax.tree.map(_put, variables, shardings)


def validate_tp_divisibility(num_heads: int, d_model: int, mlp_ratio: int,
                             model_parallel: int) -> None:
    """Raise ValueError unless the head's shapes divide the model axis."""
    if model_parallel <= 1:
        return
    if num_heads % model_parallel:
        raise ValueError(
            f"num_heads={num_heads} not divisible by "
            f"model_parallel={model_parallel}"
        )
    if (d_model * mlp_ratio) % model_parallel:
        raise ValueError(
            f"mlp width {d_model * mlp_ratio} not divisible by "
            f"model_parallel={model_parallel}"
        )
