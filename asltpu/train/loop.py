"""Training loop (C12) — the I3D fine-tune obligation (``BASELINE.json:9``),
usable for every model in the zoo.

TPU shape (SURVEY.md §3.3): ONE jitted train step containing preprocess →
forward → loss → backward → ``psum`` grads over the ``data`` mesh axis
(inserted by GSPMD) → optax update, with the train state donated. The host
loop only feeds prefetched batches and handles checkpoints/metrics.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from asltpu.config import PreprocessConfig, TrainConfig
from asltpu.dist.mesh import batch_sharding, make_mesh, replicated_sharding
from asltpu.ops.preprocess import preprocess_clip


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


class FaultInjected(RuntimeError):
    """Raised by the train loop at ``TrainConfig.fault_inject_step`` to test
    checkpoint-resume (SURVEY.md §5.3)."""


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.num_steps, cfg.warmup_steps + 1),
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )


def create_train_state(
    module,
    cfg: TrainConfig,
    dummy_inputs: Tuple[Any, ...],
    seed: int = 0,
    model_cfg=None,
) -> TrainState:
    """Build the initial TrainState.

    ``model_cfg``: when given, parameter init routes through
    :func:`asltpu.api.init_variables` — on a relay-constrained TPU host
    that is a CPU-subprocess init with a disk cache and ONE packed upload,
    instead of jitting a full-model init program on the default backend
    (~90-300 s remote compile that also degrades the relay link ~50× for
    the rest of the process; README "known environment limits"). Note the
    two paths draw the init RNG differently, so parameters for the same
    seed differ between them (either is deterministic by itself).
    """
    rng = jax.random.PRNGKey(seed)
    init_rng, state_rng = jax.random.split(rng)
    if model_cfg is not None:
        from asltpu.api import init_variables

        variables = init_variables(module, model_cfg, seed)
    else:
        variables = jax.jit(module.init, static_argnums=())(
            init_rng, *dummy_inputs
        )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=state_rng,
    )


def softmax_ce(logits: jax.Array, labels: jax.Array, smoothing: float) -> jax.Array:
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if smoothing > 0:
        onehot = onehot * (1.0 - smoothing) + smoothing / num_classes
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def make_step_fn(
    module,
    train_cfg: TrainConfig,
    pp_cfg: Optional[PreprocessConfig] = None,
    augment=None,
):
    """Build the UNJITTED train step ``(state, batch_in, labels) → (state,
    metrics)`` — the traceable body that :func:`make_train_step` wraps in
    ``jax.jit``. Exposed separately so callers that need the step INSIDE a
    larger traced program (the bench's single-dispatch ``lax.fori_loop``
    over train steps) can reuse the exact production math.

    If ``pp_cfg`` is given, the step takes staged uint8 frames and runs the
    fused preprocess — the augmented variant (random resized crop / flip /
    color jitter, ``asltpu.ops.augment``) when ``augment`` is an
    AugmentConfig — inside the same XLA program (SURVEY.md §3.3).

    MULTI-INPUT models (``two_stream`` fusion: clip + landmarks) pass
    ``batch_in`` as a tuple; element 0 is the RGB input (preprocessed when
    ``pp_cfg`` is given) and the remaining elements feed the module
    verbatim, batch-sharded alongside it. Augmentation applies to the RGB
    element ONLY — geometric augments (hflip, crop) are NOT mirrored into
    landmark streams, so fusion training should keep them disabled unless
    the landmark pipeline applies the matching transform itself.
    """
    tx = make_optimizer(train_cfg)

    if (
        pp_cfg is not None
        and pp_cfg.staging_format == "yuv420"
        and augment is not None
        and getattr(augment, "enabled", False)
    ):
        raise ValueError(
            "yuv420 staging is an inference/serving wire optimization; "
            "train-time augmentation needs RGB staged frames (and spatial "
            "slack) — use staging_format='rgb' for training with augment"
        )

    def step_fn(state: TrainState, batch_in, labels):
        rng, dropout_rng, aug_rng = jax.random.split(state.rng, 3)
        # Tuple batch = multi-input model: element 0 is the RGB input
        # (through preprocess/augment below), the rest pass verbatim.
        # The isinstance is resolved at trace time (static structure).
        extras = ()
        if isinstance(batch_in, (tuple, list)):
            batch_in, *rest = batch_in
            extras = tuple(rest)
        if pp_cfg is None:
            clip = batch_in
        elif augment is not None and augment.enabled:
            from asltpu.ops.augment import augment_preprocess_clip

            clip = augment_preprocess_clip(aug_rng, batch_in, pp_cfg, augment)
        else:
            clip = preprocess_clip(batch_in, pp_cfg)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                logits, new_state = module.apply(
                    variables, clip, *extras, True,
                    rngs={"dropout": dropout_rng}, mutable=["batch_stats"],
                )
            else:
                logits = module.apply(
                    variables, clip, *extras, True,
                    rngs={"dropout": dropout_rng},
                )
                new_state = {}
            loss = softmax_ce(logits, labels, train_cfg.label_smoothing)
            return loss, (logits, new_state.get("batch_stats", state.batch_stats))

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        top1 = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        metrics = {
            "loss": loss,
            "top1": top1,
            "grad_norm": optax.global_norm(grads),
        }
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
                rng=rng,
            ),
            metrics,
        )

    return step_fn


def _uses_model_axis(mesh) -> bool:
    from asltpu.dist.mesh import MODEL_AXIS

    return mesh is not None and dict(mesh.shape).get(MODEL_AXIS, 1) > 1


def _tp_state_shardings(state_template, mesh):
    """Per-leaf NamedSharding tree for a TrainState under TP (Megatron
    placements for attention/MLP params AND their adamw moments —
    :func:`asltpu.dist.tp.tp_variable_shardings` path-matches both)."""
    from asltpu.dist.tp import tp_variable_shardings

    if state_template is None:
        raise ValueError(
            "a mesh with model axis > 1 (tensor parallelism) needs "
            "state_template= to derive per-leaf param/opt-state shardings"
        )
    return tp_variable_shardings(state_template, mesh)


def make_train_step(
    module,
    train_cfg: TrainConfig,
    pp_cfg: Optional[PreprocessConfig] = None,
    mesh=None,
    augment=None,
    state_template=None,
):
    """Build the jitted train step.

    Signature: ``(state, frames_or_clip, labels) → (state, metrics)`` —
    the :func:`make_step_fn` body under ``jax.jit`` with the state donated.
    When ``mesh`` is given, inputs are annotated batch-sharded over ``data``
    and state replicated — GSPMD inserts the grad ``psum`` over ICI.

    When the mesh's ``model`` axis is >1 (tensor parallelism,
    ``make_mesh(model_parallel=N)``), pass ``state_template`` (the actual
    TrainState — only its tree structure is read): the state's in/out
    shardings become the per-leaf Megatron placements from
    ``asltpu.dist.tp``, so attention/MLP params, their gradients, and
    their adamw moments all live sharded over ``model`` while the rest
    replicates. Equivalence with the replicated step is asserted in
    tests/unit/test_tp.py."""
    step_fn = make_step_fn(module, train_cfg, pp_cfg, augment)

    if mesh is not None:
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        state_sh = (
            _tp_state_shardings(state_template, mesh)
            if _uses_model_axis(mesh) else repl
        )
        return jax.jit(
            step_fn,
            in_shardings=(state_sh, data, data),
            out_shardings=(state_sh, repl),
            donate_argnums=(0,),
        )
    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(module, pp_cfg: Optional[PreprocessConfig] = None, mesh=None,
                   state_template=None):
    def eval_fn(state: TrainState, batch_in, labels):
        extras = ()
        if isinstance(batch_in, (tuple, list)):  # multi-input (fusion)
            batch_in, *rest = batch_in
            extras = tuple(rest)
        clip = (
            preprocess_clip(batch_in, pp_cfg) if pp_cfg is not None else batch_in
        )
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = module.apply(variables, clip, *extras, False)
        top1 = jnp.sum((jnp.argmax(logits, -1) == labels).astype(jnp.int32))
        top5 = jnp.sum(
            jnp.any(
                jax.lax.top_k(logits, min(5, logits.shape[-1]))[1]
                == labels[:, None],
                axis=-1,
            ).astype(jnp.int32)
        )
        return top1, top5

    if mesh is not None:
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        state_sh = (
            _tp_state_shardings(state_template, mesh)
            if _uses_model_axis(mesh) else repl
        )
        return jax.jit(eval_fn, in_shardings=(state_sh, data, data))
    return jax.jit(eval_fn)


def train(
    module,
    train_cfg: TrainConfig,
    batches: Iterable[Tuple[Any, Any]],
    dummy_inputs: Tuple[Any, ...],
    pp_cfg: Optional[PreprocessConfig] = None,
    mesh=None,
    state: Optional[TrainState] = None,
    metric_writer: Optional[Callable[[int, Dict[str, float]], None]] = None,
    augment=None,
    eval_batches: Optional[Callable[[], Iterable[Tuple[Any, Any]]]] = None,
    resumable_iter=None,
    model_cfg=None,
) -> TrainState:
    """Run the training loop over an iterable of (batch_in, labels).
    ``batch_in`` may be a TUPLE for multi-input models (fusion:
    ``((clip, landmarks), labels)`` — see :func:`make_train_step`).

    Handles checkpoint/resume via orbax (``train_cfg.ckpt_dir``), periodic
    metrics, fault injection for resume testing, and — when
    ``eval_batches`` (a zero-arg callable yielding (batch_in, labels)) is
    given — periodic validation every ``train_cfg.eval_every`` steps.

    ``resumable_iter``: the :class:`asltpu.data.loader.ResumableIterator`
    underlying ``batches`` (when the grain loader feeds training) — its
    position is checkpointed with the train state so a resumed run continues
    the data stream instead of restarting it.
    """
    from asltpu import ckpt as _ckpt

    if mesh is None and len(jax.devices()) > 1:
        mesh = make_mesh()
    if state is None:
        state = create_train_state(
            module, train_cfg, dummy_inputs, train_cfg.seed,
            model_cfg=model_cfg,
        )
        state = _ckpt.try_restore_train_state(train_cfg.ckpt_dir, state)
    if _uses_model_axis(mesh):
        # Tensor parallelism: place the state under the Megatron per-leaf
        # placements up front (serial per-leaf device_put — relay-link
        # discipline, see asltpu.dist.tp.tp_shard_variables).
        from asltpu.dist.tp import tp_shard_variables

        state = tp_shard_variables(state, mesh)
    step_fn = make_train_step(module, train_cfg, pp_cfg, mesh, augment,
                              state_template=state)
    eval_fn = (
        make_eval_step(module, pp_cfg, mesh, state_template=state)
        if eval_batches is not None else None
    )

    def run_eval(state, step):
        n = top1 = top5 = 0
        for batch_in, labels in eval_batches():
            t1, t5 = eval_fn(state, batch_in, labels)
            top1 += int(t1)
            top5 += int(t5)
            # Count only REAL rows: partial-batch pads carry label -1
            # (never matches an argmax/top-k index, so they contribute 0
            # to the numerators too).
            n += int(np.sum(np.asarray(labels) >= 0))
        metrics = {
            "eval_top1": top1 / max(n, 1),
            "eval_top5": top5 / max(n, 1),
            "eval_clips": float(n),
        }
        if train_cfg.keep_best and train_cfg.ckpt_dir:
            # Model selection: ckpt_dir/best/ tracks the highest eval_top1
            # (disk-compared, so it survives fault-inject/resume cycles).
            _ckpt.save_best_state(
                train_cfg.ckpt_dir, state, metrics["eval_top1"]
            )
        if metric_writer:
            metric_writer(step, metrics)
        return metrics

    start = int(state.step)
    last_eval_step = -1
    t0 = time.perf_counter()
    try:
        for i, (batch_in, labels) in enumerate(batches):
            step = start + i
            if step >= train_cfg.num_steps:
                break
            if step == train_cfg.fault_inject_step:
                raise FaultInjected(f"injected fault at step {step}")
            state, metrics = step_fn(state, batch_in, labels)
            if (step + 1) % train_cfg.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                m["steps_per_sec"] = train_cfg.log_every / dt
                t0 = time.perf_counter()
                if metric_writer:
                    metric_writer(step + 1, m)
            if eval_fn is not None and (step + 1) % train_cfg.eval_every == 0:
                run_eval(state, step + 1)
                last_eval_step = step + 1
            if (step + 1) % train_cfg.ckpt_every == 0:
                _ckpt.save_train_state(
                    train_cfg.ckpt_dir, state, keep=train_cfg.ckpt_keep
                )
                if resumable_iter is not None:
                    # i+1 batches consumed since this train() call began.
                    data_state = resumable_iter.state_for(i + 1)
                    if data_state is not None:
                        _ckpt.save_data_state(
                            train_cfg.ckpt_dir, step + 1, data_state
                        )
    finally:
        # An early exit (num_steps reached, fault injection, any step error)
        # must stop the Prefetcher's transfer thread or it stays blocked in
        # q.put pinning host+device batch buffers for the process lifetime.
        close = getattr(batches, "close", None)
        if callable(close):
            close()
    # Final eval — unless the periodic eval already ran at this exact step
    # (num_steps a multiple of eval_every would otherwise score the whole
    # split twice back-to-back and write a duplicate metric row).
    if eval_fn is not None and int(state.step) != last_eval_step:
        run_eval(state, int(state.step))
    return state
