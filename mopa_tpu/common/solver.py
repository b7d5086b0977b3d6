"""Optimizer / LR-scheduler builders on optax.

Mirrors the reference builders (``mopa/common/solver/build.py:7-64`` and
``lr_scheduler.py:6-75``): per-model optimizer groups selected by ``TYPE``
(Adam/SGD with the reference's defaults), StepLR/MultiStepLR schedules with an
optional ``CLIP_LR`` lower bound, stepped once per iteration.
"""

from __future__ import annotations

import optax


def build_lr_schedule(cfg) -> optax.Schedule:
    """Iteration-indexed LR multiplier schedule (reference steps per iter)."""
    sched_cfg = cfg.SCHEDULER
    kind = sched_cfg.TYPE

    import jax.numpy as jnp

    if kind == "MultiStepLR":
        milestones = list(sched_cfg.MultiStepLR.milestones)
        gamma = float(sched_cfg.MultiStepLR.gamma)
        ms = jnp.asarray(milestones, jnp.int32) if milestones else None

        def schedule(step):
            if ms is None:
                return jnp.asarray(1.0)
            passed = jnp.sum((step >= ms).astype(jnp.float32))
            return gamma ** passed

    elif kind == "StepLR":
        step_size = int(sched_cfg.StepLR.step_size)
        gamma = float(sched_cfg.StepLR.gamma)

        def schedule(step):
            if step_size <= 0:
                return jnp.asarray(1.0)
            return gamma ** (step // step_size)

    elif kind == "WarmupMultiStepLR":
        wcfg = sched_cfg.WarmupMultiStepLR
        milestones = list(wcfg.milestones)
        gamma = float(wcfg.gamma)
        warmup_factor = float(wcfg.warmup_factor)
        warmup_steps = int(wcfg.warmup_steps)
        warmup_method = str(wcfg.warmup_method)
        if warmup_method not in ("constant", "linear"):
            raise ValueError(
                "Only 'constant' or 'linear' warmup_method accepted, got "
                "{!r}".format(warmup_method))
        ms = jnp.asarray(milestones, jnp.int32) if milestones else None

        def schedule(step):
            passed = (jnp.sum((step >= ms).astype(jnp.float32))
                      if ms is not None else 0.0)
            mult = gamma ** passed
            if warmup_steps > 0:
                if warmup_method == "constant":
                    wf = jnp.asarray(warmup_factor)
                else:
                    alpha = step / warmup_steps
                    wf = warmup_factor * (1 - alpha) + alpha
                mult = mult * jnp.where(step < warmup_steps, wf, 1.0)
            return mult

    elif kind in ("", None):

        def schedule(step):
            return jnp.asarray(1.0)

    else:
        raise ValueError("Unsupported scheduler: {}".format(kind))

    return schedule


def build_optimizer(optim_cfg, cfg) -> optax.GradientTransformation:
    """Build one model's optimizer from its OPTIMIZER.MODEL_{2D,3D} group.

    Falls back to the legacy flat OPTIMIZER.TYPE/BASE_LR when the group TYPE
    is unset (some shipped baseline configs use the flat form).
    """
    kind = optim_cfg.get("TYPE", "") or cfg.OPTIMIZER.get("TYPE", "")
    base_lr = float(optim_cfg.get("BASE_LR", cfg.OPTIMIZER.get("BASE_LR", 1e-3)))
    weight_decay = float(optim_cfg.get("WEIGHT_DECAY", 0.0))
    lr_mult = build_lr_schedule(cfg)
    # ClipLR wraps the scheduler with an absolute LR floor (reference
    # lr_scheduler.py ClipLR: lr = max(lr, CLIP_LR)).
    clip = float(cfg.SCHEDULER.CLIP_LR)

    def lr_schedule(step):
        lr = base_lr * lr_mult(step)
        if clip > 0:
            import jax.numpy as jnp

            lr = jnp.maximum(lr, clip)
        return lr

    if kind == "Adam":
        betas = tuple(optim_cfg.get("Adam", {}).get("betas", (0.9, 0.999)))
        tx = optax.adam(lr_schedule, b1=betas[0], b2=betas[1], eps=1e-8)
        if weight_decay > 0:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif kind == "SGD":
        sgd = optim_cfg.get("SGD", {})
        momentum = float(sgd.get("momentum", 0.9))
        tx = optax.sgd(lr_schedule, momentum=momentum)
        if weight_decay > 0:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    else:
        raise ValueError("Unsupported optimizer type: {!r}".format(kind))
    return tx
