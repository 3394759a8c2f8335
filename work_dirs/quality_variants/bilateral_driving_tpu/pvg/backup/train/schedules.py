"""Per-group learning-rate schedules (reference `lr_scheduler_fn`,
project/models/trainers/base.py:29-60): optional delay (`opt_after`),
linear/cosine warmup from `lr_pre_warmup`, then log-linear (exponential)
decay from lr_init to lr_final over max_steps. Expressed as an optax-style
schedule returning the absolute LR."""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class LRConfig(NamedTuple):
    lr_init: float
    lr_final: float | None = None
    warmup_steps: int = 0
    lr_pre_warmup: float = 1e-8
    opt_after: int = 0
    max_steps: int = 30000
    ramp: str = "linear"      # or "cosine"


def make_schedule(cfg: LRConfig):
    lr_final = cfg.lr_final if cfg.lr_final is not None else cfg.lr_init

    def schedule(step):
        step = jnp.asarray(step, jnp.float32) - cfg.opt_after
        if cfg.ramp == "cosine":
            warm = cfg.lr_pre_warmup + (cfg.lr_init - cfg.lr_pre_warmup) * \
                jnp.sin(0.5 * jnp.pi * jnp.clip(
                    step / jnp.maximum(cfg.warmup_steps, 1), 0, 1))
        else:
            warm = cfg.lr_pre_warmup + (cfg.lr_init - cfg.lr_pre_warmup) * \
                step / jnp.maximum(cfg.warmup_steps, 1)
        t = jnp.clip((step - cfg.warmup_steps)
                     / jnp.maximum(cfg.max_steps - cfg.warmup_steps, 1), 0, 1)
        decay = jnp.exp(jnp.log(cfg.lr_init) * (1 - t)
                        + jnp.log(lr_final) * t)
        lr = jnp.where(step < cfg.warmup_steps, warm, decay)
        return jnp.where(step < 0, 0.0, lr)

    return schedule
