"""Adaptive density control as jitted masked compaction (no reallocation).

The reference grows/shrinks parameter tensors with `torch.cat`/boolean
indexing and performs Adam-state surgery (vanilla.py:206-302 `refinement_after`,
basics.py:162-206 `dup_in_optim`/`remove_from_optim`). Under XLA, arrays are
static: each class owns a fixed capacity, a liveness mask, and densification
becomes pure array ops —

  * stats: per-point accumulated screen-grad norm, visibility count, max 2D
    radius ratio (vanilla.py:163-191 `after_train`);
  * cull: alive &= not (low-opacity | too-big-world | too-big-screen)
    (vanilla.py:304-331);
  * split: candidates = high-grad & large-scale; each spawns `n_split_samples`
    children sampled from the parent Gaussian, parent scale /= 1.6
    (vanilla.py:333-361);
  * dup: high-grad & small-scale spawn one clone (vanilla.py:363-375);
  * new points land in dead slots via ranked scatter (capacity overflow drops
    extras — the analogue of the reference running out of VRAM growth);
  * Adam moments at touched slots are zeroed by the same masks — replacing
    optimizer surgery with a masked `where` on the optax state;
  * opacity reset clamps to `reset_alpha_value` (vanilla.py:287-301).

Per-point arrays are identified explicitly: optimizable keys from the
standard Gaussian dict plus class extras (PVG taus/betas/velocity), and a
non-optimized `aux` dict (e.g. rigid/SMPL `point_ids`, `on_mesh_x`) whose
rows are copied to children alongside. All shapes static; no recompilation at
refinement steps.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..core import transforms

# optimizable per-point keys (leading dim == capacity); anything else in a
# class's param dict (e.g. rigid pose tracks (F, I, ...)) is left alone
PER_POINT_KEYS = frozenset({
    "means", "log_scales", "quats", "logit_opacities", "sh_dc", "sh_rest",
    "taus", "log_betas", "velocity",
})


class DensityConfig(NamedTuple):
    densify_grad_thresh: float = 0.0005
    densify_size_thresh: float = 0.003
    n_split_samples: int = 2
    cull_alpha_thresh: float = 0.005
    cull_scale_thresh: float = 0.5
    cull_screen_size: float = 0.15
    split_screen_size: float = 0.05
    stop_screen_size_at: int = 4000
    stop_split_at: int = 15000
    reset_alpha_interval: int = 3000
    reset_alpha_value: float = 0.01
    refine_interval: int = 100
    warmup_steps: int = 500
    # PVG temporal densification (reference pvg.py:149-199, pvg.yaml:96-103)
    densify_t_grad_thresh: float = 0.002
    densify_t_size_thresh: float = 0.01
    no_time_split: bool = True
    densify_until_num_points: int = 3_000_000


class DensityStats(NamedTuple):
    grad_norm: jax.Array   # (C,) accumulated screen-grad norms
    vis_count: jax.Array   # (C,)
    max_radii: jax.Array   # (C,) max radius / image size
    t_grad: jax.Array      # (C,) accumulated |dL/dtau| (PVG, pvg.py:113-125;
    #                        zeros for classes without a time axis)

    @staticmethod
    def zeros(capacity: int):
        return DensityStats(jnp.zeros(capacity), jnp.zeros(capacity),
                            jnp.zeros(capacity), jnp.zeros(capacity))


def accumulate_stats(stats: DensityStats, grad2d: jax.Array,
                     radii: jax.Array, last_size,
                     t_grad: jax.Array | None = None) -> DensityStats:
    """after_train (vanilla.py:163-191, pvg.py:100-134): grad2d (C, 2)
    this-step screen grads, radii (C,) this-step pixel radii, t_grad (C,)
    this-step |dL/dtau| (PVG only)."""
    vis = (radii > 0).astype(jnp.float32)
    g = jnp.linalg.norm(grad2d, axis=-1) * vis
    return DensityStats(
        grad_norm=stats.grad_norm + g,
        vis_count=stats.vis_count + vis,
        max_radii=jnp.maximum(stats.max_radii,
                              radii.astype(jnp.float32) / last_size),
        t_grad=stats.t_grad if t_grad is None
        else stats.t_grad + jnp.abs(t_grad) * vis,
    )


def _place(data: dict, occupied: jax.Array, new_vals: dict, want: jax.Array):
    """Scatter rows of new_vals (one per wanted source point) into free
    slots (~occupied). Every key in `data` is per-point. Returns
    (data, placed_mask, num_dropped)."""
    cap = occupied.shape[0]
    want_rank = jnp.cumsum(want.astype(jnp.int32)) - 1
    free = ~occupied
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    n_free = jnp.sum(free.astype(jnp.int32))
    slot_of_rank = jnp.zeros(cap, jnp.int32).at[
        jnp.where(free, free_rank, cap)].set(jnp.arange(cap, dtype=jnp.int32),
                                             mode="drop")
    ok = want & (want_rank < n_free)
    dest = jnp.where(ok, slot_of_rank[jnp.clip(want_rank, 0, cap - 1)], cap)
    out = {k: v.at[dest].set(new_vals[k], mode="drop")
           for k, v in data.items()}
    placed = jnp.zeros(cap, bool).at[dest].set(True, mode="drop")
    dropped = jnp.sum(want) - jnp.sum(ok)
    return out, placed, dropped


def refine(key, params: dict, aux: dict, alive: jax.Array,
           stats: DensityStats, step, scene_scale: float, cfg: DensityConfig,
           num_train_images: int = 1, extra_cull: jax.Array | None = None,
           pvg_cycle: float | None = None,
           scene_origin: tuple = (0.0, 0.0, 0.0)):
    """One refinement pass. `params`: class param dict (per-point keys are
    touched, others pass through); `aux`: non-optimized per-point arrays
    copied to children (point_ids etc.). `extra_cull`: class-specific cull
    mask (e.g. rigid out-of-bbox, rigid.py:374). `pvg_cycle`: set for PVG
    classes to enable temporal densification + the position-aware gamma size
    factor (pvg.py:90-98,149-199). Returns
    (params, aux, alive, touched, info)."""
    cap = alive.shape[0]
    pt = {k: v for k, v in params.items() if k in PER_POINT_KEYS}
    rest = {k: v for k, v in params.items() if k not in PER_POINT_KEYS}
    data = {**pt, **{f"aux/{k}": v for k, v in aux.items()}}
    is_pvg = pvg_cycle is not None and "taus" in pt

    scaling = jnp.exp(pt["log_scales"])
    max_scale = jnp.max(scaling, axis=-1)

    avg_grad = stats.grad_norm / jnp.maximum(stats.vis_count, 1.0)
    high_grads = (avg_grad > cfg.densify_grad_thresh) & alive

    # PVG position-aware size factor gamma (pvg.py:90-98): points far from
    # the scene origin may be proportionally larger before splitting/culling
    gamma = 1.0
    if is_pvg:
        dist = jnp.linalg.norm(
            pt["means"] - jnp.asarray(scene_origin), axis=-1)
        g = dist * scene_scale - 1.0
        gamma = jnp.where(g <= 1.0, 1.0, g) / scene_scale

    reset_interval = cfg.reset_alpha_interval
    gate = jnp.maximum(num_train_images, cfg.refine_interval)
    do_densify = ((step < cfg.stop_split_at)
                  & ((step % reset_interval) > gate)
                  & (step > cfg.warmup_steps))
    if is_pvg:
        # densify_until_num_points (pvg.py:160): stop growing a saturated
        # PVG class
        do_densify = do_densify & (
            jnp.sum(alive) < cfg.densify_until_num_points)

    big = max_scale > cfg.densify_size_thresh * scene_scale * gamma
    screen_big = stats.max_radii > cfg.split_screen_size
    splits = big | ((step < cfg.stop_screen_size_at) & screen_big)
    dups = ~big
    if is_pvg:
        # temporal candidates (pvg.py:166-199): high |dL/dtau| points split
        # along time when their temporal extent exceeds the threshold,
        # duplicate otherwise
        scaling_t = jnp.exp(pt["log_betas"])
        avg_t_grad = stats.t_grad / jnp.maximum(stats.vis_count, 1.0)
        high_t = (avg_t_grad > cfg.densify_t_grad_thresh) & alive
        high_grads = high_grads | high_t
        splits_t = (scaling_t > cfg.densify_t_size_thresh) & high_t
        dups_t = (scaling_t <= cfg.densify_t_size_thresh) & high_t
        splits = splits | splits_t
        dups = dups | dups_t
    splits = splits & high_grads & do_densify
    dups = dups & high_grads & do_densify

    # --- split children (vanilla.py:333-361; pvg.py:298-356)
    nsamp = cfg.n_split_samples
    keys = jax.random.split(key, nsamp)
    occupied = alive
    placed_any = jnp.zeros(cap, bool)
    new_log_scale = jnp.log(jnp.maximum(scaling / 1.6, 1e-10))
    if is_pvg:
        # a t-triggered split leaves spatial scale untouched (pvg.py:339-347)
        child_log_scale = jnp.where(big[:, None], new_log_scale,
                                    pt["log_scales"])
    else:
        child_log_scale = new_log_scale
    rot = transforms.quat_to_rotmat(pt["quats"])
    n_dropped = jnp.zeros((), jnp.int32)
    for s in range(nsamp):
        eps = jax.random.normal(keys[s], (cap, 3))
        offset = jnp.einsum("nij,nj->ni", rot, scaling * eps)
        child = dict(data)
        child["means"] = pt["means"] + offset
        child["log_scales"] = child_log_scale
        if is_pvg:
            # children sample a time from the parent's temporal gaussian and
            # ride the vibration to the matching position (pvg.py:329-337)
            t_eps = jax.random.normal(
                jax.random.fold_in(keys[s], 1), (cap,)) * scaling_t
            child["taus"] = pt["taus"] + t_eps
            rho = scaling_t / pvg_cycle
            v_eff = pt["velocity"] * jnp.exp(-0.5 * rho)[:, None]
            child["means"] = child["means"] + v_eff * t_eps[:, None]
            if cfg.no_time_split:
                child["log_betas"] = pt["log_betas"]       # pvg.py:352-353
            else:
                child["log_betas"] = jnp.where(
                    splits_t, jnp.log(jnp.maximum(scaling_t / 1.6, 1e-10)),
                    pt["log_betas"])                        # pvg.py:335,348-350
        data, placed, dropped = _place(data, occupied, child, splits)
        occupied = occupied | placed
        placed_any = placed_any | placed
        n_dropped = n_dropped + dropped
    # parent scale shrinks (vanilla.py:357-358; pvg.py:323 does so for every
    # split row, even t-triggered ones)
    data["log_scales"] = jnp.where(splits[:, None], new_log_scale,
                                   data["log_scales"])

    # --- dup children (vanilla.py:363-375)
    data, placed, dropped = _place(data, occupied, dict(data), dups)
    occupied = occupied | placed
    placed_any = placed_any | placed
    n_dropped = n_dropped + dropped
    alive = occupied

    # --- cull (vanilla.py:304-331)
    opac = jax.nn.sigmoid(data["logit_opacities"][:, 0])
    culls = opac < cfg.cull_alpha_thresh
    after_reset = step > reset_interval
    cull_gamma = 1.0
    if is_pvg:  # pvg.py:169-174: gamma recomputed over the grown set
        dist = jnp.linalg.norm(
            data["means"] - jnp.asarray(scene_origin), axis=-1)
        g = dist * scene_scale - 1.0
        cull_gamma = jnp.where(g <= 1.0, 1.0, g) / scene_scale
    toobig_world = jnp.exp(data["log_scales"]).max(-1) > \
        cfg.cull_scale_thresh * scene_scale * cull_gamma
    toobig_screen = stats.max_radii > cfg.cull_screen_size
    culls = culls | (after_reset & (toobig_world | (
        (step < cfg.stop_screen_size_at) & toobig_screen)))
    if extra_cull is not None:
        culls = culls | extra_cull
    do_cull = (step % reset_interval) > gate
    n_culled = jnp.sum(culls & do_cull & alive)
    alive = alive & ~(culls & do_cull)

    # --- opacity reset (vanilla.py:287-301)
    do_reset = (step % reset_interval) == cfg.refine_interval
    reset_logit = jnp.log(cfg.reset_alpha_value / (1 - cfg.reset_alpha_value))
    new_logit = jnp.minimum(data["logit_opacities"],
                            jnp.asarray(reset_logit))
    data["logit_opacities"] = jnp.where(do_reset, new_logit,
                                        data["logit_opacities"])
    # reset opacity moments along with the value (vanilla.py:295-301)
    touched = placed_any

    new_params = {**rest,
                  **{k: v for k, v in data.items() if not k.startswith("aux/")}}
    new_aux = {k[4:]: v for k, v in data.items() if k.startswith("aux/")}
    info = {"splits": jnp.sum(splits), "dups": jnp.sum(dups),
            "culled": n_culled, "dropped": n_dropped,
            "opacity_reset": do_reset}
    return new_params, new_aux, alive, touched, info


def reset_moments(opt_state, class_name: str, touched: jax.Array,
                  also_key: str | None = None):
    """Zero Adam moments at `touched` slots for per-point arrays under the
    given class subtree (the masked replacement for dup_in_optim /
    remove_from_optim). If `also_key` is given, only that param key's moments
    are reset (used for the opacity reset)."""
    cap = touched.shape[0]

    def fix_tree(tree):
        def fix(path, x):
            keys = [getattr(p, "key", None) for p in path]
            if class_name not in keys:
                return x
            if also_key is not None and also_key not in keys:
                return x
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
                shape = (slice(None),) + (None,) * (x.ndim - 1)
                return jnp.where(touched[shape], 0.0, x)
            return x

        return jax.tree_util.tree_map_with_path(fix, tree)

    def walk(state):
        if isinstance(state, optax.ScaleByAdamState):
            return state._replace(mu=fix_tree(state.mu), nu=fix_tree(state.nu))
        return state

    return jax.tree.map(walk, opt_state,
                        is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState))
