"""Dual-branch latent-diffusion training step (v-prediction).

The reference repo ships no training code (README.md:119 "training code is a
TODO"; its DDP imports are dead — inference_dual_p2e.py:17-19). This is the
TPU-native training layer the checkpoints imply existed: v-prediction MSE on
both branches, one optax step, shardable over the ('view',) mesh exactly like
inference (perspective batch over views, pano over frames).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..diffusion.ddim import add_noise, get_velocity, make_ddim_schedule
from ..models.dual import DualUNet, warp_sites


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    ema_params: Any = None     # shadow weights when TrainConfig.ema_decay>0

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step,
                self.ema_params), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Production training knobs (the reference ships no training code;
    these mirror what its checkpoints imply: AdamW, EMA shadow weights —
    the vendored diffusers carries the EMA utility at
    diffusers/training_utils.py — DDP-style data parallelism)."""
    lr: float = 1e-4
    weight_decay: float = 1e-2
    warmup_steps: int = 0
    total_steps: int = 0          # >0 enables cosine decay to 10% of lr
    grad_clip: float = 0.0        # >0 enables global-norm clipping
    ema_decay: float = 0.0        # >0 enables EMA shadow params
    accum_steps: int = 1          # >1 enables gradient accumulation
    antipodal_prob: float = 0.4


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.total_steps:
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, max(cfg.warmup_steps, 1), cfg.total_steps,
            end_value=cfg.lr * 0.1)
    elif cfg.warmup_steps:
        schedule = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    else:
        schedule = cfg.lr
    tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


def make_dual_batch(rng, cfg, num_frames, pers_hw, equi_hw,
                    text_len=77, sam_tokens=4096, sam_frames=16):
    """Synthetic latent-space training batch with the production shapes
    (useful for benchmarks / the multichip dry run)."""
    m = cfg.num_views
    ph, pw = pers_hw
    eh, ew = equi_hw
    ks = jax.random.split(rng, 8)
    dt = jnp.float32
    sam_c = cfg.pano.image_hidden_size
    txt_c = cfg.pano.cross_attention_dim
    return {
        "pers_latents": jax.random.normal(ks[0], (1, m, num_frames, ph, pw, 4), dt),
        "pano_latents": jax.random.normal(ks[1], (1, num_frames, eh, ew, 4), dt),
        "pers_mask": jnp.zeros((1, m, num_frames, ph, pw, 1), dt),
        "pers_masked": jnp.zeros((1, m, num_frames, ph, pw, 4), dt),
        "pano_mask": jnp.zeros((1, num_frames, eh, ew, 1), dt),
        "pano_masked": jnp.zeros((1, num_frames, eh, ew, 4), dt),
        "pers_text": jax.random.normal(ks[2], (m, text_len, txt_c), dt),
        "pano_text": jax.random.normal(ks[3], (1, text_len, txt_c), dt),
        "ref_feats_pers": jax.random.normal(ks[4], (m, sam_frames, sam_tokens, sam_c), dt),
        "ref_feats_pano": jax.random.normal(ks[5], (1, sam_frames, sam_tokens, sam_c), dt),
        "rel_pos": jnp.abs(jax.random.normal(ks[6], (1, num_frames, 6), dt)) * 10,
        "pitch": jax.random.normal(ks[7], (1, num_frames), dt) * 5,
        "fps": jnp.full((1,), 8.0, dt),
    }


def make_train_step(model: DualUNet, warp_geoms,
                    optimizer: Optional[optax.GradientTransformation] = None,
                    antipodal_prob: float = 0.4,
                    train_cfg: Optional[TrainConfig] = None) -> Callable:
    """Returns (train_step, optimizer); train_step(state, batch, rng) ->
    (state, metrics). Pass a TrainConfig for schedules/EMA/accumulation."""
    cfg = train_cfg or TrainConfig(antipodal_prob=antipodal_prob)
    antipodal_prob = cfg.antipodal_prob
    if optimizer is None:
        optimizer = make_optimizer(cfg)
    schedule = make_ddim_schedule(num_inference_steps=50)
    acp = jnp.asarray(schedule.alphas_cumprod)
    T = schedule.num_train_timesteps
    n_sites = len(warp_sites(len(model.cfg.pers.block_out_channels)))

    def loss_fn(params, batch, rng):
        k_t, k_np, k_na, k_opp, k_ip = jax.random.split(rng, 5)
        t = jax.random.randint(k_t, (1,), 0, T)
        noise_p = jax.random.normal(k_np, batch["pers_latents"].shape)
        noise_a = jax.random.normal(k_na, batch["pano_latents"].shape)

        x_p = add_noise(batch["pers_latents"], noise_p, acp,
                        t[:, None, None, None, None, None])
        x_a = add_noise(batch["pano_latents"], noise_a, acp,
                        t[:, None, None, None, None])
        v_p = get_velocity(batch["pers_latents"], noise_p, acp,
                           t[:, None, None, None, None, None])
        v_a = get_velocity(batch["pano_latents"], noise_a, acp,
                           t[:, None, None, None, None])

        pers_in = jnp.concatenate([x_p, batch["pers_mask"],
                                   batch["pers_masked"]], axis=-1)
        pano_in = jnp.concatenate([x_a, batch["pano_mask"],
                                   batch["pano_masked"]], axis=-1)
        use_opp = jax.random.bernoulli(k_opp, antipodal_prob, (n_sites,))

        pred_p, pred_a = model.apply(
            params, pers_in, pano_in, t.astype(jnp.float32),
            batch["pers_text"], batch["pano_text"], batch["fps"],
            batch["ref_feats_pers"], batch["ref_feats_pano"],
            batch["rel_pos"], batch["pitch"], warp_geoms, use_opp,
            rngs={"ip_noise": k_ip})

        loss = (jnp.mean((pred_p.astype(jnp.float32) - v_p) ** 2)
                + jnp.mean((pred_a.astype(jnp.float32) - v_a) ** 2))
        return loss

    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        ema = state.ema_params
        if ema is not None:
            d = cfg.ema_decay
            ema = jax.tree.map(lambda e, p: e * d + (1.0 - d) * p,
                               ema, params)
        return (TrainState(params, opt_state, state.step + 1, ema),
                metrics)

    return train_step, optimizer
