"""Gaussian diffusion for action decoding (DDPM/DDIM).

Compact TPU-native replacement for the reference's OpenAI-style diffusion
stack (`src/model/mvla/action_model/{diffusion_utils,respace}.py`, ~900 LoC):
epsilon-prediction objective, linear / squaredcos_cap_v2 schedules, DDPM
ancestral sampling and DDIM, all as pure functions with `lax.scan` samplers
(the whole reverse process is one XLA program). Generic over a denoiser
`eps_fn(x_t, t_int[B], cond) -> eps` so the MLP head (Octo) and the DiT head
(MVLA alternative) share it.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    num_timesteps: int = 100
    betas: tuple = ()  # filled by factory

    @property
    def alphas_cumprod(self):
        betas = jnp.asarray(self.betas, jnp.float32)
        return jnp.cumprod(1.0 - betas)


def make_schedule(num_timesteps: int = 100, kind: str = "squaredcos_cap_v2") -> DiffusionSchedule:
    # numpy on purpose: schedules are static (hashable, safe under jit tracing)
    import numpy as np

    if kind == "linear":
        scale = 1000 / num_timesteps
        betas = np.linspace(scale * 1e-4, scale * 0.02, num_timesteps)
    elif kind == "squaredcos_cap_v2":
        t = np.arange(num_timesteps + 1) / num_timesteps

        def f(u):
            return np.cos((u + 0.008) / 1.008 * np.pi / 2) ** 2

        betas = np.clip(1 - f(t[1:]) / f(t[:-1]), 0, 0.999)
    else:
        raise ValueError(f"unknown schedule {kind!r}")
    return DiffusionSchedule(num_timesteps=num_timesteps, betas=tuple(float(b) for b in betas))


def q_sample(schedule: DiffusionSchedule, x0, t_int, noise):
    """Forward process: x_t = sqrt(acp_t) x0 + sqrt(1-acp_t) eps."""
    acp = schedule.alphas_cumprod[t_int]
    while acp.ndim < x0.ndim:
        acp = acp[..., None]
    return jnp.sqrt(acp) * x0 + jnp.sqrt(1 - acp) * noise


def training_loss(schedule: DiffusionSchedule, eps_fn, key, x0, cond=None):
    """Epsilon-MSE objective with uniform timestep sampling
    (the reference's ModelMeanType.EPSILON + uniform sampler)."""
    k_t, k_noise = jax.random.split(key)
    b = x0.shape[0]
    t_int = jax.random.randint(k_t, (b,), 0, schedule.num_timesteps)
    noise = jax.random.normal(k_noise, x0.shape, jnp.float32)
    x_t = q_sample(schedule, x0, t_int, noise)
    eps = eps_fn(x_t, t_int, cond)
    losses = jnp.square(eps - noise)
    return losses.mean(), {"mse": losses.mean(), "losses": losses}


def ddpm_sample(schedule: DiffusionSchedule, eps_fn, key, shape, cond=None,
                clip_value: float | None = None, init_noise=None):
    """Ancestral sampling, full T steps, one lax.scan.

    ``clip_value`` clips x to [-v, v] after EVERY denoising step (upstream
    Octo's per-step clipping — clipping only the final sample follows a
    different trajectory whenever intermediates saturate). ``init_noise``
    fixes x_T for deterministic comparisons."""
    betas = jnp.asarray(schedule.betas, jnp.float32)
    alphas = 1.0 - betas
    acp = jnp.cumprod(alphas)
    acp_prev = jnp.concatenate([jnp.ones((1,)), acp[:-1]])
    post_var = betas * (1 - acp_prev) / (1 - acp)

    k_init, k_loop = jax.random.split(key)
    x = (jnp.asarray(init_noise, jnp.float32) if init_noise is not None
         else jax.random.normal(k_init, shape, jnp.float32))

    def step(carry, t_int):
        x, k = carry
        k, k_noise = jax.random.split(k)
        t_b = jnp.full((shape[0],), t_int, jnp.int32)
        eps = eps_fn(x, t_b, cond)
        coef = betas[t_int] / jnp.sqrt(1 - acp[t_int])
        mean = (x - coef * eps) / jnp.sqrt(alphas[t_int])
        noise = jax.random.normal(k_noise, shape, jnp.float32)
        x = mean + jnp.where(t_int > 0, jnp.sqrt(post_var[t_int]), 0.0) * noise
        if clip_value is not None:
            x = jnp.clip(x, -clip_value, clip_value)
        return (x, k), None

    ts = jnp.arange(schedule.num_timesteps - 1, -1, -1)
    (x, _), _ = jax.lax.scan(step, (x, k_loop), ts)
    return x


def ddim_sample(schedule: DiffusionSchedule, eps_fn, key, shape, cond=None,
                num_steps: int = 10, eta: float = 0.0, init_noise=None):
    """DDIM with a strided timestep subset (the reference's SpacedDiffusion
    respacing, `respace.py`). ``init_noise`` fixes x_T for deterministic
    comparisons."""
    acp = schedule.alphas_cumprod
    stride = max(schedule.num_timesteps // num_steps, 1)
    ts = jnp.arange(schedule.num_timesteps - 1, -1, -stride)

    x = (jnp.asarray(init_noise, jnp.float32) if init_noise is not None
         else jax.random.normal(key, shape, jnp.float32))

    def step(x, idx):
        t_int = ts[idx]
        t_prev = jnp.where(idx + 1 < ts.shape[0], ts[idx + 1], -1)
        t_b = jnp.full((shape[0],), t_int, jnp.int32)
        eps = eps_fn(x, t_b, cond)
        a_t = acp[t_int]
        a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
        x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        # eta interpolates deterministic DDIM (0) -> DDPM-variance (1):
        # sigma_t = eta * sqrt((1-a_prev)/(1-a_t)) * sqrt(1 - a_t/a_prev)
        sigma = eta * jnp.sqrt(
            (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
        )
        dir_x = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
        noise = jax.random.normal(jax.random.fold_in(key, idx), shape, jnp.float32)
        # the final step (t_prev < 0) is always noise-free
        sigma = jnp.where(t_prev >= 0, sigma, 0.0)
        x = jnp.sqrt(a_prev) * x0 + dir_x + sigma * noise
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(ts.shape[0]))
    return x


def timestep_embedding(t_int, dim: int, max_period: float = 10_000.0):
    """DDPM sinusoidal timestep embedding [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half) / half)
    angles = t_int.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
