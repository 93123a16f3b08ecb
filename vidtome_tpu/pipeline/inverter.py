"""DDIM inversion stage: source frames -> cached noisy latents.

Re-design of the reference Inverter (`invert.py:15-280` in
lixirui142/VidToMe): VAE-encode the clip, walk the DDIM schedule upward
predicting noise with the *unpatched* UNet (merging only applies during
generation), cache ``noisy_latents_<t>`` at the save timesteps, optionally
reconstruct for a fidelity check.  Per-frame work is independent, so frames
are micro-batched with static shapes (and this axis is the natural data-
parallel shard axis on a mesh — see parallel/mesh.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from vidtome_tpu.config import save_config
from vidtome_tpu.core.scheduler import (DDIMScheduler, ddim_inverse_step,
                                        ddim_step)
from vidtome_tpu.io import artifacts
from vidtome_tpu.io.video import load_video, save_frames
from vidtome_tpu.models.registry import ModelBundle
from vidtome_tpu.pipeline.common import TextEncoder, VAECoder
from vidtome_tpu.control.depth import prepare_depth_latents
from vidtome_tpu.control.preprocess import control_preprocess


class Inverter:
    def __init__(self, bundle: ModelBundle, config, use_pallas=None,
                 shard_fn=None):
        self.bundle = bundle
        self.config = config
        inv = config.inversion
        self.steps = int(inv.steps)
        self.save_steps = int(inv.get("save_steps", self.steps))
        self.save_intermediate = bool(inv.get("save_intermediate", False))
        self.batch_size = int(inv.get("batch_size", 8))
        self.n_frames = inv.get("n_frames", None)
        self.force = bool(inv.get("force", False))
        self.recon = bool(inv.get("recon", False))
        self.prompt = inv.prompt
        self.control = inv.get("control", "none")
        self.control_scale = float(inv.get("control_scale", 1.0))
        self.height, self.width = int(config.height), int(config.width)
        self.work_dir = config.work_dir
        self.shard_fn = shard_fn or (lambda x: x)

        self.scheduler = DDIMScheduler.create(self.steps)
        save_sch = DDIMScheduler.create(self.save_steps)
        self.timesteps_to_save = set(int(t) for t in save_sch.timesteps)

        self.text = TextEncoder(bundle)
        self.vae = VAECoder(bundle, batch_size=self.batch_size)

        unet = bundle.make_unet(use_pallas=use_pallas)
        self._params = {"unet": bundle.unet_params}
        use_controlnet = self.control not in ("none", "pnp")
        if use_controlnet:
            controlnet = bundle.make_controlnet(use_pallas=use_pallas)
            self._params["controlnet"] = bundle.controlnet_params
        control_scale = self.control_scale

        # Timestep / alpha tables gathered by traced step index (a Python
        # int index would bake one executable per step — pathological on
        # remote-compile backends).
        sch = self.scheduler
        t_up = jnp.asarray(np.asarray(sch.timesteps[::-1], np.int32))
        t_down = jnp.asarray(np.asarray(sch.timesteps, np.int32))
        inv_a = jnp.asarray(np.stack(
            [np.asarray(sch.inversion_alpha_pair(i)) for i in
             range(sch.num_steps)]))  # [S, 2]
        smp_a = jnp.asarray(np.stack(
            [np.asarray(sch.sample_alpha_pair(i)) for i in
             range(sch.num_steps)]))
        self._tables = dict(t_up=t_up, t_down=t_down, inv_a=inv_a,
                            smp_a=smp_a)

        @jax.jit
        def eps_fn(params, x, tables, step_i, inversion, context, depth,
                   control_images):
            """x: [b, h, w, 4] latents for a frame batch."""
            t = jnp.where(inversion, tables["t_up"][step_i],
                          tables["t_down"][step_i])
            if bundle.use_depth:
                x = jnp.concatenate([x, depth.astype(x.dtype)], axis=-1)
            kwargs = {}
            if use_controlnet:
                down_r, mid_r = controlnet.apply(
                    {"params": params["controlnet"]}, x, t, context,
                    control_images, conditioning_scale=control_scale)
                kwargs = dict(down_residuals=down_r, mid_residual=mid_r)
            return unet.apply({"params": params["unet"]}, x, t, context,
                              **kwargs)

        @jax.jit
        def inv_step(x, eps, tables, step_i):
            a = tables["inv_a"][step_i]
            # fp32 update, back to the latent dtype (avoids f32 retraces)
            return ddim_inverse_step(x, eps, a[0], a[1]).astype(x.dtype)

        @jax.jit
        def sample_step(x, eps, tables, step_i):
            a = tables["smp_a"][step_i]
            return ddim_step(x, eps, a[0], a[1]).astype(x.dtype)

        self._eps = eps_fn
        self._inv_step = inv_step
        self._sample_step = sample_step

    # ------------------------------------------------------------------

    def _batched_eps(self, x, step_i, inversion, conds, depth, control):
        outs = []
        n = x.shape[0]
        bs = self.batch_size
        pad = (-n) % bs
        if pad:
            def padded(a):
                return (jnp.concatenate([a, jnp.repeat(a[-1:], pad, 0)])
                        if a is not None else None)
            x_p, conds_p = padded(x), padded(conds)
            depth_p, control_p = padded(depth), padded(control)
        else:
            x_p, conds_p, depth_p, control_p = x, conds, depth, control
        for i in range(0, x_p.shape[0], bs):
            sl = slice(i, i + bs)
            outs.append(self._eps(
                self._params, self.shard_fn(x_p[sl]), self._tables, step_i,
                inversion, self.shard_fn(conds_p[sl]),
                depth_p[sl] if depth_p is not None else jnp.zeros(()),
                control_p[sl] if control_p is not None else jnp.zeros(())))
        return jnp.concatenate(outs)[:n]

    def ddim_inversion(self, latents, conds, depth, control, save_dir):
        print("[INFO] start DDIM Inversion!")
        sch = self.scheduler
        ts_up = sch.timesteps[::-1]
        x = latents
        inv = jnp.asarray(True)
        for i in range(sch.num_steps):
            step_i = jnp.asarray(i, jnp.int32)
            eps = self._batched_eps(x, step_i, inv, conds, depth, control)
            x = self._inv_step(x, eps, self._tables, step_i)
            t = int(ts_up[i])
            if self.save_intermediate and t in self.timesteps_to_save:
                artifacts.save_latent(save_dir, t, np.asarray(x, np.float32))
        path = artifacts.save_latent(save_dir, int(ts_up[-1]),
                                     np.asarray(x, np.float32))
        print(f"[INFO] inverted latent saved to: {path}")
        return x

    def ddim_sample(self, latents, conds, depth, control):
        print("[INFO] reconstructing frames...")
        sch = self.scheduler
        x = latents
        inv = jnp.asarray(False)
        for i in range(sch.num_steps):
            step_i = jnp.asarray(i, jnp.int32)
            eps = self._batched_eps(x, step_i, inv, conds, depth, control)
            x = self._sample_step(x, eps, self._tables, step_i)
        return x

    def check_latent_exists(self, save_dir) -> bool:
        ts = [int(self.scheduler.timesteps[0])]
        if self.save_intermediate:
            ts += sorted(self.timesteps_to_save)
        return artifacts.check_latents_exist(save_dir, ts)

    # ------------------------------------------------------------------

    def __call__(self, data_path: str, save_path: str):
        save_dir = artifacts.get_latents_dir(save_path, self.bundle.model_key)
        os.makedirs(save_dir, exist_ok=True)
        if self.check_latent_exists(save_dir) and not self.force:
            print(f"[INFO] inverted latents exist at: {save_dir}. Skip "
                  "inversion! Set 'inversion.force: True' to invert again.")
            return

        frames = load_video(data_path, self.height, self.width)
        frame_ids = list(range(len(frames)))
        if self.n_frames is not None:
            frame_ids = frame_ids[: int(self.n_frames)]
        frames = frames[frame_ids]

        depth = None
        if self.bundle.use_depth:
            depth = prepare_depth_latents(frames, frame_ids, self.work_dir)
            depth = jnp.asarray(depth)

        prompts = ([self.prompt] * len(frames)
                   if isinstance(self.prompt, str) else list(self.prompt))
        conds = self.text(prompts)
        with open(os.path.join(save_dir, "inversion_prompts.txt"), "w") as f:
            f.write("\n".join(prompts))

        control = None
        if self.control not in ("none", "pnp"):
            control = jnp.asarray(
                control_preprocess(np.asarray(frames), self.control),
                self.bundle.dtype)

        latents = self.vae.encode(frames)
        print(f"[INFO] clean latents shape: {latents.shape}")

        inverted = self.ddim_inversion(latents, conds, depth, control,
                                       save_dir)
        save_config(self.config, save_dir, inv=True)
        if self.recon:
            recon_latents = self.ddim_sample(inverted, conds, depth, control)
            recon = self.vae.decode(recon_latents)
            save_frames(np.asarray(recon),
                        os.path.join(save_dir, "recon_frames"),
                        frame_ids=frame_ids)
        return inverted
