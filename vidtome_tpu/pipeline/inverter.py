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
from vidtome_tpu.pipeline.common import (TextEncoder, VAECoder,
                                          resolve_precision)
from vidtome_tpu.control.depth import prepare_depth_latents
from vidtome_tpu.control.preprocess import control_preprocess


class Inverter:
    def __init__(self, bundle: ModelBundle, config, use_pallas=None,
                 shard_fn=None, mesh=None):
        self.bundle = bundle
        self.config = config
        if mesh is not None and shard_fn is None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = NamedSharding(mesh, P("data"))
            shard_fn = lambda x: jax.lax.with_sharding_constraint(x, spec)  # noqa: E731
        inv = config.inversion
        self.steps = int(inv.steps)
        self.save_steps = int(inv.get("save_steps", self.steps))
        self.save_intermediate = bool(inv.get("save_intermediate", False))
        self.batch_size = int(inv.get("batch_size", 8))
        # Deep-feature step cache for the inversion loop (same UNet
        # full/shallow split as generation — DESIGN §9.1; inversion has
        # one lane, so only the deep cache applies).
        #
        # DIRECTION NOTE: schedule specs are interpreted in INVERSION step
        # order — inversion walks the noise schedule upward, so "full:K"
        # front-loads refreshes at the LOW-noise end (the opposite end
        # from generation, where front-loaded = structure-formation steps).
        # The generation-side gate numbers therefore do NOT transfer;
        # inversion schedules carry their own quality gates (inv_* rows in
        # tools/quality_gate.py / DESIGN §9).  ``cache_reverse: true``
        # flips the mask so "full:K" refreshes the HIGH-noise end instead.
        self.cache_interval = int(inv.get("cache_interval", 0) or 0)
        self.cache_schedule = inv.get("cache_schedule") or None
        self.cache_reverse = bool(inv.get("cache_reverse", False))
        self.cache_on = bool(self.cache_interval or self.cache_schedule)
        # Eps-reuse step skip (same third serving cache as generation,
        # pipeline/generator.py): steps whose eps mask is False run no
        # UNet — the DDIM (inverse) update reuses the last computed eps,
        # optionally extrapolated from the trailing refreshes
        # (``eps_extrapolate``: true/1 = linear, 2 = quadratic — same
        # orders as generation).  Schedule specs follow the same
        # DIRECTION NOTE as above (inversion step order;
        # ``cache_reverse`` flips this mask too).
        self.eps_interval = int(inv.get("eps_interval", 0) or 0)
        self.eps_schedule = inv.get("eps_schedule") or None
        self.eps_on = bool(self.eps_interval or self.eps_schedule)
        self.eps_extrapolate = int(inv.get("eps_extrapolate", 0) or 0)
        if self.eps_extrapolate not in (0, 1, 2):
            raise ValueError("eps_extrapolate must be false/true/1/2 "
                             f"(got {self.eps_extrapolate!r})")
        self.n_frames = inv.get("n_frames", None)
        self.force = bool(inv.get("force", False))
        self.recon = bool(inv.get("recon", False))
        self.prompt = inv.prompt
        # Parity note: the reference reads `use_blip` (invert.py:60) but
        # never acts on it — a dead flag.  Accept it and warn.
        if inv.get("use_blip", False):
            print("[WARNING] use_blip is accepted for config compatibility "
                  "but not implemented (the reference never implements it "
                  "either); supply inversion.prompt directly")
        self.control = inv.get("control", "none")
        if self.control not in ("none", "pnp"):
            from vidtome_tpu.control.preprocess import \
                validate_control_available

            validate_control_available(self.control)
        self.control_scale = float(inv.get("control_scale", 1.0))
        self.height, self.width = int(config.height), int(config.width)
        self.work_dir = config.work_dir
        self.shard_fn = shard_fn or (lambda x: x)

        resolve_precision(config, inv, bundle)
        self.scheduler = DDIMScheduler.create(self.steps)
        save_sch = DDIMScheduler.create(self.save_steps)
        self.timesteps_to_save = set(int(t) for t in save_sch.timesteps)

        self.text = TextEncoder(bundle)
        self.vae = VAECoder(bundle, batch_size=self.batch_size)

        self.resnet_mode = str(inv.get(
            "resnet_mode", config.get("resnet_mode", "off")) or "off")
        # Int8 (W8A8) serving for the inversion UNet (same mechanism as
        # the Generator; see ops/quant.py).  Parsed before make_unet:
        # the fused resnet kernel's shape policy depends on it.
        self.quant = str(inv.get("quant", config.get("quant", "none"))
                         or "none").lower()
        # fused cross-attention sublayer (see Generator / ops/sublayer.py)
        self.sublayer_mode = str(inv.get(
            "sublayer_mode", config.get("sublayer_mode", "off")) or "off")
        if self.sublayer_mode not in ("off", "fused"):
            raise ValueError(f"sublayer_mode must be off|fused, got "
                             f"{self.sublayer_mode!r}")
        if self.sublayer_mode == "fused" and self.quant in ("int8", "w8a8"):
            raise ValueError(
                "sublayer_mode: fused requires bf16 attention projections "
                "(quant: none) — the int8 policy strips their kernels")
        unet = bundle.make_unet(use_pallas=use_pallas,
                                resnet_mode=self.resnet_mode,
                                resnet_quant=self.quant in ("int8", "w8a8"),
                                sublayer_mode=self.sublayer_mode)
        self._params = {"unet": bundle.unet_params}
        use_controlnet = self.control not in ("none", "pnp")
        if use_controlnet:
            controlnet = bundle.make_controlnet(use_pallas=use_pallas)
            self._params["controlnet"] = bundle.controlnet_params
        if self.quant in ("int8", "w8a8"):
            from vidtome_tpu.ops import quant as quant_ops

            res, qp = quant_ops.quantize_params(self._params["unet"])
            self._params["unet"] = res
            self._params["unet_q"] = qp
            if use_controlnet:
                cn_res, cn_qp = quant_ops.quantize_params(
                    self._params["controlnet"],
                    exclude=quant_ops.DEFAULT_EXCLUDE
                    + r"|zero_conv|cond_embedding")
                self._params["controlnet"] = cn_res
                self._params["controlnet_q"] = cn_qp
        if mesh is not None:
            from vidtome_tpu.parallel import mesh as pmesh

            self._params = pmesh.shard_params(mesh, self._params)
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

        shard_fn = self.shard_fn
        is_xl = bundle.is_xl
        height, width = float(self.height), float(self.width)

        def eps_fn(params, x, tables, step_i, inversion, context, depth,
                   control_images, cache_mode="off", deep_b=None):
            """x: [b, h, w, 4] latents for a frame batch.  ``context`` is
            the per-frame context array, or (context, pooled) for SDXL."""
            t = jnp.where(inversion, tables["t_up"][step_i],
                          tables["t_down"][step_i])
            kwargs = {}
            if is_xl:
                context, pooled = context
                time_ids = jnp.tile(
                    jnp.asarray([[height, width, 0.0, 0.0, height, width]],
                                jnp.float32), (x.shape[0], 1))
                kwargs.update(add_text_embeds=pooled,
                              add_time_ids=time_ids)
            if bundle.use_depth:
                x = jnp.concatenate([x, depth.astype(x.dtype)], axis=-1)
            if use_controlnet:
                cn_vars = {"params": params["controlnet"]}
                if "controlnet_q" in params:
                    cn_vars["qparams"] = params["controlnet_q"]
                down_r, mid_r = controlnet.apply(
                    cn_vars, x, t, context, control_images,
                    conditioning_scale=control_scale)
                kwargs.update(down_residuals=down_r, mid_residual=mid_r)
            variables = {"params": params["unet"]}
            if "unet_q" in params:
                variables["qparams"] = params["unet_q"]
            if cache_mode == "shallow":
                kwargs.update(cache_mode="shallow", deep_cache=deep_b)
            elif cache_mode == "full":
                kwargs.update(cache_mode="full")
            return unet.apply(variables, x, t, context, **kwargs)

        bs = self.batch_size

        # deep is NOT donated: in "off"/"shallow" modes it is returned
        # unchanged, and the copy a full step saves is ~0.2ms — not worth
        # an aliasing pattern this path can't re-verify on TPU today
        @functools.partial(jax.jit,
                           static_argnames=("inversion", "cache_mode",
                                            "keep_eps"),
                           donate_argnums=(1,))
        def full_step(params, x, tables, step_i, inversion, conds, depth,
                      control, deep, cache_mode="off", keep_eps=False):
            """One DDIM timestep over ALL frames: lax.scan over fixed-size
            frame micro-batches (one dispatch per timestep; per-frame work
            is independent, reference invert.py:122-131).

            ``cache_mode``/``deep``: the deep-feature step cache (same
            full/shallow UNet split as generation, DESIGN §9.1) — the
            Python step loop makes the mode STATIC per dispatch, so there
            is no lax.cond: just two executables.  ``deep`` is
            [n, h, w, Cdeep] (scalar placeholder when off)."""
            n = x.shape[0]
            nb = n // bs

            def body(_, inputs):
                xb, cb, db, ctb, dpb = inputs
                out = eps_fn(params, shard_fn(xb), tables, step_i,
                             jnp.asarray(inversion),
                             jax.tree.map(shard_fn, cb), db, ctb,
                             cache_mode, dpb)
                return None, out

            def batched_one(a):
                if a is None or a.ndim == 0:
                    return jnp.zeros((nb, bs, 1), x.dtype)
                return a.reshape(nb, bs, *a.shape[1:])

            def batched(a):
                return jax.tree.map(batched_one, a)

            _, out = jax.lax.scan(
                body, None,
                (batched(x), batched(conds), batched(depth),
                 batched(control), batched(deep)))
            if cache_mode == "full":
                eps_all, deep_all = out
                deep = deep_all.reshape(n, *deep_all.shape[2:])
            else:
                eps_all = out
            eps = eps_all.reshape(n, *eps_all.shape[2:])
            a = tables["inv_a"][step_i] if inversion else \
                tables["smp_a"][step_i]
            fn = ddim_inverse_step if inversion else ddim_step
            x_next = fn(x, eps, a[0], a[1]).astype(x.dtype)
            if keep_eps:
                # eps-reuse skip steps need the raw eps (fp32 for the
                # extrapolation subtraction)
                return x_next, deep, eps.astype(jnp.float32)
            return x_next, deep

        @functools.partial(jax.jit, static_argnames=("inversion",),
                           donate_argnums=(0,))
        def skip_step(x, eps, eps_prev, eps_prev2, w2, w1, w0, tables,
                      step_i, inversion):
            """Eps-reuse step: no UNet — the DDIM (inverse) update runs on
            a weighted combination of the last (up to) three refreshed
            eps: plain reuse (1,0,0), linear or quadratic extrapolation
            (weights from generator.extrap_weights)."""
            e = w2 * eps + w1 * eps_prev + w0 * eps_prev2
            a = tables["inv_a"][step_i] if inversion else \
                tables["smp_a"][step_i]
            fn = ddim_inverse_step if inversion else ddim_step
            return fn(x, e, a[0], a[1]).astype(x.dtype)

        self._eps = jax.jit(eps_fn)
        self._full_step = full_step
        self._skip_step = skip_step

    # ------------------------------------------------------------------

    def _pad_frames(self, a, n_target):
        if a is None:
            return None

        def pad_one(arr):
            pad = n_target - arr.shape[0]
            if pad <= 0:
                return arr
            return jnp.concatenate([arr, jnp.repeat(arr[-1:], pad, 0)])

        return jax.tree.map(pad_one, a)

    def _run(self, latents, conds, depth, control, inversion, on_step=None):
        n = latents.shape[0]
        n_p = -(-n // self.batch_size) * self.batch_size
        # copy: the step function donates its latent buffer; callers may
        # still hold (and reuse) the input array.
        x = jnp.copy(self._pad_frames(jnp.asarray(latents), n_p))
        conds_p = self._pad_frames(conds, n_p)
        depth_p = self._pad_frames(depth, n_p)
        control_p = self._pad_frames(control, n_p)
        n_steps = self.scheduler.num_steps
        if self.cache_on:
            from vidtome_tpu.pipeline.generator import refresh_mask

            mask = refresh_mask(self.cache_schedule,
                                self.cache_interval or 1, n_steps)
            if self.cache_reverse and inversion:
                mask = mask[::-1]
            ch = self.bundle.unet_config.block_out_channels[1]
            deep = jnp.zeros(x.shape[:3] + (ch,), x.dtype)
        else:
            mask = None
            deep = jnp.zeros((), x.dtype)
        if self.eps_on:
            from vidtome_tpu.pipeline.generator import refresh_mask

            eps_mask = refresh_mask(self.eps_schedule,
                                    self.eps_interval or 1, n_steps)
            if self.cache_reverse and inversion:
                eps_mask = eps_mask[::-1]
            if mask is not None:
                # a skipped step cannot refresh the deep cache — force
                # the eps-run mask over the deep refresh steps (same
                # auto-align policy as generation)
                forced = int((mask & ~eps_mask).sum())
                if forced:
                    print(f"[WARNING] {forced} deep-cache refresh steps "
                          "fall on eps-skip steps; running the UNet there "
                          "(eps-run mask auto-aligned upward).")
                    eps_mask = eps_mask | mask
            if not eps_mask[0]:
                raise ValueError("inversion eps schedule must run the "
                                 "first step: the eps cache starts empty")
        else:
            eps_mask = None
        eps = eps_prev = eps_prev2 = None
        s_last, s_prev, s_prev2 = -1, -1, -1
        for i in range(n_steps):
            if eps_mask is not None and not eps_mask[i]:
                # eps-reuse skip: no UNet dispatch at all this step
                from vidtome_tpu.pipeline.generator import extrap_weights

                w2, w1, w0 = extrap_weights(i, s_last, s_prev, s_prev2,
                                            self.eps_extrapolate)
                e1 = eps if eps_prev is None else eps_prev
                e0 = e1 if eps_prev2 is None else eps_prev2
                x = self._skip_step(x, eps, e1, e0,
                                    jnp.asarray(w2, jnp.float32),
                                    jnp.asarray(w1, jnp.float32),
                                    jnp.asarray(w0, jnp.float32),
                                    self._tables, jnp.asarray(i, jnp.int32),
                                    inversion)
                if on_step is not None:
                    on_step(i, x)
                continue
            mode = ("off" if mask is None
                    else ("full" if mask[i] else "shallow"))
            out = self._full_step(self._params, x, self._tables,
                                  jnp.asarray(i, jnp.int32), inversion,
                                  conds_p, depth_p, control_p, deep,
                                  cache_mode=mode,
                                  keep_eps=self.eps_on)
            if self.eps_on:
                x, deep, eps_new = out
                eps_prev2 = eps_prev if eps_prev is not None else eps_new
                eps_prev, eps = (eps if eps is not None else eps_new), \
                    eps_new
                s_prev2 = s_prev if s_prev >= 0 else i
                s_prev, s_last = (s_last if s_last >= 0 else i), i
            else:
                x, deep = out
            if on_step is not None:
                # hand the padded buffer to the hook; it slices [:n] only
                # when it actually saves (an unconditional x[:n] here would
                # dispatch an eager slice op every step).
                on_step(i, x)
        return x[:n]

    def ddim_inversion(self, latents, conds, depth, control, save_dir):
        print("[INFO] start DDIM Inversion!")
        ts_up = self.scheduler.timesteps[::-1]
        n = latents.shape[0]

        def save_hook(i, x):
            t = int(ts_up[i])
            if self.save_intermediate and t in self.timesteps_to_save:
                artifacts.save_latent(save_dir, t,
                                      np.asarray(x[:n], np.float32))

        x = self._run(latents, conds, depth, control, inversion=True,
                      on_step=save_hook)
        path = artifacts.save_latent(save_dir, int(ts_up[-1]),
                                     np.asarray(x, np.float32))
        print(f"[INFO] inverted latent saved to: {path}")
        return x

    def ddim_sample(self, latents, conds, depth, control):
        print("[INFO] reconstructing frames...")
        return self._run(latents, conds, depth, control, inversion=False)

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


def main(argv=None):
    """Standalone inversion stage (reference invert.py:282-289)."""
    from vidtome_tpu.cli import run_inversion, setup_from_argv

    config, bundle, mesh, use_pallas = setup_from_argv(argv)
    run_inversion(config, bundle, mesh, use_pallas)


if __name__ == "__main__":
    main()
