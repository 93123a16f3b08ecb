"""Generation stage: chunked CFG denoising with token merging active.

Re-design of the reference Generator (`generate.py:20-359` in
lixirui142/VidToMe).  Differences driven by TPU/XLA:

  * Chunks are always exactly ``chunk_size`` frames: the reference's random
    ragged first chunk becomes a random cyclic rotation of the frame axis
    per timestep (same boundary decorrelation, static shapes) — see
    core/chunk.py.  The video is padded once to a chunk multiple.
  * The global token bank is an explicit pytree threaded through the jitted
    chunk step (flax ``tome_bank`` collection) instead of CPU-offloaded
    module attributes; the first processed chunk of each timestep runs the
    'init' variant (bank := local tokens), the rest run 'merge'.
  * PnP injection schedules become traced booleans (step < threshold) fed
    to the UNet; source latents come from the inversion cache per timestep.
  * CFG lanes ([source,] uncond, cond) ride one batched UNet call, lane-
    major, exactly like the reference (generate.py:245-254).
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from vidtome_tpu.config import save_config
from vidtome_tpu.core import chunk as chunking
from vidtome_tpu.core.scheduler import DDIMScheduler, ddim_step
from vidtome_tpu.io import artifacts
from vidtome_tpu.io.video import load_video, save_video
from vidtome_tpu.models.registry import CONTROLNET_DICT, ModelBundle
from vidtome_tpu.models.tome import ToMeCall, ToMeConfig
from vidtome_tpu.pipeline.common import (TextEncoder, VAECoder,
                                          resolve_precision)
from vidtome_tpu.control.depth import prepare_depth_latents
from vidtome_tpu.control.preprocess import control_preprocess


def refresh_mask(spec: str | None, interval: int, num_steps: int,
                 start: int = 0, kind: str = "cache") -> np.ndarray:
    """Boolean refresh mask [num_steps] for a step cache.

    ``spec`` (wins over ``interval``) is a comma-separated list of
    segments consumed in order from ``start``:

      * ``full:K``    — K consecutive refresh (full) steps;
      * ``shallow:K`` — K consecutive cached (shallow) steps;
      * ``every:NxK`` — every-Nth refresh for the next K steps (piecewise
                        cadences: e.g. denser refreshes through the
                        structure-forming mid-trajectory, sparser late);
      * ``uniform:N`` — every-Nth refresh for the remaining steps
                        (must be the last segment).

    Without a spec, ``interval`` gives the uniform every-Nth pattern.
    Entries before ``start`` are marked full (they are never executed by
    a sampling that begins at ``start``; full is the safe value)."""
    mask = np.ones(num_steps, bool)
    i = start
    if spec:
        segments = [s.strip() for s in str(spec).split(",") if s.strip()]
        for seg_no, seg in enumerate(segments):
            seg_kind, _, arg = seg.partition(":")
            if seg_kind not in ("full", "shallow", "uniform",
                                "every") or not arg:
                raise ValueError(f"bad cache schedule segment {seg!r} "
                                 f"in {spec!r}")
            if seg_kind == "every":
                n_s, _, span_s = arg.partition("x")
                if not n_s or not span_s:
                    raise ValueError(f"'every' segment needs NxK (every-"
                                     f"Nth for K steps): {seg!r}")
                n, span = int(n_s), int(span_s)
                if n < 1 or span < 1:
                    raise ValueError(f"every:NxK needs N,K >= 1: {seg!r}")
                stop = min(i + span, num_steps)
                for j in range(i, stop):
                    mask[j] = (j - i) % n == 0
                i = stop
                continue
            n = int(arg)
            if seg_kind == "uniform":
                if seg_no != len(segments) - 1:
                    raise ValueError(
                        f"'uniform' must be the last segment: {spec!r}")
                if n < 1:
                    raise ValueError(f"uniform interval must be >=1: "
                                     f"{spec!r}")
                for j in range(i, num_steps):
                    mask[j] = (j - i) % n == 0
                i = num_steps
            else:
                stop = min(i + n, num_steps)
                mask[i:stop] = seg_kind == "full"
                i = stop
        # steps past the listed segments (no trailing uniform): refresh
        mask[i:] = True
    elif interval:
        for j in range(start, num_steps):
            mask[j] = (j - start) % interval == 0
    if start < num_steps and not mask[start]:
        # "eps" masks mean 'run the UNet', not 'refresh a cache' — word
        # the error accordingly so schedule specs are debuggable
        what = ("eps schedule must run the UNet on its first step"
                if kind == "eps"
                else f"{kind} schedule must refresh on its first step")
        raise ValueError(f"{what} (step {start}, spec {spec!r}): "
                         "the cache starts empty")
    return mask


def extrap_weights(t: float, s2: float, s1: float, s0: float,
                   order: int) -> tuple[float, float, float]:
    """Combination weights (w2, w1, w0) for an eps-skip prediction at step
    ``t`` from the last refreshes at steps s2 (newest), s1, s0:
    eps_hat = w2*eps2 + w1*eps1 + w0*eps0.  Order reduces automatically
    while the history is short (duplicate/missing nodes): 0 or one
    refresh -> plain reuse; two -> linear; three (order 2) -> quadratic
    Lagrange.  Host-side twin of the generator's in-graph Newton form."""
    if order < 1 or s1 < 0 or s1 == s2:
        return 1.0, 0.0, 0.0
    if order < 2 or s0 < 0 or s0 == s1:
        f = (t - s2) / (s2 - s1)
        return 1.0 + f, -f, 0.0
    w0 = (t - s1) * (t - s2) / ((s0 - s1) * (s0 - s2))
    w1 = (t - s0) * (t - s2) / ((s1 - s0) * (s1 - s2))
    w2 = (t - s0) * (t - s1) / ((s2 - s0) * (s2 - s1))
    return w2, w1, w0


class Generator:
    def __init__(self, bundle: ModelBundle, config, use_pallas=None,
                 mesh=None):
        self.bundle = bundle
        self.config = config
        self.mesh = mesh
        gene = config.generation
        self.gene = gene

        self.seed = int(config.get("seed", 123))
        self.n_timesteps = int(gene.n_timesteps)
        self.guidance_scale = float(gene.guidance_scale)
        self.negative_prompt = gene.get("negative_prompt", "")
        self.prompt = gene.prompt
        self.save_frame = bool(gene.get("save_frame", False))
        self.height, self.width = int(config.height), int(config.width)
        self.work_dir = config.work_dir

        self.control = gene.get("control", "none")
        if self.control not in ("none", "pnp"):
            from vidtome_tpu.control.preprocess import \
                validate_control_available

            validate_control_available(self.control)
        self.use_depth = bundle.use_depth
        self.use_controlnet = self.control in CONTROLNET_DICT
        self.use_pnp = self.control == "pnp"
        self.num_lanes = 3 if self.use_pnp else 2
        self.control_scale = float(gene.get("control_scale", 1.0))

        self.chunk_size = int(gene.get("chunk_size", 4))
        self.chunk_ord, self.perm_div = chunking.parse_chunk_ord(
            str(gene.get("chunk_ord", "mix-4")))
        self.merge_global = bool(gene.get("merge_global", False))
        # Chunk-boundary semantics (DESIGN §9 gated deviation):
        #   "rotate" (default) — static full chunks, boundaries cyclically
        #     rotated per step (core/chunk.chunk_schedule);
        #   "ragged" — reference-faithful random-length first chunk per
        #     step, no wraparound, padded frames never scheduled
        #     (core/chunk.ragged_fidx; the exact side of the gate).
        self.chunk_boundaries = str(
            gene.get("chunk_boundaries", "rotate")).lower()
        if self.chunk_boundaries not in ("rotate", "ragged"):
            raise ValueError(
                f"chunk_boundaries must be rotate|ragged, got "
                f"{self.chunk_boundaries!r}")
        self.ragged = self.chunk_boundaries == "ragged"
        # Batched-chunk step (serving acceleration, quality-gated like the
        # caches — DESIGN §9.5): chunks 2..K of every timestep run as ONE
        # UNet call (batch = lanes * (K-1) * chunk_size) instead of a
        # sequential lax.scan.  Local merging stays per-chunk for free —
        # join_frames groups every ``chunk_size`` consecutive batch rows —
        # and every batched chunk global-merges against the FIRST chunk's
        # bank (star topology) instead of its predecessor's (the
        # reference's chain, patch.py:80).  One matching draw is shared
        # across the batched chunks.  Both deviations are covered by
        # gates/chunk_batch*.json; exactness when merging is off is
        # covered by tests/test_chunk_batch.py.
        self.chunk_batch = bool(gene.get("chunk_batch", False))
        if self.chunk_batch and self.ragged:
            raise ValueError(
                "generation.chunk_batch requires chunk_boundaries: rotate "
                "— ragged mode routes duplicate scatter slots through the "
                "waste slot sequentially, which a single batched scatter "
                "cannot order.")

        self.tome = ToMeConfig(
            frames=self.chunk_size,
            local_merge_ratio=float(gene.get("local_merge_ratio", 0.9)),
            merge_global=self.merge_global,
            global_merge_ratio=float(gene.get("global_merge_ratio", 0.8)),
            global_rand=float(gene.get("global_rand", 0.5)),
            max_downsample=int(gene.get("max_downsample", 2)),
            target_stride=int(gene.get("target_stride", 4)),
            align_batch=self.use_pnp or bool(gene.get("align_batch", False)),
            # Default ON: sibling blocks at one resolution level reuse the
            # first block's matching (the reference already shares the
            # random dst draw across blocks, patch.py:219-231; sharing the
            # whole matching trades a per-block re-match of slowly-varying
            # hidden states for ~13% end-to-end throughput).  Disable with
            # generation.share_match: false.
            share_match=bool(gene.get("share_match", True)),
            # Merged lengths round down to the attention tile size so long
            # merged sequences carry no pad mask (core/merge.quantize_r);
            # generation.len_quantum: null restores exact r = int(S*ratio).
            len_quantum=gene.get("len_quantum", 1024),
            # Opt-in LDM-variant merging (reference patch.py:104-114): also
            # run cross-attention / feed-forward on the merged sequence.
            merge_crossattn=bool(gene.get("merge_crossattn", False)),
            merge_ff=bool(gene.get("merge_ff", False)),
        )

        # Deep-feature cache (serving acceleration, quality-gated —
        # DESIGN.md §9): recompute the full UNet every `cache_interval`
        # steps and reuse the deep trunk output (input of the last up
        # block) for the steps in between, recomputing only the level-0
        # path.  0 disables; 1 = full every step (identical output to off,
        # used by tests).  No reference counterpart — the TPU-serving
        # analog of training-free step-caching (DeepCache-style).
        self.cache_interval = int(gene.get("cache_interval", 0) or 0)
        # CFG delta cache (same quality-gate regime): refresh steps run
        # both lanes and store the guidance DELTA (cond - uncond); skip
        # steps drop the uncond lane from the batch (keeping the PnP
        # source lane) and apply eps = cond + (gs-1)*delta.  Caching the
        # delta rather than the uncond eps is load-bearing — see
        # chunk_eps and DESIGN §9.1.
        self.cfg_interval = int(gene.get("cfg_interval", 0) or 0)
        # Non-uniform refresh schedules (override the uniform intervals):
        # comma-separated segments consumed in order from the sampling
        # start — "full:K" (K refresh steps), "shallow:K" (K cached
        # steps), "uniform:N" (every-Nth refresh for the remainder).
        # Early diffusion steps set structure and tolerate stale features
        # worst, so e.g. "full:8,uniform:3" buys interval-3 cost at
        # near-interval-2 fidelity (measured in DESIGN.md §9).
        self.cache_schedule = gene.get("cache_schedule") or None
        self.cfg_schedule = gene.get("cfg_schedule") or None
        # Eps-reuse step skip (third serving cache, quality-gated like the
        # other two): steps whose eps-mask entry is False run NO UNet at
        # all — the DDIM update reuses the last computed guidance-combined
        # eps (optionally extrapolated from the trailing refresh steps,
        # ``eps_extrapolate``: true/1 = linear through the last two,
        # 2 = quadratic through the last three — the multistep-solver
        # trick applied to the skip predictor, buying gate margin for
        # deeper skip cadences).  The deep/CFG caches cannot refresh
        # on a skipped step, so _mode_masks force-aligns the eps-run mask
        # over every ACTIVE cache's refresh steps (strictly more compute
        # than requested; quality can only improve).  No reference
        # counterpart — the training-free analog of TeaCache-style step
        # skipping for the TPU serving path.
        self.eps_interval = int(gene.get("eps_interval", 0) or 0)
        self.eps_schedule = gene.get("eps_schedule") or None
        self.eps_on = bool(self.eps_interval or self.eps_schedule)
        self.eps_extrapolate = int(gene.get("eps_extrapolate", 0) or 0)
        if self.eps_extrapolate not in (0, 1, 2):
            raise ValueError("eps_extrapolate must be false/true/1/2 "
                             f"(got {self.eps_extrapolate!r})")
        self.cache_on = bool(self.cache_interval or self.cache_schedule)
        self.cfg_on = bool(self.cfg_interval or self.cfg_schedule)
        if self.eps_on and self.use_pnp:
            # a skipped step runs no UNet, so the per-timestep PnP
            # feature/attention injections silently vanish on those steps
            # — same hazard class as PnP+deepcache below; no gated
            # profile combines them.  Fail fast.
            raise ValueError(
                "eps_interval/eps_schedule cannot be combined with "
                "control: pnp — skipped steps run no UNet, dropping that "
                "timestep's PnP injections.")
        if self.cache_on and self.use_pnp:
            # shallow steps run only the level-0 UNet path, which skips
            # the up-block-1 PnP conv/attention injections — the flagship
            # PnP mechanism would silently half-disable mid-schedule.  No
            # PnP+deepcache profile has a quality gate; fail fast.
            raise ValueError(
                "cache_interval/cache_schedule cannot be combined with "
                "control: pnp — cached (shallow) steps skip the up-block-1 "
                "feature injections.  Use cfg_interval/cfg_schedule (the "
                "CFG delta cache keeps all injections) or disable the "
                "deep-feature cache.")

        resolve_precision(config, gene, bundle)
        self.scheduler = DDIMScheduler.create(self.n_timesteps)
        if self.use_pnp:
            self.pnp_attn_steps = int(
                self.n_timesteps * float(gene.get("pnp_attn_t", 0.5)))
            self.pnp_conv_steps = int(
                self.n_timesteps * float(gene.get("pnp_f_t", 0.8)))

        if bool(gene.get("use_lora", False)):
            # Merge before TextEncoder construction so the text-encoder
            # components of the LoRA (reference: pipe.load_lora_weights,
            # generate.py:93-94 applies TE LoRAs too) land in the encode jit.
            from vidtome_tpu.models.lora import apply_lora_bundle

            apply_lora_bundle(bundle, gene.get("lora", {}))

        self.text = TextEncoder(bundle)
        # decode batching: 8 measured 22ms/frame vs 31 at 4 on v5e 512p
        # (perf/decode_profile_r5.json batch sweep)
        self.vae = VAECoder(bundle, batch_size=int(gene.get("batch_size", 8)))

        # Fused Pallas resnet-block dispatch (ops/resnet.py, DESIGN §8.4):
        # "off" (XLA path) or "fused"; a config dial like quant/cache_*.
        # The quant mode is parsed first because the fused kernel's
        # measured-win shape policy differs between bf16 and int8.
        self.resnet_mode = str(gene.get(
            "resnet_mode", config.get("resnet_mode", "off")) or "off")
        self.quant = str(gene.get("quant", config.get("quant", "none"))
                         or "none").lower()
        # Fused transformer cross-attention sublayer (ops/sublayer.py):
        # one Pallas call per block for add+LN2+to_q+cross-attn+to_out+
        # add+LN3.  bf16-only — the int8 policy quantizes the attention
        # projections, whose bf16 kernels the fused path needs.
        self.sublayer_mode = str(gene.get(
            "sublayer_mode", config.get("sublayer_mode", "off")) or "off")
        if self.sublayer_mode not in ("off", "fused"):
            raise ValueError(f"sublayer_mode must be off|fused, got "
                             f"{self.sublayer_mode!r}")
        if self.sublayer_mode == "fused" and self.quant in ("int8", "w8a8"):
            raise ValueError(
                "sublayer_mode: fused requires bf16 attention projections "
                "(quant: none) — the int8 policy strips their kernels")
        self.unet = bundle.make_unet(
            tome=self.tome, use_pallas=use_pallas,
            resnet_mode=self.resnet_mode,
            resnet_quant=self.quant in ("int8", "w8a8"),
            sublayer_mode=self.sublayer_mode)
        self.unet_params = bundle.unet_params
        if self.use_controlnet:
            self.controlnet = bundle.make_controlnet(use_pallas=use_pallas)

        self._params = {"unet": self.unet_params}
        if self.use_controlnet:
            self._params["controlnet"] = bundle.controlnet_params

        # Int8 (W8A8) serving: split the UNet tree into residual bf16
        # params + int8 qparams once at construction; the QDense/QConv
        # modules pick up the "qparams" collection at apply time.  The
        # TPU-native analog of the reference's fp16 serving dial
        # (utils/utils.py:42-66) — see ops/quant.py.
        if self.quant in ("int8", "w8a8"):
            from vidtome_tpu.ops import quant as quant_ops

            res, qp = quant_ops.quantize_params(self._params["unet"])
            self._params["unet"] = res
            self._params["unet_q"] = qp
            print(f"[INFO] int8 serving: quantized "
                  f"{quant_ops.count_quantized(qp)} UNet weight tensors")
            if self.use_controlnet:
                # the ControlNet shares the UNet block classes (QConv/
                # QDense), so the same transform applies; its residual-
                # producing zero convs and the image-space hint encoder
                # stay bf16 (output-critical / un-normed inputs)
                cn_res, cn_qp = quant_ops.quantize_params(
                    self._params["controlnet"],
                    exclude=quant_ops.DEFAULT_EXCLUDE
                    + r"|zero_conv|cond_embedding")
                self._params["controlnet"] = cn_res
                self._params["controlnet_q"] = cn_qp
                print(f"[INFO] int8 serving: quantized "
                      f"{quant_ops.count_quantized(cn_qp)} ControlNet "
                      "weight tensors")
        elif self.quant not in ("none", "false", "off"):
            raise ValueError(f"unknown quant mode {self.quant!r} "
                             "(choices: none, int8)")
        self._lane_constraint = lambda x: x
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from vidtome_tpu.parallel import mesh as pmesh

            self._params = pmesh.shard_params(mesh, self._params)
            spec = NamedSharding(mesh, P("data"))
            self._lane_constraint = (
                lambda x: jax.lax.with_sharding_constraint(x, spec))

        self.base_key = jax.random.key(self.seed)

        # Alpha-bar / timestep tables as device arrays gathered by a
        # *traced* step index: indexing with a Python int would bake a new
        # executable per step (catastrophic on remote-compile backends).
        sch = self.scheduler
        a_t_all = np.stack([np.asarray(sch.sample_alpha_pair(i)[0])
                            for i in range(sch.num_steps)])
        a_prev_all = np.stack([np.asarray(sch.sample_alpha_pair(i)[1])
                               for i in range(sch.num_steps)])
        self._alpha_tables = (jnp.asarray(a_t_all), jnp.asarray(a_prev_all))
        self._t_table = jnp.asarray(np.asarray(sch.timesteps, np.int32))

        self._sample_block = self._build_sample_fn()

        # Optional SDXL-refiner second stage (no reference counterpart —
        # diffusers-style two-stage denoise split): the base model handles
        # the first denoising_start fraction of the schedule, the refiner
        # (a low-noise specialist conditioned on an aesthetic score) the
        # rest.  Token merging stays active in both stages.
        self.refiner = None
        ref = gene.get("refiner", None)
        if ref and not bundle.is_refiner:
            from vidtome_tpu.config import Config
            from vidtome_tpu.models.registry import init_model

            if not bundle.is_xl:
                # The refiner denoises in the SDXL VAE latent space
                # (scaling 0.13025); chaining it onto an SD1.5/2.x base
                # would silently produce corrupted output.
                raise ValueError(
                    "generation.refiner requires an SDXL base "
                    "(sd_version: xl); got "
                    f"sd_version={bundle.sd_version!r}")

            ref_bundle = init_model(
                sd_version=ref.get("sd_version", "xl-refiner"),
                model_key=ref.get("model_key"),
                weight_dtype=("bf16" if bundle.dtype == jnp.bfloat16
                              else "fp32"))
            ref_cfg = Config(config.to_dict())
            ref_cfg["generation"]["control"] = "none"  # no PnP/ControlNet
            ref_cfg["generation"]["refiner"] = None
            self.refiner = Generator(ref_bundle, ref_cfg,
                                     use_pallas=use_pallas, mesh=mesh)
            self.refiner_start = float(ref.get("denoising_start", 0.8))
            self.aesthetic_score = float(ref.get("aesthetic_score", 6.0))
            self.negative_aesthetic_score = float(
                ref.get("negative_aesthetic_score", 2.5))

    # ------------------------------------------------------------------

    def _build_sample_fn(self):
        """One jitted function per BLOCK of timesteps: fori_loop over steps,
        each step = init chunk + lax.scan over the remaining chunks (global
        token bank as scan carry) + DDIM update.  All per-step inputs
        (chunk schedules, PnP source latents, alpha/timestep tables) are
        device arrays gathered by the traced step index, so the host loop
        dispatches once per ~10 steps instead of doing per-step schedule
        builds and transfers (the reference's Python loops,
        generate.py:211-219).  The latent buffer is donated."""
        unet = self.unet
        use_pnp, use_depth = self.use_pnp, self.use_depth
        use_controlnet = self.use_controlnet
        num_lanes = self.num_lanes
        merge_global = self.merge_global
        controlnet = self.controlnet if use_controlnet else None
        control_scale = self.control_scale

        t_table = self._t_table
        alpha_tables = self._alpha_tables
        base_key = self.base_key
        lane_constraint = self._lane_constraint
        pnp_attn_steps = getattr(self, "pnp_attn_steps", 0)
        pnp_conv_steps = getattr(self, "pnp_conv_steps", 0)

        is_xl = self.bundle.needs_pooled

        cache_on = self.cache_on
        cfg_on = self.cfg_on
        eps_on = self.eps_on
        eps_extrapolate = self.eps_extrapolate
        chunk_batch = self.chunk_batch

        def chunk_eps(bank_mode, params, x_full, eps_buf, fidx, banks,
                      step_i, chunk_pos, context, source_full, depth_full,
                      control_full, guidance_scale, caches,
                      cache_mode="off", cfg_skip=False):
            """Gather one chunk, run CFG lanes through the merged UNet,
            scatter eps back into the full buffer.  ``context`` is the lane
            context array, or (context, pooled, time_ids) for SDXL.

            ``caches`` (serving accelerations, both quality-gated):
              * caches["deep"] [num_lanes, Fpad, h, w, c] — deep-feature
                cache: cache_mode "full" refreshes this chunk's slice,
                "shallow" serves the UNet's deep trunk from it.
              * caches["ucond"] [Fpad, h, w, 4] fp32 — the guidance
                DELTA (cond - uncond): ``cfg_skip`` steps drop the
                uncond lane from the batch and apply
                eps = cond + (gs-1)*delta; refresh steps update it.
            """
            unet_params = params["unet"]
            cn_params = params.get("controlnet")
            xl_kwargs = {}
            if is_xl:
                context, pooled, time_ids = context
            # fidx: [chunk, 2] (gather, scatter).  Gather reads use column
            # 0; scatter writes use column 1.  Rotate mode keeps them
            # identical; ragged mode routes duplicate-slot writes to the
            # waste slot so no real frame's outputs are clobbered.
            fidx_g, fidx_s = fidx[:, 0], fidx[:, 1]
            t = t_table[step_i]
            # nested fold_in: unique per (step, chunk) for ANY chunk count
            key = jax.random.fold_in(jax.random.fold_in(base_key, step_i),
                                     chunk_pos)
            attn_flag = step_i < pnp_attn_steps
            conv_flag = step_i < pnp_conv_steps
            x_chunk = x_full[fidx_g]
            F = x_chunk.shape[0]
            if cfg_skip:
                # run only [source,] cond — the uncond row (index
                # num_lanes-2 in lane-major order) comes from the cache
                lane_rows = tuple(r for r in range(num_lanes)
                                  if r != num_lanes - 2)
            else:
                lane_rows = tuple(range(num_lanes))
            lanes_eff = len(lane_rows)
            lanes = [x_chunk] if cfg_skip else [x_chunk, x_chunk]
            if use_pnp:
                lanes = [source_full[fidx_g].astype(x_chunk.dtype)] + lanes
            x_in = lane_constraint(jnp.concatenate(lanes))
            rows = jnp.asarray(lane_rows, jnp.int32)
            ctx = jnp.repeat(context[rows], F, axis=0)
            if is_xl:
                xl_kwargs = dict(
                    add_text_embeds=jnp.repeat(pooled[rows], F, axis=0),
                    add_time_ids=jnp.repeat(time_ids[rows], F, axis=0))
            if use_depth:
                depth = jnp.tile(depth_full[fidx_g], (lanes_eff, 1, 1, 1))
                x_in = jnp.concatenate([x_in, depth.astype(x_in.dtype)], -1)
            kwargs = {}
            if use_controlnet:
                cond = jnp.tile(control_full[fidx_g], (lanes_eff, 1, 1, 1))
                cn_vars = {"params": cn_params}
                if "controlnet_q" in params:
                    cn_vars["qparams"] = params["controlnet_q"]
                down_r, mid_r = controlnet.apply(
                    cn_vars, x_in, t, ctx, cond,
                    conditioning_scale=control_scale)
                kwargs = dict(down_residuals=down_r, mid_residual=mid_r)
            if cache_mode == "shallow":
                # frame gather FIRST (4 of Fpad frames), lane gather on the
                # small result — the reverse order would materialize the
                # whole [lanes, Fpad, h, w, c] cache per chunk
                dc = caches["deep"][:, fidx_g][rows]  # [Leff, F, h, w, c]
                kwargs.update(
                    cache_mode="shallow",
                    deep_cache=dc.reshape((lanes_eff * F,) + dc.shape[2:]))
            elif cache_mode == "full":
                kwargs.update(cache_mode="full")

            tome_call = ToMeCall(key=key, bank_mode=bank_mode)
            variables = {"params": unet_params}
            if "unet_q" in params:
                variables["qparams"] = params["unet_q"]
            if banks is not None:
                variables["tome_bank"] = banks
            pnp_kwargs = {}
            if use_pnp:
                pnp_kwargs = dict(attn_inject=attn_flag,
                                  conv_inject=conv_flag)
            if merge_global:
                eps_all, mut = unet.apply(
                    variables, x_in, t, ctx, tome_call=tome_call,
                    num_lanes=lanes_eff, mutable=["tome_bank"],
                    **pnp_kwargs, **kwargs, **xl_kwargs)
                # cache-shallow steps on models whose level-0 blocks have
                # no attention (SDXL: down block 0 is attention-free) run
                # no merging at all — the bank collection stays untouched
                banks_out = mut.get("tome_bank", banks)
            else:
                eps_all = unet.apply(
                    variables, x_in, t, ctx, tome_call=tome_call,
                    num_lanes=lanes_eff, **pnp_kwargs, **kwargs,
                    **xl_kwargs)
                banks_out = banks
            if cache_mode == "full":
                eps_all, deep = eps_all
                deep = deep.reshape((lanes_eff, F) + deep.shape[1:])
                deep_full = caches["deep"]
                for li, lane in enumerate(lane_rows):
                    deep_full = deep_full.at[lane, fidx_s].set(deep[li])
                caches = dict(caches, deep=deep_full)
            eps_cond = eps_all[(lanes_eff - 1) * F:].astype(jnp.float32)
            if cfg_skip:
                # Cached-delta CFG: eps = cond + (gs-1)*(cond - uncond)|old.
                # Caching the guidance DELTA (not the uncond eps) matters:
                # combining a fresh cond with a stale uncond would inject
                # the cond lane's per-step drift into the difference and
                # amplify it by gs; the delta itself varies much more
                # slowly (measured: ucond-eps cache 23.3 dB proxy vs
                # delta cache — DESIGN.md §9).
                eps = eps_cond + (guidance_scale - 1.0) * caches["ucond"][
                    fidx_g]
            else:
                eps_uncond = eps_all[(lanes_eff - 2) * F:(lanes_eff - 1) * F
                                     ].astype(jnp.float32)
                delta = eps_cond - eps_uncond
                if cfg_on:
                    caches = dict(caches, ucond=caches["ucond"].at[fidx_s]
                                  .set(delta))
                # CFG combine in fp32 — cast BEFORE the difference so the
                # guidance-amplified delta keeps full precision (the
                # reference's autocast leaves this in reduced precision).
                eps = eps_uncond + guidance_scale * delta
            eps_buf = eps_buf.at[fidx_s].set(eps.astype(eps_buf.dtype))
            return eps_buf, banks_out, caches

        def step(params, x, step_i, fidx_all, context, source_full,
                 depth_full, control_full, guidance_scale, caches,
                 cache_mode="off", cfg_skip=False):
            """Full timestep: fidx_all [n_chunks, chunk_size, 2] lists each
            chunk's (gather, scatter) frame indices in processing order."""
            n_chunks = fidx_all.shape[0]
            eps = jnp.zeros_like(x)

            first_mode = "init" if merge_global else "off"
            eps, banks, caches = chunk_eps(
                first_mode, params, x, eps, fidx_all[0], None, step_i,
                jnp.asarray(0, jnp.int32), context, source_full, depth_full,
                control_full, guidance_scale, caches, cache_mode, cfg_skip)

            if n_chunks > 1:
                rest_mode = "merge" if merge_global else "off"

                if chunk_batch:
                    # ONE UNet call for chunks 2..K: fold the chunks into
                    # the batch axis (lane-major, chunk-then-frame order so
                    # join_frames' consecutive-``chunk_size`` grouping
                    # reproduces per-chunk local merging).  The first
                    # chunk's bank is tiled per chunk row — every batched
                    # chunk merges against it (star vs the scan's chain).
                    banks_rest = None
                    if banks is not None:
                        banks_rest = jax.tree.map(
                            lambda b: jnp.repeat(b, n_chunks - 1, axis=0),
                            banks)
                    fidx_rest = fidx_all[1:].reshape(
                        (n_chunks - 1) * fidx_all.shape[1], 2)
                    eps, _, caches = chunk_eps(
                        rest_mode, params, x, eps, fidx_rest, banks_rest,
                        step_i, jnp.asarray(1, jnp.int32), context,
                        source_full, depth_full, control_full,
                        guidance_scale, caches, cache_mode, cfg_skip)
                else:
                    def body(carry, inp):
                        eps, banks, caches = carry
                        fidx, pos = inp
                        eps, banks, caches = chunk_eps(
                            rest_mode, params, x, eps, fidx, banks, step_i,
                            pos, context, source_full, depth_full,
                            control_full, guidance_scale, caches,
                            cache_mode, cfg_skip)
                        return (eps, banks, caches), None

                    (eps, banks, caches), _ = jax.lax.scan(
                        body, (eps, banks, caches),
                        (fidx_all[1:],
                         jnp.arange(1, n_chunks, dtype=jnp.int32)))

            if eps_on:
                # store the guidance-combined eps for eps-skip steps (and
                # the previous refresh's eps + step indices when linear
                # extrapolation is on; before the second refresh the
                # "previous" slot aliases the current one, so the slope
                # degenerates to plain reuse)
                eps32 = eps.astype(jnp.float32)
                step_f = step_i.astype(jnp.float32)
                if eps_extrapolate:
                    first = caches["eps_step"] < 0
                    upd = dict(
                        eps_prev=jnp.where(first, eps32, caches["eps"]),
                        eps_prev_step=jnp.where(first, step_f,
                                                caches["eps_step"]),
                        eps=eps32, eps_step=step_f)
                    if eps_extrapolate >= 2:
                        # three-deep history: prev2 <- prev (aliases on
                        # the first refreshes; the skip predictor gates
                        # the quadratic term on distinct step indices)
                        upd["eps_prev2"] = jnp.where(first, eps32,
                                                     caches["eps_prev"])
                        upd["eps_prev2_step"] = jnp.where(
                            first, step_f, caches["eps_prev_step"])
                    caches = dict(caches, **upd)
                else:
                    caches = dict(caches, eps=eps32)
            a_t_tab, a_prev_tab = alpha_tables
            x_next = ddim_step(x, eps, a_t_tab[step_i], a_prev_tab[step_i])
            return x_next.astype(x.dtype), caches

        @functools.partial(jax.jit, donate_argnums=(1, 2),
                           static_argnames=("n_steps",))
        def sample_block(params, x, caches, start_i, mode_tab, fidx_table,
                         context, src_table, depth_full, control_full,
                         guidance_scale, n_steps: int):
            """Run ``n_steps`` consecutive timesteps on device.

            fidx_table: [num_steps, n_chunks, chunk_size, 2] chunk schedules.
            src_table: PnP source latents [num_steps, F, h, w, 4] (or a
            scalar placeholder when PnP is off).
            caches: serving-cache buffer dict from _cache_buffers (scalar
            placeholders when the caches are off); mode_tab is the
            [num_steps, 3] int32 refresh table from _mode_masks (column 0:
            run the full UNet and refresh the deep cache; column 1:
            refresh the CFG delta cache; column 2: run the UNet at all —
            0 reuses the cached eps) — built per sampling start so a
            refiner stage entering mid-schedule still opens with
            cache-refreshing full steps.  Scalar placeholder when both
            caches are off."""

            def body(j, carry):
                x, caches = carry
                step_i = start_i + j
                src = src_table[step_i] if use_pnp else src_table

                def run(mode, skip, operands):
                    x, caches = operands
                    return step(params, x, step_i, fidx_table[step_i],
                                context, src, depth_full, control_full,
                                guidance_scale, caches, mode, skip)

                def run_modes(operands):
                    if not (cache_on or cfg_on):
                        return run("off", False, operands)
                    if cache_on and cfg_on:
                        idx = 2 * mode_tab[step_i, 0] + mode_tab[step_i, 1]
                        return jax.lax.switch(idx, [
                            functools.partial(run, "shallow", True),
                            functools.partial(run, "shallow", False),
                            functools.partial(run, "full", True),
                            functools.partial(run, "full", False),
                        ], operands)
                    if cache_on:
                        return jax.lax.cond(
                            mode_tab[step_i, 0] == 1,
                            functools.partial(run, "full", False),
                            functools.partial(run, "shallow", False),
                            operands)
                    return jax.lax.cond(
                        mode_tab[step_i, 1] == 1,
                        functools.partial(run, "off", False),
                        functools.partial(run, "off", True),
                        operands)

                if not eps_on:
                    return run_modes((x, caches))

                def skip_step(operands):
                    # eps-reuse step: NO UNet call — the DDIM update runs
                    # on the cached guidance-combined eps, extrapolated
                    # from the trailing refreshes when eps_extrapolate is
                    # on: order 1 = linear along the last refresh slope,
                    # order 2 = Newton-form quadratic through the last
                    # three refreshes (slopes scaled by step distances,
                    # so any refresh cadence extrapolates consistently).
                    x, caches = operands
                    e = caches["eps"]
                    if eps_extrapolate:
                        t = step_i.astype(jnp.float32)
                        s2v = caches["eps_step"]
                        s1v = caches["eps_prev_step"]
                        # before the second refresh eps_prev aliases eps,
                        # so d1 == 0 and this degrades to plain reuse
                        d1 = ((e - caches["eps_prev"])
                              / jnp.maximum(s2v - s1v, 1.0))
                        e = e + (t - s2v) * d1
                        if eps_extrapolate >= 2:
                            s0v = caches["eps_prev2_step"]
                            d2 = ((caches["eps_prev"] - caches["eps_prev2"])
                                  / jnp.maximum(s1v - s0v, 1.0))
                            # curvature only once three DISTINCT refreshes
                            # exist (aliased history would fake curvature)
                            dd = jnp.where(
                                s1v > s0v,
                                (d1 - d2) / jnp.maximum(s2v - s0v, 1.0),
                                0.0)
                            e = e + (t - s2v) * (t - s1v) * dd
                    a_t_tab, a_prev_tab = alpha_tables
                    x2 = ddim_step(x, e, a_t_tab[step_i],
                                   a_prev_tab[step_i])
                    return (x2.astype(x.dtype), caches)

                return jax.lax.cond(mode_tab[step_i, 2] == 1,
                                    run_modes, skip_step, (x, caches))

            return jax.lax.fori_loop(0, n_steps, body, (x, caches))

        return sample_block

    # ------------------------------------------------------------------

    def _block_size(self) -> int:
        """Steps per device dispatch: largest small divisor of num_steps so
        one executable covers the whole schedule (progress still prints
        between blocks).  ``generation.steps_per_block`` overrides (it
        must divide n_timesteps): each block boundary costs a host
        round-trip, so serving configs can trade progress granularity for
        wall time."""
        override = int(self.gene.get("steps_per_block", 0) or 0)
        n = self.scheduler.num_steps
        if override:
            if n % override:
                raise ValueError(
                    f"generation.steps_per_block={override} must divide "
                    f"n_timesteps={n}")
            return override
        for b in (10, 8, 5, 4, 2):
            if n % b == 0:
                return b
        return 1

    def _cache_buffers(self, x):
        """Zeros for the serving caches: deep-feature cache
        [lanes, Fpad, h, w, Cdeep] + CFG-delta cache [Fpad, h, w, 4]
        (scalar placeholders when the corresponding interval is 0 — the
        donation slot still needs leaves).  The two placeholders must be
        DISTINCT buffers: the caches pytree is donated, and donating one
        buffer through two leaves is a runtime error ("attempt to donate
        the same buffer twice")."""
        if self.cache_on:
            ch = self.bundle.unet_config.block_out_channels[1]
            deep = jnp.zeros(
                (self.num_lanes, x.shape[0], x.shape[1], x.shape[2], ch),
                self.bundle.dtype)
        else:
            deep = jnp.zeros((), self.bundle.dtype)
        ucond = (jnp.zeros(x.shape[:3] + (4,), jnp.float32)
                 if self.cfg_on else jnp.zeros((), jnp.float32))
        bufs = {"deep": deep, "ucond": ucond}
        # eps-reuse cache: last guidance-combined eps (+ the previous
        # refresh's eps and both refresh step indices when linear
        # extrapolation is on).  Distinct zero buffers per leaf — the
        # caches pytree is donated (see the deep/ucond note above).
        bufs["eps"] = (jnp.zeros(x.shape[:3] + (4,), jnp.float32)
                       if self.eps_on else jnp.zeros((), jnp.float32))
        if self.eps_on and self.eps_extrapolate:
            bufs["eps_prev"] = jnp.zeros(x.shape[:3] + (4,), jnp.float32)
            bufs["eps_step"] = jnp.full((), -1.0, jnp.float32)
            bufs["eps_prev_step"] = jnp.full((), -1.0, jnp.float32)
        if self.eps_on and self.eps_extrapolate >= 2:
            bufs["eps_prev2"] = jnp.zeros(x.shape[:3] + (4,), jnp.float32)
            bufs["eps_prev2_step"] = jnp.full((), -1.0, jnp.float32)
        return bufs

    def _mode_masks(self, start: int = 0):
        """[num_steps, 3] int32 refresh table for sample_block (column 0:
        deep-feature cache, column 1: CFG delta cache, column 2: run the
        UNet at all — eps-reuse skip), or a scalar placeholder when all
        three caches are off."""
        if not (self.cache_on or self.cfg_on or self.eps_on):
            return jnp.zeros((), jnp.int32)
        n = self.scheduler.num_steps
        deep = refresh_mask(self.cache_schedule, self.cache_interval or 1,
                            n, start, kind="cache")
        cfgm = refresh_mask(self.cfg_schedule, self.cfg_interval or 1,
                            n, start, kind="cfg")
        epsm = refresh_mask(self.eps_schedule, self.eps_interval or 1,
                            n, start, kind="eps")
        if self.eps_on:
            # a skipped step cannot refresh the other caches: force the
            # eps-run mask over every ACTIVE cache's refresh steps (same
            # repair policy as the deep/cfg alignment below — strictly
            # more computation than requested, quality can only improve)
            align = np.zeros(n, bool)
            if self.cache_on:
                align |= deep
            if self.cfg_on:
                align |= cfgm
            forced = int((align[start:] & ~epsm[start:]).sum())
            if forced:
                # once per Generator (warmup + every sample/refiner start
                # rebuilds the masks) and on stderr, away from the JSON
                # artifacts on stdout
                if not getattr(self, "_eps_align_warned", False):
                    print(f"[WARNING] {forced} deep/CFG cache refresh "
                          "steps fall on eps-skip steps; those steps now "
                          "run the UNet (eps-run mask auto-aligned "
                          "upward).", file=sys.stderr)
                    self._eps_align_warned = True
                epsm = epsm | align
        if self.cache_on and self.cfg_on:
            # The uncond lane's deep-cache slice only refreshes on steps
            # that are BOTH deep-full and cfg-full (cfg-skip steps drop
            # the lane from the batch).  Misaligned schedules make that
            # slice much staler than either schedule implies — measured
            # to degrade quality past both individual gates (DESIGN §9,
            # serve32 27.2 dB vs its levers' 33+).
            misaligned = int((deep[start:] & ~cfgm[start:]).sum())
            if misaligned:
                # Auto-align rather than warn-and-degrade (the analogous
                # PnP+deepcache hazard fails fast; this one has a safe
                # repair): force every deep-refresh step to also be a
                # cfg-refresh step.  Strictly more computation than the
                # requested cfg schedule — quality can only improve.
                print(f"[WARNING] {misaligned} deep-cache refresh steps "
                      "fall on CFG-skip steps (stale uncond deep slice, "
                      "measured below the fidelity gate — DESIGN §9 "
                      "serve32). Auto-aligning: those steps now also "
                      "refresh the CFG delta cache.")
                cfgm = cfgm | deep
        return jnp.asarray(np.stack([deep, cfgm, epsm], axis=1), jnp.int32)

    def warmup(self, x, context):
        """Compile the production sample-block executable (and force
        completion).  Useful where first-compile latency matters."""
        zero = jnp.zeros((), self.bundle.dtype)
        depth = self.depth if self.depth is not None else zero
        control = (self.control_images
                   if self.control_images is not None else zero)
        steps = self.scheduler.num_steps
        if self.use_pnp:
            src = jnp.broadcast_to(x, (steps,) + x.shape)
        else:
            src = zero
        gs = jnp.asarray(self.guidance_scale, jnp.float32)
        n_chunks = x.shape[0] // self.chunk_size
        fidx = jnp.arange(x.shape[0], dtype=jnp.int32).reshape(
            n_chunks, self.chunk_size)
        fidx_table = jnp.broadcast_to(
            jnp.stack([fidx, fidx], axis=-1),
            (steps, n_chunks, self.chunk_size, 2))
        out, _ = self._sample_block(
            self._params, jnp.copy(x), self._cache_buffers(x),
            jnp.asarray(0, jnp.int32), self._mode_masks(), fidx_table,
            context, src, depth, control, gs, n_steps=self._block_size())
        return float(jnp.sum(out))  # force completion

    def configure_frames(self, n: int) -> None:
        """Set n_frames / n_padded / pad_src for an n-frame clip (also the
        entry point for benchmark/gate harnesses that skip prepare_data)."""
        self.n_frames = n
        self.n_padded, self.pad_src = chunking.pad_to_chunks(
            n, self.chunk_size)
        if self.ragged and self.n_padded == n:
            # ragged mode needs at least one slot beyond the real frames
            # as the duplicate-write sink (waste slot); keep the buffer a
            # chunk multiple so mesh frame-axis shardings stay even
            self.n_padded += self.chunk_size
            self.pad_src = np.minimum(np.arange(self.n_padded), n - 1)

    def prepare_data(self, data_path, latents_dir, frame_ids):
        self.frames = load_video(data_path, self.height, self.width,
                                 frame_ids=frame_ids)
        self.frame_ids = frame_ids
        n = len(self.frames)
        self.configure_frames(n)

        init = artifacts.load_latent(latents_dir,
                                     int(self.scheduler.timesteps[0]),
                                     frame_ids=frame_ids)
        self.init_noise = jnp.asarray(init, self.bundle.dtype)[self.pad_src]

        self.depth = None
        if self.use_depth:
            depth = prepare_depth_latents(self.frames, frame_ids,
                                          self.work_dir)
            self.depth = jnp.asarray(depth)[self.pad_src]

        self.control_images = None
        if self.use_controlnet:
            images = artifacts.load_or_compute_control(
                self.work_dir, self.control, self.frames, frame_ids,
                functools.partial(control_preprocess,
                                  control_type=self.control))
            self.control_images = jnp.asarray(
                images, self.bundle.dtype)[self.pad_src]

    def check_latent_exists(self, latents_dir) -> bool:
        if self.use_pnp:
            ts = [int(t) for t in self.scheduler.timesteps]
        else:
            ts = [int(self.scheduler.timesteps[0])]
        return artifacts.check_latents_exist(latents_dir, ts)

    # ------------------------------------------------------------------

    def ddim_sample(self, x, context, start: int = 0,
                    stop: int | None = None):
        print("[INFO] denoising frames...")
        profile_dir = (self.config.get("tpu", {}) or {}).get("profile_dir")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        try:
            return self._ddim_sample(x, context, start, stop)
        finally:
            if profile_dir:
                jax.profiler.stop_trace()
                print(f"[INFO] profiler trace written to {profile_dir}")

    def _ddim_sample(self, x, context, start: int = 0,
                     stop: int | None = None):
        # copy: the block function donates its latent buffer, and callers
        # reuse the initial noise across prompts (multi-edit loop).
        x = jnp.copy(x)
        sch = self.scheduler
        rng = np.random.default_rng(self.seed)
        zero = jnp.zeros((), self.bundle.dtype)
        gs = jnp.asarray(self.guidance_scale, jnp.float32)
        depth = self.depth if self.depth is not None else zero
        control = (self.control_images
                   if self.control_images is not None else zero)

        # Pre-build every timestep's chunk schedule (host-side numpy is off
        # the critical path this way): [steps, K, chunk, 2] gather/scatter
        # pairs — rotate mode (default) or reference-faithful ragged mode.
        fidx_table = jnp.asarray(chunking.build_fidx_table(
            self.n_padded, self.chunk_size, rng, sch.num_steps,
            chunk_ord=self.chunk_ord, perm_div=self.perm_div,
            merge_global=self.merge_global, ragged=self.ragged,
            n_frames=self.n_frames), jnp.int32)

        # ... and preload every PnP source latent to device once instead of
        # a synchronous disk read per step in the hot loop.
        if self.use_pnp:
            src_np = np.stack([
                artifacts.load_latent(self.latents_dir, int(t),
                                      frame_ids=self.frame_ids)
                for t in sch.timesteps])
            src_table = jnp.asarray(src_np, self.bundle.dtype)[:, self.pad_src]
        else:
            src_table = zero

        stop = sch.num_steps if stop is None else stop
        block = self._block_size()
        deep = self._cache_buffers(x)
        mode_tab = self._mode_masks(start)
        s = start
        while s < stop:
            # partial blocks (refiner splits that don't align to the block
            # size) compile one extra executable for the remainder
            n = min(block, stop - s)
            x, deep = self._sample_block(
                self._params, x, deep, jnp.asarray(s, jnp.int32), mode_tab,
                fidx_table, context, src_table, depth, control, gs,
                n_steps=n)
            s += n
            print(f"[INFO] step {s}/{sch.num_steps}")
        return x

    # ------------------------------------------------------------------

    def _build_context(self, edit_prompt, aesthetic=None):
        """Text context for THIS generator's bundle.  SDXL family adds
        (pooled, time_ids); the refiner's 5 time ids carry an aesthetic
        score per CFG lane instead of the base's target-size pair."""
        context = self.text.embed_cfg(edit_prompt, self.negative_prompt,
                                      pnp=self.use_pnp)
        if not self.bundle.needs_pooled:
            return context
        ctx, pooled = context
        h, w = float(self.height), float(self.width)
        if self.bundle.unet_config.addition_num_time_ids == 5:
            # standalone refiner runs (sd_version: xl-refiner as the primary
            # model) read configured scores; the two-stage path passes them
            # explicitly via ``aesthetic``
            ref_cfg = self.gene.get("refiner", None) or {}
            neg, pos = aesthetic or (
                float(ref_cfg.get("negative_aesthetic_score", 2.5)),
                float(ref_cfg.get("aesthetic_score", 6.0)))
            scores = [neg] * (ctx.shape[0] - 1) + [pos]  # cond lane last
            time_ids = jnp.asarray(
                [[h, w, 0.0, 0.0, s] for s in scores], jnp.float32)
        else:
            time_ids = jnp.tile(
                jnp.asarray([[h, w, 0.0, 0.0, h, w]], jnp.float32),
                (ctx.shape[0], 1))
        return (ctx, pooled, time_ids)

    def _sample_with_refiner(self, edit_prompt, context):
        """Two-stage denoise: base for the first denoising_start fraction
        of the schedule, refiner for the rest."""
        steps = self.scheduler.num_steps
        split = max(1, min(int(round(steps * self.refiner_start)),
                           steps - 1))
        x = self.ddim_sample(self.init_noise, context, stop=split)
        r = self.refiner
        r.n_frames, r.n_padded, r.pad_src = (
            self.n_frames, self.n_padded, self.pad_src)
        r.depth = r.control_images = None
        ref_context = r._build_context(
            edit_prompt, aesthetic=(self.negative_aesthetic_score,
                                    self.aesthetic_score))
        print(f"[INFO] refiner stage: steps {split}..{steps}")
        return r.ddim_sample(x, ref_context, start=split)

    def __call__(self, data_path, latents_path, output_path, frame_ids):
        latents_dir = artifacts.get_latents_dir(latents_path,
                                                self.bundle.model_key)
        assert self.check_latent_exists(latents_dir), (
            f"Required latent not found at {latents_dir}. Note: If using "
            "PnP as control, you need inversion latents saved at each "
            "generation timestep.")
        self.latents_dir = latents_dir
        self.prepare_data(data_path, latents_dir, frame_ids)
        print(f"[INFO] initial noise latent shape: {self.init_noise.shape}")

        outputs = {}
        for edit_name, edit_prompt in dict(self.prompt).items():
            print(f"[INFO] current prompt: {edit_prompt}")
            context = self._build_context(edit_prompt)
            if self.refiner is not None:
                clean = self._sample_with_refiner(edit_prompt, context)
            else:
                clean = self.ddim_sample(self.init_noise, context)
            frames = np.asarray(self.vae.decode(clean[: self.n_frames]))
            cur_out = os.path.join(output_path, edit_name)
            save_config(self.config, cur_out, gene=True)
            save_video(frames, cur_out, save_frame=self.save_frame)
            outputs[edit_name] = frames
        return outputs


def main(argv=None):
    """Standalone generation stage (reference generate.py:365-375); requires
    a prior inversion run to have cached the latents."""
    from vidtome_tpu.cli import run_generation, setup_from_argv

    config, bundle, mesh, use_pallas = setup_from_argv(argv)
    run_generation(config, bundle, mesh, use_pallas)


if __name__ == "__main__":
    main()
