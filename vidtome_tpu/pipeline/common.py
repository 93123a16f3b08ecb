"""Shared pipeline runtime: text embedding, batched VAE coding, frame ids.

The jitted closures here are the building blocks both stages share
(reference spreads these across invert.py:70-115 and generate.py:100-170)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vidtome_tpu.models.registry import ModelBundle
from vidtome_tpu.models.vae import AutoencoderKL


class TextEncoder:
    """Tokenize + encode prompts to UNet cross-attention context.

    For SDXL bundles (dual encoders) the context is the concatenation of
    both encoders' penultimate hidden states and a pooled projection from
    encoder 2 is returned alongside."""

    def __init__(self, bundle: ModelBundle):
        self._tokenizer = bundle.tokenizer
        model = bundle.make_text_model()
        self._params = bundle.text_params
        self.is_xl = bundle.is_xl
        self.is_refiner = bundle.is_refiner

        @jax.jit
        def encode(params, ids):
            return model.apply({"params": params}, ids)

        self._encode = encode

        if self.is_xl:
            model2 = bundle.make_text_model_2()
            self._params2 = bundle.text2_params

            @jax.jit
            def encode2(params, ids):
                return model2.apply({"params": params}, ids)

            self._encode2 = encode2

    def __call__(self, prompts: str | list[str]):
        ids = jnp.asarray(self._tokenizer(prompts))
        if self.is_refiner:
            # SDXL refiner: the bigG encoder alone provides both the
            # context and the pooled projection; its tokenizer pads with
            # id 0 after the first EOS (same convention as encoder 2).
            hidden, pooled = self._encode(self._params,
                                          self._zero_after_eos(ids))
            return hidden, pooled
        hidden = self._encode(self._params, ids)
        if not self.is_xl:
            return hidden
        hidden2, pooled = self._encode2(self._params2,
                                        self._zero_after_eos(ids))
        return jnp.concatenate([hidden, hidden2], axis=-1), pooled

    def _zero_after_eos(self, ids):
        """SDXL's second tokenizer pads with id 0 ('!') instead of EOS:
        keep the first EOS, zero everything after it."""
        eos = getattr(self._tokenizer, "eos", None)
        if eos is None:
            return ids
        is_eos = (ids == eos).astype(jnp.int32)
        after_first_eos = jnp.cumsum(is_eos, axis=1) - is_eos > 0
        return jnp.where(after_first_eos, 0, ids)

    def embed_cfg(self, prompt: str, negative_prompt: str | None,
                  pnp: bool = False):
        """[uncond; cond] (+ leading empty-prompt lane for PnP,
        reference generate.py:100-108).  SDXL family: returns
        (context, pooled)."""
        prompts = []
        if pnp:
            prompts.append("")
        prompts.append(negative_prompt or "")
        prompts.append(prompt)
        if self.is_xl or self.is_refiner:
            ctxs, pooleds = [], []
            for p in prompts:
                c, pl = self(p)
                ctxs.append(c[0])
                pooleds.append(pl[0])
            return jnp.stack(ctxs), jnp.stack(pooleds)
        return jnp.stack([self(p)[0] for p in prompts])


class VAECoder:
    """Batched, jitted VAE encode/decode (reference invert.py:91-115)."""

    def __init__(self, bundle: ModelBundle, batch_size: int = 8):
        self.batch_size = batch_size
        vae = bundle.make_vae()
        self._params = bundle.vae_params
        dtype = bundle.dtype

        @jax.jit
        def encode(params, imgs):
            return vae.apply({"params": params}, (imgs * 2 - 1).astype(dtype),
                             method=AutoencoderKL.encode)

        @jax.jit
        def decode(params, lat):
            return vae.apply({"params": params}, lat.astype(dtype),
                             method=AutoencoderKL.decode)

        self._encode = encode
        self._decode = decode

    def _batched(self, fn, x: jnp.ndarray) -> jnp.ndarray:
        n = x.shape[0]
        bs = self.batch_size
        pad = (-n) % bs
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
        outs = [fn(self._params, x[i: i + bs])
                for i in range(0, x.shape[0], bs)]
        return jnp.concatenate(outs)[:n]

    def encode(self, images: jnp.ndarray) -> jnp.ndarray:
        """[T, H, W, 3] in [0,1] -> scaled latents [T, H/8, W/8, 4]."""
        return self._batched(self._encode, jnp.asarray(images))

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """Scaled latents -> images [T, H, W, 3] in [0,1] (fp32)."""
        return self._batched(self._decode, jnp.asarray(latents))


def get_frame_ids(frame_range, frame_ids=None) -> list[int]:
    """[start, end, step] / [end] / explicit ids (reference
    utils/utils.py:298-309)."""
    if frame_ids is None:
        frame_ids = list(range(*frame_range))
    frame_ids = sorted(frame_ids)
    if len(frame_ids) > 4:
        shown = "{} {} ... {} {}".format(*frame_ids[:2], *frame_ids[-2:])
    else:
        shown = " ".join(str(i) for i in frame_ids)
    print("[INFO] frame indexes: ", shown)
    return frame_ids


def resolve_precision(config, stage_cfg, bundle=None) -> str:
    """Stage-level float_precision falls back to the global setting
    (reference invert.py:26 lets inversion run fp32 under an fp16
    pipeline).  When a stage requests a precision the loaded weights don't
    currently use, the bundle's UNet/VAE/ControlNet params are re-cast in
    place (one jitted whole-tree cast) and ``bundle.dtype`` updated, so the
    modules the stage constructs afterwards compute in the stage dtype.
    Text-encoder params always stay fp32 (registry policy)."""
    prec = stage_cfg.get("float_precision",
                         config.get("float_precision", "bf16"))
    if prec == "fp16":
        prec = "bf16"  # TPU-native half precision
    if bundle is not None:
        import jax.numpy as jnp

        want = jnp.bfloat16 if prec == "bf16" else jnp.float32
        if want != bundle.dtype:
            from vidtome_tpu.models.registry import _cast

            print(f"[INFO] stage float_precision={prec}: re-casting "
                  f"weights {jnp.dtype(bundle.dtype).name} -> "
                  f"{jnp.dtype(want).name} for this stage")
            bundle.unet_params = _cast(bundle.unet_params, want)
            bundle.vae_params = _cast(bundle.vae_params, want)
            if bundle.controlnet_params is not None:
                bundle.controlnet_params = _cast(bundle.controlnet_params,
                                                 want)
            bundle.dtype = want
    return prec
