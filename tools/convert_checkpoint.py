"""Convert a diffusers-layout SD checkpoint to a native vidtome-tpu bundle.

    python tools/convert_checkpoint.py --src /ckpts/stable-diffusion-v1-5 \
        --dst /ckpts/sd15-native --sd-version 1.5 [--control softedge \
        --controlnet-root /ckpts/controlnets]

The native bundle (orbax) restores in seconds and is the recommended
deployment format; see vidtome_tpu/models/checkpoint.py.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True,
                        help="diffusers-layout checkpoint dir")
    parser.add_argument("--dst", required=True, help="output bundle dir")
    parser.add_argument("--sd-version", default="1.5")
    parser.add_argument("--control", default="none")
    parser.add_argument("--controlnet-root", default=None)
    parser.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    args = parser.parse_args()

    from vidtome_tpu.models.checkpoint import save_bundle
    from vidtome_tpu.models.registry import init_model

    bundle = init_model(
        sd_version=args.sd_version, model_key=args.src,
        control=args.control, weight_dtype=args.dtype,
        controlnet_root=args.controlnet_root, allow_random_weights=False)
    save_bundle(bundle, args.dst)
    print(f"[INFO] native bundle written to {args.dst}")


if __name__ == "__main__":
    main()
