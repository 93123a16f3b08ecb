"""End-to-end CLI: invert then generate (reference run_vidtome.py:5-21).

Each stage is also runnable standalone, mirroring the reference's
``invert.py:282-289`` / ``generate.py:365-375`` ``__main__`` blocks:

    python -m vidtome_tpu.pipeline.inverter  --config configs/demo.yaml
    python -m vidtome_tpu.pipeline.generator --config configs/demo.yaml
"""

from __future__ import annotations

from vidtome_tpu.config import load_config
from vidtome_tpu.models.registry import init_model
from vidtome_tpu.pipeline.common import get_frame_ids
from vidtome_tpu.utils import seed_everything


def setup_from_argv(argv=None):
    """Shared stage preamble: config, model bundle, mesh, attention flag."""
    from vidtome_tpu.runtime import setup_compilation_cache

    setup_compilation_cache()
    config = load_config(argv)

    # Multi-host first: jax.distributed.initialize must run before any
    # backend touch so jax.devices() spans the pod for mesh construction.
    from vidtome_tpu.parallel.distributed import initialize_from_config

    initialize_from_config(config.get("tpu", None))
    bundle = init_model(
        sd_version=str(config.get("sd_version", "1.5")),
        model_key=config.get("model_key", None),
        control=str(config.generation.get("control", "none")),
        weight_dtype=str(config.get("float_precision", "bf16")),
        controlnet_root=config.get("controlnet_root", None),
    )
    config["model_key"] = bundle.model_key
    seed_everything(int(config.get("seed", 123)))

    from vidtome_tpu.parallel.mesh import mesh_from_config

    mesh = mesh_from_config(config.get("tpu", None))
    if mesh is not None:
        print(f"[INFO] device mesh: {dict(mesh.shape)}")

    tpu_cfg = config.get("tpu", None)
    use_pallas = None if tpu_cfg is None else tpu_cfg.get(
        "use_pallas_attention", None)
    return config, bundle, mesh, use_pallas


def run_inversion(config, bundle, mesh=None, use_pallas=None):
    from vidtome_tpu.pipeline.inverter import Inverter

    print("Start inversion!")
    inverter = Inverter(bundle, config, use_pallas=use_pallas, mesh=mesh)
    return inverter(config.input_path, config.inversion.save_path)


def run_generation(config, bundle, mesh=None, use_pallas=None):
    from vidtome_tpu.pipeline.generator import Generator

    print("Start generation!")
    generator = Generator(bundle, config, use_pallas=use_pallas, mesh=mesh)
    frame_ids = get_frame_ids(config.generation.get("frame_range", None),
                              config.generation.get("frame_ids", None))
    return generator(config.input_path, config.generation.latents_path,
                     config.generation.output_path, frame_ids=frame_ids)


def main(argv=None):
    config, bundle, mesh, use_pallas = setup_from_argv(argv)
    run_inversion(config, bundle, mesh, use_pallas)
    run_generation(config, bundle, mesh, use_pallas)


if __name__ == "__main__":
    main()
