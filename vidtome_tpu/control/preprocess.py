"""Control-image preprocessors (reference utils/controlnet_utils.py:28-99).

Per-type image preprocessing feeding the matching ControlNet.  These run
offline on CPU (cv2 / optional aux models), are cached to disk by the
pipeline, and never touch the TPU hot path.

  canny          cv2.Canny edges
  tile           down/up resample blur
  ip2p           identity
  depth          DPT depth (3-channel) via control/depth.py
  softedge       native Flax HED (control/edge_hed.py, enabled by
                 VIDTOME_HED_MODEL) > controlnet_aux if importable >
                 Sobel-magnitude fallback (warned)
  lineart_anime  controlnet_aux if importable, else inverted-edge fallback
  openpose       controlnet_aux only (no meaningful cv2 fallback); use
                 ``validate_control_available`` to fail BEFORE the
                 expensive stages rather than mid-pipeline
"""

from __future__ import annotations

import numpy as np


def _to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def canny_preprocess(images: np.ndarray, low: int = 100, high: int = 200,
                     **_) -> np.ndarray:
    import cv2

    out = []
    for img in images:
        edges = cv2.Canny(_to_uint8(img), low, high)
        out.append(np.stack([edges] * 3, -1).astype(np.float32) / 255.0)
    return np.stack(out)


def tile_preprocess(images: np.ndarray, resample_rate: float = 1.0,
                    **_) -> np.ndarray:
    import cv2

    out = []
    for img in images:
        h, w = img.shape[:2]
        dh, dw = max(1, int(h * resample_rate)), max(1, int(w * resample_rate))
        small = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_LINEAR)
        out.append(cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST))
    return np.stack(out).astype(np.float32)


def ip2p_preprocess(images: np.ndarray, **_) -> np.ndarray:
    return np.asarray(images, np.float32)


def depth_preprocess(images: np.ndarray, **_) -> np.ndarray:
    from vidtome_tpu.control.depth import depth_to_control_image

    return depth_to_control_image(images)


def _sobel_edges(img: np.ndarray) -> np.ndarray:
    import cv2

    gray = cv2.cvtColor(_to_uint8(img), cv2.COLOR_RGB2GRAY)
    gx = cv2.Sobel(gray, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(gray, cv2.CV_32F, 0, 1, ksize=3)
    mag = np.sqrt(gx ** 2 + gy ** 2)
    mag = mag / max(mag.max(), 1e-8)
    return cv2.GaussianBlur(mag, (0, 0), sigmaX=2)


_aux_warned: set[str] = set()


def _try_aux(processor_id: str, images: np.ndarray) -> np.ndarray | None:
    try:
        import cv2
        from controlnet_aux.processor import Processor
    except ImportError:
        return None
    proc = Processor(processor_id, {"output_type": "numpy"})
    out = []
    H, W = images.shape[1:3]
    for img in images:
        res = proc(_to_uint8(img))
        res = cv2.resize(res, (W, H), interpolation=cv2.INTER_LINEAR)
        out.append(res.astype(np.float32) / 255.0)
    return np.stack(out)


def softedge_preprocess(images: np.ndarray, proc: str = "pidsafe",
                        **_) -> np.ndarray:
    from vidtome_tpu.control import edge_hed

    hed = edge_hed.hed_model_path()
    if hed is not None:
        # Native Flax HED (documented deviation: the reference's default
        # softedge processor is PiDiNet via controlnet_aux; HED is the
        # classic softedge model and feeds the same ControlNet).  The
        # *safe variants quantize the edge map to coarse steps.
        return edge_hed.hed_edges(images, hed, safe=proc.endswith("safe"))
    aux = _try_aux(f"softedge_{proc}", images)
    if aux is not None:
        return aux
    if "softedge" not in _aux_warned:
        print("[WARNING] no HED checkpoint (set VIDTOME_HED_MODEL) and no "
              "controlnet_aux — softedge falls back to Sobel magnitude "
              "(approximate)")
        _aux_warned.add("softedge")
    return np.stack([np.stack([_sobel_edges(i)] * 3, -1) for i in images])


def lineart_anime_preprocess(images: np.ndarray, proc: str = "anime",
                             **_) -> np.ndarray:
    from vidtome_tpu.control import lineart

    model = lineart.lineart_model_path()
    if model is not None:
        # native Anime2Sketch UnetGenerator (control/lineart.py)
        return lineart.lineart_edges(images, model)
    aux = _try_aux(f"lineart_{proc}", images)
    if aux is not None:
        return aux
    if "lineart" not in _aux_warned:
        print("[WARNING] no lineart checkpoint (set VIDTOME_LINEART_MODEL) "
              "and no controlnet_aux — lineart falls back to inverted "
              "edges (approximate)")
        _aux_warned.add("lineart")
    return np.stack([
        np.stack([1.0 - _sobel_edges(i)] * 3, -1) for i in images])


def openpose_preprocess(images: np.ndarray, **_) -> np.ndarray:
    from vidtome_tpu.control.pose import pose_images, pose_model_path

    path = pose_model_path()
    if path is not None:
        return pose_images(images, path)
    aux = _try_aux("openpose", images)
    if aux is None:
        raise RuntimeError(
            "openpose preprocessing needs a pose model: set "
            "VIDTOME_POSE_MODEL to a body_pose_model.pth checkpoint "
            "(native Flax port, control/pose.py) or install "
            "controlnet_aux; no cv2 fallback exists")
    return aux


PREPROCESS_DICT = {
    "tile": tile_preprocess,
    "ip2p": ip2p_preprocess,
    "openpose": openpose_preprocess,
    "softedge": softedge_preprocess,
    "depth": depth_preprocess,
    "lineart_anime": lineart_anime_preprocess,
    "canny": canny_preprocess,
}


def control_preprocess(images: np.ndarray, control_type: str,
                       **kwargs) -> np.ndarray:
    """[T, H, W, 3] in [0,1] -> control images [T, H, W, 3] in [0,1]."""
    if control_type not in PREPROCESS_DICT:
        raise KeyError(f"unknown control type {control_type!r}; "
                       f"choices: {sorted(PREPROCESS_DICT)}")
    return PREPROCESS_DICT[control_type](np.asarray(images), **kwargs)


def validate_control_available(control_type: str) -> None:
    """Fail FAST for control types whose preprocessor cannot run, instead
    of raising mid-pipeline after minutes of inversion (the pipelines call
    this at construction).  Only openpose is hard-gated: it needs a pose
    model (controlnet_aux) and has no meaningful classical fallback; the
    other types always produce something (exact or warned-approximate)."""
    if control_type != "openpose":
        return
    from vidtome_tpu.control.pose import pose_model_path

    if pose_model_path() is not None:
        return
    try:
        import controlnet_aux  # noqa: F401
        return
    except ImportError:
        pass
    raise RuntimeError(
        "control: openpose needs a pose model and none is available: set "
        "VIDTOME_POSE_MODEL to a body_pose_model.pth checkpoint (native "
        "Flax port, control/pose.py) or install controlnet_aux.  There "
        "is no classical fallback for pose estimation — choose another "
        "control type (canny/softedge/depth/tile/ip2p/lineart_anime) "
        "instead.  Failing now, before inversion, so no compute is "
        "wasted.")
