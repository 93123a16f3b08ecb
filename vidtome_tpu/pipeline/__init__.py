from vidtome_tpu.pipeline.inverter import Inverter  # noqa: F401
from vidtome_tpu.pipeline.generator import Generator  # noqa: F401
