from refid_tpu.core.config import parse_options
from refid_tpu.core.registry import DATASETS, MODELS, ARCHS

__all__ = ["parse_options", "DATASETS", "MODELS", "ARCHS"]
