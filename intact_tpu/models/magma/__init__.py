from intact_tpu.models.magma.config import MagmaConfig

__all__ = ["MagmaConfig"]
