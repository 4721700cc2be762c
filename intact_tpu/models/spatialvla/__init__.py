from intact_tpu.models.spatialvla.config import SpatialVLAConfig

__all__ = ["SpatialVLAConfig"]
