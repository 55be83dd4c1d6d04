from sift3d.core.config import SiftConfig
from sift3d.core.volume import Volume

__all__ = ["SiftConfig", "Volume"]
