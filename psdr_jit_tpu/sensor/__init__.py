from .sensor import Sensor, SensorData, sample_primary_edge
from .perspective import PerspectiveCamera
from .orthographic import OrthographicCamera

__all__ = ["SensorData", "PerspectiveCamera", "OrthographicCamera",
           "sample_primary_edge"]
