from .emitter import Emitter
from .area import AreaLight, AreaLightData
from .envmap import EnvironmentMap, EnvironmentMapData

__all__ = ["Emitter", "AreaLight", "AreaLightData",
           "EnvironmentMap", "EnvironmentMapData"]
