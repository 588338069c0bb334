from .area import AreaLight, AreaLightData
from .envmap import EnvironmentMap, EnvironmentMapData

__all__ = ["AreaLight", "AreaLightData", "EnvironmentMap", "EnvironmentMapData"]
