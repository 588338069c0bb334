from .scene import Scene, SceneData

__all__ = ["Scene", "SceneData"]
