from .mesh import Mesh, TriangleInfo, MeshData, process_mesh

__all__ = ["Mesh", "TriangleInfo", "MeshData", "process_mesh"]
