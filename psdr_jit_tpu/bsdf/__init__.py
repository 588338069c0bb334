from .bsdf import BSDF, eval_dispatch, sample_dispatch, pdf_dispatch
from .diffuse import DiffuseBSDF
from .ggx import GGXDistribution
from .microfacet import MicrofacetBSDF
from .microfacet_pv import MicrofacetBSDFPerVertex
from .roughconductor import RoughConductorBSDF
from .roughdielectric import RoughDielectricBSDF
from .normalmap import NormalMapBSDF

__all__ = [
    "BSDF", "DiffuseBSDF", "GGXDistribution", "MicrofacetBSDF",
    "MicrofacetBSDFPerVertex", "RoughConductorBSDF", "RoughDielectricBSDF",
    "NormalMapBSDF", "eval_dispatch", "sample_dispatch", "pdf_dispatch",
]
