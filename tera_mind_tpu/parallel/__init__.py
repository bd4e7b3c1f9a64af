from .mesh import make_mesh
from .halo import exchange_halo_2d
from .generator import TeraGenerator, GeneratorConfig

__all__ = ["make_mesh", "exchange_halo_2d", "TeraGenerator",
           "GeneratorConfig"]
