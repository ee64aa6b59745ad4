from .blocks import ConvBlock, HourGlass, HGFilter, ResBlkEncoder  # noqa: F401
from .mlp import WNLinear, MLP, MLPUNet, MLPUNetFusion  # noqa: F401
from .spatial import SpatialEncoder  # noqa: F401
from .fusion import GeoVisFusion, TexVisFusion  # noqa: F401
from .ibr import IBRRenderingHead  # noqa: F401
from .discriminator import DiscriminatorVis  # noqa: F401
from .vanerf import VANeRF  # noqa: F401
