"""Physics/forward-model blocks."""
from . import telescope, sky, beam, rime, linear_model, bessel
from .telescope import TelescopeModel, ArrayModel, build_reds
from .sky import (
    PointSky, PixelSky, PointSkyResponse, PixelSkyResponse, CompositeModel,
    Stokes2Coherency,
)
from .beam import (
    PixelBeam, GaussResponse, AiryResponse, UniformResponse, PixelResponse,
)
from .rime import RIME
from .linear_model import LinearModel, DictLM, MultiLM
